"""Serving daemon: health, diarize (json + rttm), error handling."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.runtime.server import (
    DiarizationService,
    serve,
)

@pytest.fixture(scope="module")
def server_url(tiny1s_pipeline):
    service = DiarizationService(tiny1s_pipeline)
    server = serve(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _wav_bytes(seconds=3, seed=0):
    rng = np.random.default_rng(seed)
    samples = (rng.normal(size=seconds * 16000) * 3000).round()
    buf = io.BytesIO()
    # write via the file writer path into memory
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.wav")
        wavio.write_wav(path, samples.astype(np.float32), 16000, 16)
        return open(path, "rb").read()


def test_health(server_url):
    with urllib.request.urlopen(f"{server_url}/health") as r:
        body = json.load(r)
    assert body["status"] == "ok"


def test_diarize_json(server_url):
    req = urllib.request.Request(
        f"{server_url}/diarize", data=_wav_bytes(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        body = json.load(r)
    assert body["audio_seconds"] == 3.0
    assert isinstance(body["turns"], list)
    for turn in body["turns"]:
        assert 0 <= turn["start"] <= turn["end"] <= 3.0
        assert turn["speaker"].startswith("Speaker_")


def test_diarize_rttm(server_url):
    req = urllib.request.Request(
        f"{server_url}/diarize?format=rttm", data=_wav_bytes(seed=1), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        text = r.read().decode()
    for line in filter(None, text.strip().splitlines()):
        assert line.startswith("SPEAKER ")


def test_diarize_bad_input(server_url):
    req = urllib.request.Request(
        f"{server_url}/diarize", data=b"not a wav", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400


def test_unknown_path(server_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"{server_url}/nope")
    assert err.value.code == 404


def test_concurrent_requests_pipeline(server_url):
    """Concurrent POSTs overlap on the device (only the dispatch phase is
    serialized); every response must match the sequential answer."""
    payloads = [_wav_bytes(seconds=3, seed=s) for s in (5, 6, 7, 8)]

    def post(body):
        req = urllib.request.Request(f"{server_url}/diarize", data=body)
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    sequential = [post(b) for b in payloads]

    results = [None] * len(payloads)

    def worker(i):
        results[i] = post(payloads[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got, want in zip(results, sequential):
        assert got["turns"] == want["turns"]


def test_pipeline_warmup_compiles_buckets(tiny1s_pipeline):
    """warmup() pre-compiles every chunk bucket up to the horizon; requests
    at any length below it then hit only cached executables."""
    warmed = tiny1s_pipeline.warmup(max_audio_seconds=6.0)
    assert warmed == sorted(set(warmed)) and len(warmed) >= 1
    # a request inside the warmed horizon must work (and reuse the compiles)
    rng = np.random.default_rng(3)
    ann = tiny1s_pipeline((0.1 * rng.normal(size=4 * 16000)).astype(np.float32))
    assert ann is not None


def test_request_size_cap(tiny1s_pipeline):
    """Bodies over max_request_bytes are refused with 413 BEFORE being read
    into memory."""
    service = DiarizationService(tiny1s_pipeline)
    server = serve(service, host="127.0.0.1", port=0, max_request_bytes=1024)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(f"{url}/diarize", data=b"x" * 2048)
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 413
        # a small (if malformed) body still reaches the wav parser (400)
        req = urllib.request.Request(f"{url}/diarize", data=b"small")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
    finally:
        server.shutdown()


def test_admission_timeout_fails_fast(tiny1s_pipeline):
    """When the dispatch slot is wedged, new requests get 503 within the
    admission timeout instead of queueing forever."""
    service = DiarizationService(tiny1s_pipeline, admission_timeout=0.2)
    server = serve(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    service._lock.acquire()  # simulate a wedged dispatch
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(f"{url}/diarize", data=_wav_bytes())
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 503
    finally:
        service._lock.release()
        server.shutdown()


def test_concurrent_load_throughput_and_memory(server_url):
    """N simultaneous requests: aggregate wall time must beat N sequential
    requests (the pipelined overlap), every response must be valid, and RSS
    must stay bounded (no per-request leak)."""
    import resource
    import time as _time

    payloads = [_wav_bytes(seconds=3, seed=100 + s) for s in range(6)]

    def post(body):
        req = urllib.request.Request(f"{server_url}/diarize", data=body)
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    # warm all shapes + measure sequential wall
    t0 = _time.perf_counter()
    for b in payloads:
        post(b)
    sequential_wall = _time.perf_counter() - t0

    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    results = [None] * len(payloads)

    def worker(i):
        results[i] = post(payloads[i])

    t0 = _time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(payloads))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent_wall = _time.perf_counter() - t0

    assert all(r is not None and "turns" in r for r in results)
    # aggregate throughput >= sequential (generous slack for CI noise)
    assert concurrent_wall <= sequential_wall * 1.5
    # bounded memory: 6 requests of 3 s audio must not grow RSS by > 512 MB
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert (rss_after - rss_before) < 512 * 1024  # ru_maxrss is in KB on linux


# ---------------------------------------------------------------------------
# streaming endpoints (round 5)
# ---------------------------------------------------------------------------


def _post(url, data=b""):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.load(r)


def test_stream_session_matches_offline(server_url, tiny1s_pipeline):
    """open -> feed blocks -> close must equal the offline pipeline on the
    concatenated audio (flush == offline, served)."""
    rng = np.random.default_rng(50)
    audio = (0.1 * rng.normal(size=int(6.5 * 16000))).astype(np.float32)
    sid = _post(f"{server_url}/stream/open?emit_every=2")["stream_id"]
    emitted = 0
    for block in np.array_split(audio, 5):
        body = _post(
            f"{server_url}/stream/feed?id={sid}&format=f32",
            block.astype("<f4").tobytes(),
        )
        if body["emitted"]:
            emitted += 1
            assert isinstance(body["turns"], list)
    final = _post(f"{server_url}/stream/close?id={sid}")
    assert emitted >= 1
    offline = tiny1s_pipeline(audio)
    want = [
        {
            "start": round(t.start, 3),
            "end": round(t.end, 3),
            "speaker": f"Speaker_{t.label}",
        }
        for t in offline.turns()
    ]
    # the served pipeline IS tiny1s_pipeline (device clustering on) while
    # flush reclusters on host: compare boundaries, labels up to renaming
    assert [(t["start"], t["end"]) for t in final["turns"]] == [
        (t["start"], t["end"]) for t in want
    ]
    # closed session is gone
    req = urllib.request.Request(
        f"{server_url}/stream/feed?id={sid}", data=b"", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 404


def test_stream_i16_format_and_health_count(server_url):
    sid = _post(f"{server_url}/stream/open")["stream_id"]
    with urllib.request.urlopen(f"{server_url}/health") as r:
        assert json.load(r)["streams"] >= 1
    samples = (np.random.default_rng(3).normal(size=16000) * 3000).astype("<i2")
    body = _post(f"{server_url}/stream/feed?id={sid}", samples.tobytes())
    assert body["stream_seconds"] == 1.0
    _post(f"{server_url}/stream/close?id={sid}")


def test_stream_limits_and_errors(tiny1s_pipeline):
    from pyannote_audio_speaker_diarization_cpp_tpu.runtime.server import (
        StreamLimit,
        StreamSessions,
    )

    sessions = StreamSessions(tiny1s_pipeline, max_streams=2, ttl=1e9)
    a, b = sessions.open(), sessions.open()
    with pytest.raises(StreamLimit):
        sessions.open()
    sessions.close(a)
    c = sessions.open(emit_every=4)  # capacity freed
    assert len(sessions) == 2
    with pytest.raises(KeyError):
        sessions.feed("nope", np.zeros(10, np.float32))
    # TTL eviction: zero TTL evicts everything at the next open
    sessions.ttl = 0.0
    import time as _t

    _t.sleep(0.01)
    d = sessions.open()
    assert len(sessions) == 1  # b and c evicted, only d lives
