"""Serving daemon: health, diarize (json + rttm), error handling."""

import io
import json
import threading
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
