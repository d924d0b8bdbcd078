"""Diarization serving daemon.

The reference ships only a one-shot CLI binary (reference
pipeline/src/speakerDiarizer.cpp:3415-3442) — every request pays process
startup, model load, and (here) jit compilation. This daemon keeps one
compiled pipeline resident and serves requests over HTTP (stdlib only):

    python -m pyannote_audio_speaker_diarization_cpp_tpu.runtime.server \
        [--port 8787] [--checkpoint DIR]

Endpoints:
  GET  /health            -> {"status": "ok", "requests": N, "streams": M}
  POST /diarize           body: RIFF WAV bytes
       query params: num_speakers, min_speakers, max_speakers,
                     format=json|rttm (default json)
       -> {"turns": [{"start": s, "end": e, "speaker": "Speaker_k"}, ...],
           "audio_seconds": T, "wall_seconds": W}
  POST /stream/open       query params: emit_every, recluster_every,
                            schedule=fixed|doubling, num_speakers,
                            min_speakers, max_speakers
       -> {"stream_id": "..."}
  POST /stream/feed?id=X  body: raw mono 16 kHz PCM samples —
                            little-endian int16 (default) or f32
                            (?format=f32)
       -> {"emitted": bool, "turns": [...] | null, "stream_seconds": T}
  POST /stream/close?id=X -> final flush: {"turns": [...],
                            "stream_seconds": T} (session removed)

Online sessions wrap pipelines.streaming.StreamingDiarizer — incremental
emissions with the frozen-prefix decode, flush identical to the offline
pipeline. Sessions are capped (--max-streams) and idle-evicted
(--stream-ttl); each is serialized by its own lock, while different
sessions and offline /diarize requests interleave freely.

Concurrent requests PIPELINE on the chip: only the (few-ms) dispatch phase
is serialized, so one request's transfers/host clustering overlap the
others' device compute (same mechanism as ``pipeline.map``; measured 440+
audio-s/s aggregate, docs/PERF.md). For multi-chip serving, run the
pipeline over a mesh (``--mesh``) — batch work inside one request
data-parallelizes across chips.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def build_pipeline(checkpoint=None, mesh=False, seg_batch=None, emb_batch=None):
    import jax

    from ..pipelines.diarization import SpeakerDiarizationPipeline

    params = None
    if checkpoint:
        from ..models.ingest import load_params_auto

        params = load_params_auto(checkpoint)
    mesh_obj = None
    if mesh:
        from ..parallel.mesh import make_mesh

        mesh_obj = make_mesh(jax.devices())
    return SpeakerDiarizationPipeline(
        params=params, mesh=mesh_obj, seg_batch=seg_batch, emb_batch=emb_batch
    )


class ServiceBusy(Exception):
    """The dispatch lock was not acquired within the admission timeout —
    the pipeline is wedged or overloaded; fail fast instead of queueing."""


class DiarizationService:
    """Thread-safe wrapper: one pipeline, PIPELINED concurrent inference.

    Only the dispatch phase (host prep + the two async device-stage
    dispatches, a few ms) is serialized; the collect phase (d2h fetch,
    host clustering, post-step, decode) runs outside the lock — so while
    one request waits on its transfers, the next request's device compute
    is already queued, exactly like pipeline.map (docs/PERF.md measured
    440+ audio-s/s aggregate vs ~350 for strictly serial requests).

    Each request carries its OWN StageTimings (passed through
    _dispatch/_collect), so concurrent requests never interleave their
    attribution on the shared pipeline object.

    ``admission_timeout``: seconds to wait for the dispatch lock before
    raising ServiceBusy (503). A wedged device dispatch holds the lock, so
    this bounds how long new requests can pile up behind it.
    """

    def __init__(
        self,
        pipeline,
        admission_timeout: float = 30.0,
        max_streams: int = 16,
        stream_ttl: float = 600.0,
    ):
        self.pipeline = pipeline
        self.admission_timeout = admission_timeout
        self._lock = threading.Lock()
        self.requests = 0
        self.streams = StreamSessions(
            pipeline, max_streams=max_streams, ttl=stream_ttl
        )

    def diarize(self, wav_bytes: bytes, **bounds):
        from ..pipelines.diarization import StageTimings
        from ..io import wav as wavio

        data = wavio.read_wav(io.BytesIO(wav_bytes))
        waveform = data.normalized_mono()
        timings = StageTimings()
        t0 = time.perf_counter()
        if not self._lock.acquire(timeout=self.admission_timeout):
            raise ServiceBusy(
                f"dispatch queue stalled for {self.admission_timeout:.0f}s"
            )
        try:
            pending = self.pipeline._dispatch(
                waveform, data.sample_rate, timings=timings, **bounds
            )
            self.requests += 1
        finally:
            self._lock.release()
        annotation = self.pipeline._collect(pending, timings=timings, **bounds)
        wall = time.perf_counter() - t0
        return annotation, data.num_samples / data.sample_rate, wall


class StreamLimit(Exception):
    """Too many live streaming sessions (HTTP 429)."""


class StreamSessions:
    """Online diarization sessions over the shared pipeline.

    Each session owns a StreamingDiarizer plus a lock (feeds on ONE
    session are serialized; different sessions and offline requests
    interleave — the jitted stage dispatches are thread-safe and the
    per-session state is what needs guarding). Idle sessions are evicted
    after ``ttl`` seconds, checked whenever a session is opened."""

    def __init__(self, pipeline, max_streams: int = 16, ttl: float = 600.0):
        self.pipeline = pipeline
        self.max_streams = max_streams
        self.ttl = ttl
        self._lock = threading.Lock()
        self._sessions: dict = {}
        self._next_id = 0

    def open(self, **kwargs) -> str:
        from ..pipelines.streaming import StreamingDiarizer

        stream = StreamingDiarizer(self.pipeline, **kwargs)
        with self._lock:
            now = time.monotonic()
            for sid in [
                s
                for s, (_, _, last) in self._sessions.items()
                if now - last > self.ttl
            ]:
                del self._sessions[sid]
            if len(self._sessions) >= self.max_streams:
                raise StreamLimit(
                    f"{self.max_streams} live streams (close or wait for TTL)"
                )
            sid = f"s{self._next_id}"
            self._next_id += 1
            self._sessions[sid] = (stream, threading.Lock(), now)
        return sid

    def _get(self, sid: str):
        with self._lock:
            entry = self._sessions.get(sid)
            if entry is None:
                raise KeyError(sid)
            stream, lock, _ = entry
            self._sessions[sid] = (stream, lock, time.monotonic())
        return stream, lock

    def feed(self, sid: str, samples):
        stream, lock = self._get(sid)
        with lock:
            ann = stream.feed(samples)
            seconds = stream.total_samples / 16000.0
        return ann, seconds

    def close(self, sid: str):
        stream, lock = self._get(sid)
        with lock:
            ann = stream.flush()
            seconds = stream.total_samples / 16000.0
        with self._lock:
            self._sessions.pop(sid, None)
        return ann, seconds

    def __len__(self) -> int:
        with self._lock:
            return len(self._sessions)


def _turns_json(annotation):
    return [
        {
            "start": round(t.start, 3),
            "end": round(t.end, 3),
            "speaker": f"Speaker_{t.label}",
        }
        for t in annotation.turns()
    ]


def make_handler(service: DiarizationService, max_request_bytes: int = 256 << 20):
    class Handler(BaseHTTPRequestHandler):
        # socket read timeout: a client that stops sending mid-body cannot
        # hold a handler thread forever
        timeout = 60

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/health":
                self._send(
                    200,
                    json.dumps(
                        {
                            "status": "ok",
                            "requests": service.requests,
                            "streams": len(service.streams),
                        }
                    ).encode(),
                )
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            url = urlparse(self.path)
            if url.path not in (
                "/diarize",
                "/stream/open",
                "/stream/feed",
                "/stream/close",
            ):
                self._send(404, b'{"error": "not found"}')
                return
            query = parse_qs(url.query)

            def q_int(name):
                return int(query[name][0]) if name in query else None

            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0:
                    raise ValueError("negative Content-Length")
            except (TypeError, ValueError):
                # malformed header: answer 400 instead of dropping the
                # connection with no HTTP response (round-4 advisor); the
                # body length is unknown, so the keep-alive stream cannot
                # be resynchronized — close it
                self.close_connection = True
                self._send(400, b'{"error": "bad Content-Length"}')
                return
            if length > max_request_bytes:
                # refuse before reading the body into memory; the unread
                # body is still on the socket, so close the connection
                # instead of leaving the keep-alive stream desynchronized
                self.close_connection = True
                self._send(
                    413,
                    json.dumps(
                        {
                            "error": "request too large",
                            "max_bytes": max_request_bytes,
                        }
                    ).encode(),
                )
                return
            body = self.rfile.read(length)
            if url.path != "/diarize":
                self._stream_request(url.path, query, body, q_int)
                return
            try:
                annotation, audio_s, wall_s = service.diarize(
                    body,
                    num_speakers=q_int("num_speakers"),
                    min_speakers=q_int("min_speakers"),
                    max_speakers=q_int("max_speakers"),
                )
            except ServiceBusy as exc:
                self._send(503, json.dumps({"error": str(exc)}).encode())
                return
            except Exception as exc:  # malformed wav etc.
                self._send(400, json.dumps({"error": str(exc)}).encode())
                return
            if query.get("format", ["json"])[0] == "rttm":
                self._send(
                    200, (annotation.to_rttm("stream") + "\n").encode(), "text/plain"
                )
                return
            self._send(
                200,
                json.dumps(
                    {
                        "turns": _turns_json(annotation),
                        "audio_seconds": round(audio_s, 3),
                        "wall_seconds": round(wall_s, 4),
                    }
                ).encode(),
            )

        def _stream_request(self, path, query, body, q_int):
            import numpy as np

            if path == "/stream/open":
                kwargs = {}
                if "emit_every" in query:
                    kwargs["emit_every"] = q_int("emit_every")
                if "recluster_every" in query:
                    kwargs["recluster_every"] = q_int("recluster_every")
                if "schedule" in query:
                    kwargs["recluster_schedule"] = query["schedule"][0]
                for b in ("num_speakers", "min_speakers", "max_speakers"):
                    if b in query:
                        kwargs[b] = q_int(b)
                try:
                    sid = service.streams.open(**kwargs)
                except StreamLimit as exc:
                    self._send(429, json.dumps({"error": str(exc)}).encode())
                    return
                except (TypeError, ValueError) as exc:
                    self._send(400, json.dumps({"error": str(exc)}).encode())
                    return
                self._send(200, json.dumps({"stream_id": sid}).encode())
                return

            sid = query.get("id", [None])[0]
            if sid is None:
                self._send(400, b'{"error": "missing id"}')
                return
            try:
                if path == "/stream/feed":
                    fmt = query.get("format", ["i16"])[0]
                    if fmt == "i16":
                        samples = (
                            np.frombuffer(body, dtype="<i2").astype(np.float32)
                            / 32768.0
                        )
                    elif fmt == "f32":
                        samples = np.frombuffer(body, dtype="<f4")
                    else:
                        self._send(400, b'{"error": "format must be i16|f32"}')
                        return
                    ann, seconds = service.streams.feed(sid, samples)
                    self._send(
                        200,
                        json.dumps(
                            {
                                "emitted": ann is not None,
                                "turns": None if ann is None else _turns_json(ann),
                                "stream_seconds": round(seconds, 3),
                            }
                        ).encode(),
                    )
                else:  # /stream/close
                    ann, seconds = service.streams.close(sid)
                    self._send(
                        200,
                        json.dumps(
                            {
                                "turns": _turns_json(ann),
                                "stream_seconds": round(seconds, 3),
                            }
                        ).encode(),
                    )
            except KeyError:
                self._send(404, b'{"error": "unknown stream id"}')
            except Exception as exc:
                self._send(400, json.dumps({"error": str(exc)}).encode())

    return Handler


def serve(
    service: DiarizationService,
    host="127.0.0.1",
    port=8787,
    max_request_bytes: int = 256 << 20,
):
    server = ThreadingHTTPServer(
        (host, port), make_handler(service, max_request_bytes)
    )
    return server


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="diarization serving daemon")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--mesh", action="store_true", help="shard over all devices")
    parser.add_argument("--seg-batch", type=int, default=None)
    parser.add_argument("--emb-batch", type=int, default=None)
    parser.add_argument(
        "--max-request-mb",
        type=int,
        default=256,
        help="reject request bodies larger than this (HTTP 413) before "
        "reading them into memory",
    )
    parser.add_argument(
        "--admission-timeout",
        type=float,
        default=30.0,
        help="seconds a request may wait for the dispatch slot before "
        "failing fast with HTTP 503 (guards against a wedged device)",
    )
    parser.add_argument(
        "--warmup",
        type=float,
        default=0.0,
        metavar="SECONDS",
        help="pre-compile all chunk buckets up to this audio length before "
        "accepting requests (no first-request compile stall)",
    )
    parser.add_argument(
        "--max-streams",
        type=int,
        default=16,
        help="cap on live /stream sessions (HTTP 429 beyond it)",
    )
    parser.add_argument(
        "--stream-ttl",
        type=float,
        default=600.0,
        help="seconds of inactivity before a /stream session is evicted",
    )
    args = parser.parse_args(argv)

    pipeline = build_pipeline(args.checkpoint, args.mesh, args.seg_batch, args.emb_batch)
    if args.warmup > 0:
        warmed = pipeline.warmup(args.warmup)
        print(f"warmed {len(warmed)} chunk buckets (up to {args.warmup:.0f} s audio)")
    service = DiarizationService(
        pipeline,
        admission_timeout=args.admission_timeout,
        max_streams=args.max_streams,
        stream_ttl=args.stream_ttl,
    )
    server = serve(
        service, args.host, args.port, max_request_bytes=args.max_request_mb << 20
    )
    print(f"serving on http://{args.host}:{args.port} (POST /diarize)")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
