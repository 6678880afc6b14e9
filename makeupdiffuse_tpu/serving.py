"""Production serving: static-shape dynamic batching for the transfer pipeline.

The reference has no serving story — its product surface is an offline driver
that writes PNG grids (`/root/reference/runs/test.py`,
`/root/reference/diffmk/diffusion_makeup.py:332-411`). This module is the
TPU-native production path for the same `(source, reference) → transfer`
call:

- **Static shapes**: XLA compiles one program per batch size. Requests are
  micro-batched into a small set of fixed bucket sizes; a partial batch is
  padded by repeating its last item and the outputs are sliced back. Every
  bucket is compiled once at warmup, so steady-state serving never compiles.
- **Dynamic batching**: a dispatcher thread drains the request queue, waits at
  most ``max_wait_ms`` for co-riders, picks the smallest bucket that fits, and
  issues ONE device program for the whole group — the TPU analog of the
  reference's DataLoader batching, applied at serving time.
- **Zero dependencies**: the wire protocol is newline-delimited JSON over a
  local TCP socket (stdlib ``socket``/``threading``); tensors travel as .npy
  file paths so the hot path never serializes images through JSON.

Drive it with ``scripts/serve.py`` (also has a ``--selftest`` mode that runs
concurrent synthetic clients against a live server and prints latency
percentiles).
"""
from __future__ import annotations

import dataclasses
import json
import os
import queue
import socket
import socketserver
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# sample_fn(src [B,H,W,3] f32 [0,1], ref [B,H,W,3], seed int) -> [B,H,W,3] in [-1,1]
SampleFn = Callable[[np.ndarray, np.ndarray, int], np.ndarray]


@dataclasses.dataclass
class _Pending:
    src: np.ndarray
    ref: np.ndarray
    done: threading.Event
    out: Optional[np.ndarray] = None
    error: Optional[str] = None
    t_submit: float = 0.0
    t_done: float = 0.0

    @property
    def latency_ms(self) -> float:
        return (self.t_done - self.t_submit) * 1e3


class BatchingEngine:
    """Groups concurrent transfer requests into fixed-size device batches.

    ``buckets`` must be sorted ascending; the largest bucket is the max batch.
    ``max_wait_ms`` bounds the time the dispatcher holds the FIRST request of a
    group open for co-riders — throughput/latency knob, not a correctness one.
    """

    def __init__(self, sample_fn: SampleFn, buckets: Sequence[int] = (1, 2, 4, 8),
                 max_wait_ms: float = 30.0):
        if list(buckets) != sorted(set(int(b) for b in buckets)) or buckets[0] < 1:
            raise ValueError(f"buckets must be ascending unique positives: {buckets}")
        self.sample_fn = sample_fn
        self.buckets = [int(b) for b in buckets]
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._lock = threading.Lock()
        self._stats = dict(requests=0, batches=0, padded_slots=0, errors=0)
        self._latencies: List[float] = []
        self._seed = np.random.SeedSequence(0)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True,
                                        name="mdt-serve-dispatch")
        self._thread.start()

    # ---- client side ------------------------------------------------------------

    def submit(self, src: np.ndarray, ref: np.ndarray) -> _Pending:
        """Enqueue one request; returns a handle whose ``done`` event fires when
        ``out`` (or ``error``) is set. src/ref: [H,W,3] float32 in [0,1]."""
        if self._stop.is_set():
            raise RuntimeError("BatchingEngine is shut down")
        if src.ndim != 3 or ref.ndim != 3:
            raise ValueError(f"expected [H,W,3] images, got {src.shape} / {ref.shape}")
        p = _Pending(src=np.asarray(src, np.float32), ref=np.asarray(ref, np.float32),
                     done=threading.Event(), t_submit=time.time())
        self._q.put(p)
        return p

    def transfer(self, src: np.ndarray, ref: np.ndarray,
                 timeout: Optional[float] = None) -> np.ndarray:
        """Blocking convenience wrapper around submit()."""
        p = self.submit(src, ref)
        if not p.done.wait(timeout):
            raise TimeoutError("transfer timed out")
        if p.error is not None:
            raise RuntimeError(p.error)
        return p.out

    # ---- engine side ------------------------------------------------------------

    def warmup(self, image_hw: int) -> Dict[int, float]:
        """Compile every bucket once (static shapes → steady state never
        compiles). Returns {bucket: seconds} compile+run times."""
        times = {}
        for b in self.buckets:
            x = np.full((b, image_hw, image_hw, 3), 0.5, np.float32)
            t0 = time.time()
            out = self.sample_fn(x, x, 0)
            np.asarray(out)  # host fetch = true sync through the attachment
            times[b] = time.time() - t0
        return times

    def _take_group(self) -> Optional[List[_Pending]]:
        """Block for the first request, then hold the window open for co-riders
        up to max_wait_s or the largest bucket, whichever first."""
        try:
            first = self._q.get(timeout=0.25)
        except queue.Empty:
            return None
        if first is None:  # shutdown sentinel
            return None
        group = [first]
        deadline = time.time() + self.max_wait_s
        max_b = self.buckets[-1]
        while len(group) < max_b:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post sentinel for the outer loop
                break
            group.append(nxt)
        return group

    def _dispatch_loop(self) -> None:
        while not self._stop.is_set():
            group = self._take_group()
            if group is None:
                continue
            self._run_group(group)

    def _run_group(self, group: List[_Pending]) -> None:
        n = len(group)
        bucket = next(b for b in self.buckets if b >= n)
        src = np.stack([p.src for p in group] + [group[-1].src] * (bucket - n))
        ref = np.stack([p.ref for p in group] + [group[-1].ref] * (bucket - n))
        seed = int(self._seed.spawn(1)[0].generate_state(1)[0])
        try:
            out = np.asarray(self.sample_fn(src, ref, seed))
        except Exception as e:  # surface device errors to every waiter
            with self._lock:
                self._stats["errors"] += n
            for p in group:
                p.error = f"{type(e).__name__}: {e}"
                p.t_done = time.time()
                p.done.set()
            return
        t_done = time.time()
        for i, p in enumerate(group):
            p.out = out[i]
            p.t_done = t_done
            p.done.set()
        with self._lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["padded_slots"] += bucket - n
            self._latencies.extend(p.latency_ms for p in group)

    def stats(self) -> Dict[str, float]:
        with self._lock:
            s = dict(self._stats)
            lats = sorted(self._latencies)
        if lats:
            s["latency_ms_p50"] = lats[len(lats) // 2]
            s["latency_ms_p95"] = lats[min(len(lats) - 1, int(len(lats) * 0.95))]
            s["latency_ms_max"] = lats[-1]
        if s["batches"]:
            s["mean_occupancy"] = s["requests"] / (
                s["requests"] + s["padded_slots"])
        return s

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)


# ---- wire protocol -------------------------------------------------------------
#
# One JSON object per line. Request:
#   {"src": "/path/s.npy|png", "ref": "/path/r.npy|png", "out": "/path/o.npy|png"}
# Special: {"cmd": "stats"} and {"cmd": "ping"}.
# Response: {"ok": true, "out": ..., "latency_ms": ...} or {"ok": false, "error": ...}


def _load_image(path: str, image_hw: int) -> np.ndarray:
    """[H,W,3] float32 in [0,1]; .npy loads raw, anything else goes through PIL
    with the native bilinear resize (utils/native.py) when available."""
    if path.endswith(".npy"):
        arr = np.asarray(np.load(path), np.float32)
        if arr.shape != (image_hw, image_hw, 3):
            raise ValueError(f"{path}: expected {(image_hw, image_hw, 3)}, got {arr.shape}")
        return arr
    from PIL import Image

    from .utils import native

    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return native.resize_normalize(img, image_hw, scale=1 / 255.0, offset=0.0)


def _save_image(path: str, img: np.ndarray) -> None:
    """img in [-1,1]. .npy saves raw; anything else writes a PNG."""
    if path.endswith(".npy"):
        np.save(path, img)
        return
    from PIL import Image

    u8 = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)


class TransferServer:
    """Threaded JSONL-over-TCP front end for a BatchingEngine.

    Each connection is one thread; concurrent connections are what fills the
    engine's batches. Localhost-only by default."""

    def __init__(self, engine: BatchingEngine, image_hw: int,
                 host: str = "127.0.0.1", port: int = 0,
                 request_timeout_s: float = 300.0):
        self.engine = engine
        self.image_hw = image_hw
        self.request_timeout_s = request_timeout_s
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                for raw in self.rfile:
                    line = raw.strip()
                    if not line:
                        continue
                    resp = outer._handle_line(line)
                    self.wfile.write((json.dumps(resp) + "\n").encode())
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address: Tuple[str, int] = self._server.server_address[:2]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True, name="mdt-serve-accept")

    def _handle_line(self, line: bytes) -> Dict:
        try:
            req = json.loads(line)
            if req.get("cmd") == "ping":
                return {"ok": True, "pong": True}
            if req.get("cmd") == "stats":
                return {"ok": True, "stats": self.engine.stats()}
            src = _load_image(req["src"], self.image_hw)
            ref = _load_image(req["ref"], self.image_hw)
            t0 = time.time()
            out = self.engine.transfer(src, ref, timeout=self.request_timeout_s)
            latency_ms = (time.time() - t0) * 1e3
            _save_image(req["out"], out)
            return {"ok": True, "out": req["out"], "latency_ms": round(latency_ms, 2)}
        except Exception as e:
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}

    def start(self) -> Tuple[str, int]:
        self._thread.start()
        return self.address

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class TransferClient:
    """Minimal blocking client for the JSONL protocol."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._file = self._sock.makefile("rwb")

    def request(self, payload: Dict) -> Dict:
        self._file.write((json.dumps(payload) + "\n").encode())
        self._file.flush()
        line = self._file.readline()
        if not line:
            raise ConnectionError("server closed the connection")
        return json.loads(line)

    def transfer(self, src_path: str, ref_path: str, out_path: str) -> Dict:
        return self.request({"src": src_path, "ref": ref_path, "out": out_path})

    def close(self) -> None:
        try:
            self._file.close()
        finally:
            self._sock.close()
