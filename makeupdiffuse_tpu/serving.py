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
- **Pipelined dispatch**: submit and fetch are split across two threads. JAX
  dispatch is asynchronous, so the dispatcher can assemble + submit group N+1
  while the collector thread blocks on the host fetch of group N — the device
  never idles on group assembly, padding, or output fan-out (bounded by
  ``pipeline_depth`` groups in flight). ``sample_fn`` must therefore NOT force
  a host sync itself; return the device array and let the collector fetch.
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

# sample_fn(src [B,H,W,3] f32 [0,1], ref [B,H,W,3], seed int) -> [B,H,W,3] in [-1,1].
# May return a device array (preferred — lets the engine overlap the next group's
# assembly with device compute); the collector thread's np.asarray is the fetch.
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
    cancelled: bool = False  # set by a timed-out waiter; engine skips/discards

    @property
    def latency_ms(self) -> float:
        return (self.t_done - self.t_submit) * 1e3


class BatchingEngine:
    """Groups concurrent transfer requests into fixed-size device batches.

    ``buckets`` must be sorted ascending; the largest bucket is the max batch.
    ``max_wait_ms`` bounds the time the dispatcher holds the FIRST request of a
    group open for co-riders — throughput/latency knob, not a correctness one.
    ``image_hw``, when given, pins the exact request shape at submit() so a
    stray-sized image can neither kill a device batch nor trigger a fresh XLA
    compile in steady state (every warmed bucket shares this H=W).
    ``pipeline_depth`` bounds how many groups may be submitted-but-unfetched;
    2 gives the assemble/compute overlap, more only adds queueing latency.
    """

    def __init__(self, sample_fn: SampleFn, buckets: Sequence[int] = (1, 2, 4, 8),
                 max_wait_ms: float = 30.0, image_hw: Optional[int] = None,
                 pipeline_depth: int = 2):
        if (not buckets or list(buckets) != sorted(set(int(b) for b in buckets))
                or buckets[0] < 1):
            raise ValueError(f"buckets must be ascending unique positives: {buckets}")
        self.sample_fn = sample_fn
        self.buckets = [int(b) for b in buckets]
        self.max_wait_s = max_wait_ms / 1e3
        self.image_hw = int(image_hw) if image_hw else None
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._results: "queue.Queue[Optional[tuple]]" = queue.Queue()
        self._depth = max(1, int(pipeline_depth))
        self._inflight_slots = threading.Semaphore(self._depth)
        self._lock = threading.Lock()
        self._stats = dict(requests=0, batches=0, padded_slots=0, errors=0,
                           cancelled=0)
        self._latencies: List[float] = []
        # in-flight interval accounting → device occupancy (stats())
        self._inflight_n = 0
        self._busy_since = 0.0
        self._busy_accum = 0.0
        self._span_start: Optional[float] = None
        self._span_end = 0.0
        self._seed = np.random.SeedSequence(0)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True,
                                        name="mdt-serve-dispatch")
        self._collector = threading.Thread(target=self._collect_loop, daemon=True,
                                           name="mdt-serve-collect")
        self._thread.start()
        self._collector.start()

    # ---- client side ------------------------------------------------------------

    def submit(self, src: np.ndarray, ref: np.ndarray) -> _Pending:
        """Enqueue one request; returns a handle whose ``done`` event fires when
        ``out`` (or ``error``) is set. src/ref: [H,W,3] float32 in [0,1]."""
        if self._stop.is_set():
            raise RuntimeError("BatchingEngine is shut down")
        want = (self.image_hw, self.image_hw, 3) if self.image_hw else None
        for name, img in (("src", src), ("ref", ref)):
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(f"{name}: expected [H,W,3], got {img.shape}")
            if want is not None and tuple(img.shape) != want:
                raise ValueError(f"{name}: expected {want} (the warmed bucket "
                                 f"shape), got {tuple(img.shape)}")
        if src.shape != ref.shape:
            raise ValueError(f"src/ref shapes differ: {src.shape} vs {ref.shape}")
        p = _Pending(src=np.asarray(src, np.float32), ref=np.asarray(ref, np.float32),
                     done=threading.Event(), t_submit=time.time())
        self._q.put(p)
        return p

    def transfer(self, src: np.ndarray, ref: np.ndarray,
                 timeout: Optional[float] = None) -> np.ndarray:
        """Blocking convenience wrapper around submit(). On timeout the pending
        request is cancelled: the engine drops it from any not-yet-submitted
        group and excludes it from latency stats (a full device batch is not
        spent on a waiter that already gave up)."""
        p = self.submit(src, ref)
        if not p.done.wait(timeout):
            p.cancelled = True
            with self._lock:
                self._stats["cancelled"] += 1
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
        up to max_wait_s or the largest bucket — and KEEP holding it while the
        pipeline is full: submit would block on a slot anyway, so waiting for
        a fuller (less padded) bucket is free device throughput. Under
        sustained load groups converge to the largest bucket."""
        try:
            first = self._q.get(timeout=0.25)
        except queue.Empty:
            return None
        if first is None:  # shutdown sentinel
            return None
        group = [first]
        deadline = time.time() + self.max_wait_s
        max_b = self.buckets[-1]
        while len(group) < max_b and not self._stop.is_set():
            remaining = deadline - time.time()
            if remaining <= 0:
                with self._lock:
                    pipeline_full = self._inflight_n >= self._depth
                if not pipeline_full:
                    break  # a slot is free — launch what we have
                remaining = 0.005  # device busy: co-rider wait costs nothing
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                continue  # loop re-checks deadline/pipeline state
            if nxt is None:
                self._q.put(None)  # re-post sentinel for the outer loop
                break
            group.append(nxt)
        return group

    def _dispatch_loop(self) -> None:
        while not self._stop.is_set():
            group = None
            try:
                group = self._take_group()
                if group is None:
                    continue
                self._submit_group(group)
            except Exception as e:  # the dispatcher must outlive any one group
                try:
                    if group:
                        self._fail_group(group, e)
                except Exception:
                    pass

    def _fail_group(self, group: List[_Pending], e: Exception) -> None:
        live = [p for p in group if not p.cancelled]
        with self._lock:
            self._stats["errors"] += len(live)
        for p in live:
            p.error = f"{type(e).__name__}: {e}"
            p.t_done = time.time()
            p.done.set()

    def _submit_group(self, group: List[_Pending]) -> None:
        """Assemble + submit ONE device batch; the collector thread fetches it.
        Bounded by pipeline_depth groups in flight, so group N+1's stacking,
        padding and seed draw overlap group N's device compute."""
        group = [p for p in group if not p.cancelled]
        if not group:
            return
        self._inflight_slots.acquire()
        try:
            n = len(group)
            bucket = next(b for b in self.buckets if b >= n)
            src = np.stack([p.src for p in group] + [group[-1].src] * (bucket - n))
            ref = np.stack([p.ref for p in group] + [group[-1].ref] * (bucket - n))
            seed = int(self._seed.spawn(1)[0].generate_state(1)[0])
            out = self.sample_fn(src, ref, seed)  # async dispatch — no fetch here
        except Exception as e:
            self._inflight_slots.release()
            self._fail_group(group, e)
            return
        now = time.time()
        with self._lock:
            if self._span_start is None:
                self._span_start = now
            if self._inflight_n == 0:
                self._busy_since = now
            self._inflight_n += 1
        self._results.put((group, bucket, out))

    def _collect_loop(self) -> None:
        while True:
            item = self._results.get()
            if item is None:
                return
            group, bucket, out = item
            err: Optional[Exception] = None
            try:
                arr = np.asarray(out)  # the host fetch that truly syncs
            except Exception as e:  # async device errors surface at fetch time
                err = e
            self._inflight_slots.release()
            t_done = time.time()
            with self._lock:
                self._inflight_n -= 1
                if self._inflight_n == 0:
                    self._busy_accum += t_done - self._busy_since
                self._span_end = t_done
            if err is not None:
                self._fail_group(group, err)
                continue
            live = []
            for i, p in enumerate(group):
                if p.cancelled:  # waiter gave up mid-flight; drop silently
                    continue
                p.out = arr[i]
                p.t_done = t_done
                p.done.set()
                live.append(p)
            with self._lock:
                self._stats["requests"] += len(live)
                self._stats["batches"] += 1
                self._stats["padded_slots"] += bucket - len(group)
                self._latencies.extend(p.latency_ms for p in live)

    def stats(self) -> Dict[str, float]:
        with self._lock:
            s = dict(self._stats)
            lats = sorted(self._latencies)
            busy = self._busy_accum
            if self._inflight_n > 0:  # close the open interval for reporting
                busy += time.time() - self._busy_since
            span_start, span_end = self._span_start, self._span_end
            if self._inflight_n > 0:
                span_end = time.time()
        s["pending"] = self._q.qsize() + self._inflight_n  # leak gauge: must
        # drain to 0 once every waiter returned (asserted by the --soak driver
        # and tests/test_serving.py)
        if lats:
            s["latency_ms_p50"] = lats[len(lats) // 2]
            s["latency_ms_p95"] = lats[min(len(lats) - 1, int(len(lats) * 0.95))]
            s["latency_ms_p99"] = lats[min(len(lats) - 1, int(len(lats) * 0.99))]
            s["latency_ms_max"] = lats[-1]
        if s["batches"]:
            # fraction of batch slots holding real requests (padding efficiency)
            s["mean_occupancy"] = s["requests"] / (
                s["requests"] + s["padded_slots"])
        if span_start is not None and span_end > span_start:
            # fraction of the serving span with >=1 group submitted-but-unfetched:
            # an upper bound on device busy time — if THIS is < 1 the chip idled
            # waiting on the host (the round-3 dispatcher's hidden 37% gap)
            s["device_occupancy"] = busy / (span_end - span_start)
        return s

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)
        self._results.put(None)
        self._collector.join(timeout=5)


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
