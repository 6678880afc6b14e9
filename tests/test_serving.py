"""Serving subsystem: static-bucket dynamic batching + JSONL socket protocol.

Engine semantics are pinned with a deterministic fake sample_fn (no model); the
socket test runs a real client/server round-trip in-process. The full pipeline
behind the engine is exercised by `scripts/serve.py --selftest --tiny --cpu`.
"""
import os
import threading
import time

import numpy as np
import pytest

from makeupdiffuse_tpu import serving

HW = 8


def _echo_fn(calls):
    """sample_fn that records batch sizes and returns src - ref (deterministic)."""

    def fn(src, ref, seed):
        calls.append(src.shape[0])
        return (src - ref).astype(np.float32)

    return fn


def test_single_request_roundtrip():
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2, 4), max_wait_ms=1.0)
    try:
        src = np.full((HW, HW, 3), 0.75, np.float32)
        ref = np.full((HW, HW, 3), 0.25, np.float32)
        out = eng.transfer(src, ref, timeout=10)
        np.testing.assert_allclose(out, 0.5)
        assert calls == [1]  # smallest bucket, no padding
        s = eng.stats()
        assert s["requests"] == 1 and s["batches"] == 1 and s["padded_slots"] == 0
    finally:
        eng.shutdown()


def test_concurrent_requests_batch_and_pad():
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2, 4, 8),
                                 max_wait_ms=200.0)
    try:
        rng = np.random.default_rng(0)
        srcs = [rng.random((HW, HW, 3), np.float32) for _ in range(3)]
        refs = [rng.random((HW, HW, 3), np.float32) for _ in range(3)]
        outs = [None] * 3

        def go(i):
            outs[i] = eng.transfer(srcs[i], refs[i], timeout=10)

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # each client got ITS OWN answer back (scatter respects order)
        for i in range(3):
            np.testing.assert_allclose(outs[i], srcs[i] - refs[i], rtol=1e-6)
        # 3 concurrent requests rode one padded bucket-4 batch (or, if the
        # dispatcher won the race for an early one, at most two batches)
        assert sum(calls) >= 3 and len(calls) <= 2
        s = eng.stats()
        assert s["requests"] == 3
        assert 0 < s["mean_occupancy"] <= 1.0
    finally:
        eng.shutdown()


def test_oversized_group_splits_to_max_bucket():
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2), max_wait_ms=100.0)
    try:
        x = np.zeros((HW, HW, 3), np.float32)
        handles = [eng.submit(x, x) for _ in range(5)]
        for h in handles:
            assert h.done.wait(10)
            assert h.error is None
        assert all(c <= 2 for c in calls) and sum(calls) >= 5
    finally:
        eng.shutdown()


def test_engine_error_propagates_to_waiters():
    def boom(src, ref, seed):
        raise RuntimeError("device on fire")

    eng = serving.BatchingEngine(boom, buckets=(1,), max_wait_ms=1.0)
    try:
        x = np.zeros((HW, HW, 3), np.float32)
        with pytest.raises(RuntimeError, match="device on fire"):
            eng.transfer(x, x, timeout=10)
        assert eng.stats()["errors"] == 1
    finally:
        eng.shutdown()


def test_bad_bucket_spec_rejected():
    with pytest.raises(ValueError):
        serving.BatchingEngine(lambda s, r, i: s, buckets=(4, 2))
    with pytest.raises(ValueError):
        serving.BatchingEngine(lambda s, r, i: s, buckets=(0, 2))
    with pytest.raises(ValueError):  # empty spec must be a ValueError, not IndexError
        serving.BatchingEngine(lambda s, r, i: s, buckets=())


def test_submit_rejects_wrong_shape_and_engine_survives():
    """A stray-sized request is refused at submit() (never reaches the device —
    no mid-batch crash, no steady-state recompile), and the engine keeps
    serving correctly-shaped requests afterwards."""
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2), max_wait_ms=1.0,
                                 image_hw=HW)
    try:
        good = np.full((HW, HW, 3), 0.5, np.float32)
        with pytest.raises(ValueError, match="warmed bucket"):
            eng.submit(np.zeros((HW + 4, HW + 4, 3), np.float32), good)
        with pytest.raises(ValueError, match=r"\[H,W,3\]"):
            eng.submit(np.zeros((HW, HW, 4), np.float32),
                       np.zeros((HW, HW, 4), np.float32))
        with pytest.raises(ValueError, match="differ"):
            serving.BatchingEngine(_echo_fn([]), buckets=(1,)).submit(
                good, np.zeros((HW * 2, HW * 2, 3), np.float32))
        out = eng.transfer(good, good, timeout=10)  # engine still alive
        np.testing.assert_allclose(out, 0.0)
    finally:
        eng.shutdown()


def test_timeout_cancels_pending():
    """A timed-out transfer is dropped: the engine never spends a device batch
    on it and its latency never enters the stats."""
    release = threading.Event()

    def slow_fn(src, ref, seed):
        release.wait(10)
        return (src - ref).astype(np.float32)

    # depth 1 so the first (slow) group blocks the queue while we time out
    eng = serving.BatchingEngine(slow_fn, buckets=(1,), max_wait_ms=1.0,
                                 pipeline_depth=1)
    try:
        x = np.zeros((HW, HW, 3), np.float32)
        blocker = eng.submit(x, x)  # occupies the device
        with pytest.raises(TimeoutError):
            eng.transfer(x, x, timeout=0.2)  # gives up while queued
        release.set()
        assert blocker.done.wait(10) and blocker.error is None
        deadline = time.time() + 5
        while eng.stats()["batches"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        s = eng.stats()
        assert s["cancelled"] == 1
        # the cancelled request must not have produced a second device batch
        assert s["batches"] == 1 and s["requests"] == 1
    finally:
        release.set()
        eng.shutdown()


def test_pipelined_dispatch_overlaps_groups():
    """With pipeline_depth=2 the dispatcher submits group N+1 while group N is
    still 'on device' (simulated by a sample_fn returning a lazy handle whose
    np.asarray blocks) — and stats() reports the device_occupancy measure."""
    submitted = []
    fetch_gate = threading.Semaphore(0)

    class LazyOut:
        """Stands in for an async jax.Array: np.asarray blocks until released."""

        def __init__(self, val):
            self.val = val

        def __array__(self, dtype=None, copy=None):
            fetch_gate.acquire()
            return self.val

    def fn(src, ref, seed):
        submitted.append(time.time())
        return LazyOut((src - ref).astype(np.float32))

    eng = serving.BatchingEngine(fn, buckets=(1,), max_wait_ms=1.0,
                                 pipeline_depth=2)
    try:
        x = np.full((HW, HW, 3), 0.25, np.float32)
        h1 = eng.submit(x, x)
        h2 = eng.submit(x, x)
        # both groups must be SUBMITTED before either is fetched (overlap)
        deadline = time.time() + 5
        while len(submitted) < 2 and time.time() < deadline:
            time.sleep(0.005)
        assert len(submitted) == 2, "second group was not dispatched while the first was in flight"
        fetch_gate.release()
        fetch_gate.release()
        assert h1.done.wait(10) and h2.done.wait(10)
        np.testing.assert_allclose(h1.out, 0.0)
        s = eng.stats()
        assert s["batches"] == 2 and "device_occupancy" in s
        assert 0.0 < s["device_occupancy"] <= 1.0
    finally:
        fetch_gate.release()
        fetch_gate.release()
        eng.shutdown()


def test_socket_server_roundtrip(tmp_path):
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2), max_wait_ms=1.0)
    server = serving.TransferServer(eng, HW, port=0)
    host, port = server.start()
    try:
        rng = np.random.default_rng(1)
        s_path, r_path = str(tmp_path / "s.npy"), str(tmp_path / "r.npy")
        o_path = str(tmp_path / "o.npy")
        src = rng.random((HW, HW, 3)).astype(np.float32)
        ref = rng.random((HW, HW, 3)).astype(np.float32)
        np.save(s_path, src)
        np.save(r_path, ref)

        client = serving.TransferClient(host, port)
        try:
            assert client.request({"cmd": "ping"})["pong"] is True
            resp = client.transfer(s_path, r_path, o_path)
            assert resp["ok"], resp
            np.testing.assert_allclose(np.load(o_path), src - ref, rtol=1e-6)
            stats = client.request({"cmd": "stats"})["stats"]
            assert stats["requests"] == 1
            # malformed request → structured error, connection stays usable
            bad = client.request({"src": "/nonexistent.npy", "ref": r_path,
                                  "out": o_path})
            assert bad["ok"] is False and "error" in bad
            assert client.request({"cmd": "ping"})["pong"] is True
        finally:
            client.close()
    finally:
        server.shutdown()
        eng.shutdown()


def test_png_image_io(tmp_path):
    """PNG in / PNG out through the native resize path."""
    from PIL import Image

    eng = serving.BatchingEngine(_echo_fn([]), buckets=(1,), max_wait_ms=1.0)
    server = serving.TransferServer(eng, HW, port=0)
    host, port = server.start()
    try:
        rng = np.random.default_rng(2)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)  # resized 32→8
        s_path, r_path = str(tmp_path / "s.png"), str(tmp_path / "r.png")
        o_path = str(tmp_path / "o.png")
        Image.fromarray(img).save(s_path)
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(r_path)
        client = serving.TransferClient(host, port)
        try:
            resp = client.transfer(s_path, r_path, o_path)
            assert resp["ok"], resp
            out = np.asarray(Image.open(o_path))
            assert out.shape == (HW, HW, 3) and out.dtype == np.uint8
        finally:
            client.close()
    finally:
        server.shutdown()
        eng.shutdown()


def test_engine_with_dp_sharded_sample_fn():
    """The engine composes with a pjit'd SPMD sample_fn: batch sharded over the
    8-device CPU data mesh (the serving analog of scripts/serve.py --dp 8)."""
    import jax
    import jax.numpy as jnp

    from makeupdiffuse_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(n_data=8)
    b_shard = batch_sharding(mesh)

    @jax.jit
    def blur(src, ref):  # stand-in device program: any elementwise pipeline
        return jnp.tanh(src) - jnp.tanh(ref)

    def sample_fn(src, ref, seed):
        s = jax.device_put(jnp.asarray(src), b_shard)
        r = jax.device_put(jnp.asarray(ref), b_shard)
        return np.asarray(blur(s, r))

    eng = serving.BatchingEngine(sample_fn, buckets=(8,), max_wait_ms=100.0)
    try:
        rng = np.random.default_rng(3)
        srcs = [rng.random((HW, HW, 3), np.float32) for _ in range(8)]
        refs = [rng.random((HW, HW, 3), np.float32) for _ in range(8)]
        outs = [None] * 8

        def go(i):
            outs[i] = eng.transfer(srcs[i], refs[i], timeout=30)

        threads = [threading.Thread(target=go, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_allclose(
                outs[i], np.tanh(srcs[i]) - np.tanh(refs[i]), rtol=1e-5, atol=1e-6)
    finally:
        eng.shutdown()


def test_warmup_compiles_every_bucket_and_submit_after_shutdown_raises():
    calls = []
    eng = serving.BatchingEngine(_echo_fn(calls), buckets=(1, 2, 4), max_wait_ms=1.0)
    try:
        times = eng.warmup(HW)
        assert sorted(times) == [1, 2, 4] and all(t >= 0 for t in times.values())
        assert sorted(calls) == [1, 2, 4]  # one compile-shape call per bucket
    finally:
        eng.shutdown()
    x = np.zeros((HW, HW, 3), np.float32)
    with pytest.raises(RuntimeError, match="shut down"):
        eng.submit(x, x)


def test_hostile_mix_drains_pending_to_zero():
    """Leak-assert for the soak pattern (scripts/serve.py --soak): a burst
    bigger than the largest bucket, a cancelling waiter, and a submit-time
    shape error all in flight together — afterwards the 'pending' gauge
    (queue + in-flight groups) must drain to exactly 0 and the stats ledger
    must balance: requests == completed live waiters, cancelled == 1."""
    calls = []

    def fn(src, ref, seed):
        calls.append(src.shape[0])
        time.sleep(0.05)  # long enough that the 1 ms waiter cancels mid-queue
        return (src - ref).astype(np.float32)

    eng = serving.BatchingEngine(fn, buckets=(1, 2), max_wait_ms=5.0,
                                 image_hw=HW, pipeline_depth=2)
    try:
        x = np.zeros((HW, HW, 3), np.float32)
        outs = [None] * 5
        def go(i):
            outs[i] = eng.transfer(x + i / 8.0, x)
        threads = [threading.Thread(target=go, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        with pytest.raises(TimeoutError):
            eng.transfer(x, x, timeout=0.001)
        with pytest.raises(ValueError):
            eng.submit(np.zeros((HW // 2, HW, 3), np.float32), x)
        for t in threads:
            t.join(timeout=30)
        deadline = time.time() + 10
        while eng.stats()["pending"] > 0 and time.time() < deadline:
            time.sleep(0.01)
        s = eng.stats()
        assert s["pending"] == 0, s
        assert s["requests"] == 5 and s["cancelled"] == 1, s
        assert s["errors"] == 0, s
        assert all(o is not None for o in outs)
        assert "latency_ms_p99" in s
    finally:
        eng.shutdown()
