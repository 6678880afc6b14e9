"""Serving driver: static-shape dynamically-batched transfer over a JSONL socket.

The reference ships only offline drivers (`/root/reference/runs/test.py`); this
is the production serving path for the same product call — see
makeupdiffuse_tpu/serving.py for the batching/bucket design.

Usage:
  python scripts/serve.py [--tiny] [--cpu] [--port 7860] [--buckets 1,2,4,8]
                          [--steps 50] [--sampler ddim|dpmpp] [--params p.pkl]
                          [--dp N] [--sp N]   # data-/spatial-parallel mesh serving
  python scripts/serve.py --selftest [--clients 12] ...   # in-process benchmark

Selftest spins the server up in-process, fires N concurrent synthetic clients
at it, and prints throughput + latency percentiles + batch occupancy — the
serving analog of bench.py.
"""
import argparse
import json
import os
import pickle
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--buckets", default="1,2,4,8")
    ap.add_argument("--max-wait-ms", type=float, default=30.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=9.0)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp"])
    ap.add_argument("--params", default=None, help="converted/trained params pickle")
    ap.add_argument("--allow-placeholder-prompts", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="run an in-process concurrent-client benchmark and exit")
    ap.add_argument("--soak", action="store_true",
                    help="adversarial serving soak: repeated cold bursts > max "
                         "bucket, short-timeout waiters that cancel mid-queue, "
                         "malformed requests mid-burst — asserts no queue leak "
                         "(pending drains to 0) and stats consistency, prints "
                         "one JSON line (selftest v2)")
    ap.add_argument("--soak-min", type=float, default=5.0,
                    help="soak duration in minutes")
    ap.add_argument("--clients", type=int, default=12)
    ap.add_argument("--requests-per-client", type=int, default=3,
                    help="sequential transfers per selftest client (closed loop "
                         "— steady-state throughput, not one-shot ramp)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel serving over N devices: each batch is "
                         "sharded over a 1-D data mesh (every bucket must be "
                         "divisible by N)")
    ap.add_argument("--sp", type=int, default=1,
                    help="spatial-parallel serving over N devices: every "
                         "sample's activations shard over image H "
                         "(parallel/spatial.py) — the batch-1 LATENCY mode; "
                         "composes with --dp on a dp×sp mesh")
    ap.add_argument("--sp-attn", default=None,
                    choices=["gspmd", "allgather", "ring"],
                    help="self-attention strategy under --sp. Default: "
                         "'allgather' shard_map island when Pallas kernels are "
                         "on (GSPMD cannot partition the flash custom call over "
                         "H-sharded activations — ops/sp_attention.py), else "
                         "'gspmd' (plain XLA attention, partitioned by GSPMD)")
    ap.add_argument("--quant8", action="store_true",
                    help="route UNet/ControlNet GEMMs through the w8a8 int8 MXU "
                         "path (ops/quant.py; also honored via env MDT_QUANT8=1; "
                         "throughput/PSNR trade in PERF.md)")
    args = ap.parse_args()

    n_mesh = args.dp * args.sp
    if args.cpu and n_mesh > 1:
        # virtual CPU mesh for DP/SP serving without chips — must precede backend init
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_mesh}").strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")  # before any jax.devices() call

    from makeupdiffuse_tpu.ops import enable_quant8, enable_tpu_kernels_if_tpu

    kernels_on = enable_tpu_kernels_if_tpu()
    if args.quant8 or os.environ.get("MDT_QUANT8") == "1":
        enable_quant8(True)

    import jax.numpy as jnp

    from makeupdiffuse_tpu import serving
    from makeupdiffuse_tpu.api import transfer
    from makeupdiffuse_tpu.config import Config, tiny_test_config
    from makeupdiffuse_tpu.core.ddim import DDIMTables
    from makeupdiffuse_tpu.core.dpm_solver import DPMTables
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, init_model

    cfg = tiny_test_config() if args.tiny else Config()
    m = cfg.model
    print(f"# building model (tiny={args.tiny})...", file=sys.stderr, flush=True)
    if args.tiny:
        model, params = init_model(m, jax.random.PRNGKey(0))
    else:
        model, params = fast_init_model(m, param_dtype=jnp.bfloat16)
    if args.params:
        with open(args.params, "rb") as f:
            loaded = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, {"params": loaded["params"]})
        from makeupdiffuse_tpu.models.clip_text import load_context_bank

        enc = lambda p, ids: model.apply(p, ids, method=model.encode_text)
        bank = load_context_bank(loaded, enc, params, max_length=m.clip.max_length,
                                 allow_placeholder=args.allow_placeholder_prompts)
    else:
        enc = lambda p, ids: model.apply(p, ids, method=model.encode_text)
        bank = precompute_prompt_bank(enc, params, max_length=m.clip.max_length)

    sched = DiffusionSchedule.create(timesteps=m.timesteps, linear_start=m.linear_start,
                                     linear_end=m.linear_end)
    if args.sampler == "dpmpp":
        tables = DPMTables.create(sched, num_steps=args.steps)
    else:
        tables = DDIMTables.create(sched, num_steps=args.steps)

    # the production prompt rows (reference: constant "makeup transfer" prompt,
    # datasets.py:633; "" is the CFG unconditional)
    ctx1 = jnp.asarray(bank["makeup transfer"])[None]
    uc1 = jnp.asarray(bank[""])[None]

    @jax.jit
    def _sample(params, src, ref, seed):
        b = src.shape[0]
        ctx = jnp.tile(ctx1, (b, 1, 1))
        uc = jnp.tile(uc1, (b, 1, 1))
        return transfer(model, params, sched, tables, src, ref, ctx, uc,
                        jax.random.PRNGKey(seed), cfg_scale=args.cfg_scale)

    buckets = tuple(int(b) for b in args.buckets.split(","))

    if args.sp > 1:
        # SP serving: each sample's activations shard over image H on the
        # `model` axis — the latency mode (a 1-request bucket still uses every
        # chip). Composes with --dp: batch over `data`, H over `model`.
        from makeupdiffuse_tpu.parallel import spatial as spx
        from makeupdiffuse_tpu.parallel.mesh import make_mesh, replicate

        bad = [b for b in buckets if b % args.dp]
        if bad:
            ap.error(f"--dp {args.dp}: buckets {bad} not divisible by the mesh")
        mesh = make_mesh(n_data=args.dp, n_model=args.sp)
        params = replicate(mesh, params)
        # With Pallas kernels on, GSPMD can't partition the flash custom call
        # over H-sharded activations — default to the all-gather shard_map
        # island (right collective at ≤1024 tokens, ops/sp_attention.py)
        sp_attn = args.sp_attn or ("allgather" if kernels_on else "gspmd")
        print(f"# sp self-attention strategy: {sp_attn}", file=sys.stderr)
        sp_fn = spx.make_sp_sample_fn(
            model, mesh, tables, cfg_scale=args.cfg_scale,
            sp_attn=None if sp_attn == "gspmd" else sp_attn)

        def sample_fn(src, ref, seed):
            b = src.shape[0]
            ctx = jnp.tile(ctx1, (b, 1, 1))
            uc = jnp.tile(uc1, (b, 1, 1))
            x_T = jax.random.normal(
                jax.random.PRNGKey(seed),
                (b, m.latent_size, m.latent_size, m.latent_channels))
            ins = spx.sp_shard_sample_inputs(mesh, x_T, jnp.asarray(src),
                                             jnp.asarray(ref), ctx, uc)
            return sp_fn(params, *ins)
    elif args.dp > 1:
        # DP serving: batch sharded over the data axis, params replicated —
        # XLA runs each bucket as one SPMD program across the mesh
        from makeupdiffuse_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                     replicate)

        bad = [b for b in buckets if b % args.dp]
        if bad:
            ap.error(f"--dp {args.dp}: buckets {bad} not divisible by the mesh")
        mesh = make_mesh(n_data=args.dp)
        params = replicate(mesh, params)
        b_shard = batch_sharding(mesh)

        def sample_fn(src, ref, seed):
            s = jax.device_put(jnp.asarray(src), b_shard)
            r = jax.device_put(jnp.asarray(ref), b_shard)
            return _sample(params, s, r, jnp.uint32(seed))
    else:

        def sample_fn(src, ref, seed):
            # params stays an argument (never a closure constant — CLAUDE.md).
            # No host fetch here: the dispatch is async, and the engine's
            # collector thread does the np.asarray fetch — that split is what
            # lets group N+1's assembly overlap group N's device compute.
            return _sample(params, jnp.asarray(src), jnp.asarray(ref),
                           jnp.uint32(seed))
    engine = serving.BatchingEngine(sample_fn, buckets=buckets,
                                    max_wait_ms=args.max_wait_ms,
                                    image_hw=m.image_size)
    print(f"# warmup: compiling buckets {buckets} "
          f"(one-off; steady state never compiles)...", file=sys.stderr, flush=True)
    times = engine.warmup(m.image_size)
    print(f"# warmup done: { {b: round(t, 1) for b, t in times.items()} } s",
          file=sys.stderr, flush=True)

    server = serving.TransferServer(engine, m.image_size, host=args.host,
                                    port=0 if args.selftest else args.port)
    host, port = server.start()

    if args.soak:
        rc = _soak(server, engine, host, port, m.image_size,
                   duration_s=args.soak_min * 60.0)
        server.shutdown()
        engine.shutdown()
        sys.exit(rc)

    if args.selftest:
        _selftest(server, engine, host, port, m.image_size, args.clients,
                  args.requests_per_client)
        server.shutdown()
        engine.shutdown()
        return

    print(json.dumps({"serving": f"{host}:{port}", "buckets": list(buckets),
                      "image_size": m.image_size, "steps": args.steps,
                      "sampler": args.sampler}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()
        engine.shutdown()


def _soak(server, engine, host, port, hw, duration_s=300.0, seed=0):
    """Adversarial serving soak (selftest v2 — VERDICT r4 Weak #6).

    Sustained hostile load against the live engine+socket for `duration_s`:
      * COLD BURSTS: 2× the largest bucket fired simultaneously from fresh
        connections (forces max-bucket grouping + a queued second wave)
      * CANCELLING WAITERS: direct engine.transfer calls with a timeout far
        below the service time — they must cancel mid-queue, be excluded from
        latency stats, and never leak a pending slot
      * MALFORMED REQUESTS mid-burst: non-JSON lines, missing files, and a
        wrong-shape .npy — each must produce ok:false without poisoning the
        connection or the engine
      * a steady closed-loop trickle keeping the pipeline busy between bursts

    Exit checks (rc!=0 on violation):
      * no queue leak: stats.pending drains to 0 after the last waiter returns
      * stats consistency: engine 'requests' == client-side ok count,
        'cancelled' == cancels issued, every malformed reply was ok:false
      * p50/p99/occupancy over the whole soak reported in ONE JSON line
    """
    from makeupdiffuse_tpu import serving

    tmp = tempfile.mkdtemp(prefix="mdt_soak_")
    rng = np.random.default_rng(seed)
    max_b = engine.buckets[-1]
    n_pool = 2 * max_b
    paths = []
    for i in range(n_pool):
        s, r = (os.path.join(tmp, f"s{i}.npy"), os.path.join(tmp, f"r{i}.npy"))
        np.save(s, rng.random((hw, hw, 3), np.float32))
        np.save(r, rng.random((hw, hw, 3), np.float32))
        paths.append((s, r, os.path.join(tmp, f"o{i}.npy")))
    bad_npy = os.path.join(tmp, "bad_shape.npy")
    np.save(bad_npy, rng.random((hw // 2, hw, 3), np.float32))

    counts = {"ok": 0, "bad_ok": 0, "bad_total": 0, "cancelled": 0,
              "cancel_failed": 0}
    lock = threading.Lock()
    stop = threading.Event()

    def burst_client(i):
        c = serving.TransferClient(host, port)
        try:
            r = c.transfer(*paths[i % n_pool])
            with lock:
                counts["ok" if r.get("ok") else "bad_ok"] += 1
        finally:
            c.close()

    def steady_client():
        c = serving.TransferClient(host, port)
        try:
            while not stop.is_set():
                r = c.transfer(*paths[rng.integers(n_pool)])
                with lock:
                    counts["ok" if r.get("ok") else "bad_ok"] += 1
        finally:
            c.close()

    def cancelling_waiter():
        src = rng.random((hw, hw, 3), np.float32)
        try:
            engine.transfer(src, src, timeout=0.02)
            with lock:  # 20 ms << service time: success here means no cancel
                counts["cancel_failed"] += 1
        except TimeoutError:
            with lock:
                counts["cancelled"] += 1

    def malformed_volley():
        c = serving.TransferClient(host, port)
        try:
            malformed = (
                {"src": "/nonexistent.npy", "ref": paths[0][1],
                 "out": paths[0][2]},            # missing file
                {"src": bad_npy, "ref": paths[0][1], "out": paths[0][2]},
                b"this is not json\n",           # protocol garbage
            )
            for req in malformed:
                if isinstance(req, bytes):
                    c._file.write(req)
                    c._file.flush()
                    r = json.loads(c._file.readline())
                else:
                    r = c.request(req)
                with lock:
                    counts["bad_total"] += 1
                    if r.get("ok"):
                        counts["bad_ok"] += 1  # malformed must NOT be ok
            # the same (possibly poisoned) connection must still answer
            if not c.request({"cmd": "stats"}).get("ok"):
                with lock:
                    counts["bad_ok"] += 1
        finally:
            c.close()

    steady = [threading.Thread(target=steady_client) for _ in range(2)]
    for t in steady:
        t.start()
    t0 = time.time()
    waves = 0
    live: list = []
    while time.time() - t0 < duration_s:
        wave = [threading.Thread(target=burst_client, args=(i,))
                for i in range(2 * max_b)]
        wave.append(threading.Thread(target=cancelling_waiter))
        wave.append(threading.Thread(target=malformed_volley))
        for t in wave:
            t.start()
        live.extend(wave)
        waves += 1
        time.sleep(min(10.0, max(2.0, duration_s / 30.0)))
        live = [t for t in live if t.is_alive()]
    stop.set()
    for t in live + steady:
        t.join(timeout=600)
    wall = time.time() - t0

    # give the collector a beat to fetch the final in-flight group
    deadline = time.time() + 60
    while engine.stats()["pending"] > 0 and time.time() < deadline:
        time.sleep(0.2)
    stats = engine.stats()

    checks = {
        "no_queue_leak": stats["pending"] == 0,
        "requests_match": stats["requests"] == counts["ok"],
        "cancels_counted": (stats["cancelled"] == counts["cancelled"]
                            and counts["cancel_failed"] == 0),
        "malformed_rejected": counts["bad_ok"] == 0,
        "no_socket_errors": counts["bad_ok"] == 0 and counts["ok"] > 0,
    }
    result = {
        "soak": "ok" if all(checks.values()) else "FAIL",
        "wall_s": round(wall, 1), "waves": waves,
        "transfers_ok": counts["ok"],
        "transfers_per_sec": round(counts["ok"] / wall, 3),
        "cancelled": counts["cancelled"],
        "malformed_sent": counts["bad_total"],
        "batches": stats["batches"],
        "mean_occupancy": round(stats.get("mean_occupancy", 0.0), 3),
        "device_occupancy": round(stats.get("device_occupancy", 0.0), 3),
        "latency_ms_p50": round(stats.get("latency_ms_p50", 0.0), 1),
        "latency_ms_p99": round(stats.get("latency_ms_p99", 0.0), 1),
        "pending_after_drain": stats["pending"],
        "checks": checks,
    }
    print(json.dumps(result), flush=True)
    return 0 if all(checks.values()) else 1


def _selftest(server, engine, host, port, hw, n_clients, reqs_per_client=3):
    """Concurrent closed-loop clients against the live socket; prints one JSON
    line. Each client issues `reqs_per_client` sequential transfers so the
    number measures STEADY-STATE throughput under sustained concurrency (a
    single one-shot wave mostly measures the pipeline ramp + the final
    straggler group)."""
    from makeupdiffuse_tpu import serving

    tmp = tempfile.mkdtemp(prefix="mdt_serve_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_clients):
        s, r = (os.path.join(tmp, f"s{i}.npy"), os.path.join(tmp, f"r{i}.npy"))
        np.save(s, rng.random((hw, hw, 3), np.float32))
        np.save(r, rng.random((hw, hw, 3), np.float32))
        paths.append((s, r, os.path.join(tmp, f"o{i}.npy")))

    results = [None] * n_clients

    def client(i):
        c = serving.TransferClient(host, port)
        try:
            for _ in range(reqs_per_client):
                results[i] = c.transfer(*paths[i])
                if not (results[i] and results[i].get("ok")):
                    return
        finally:
            c.close()

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = n_clients * reqs_per_client

    ok = sum(1 for r in results if r and r.get("ok"))
    bad = [r for r in results if not (r and r.get("ok"))]
    for i, (_, _, out) in enumerate(paths):
        if results[i] and results[i].get("ok"):
            arr = np.load(out)
            assert arr.shape == (hw, hw, 3), (i, arr.shape)
    stats = engine.stats()
    print(json.dumps({
        "selftest": "ok" if ok == n_clients else f"FAIL ({len(bad)} errors)",
        "clients": n_clients, "requests_per_client": reqs_per_client,
        "wall_s": round(wall, 2),
        "transfers_per_sec": round(total / wall, 3),
        "batches": stats["batches"],
        "mean_occupancy": round(stats.get("mean_occupancy", 0.0), 3),
        "device_occupancy": round(stats.get("device_occupancy", 0.0), 3),
        "latency_ms_p50": round(stats.get("latency_ms_p50", 0.0), 1),
        "latency_ms_p95": round(stats.get("latency_ms_p95", 0.0), 1),
    }), flush=True)
    if bad:
        print(f"# errors: {bad[:3]}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
