"""Experiment: packed-layout flash attention — [B, N, C] blocks, per-head loop
inside the kernel — vs the current [B·H, N, D] kernel whose HBM head-transposes
cost ~1.7 ms/forward (copy.138x in the v5e profile, PERF.md).

Times xla / current-flash / packed at the production level-0 shape with the
layout conversions INCLUDED (model-side layout is [B, N, C]); lax.scan chains,
varied inputs per repeat (CLAUDE.md timing rules).

Usage: python tools/exp_packed_attn.py [--iters 50] [--repeats 5]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from makeupdiffuse_tpu.ops import pallas_attention
from makeupdiffuse_tpu.ops.attention import mha_attention


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """One (batch, q-block) program; loops heads over static lane slices."""
    d = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]  # [BQ, D]
        k = k_ref[0, :, sl]  # [S, D]
        v = v_ref[0, :, sl]  # [S, D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def packed_attention(q, k, v, heads, bq=256):
    b, n, c = q.shape
    if bq > n:  # grid n//bq would be 0 → no programs, garbage output
        bq = n
    s = k.shape[1]
    d = c // heads
    scale = float(d) ** -0.5
    q_spec = pl.BlockSpec((1, bq, c), lambda i, l: (i, l, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s, c), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, n // bq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * s * c,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n * s * heads,
        ),
    )(q, k, v)


def time_chain(fn, q, k, v, iters, repeats):
    @jax.jit
    def chain(q, k, v):
        def body(carry, _):
            return fn(carry, k, v), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    def sync(x):
        # AXON GOTCHA (measured 2026-08-18): block_until_ready can return in
        # ~0.1 ms while execution (even remote compile) is still in flight —
        # only a host fetch truly synchronizes. Fetch one scalar.
        return float(jax.device_get(x[0, 0, 0]))

    sync(chain(q, k, v))  # compile + drain
    # measure the fetch round-trip itself on a ready buffer
    t0 = time.time()
    sync(q)
    fetch_s = time.time() - t0
    times = []
    for r in range(repeats):
        # BF16 GOTCHA: q * (1 + 1e-3) rounds back to q bitwise (bf16 eps ~8e-3),
        # letting the attachment serve an identical dispatch ~free. Fresh noise
        # per repeat guarantees genuinely distinct inputs.
        qr = q + 0.05 * jax.random.normal(
            jax.random.PRNGKey(100 + r), q.shape, q.dtype)
        sync(qr)
        t0 = time.time()
        sync(chain(qr, k, v))
        times.append(time.time() - t0 - fetch_s)
    return sorted(times)[len(times) // 2] * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    print(f"device={jax.devices()[0]}")
    # level-0 production shape, CFG batch: B16 N1024 C320 H8 (D40)
    for (label, b, n, s, h, c) in [
        ("self 1024 C320 H8", 16, 1024, 1024, 8, 320),
        ("vae 1024 C512 H1", 16, 1024, 1024, 1, 512),
        ("cross 1024x77 C320 H8", 16, 1024, 77, 8, 320),
        ("self 256 C640 H8", 16, 256, 256, 8, 640),
        ("cross 256x77 C640 H8", 16, 256, 77, 8, 640),
        ("self 64 C1280 H8", 16, 64, 64, 8, 1280),
        ("cross 64x77 C1280 H8", 16, 64, 77, 8, 1280),
    ]:
        d = c // h
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, n, c), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, c), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, c), jnp.bfloat16)

        def via_heads(attn):
            def fn(q, k, v):
                qh = q.reshape(b, n, h, d)
                kh = k.reshape(b, s, h, d)
                vh = v.reshape(b, s, h, d)
                return attn(qh, kh, vh).reshape(b, n, c)
            return fn

        variants = [
            ("xla", via_heads(mha_attention)),
            ("flash+transpose", via_heads(pallas_attention.flash_attention)),
            ("packed bq256", lambda q, k, v: packed_attention(q, k, v, h, 256)),
            ("packed bq512", lambda q, k, v: packed_attention(q, k, v, h, 512)),
            ("packed bq1024", lambda q, k, v: packed_attention(q, k, v, h, 1024)),
        ]
        print(f"\n== {label} ==", flush=True)
        # warm-up shape artifact guard: time a throwaway first
        time_chain(variants[0][1], q, k, v, 5, 1)
        ref = None
        for vlabel, fn in variants:
            try:
                ms = time_chain(fn, q, k, v, args.iters, args.repeats)
                out = fn(q, k, v)
                if ref is None:
                    ref, err = out, 0.0
                else:
                    err = float(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32)).max())
                print(f"  {vlabel:18s} {ms:8.3f} ms/call   maxerr {err:.3e}", flush=True)
            except Exception as e:
                print(f"  {vlabel:18s} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
