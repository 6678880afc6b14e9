"""On-chip attention micro-sweep via lax.scan chains (the only trustworthy timing
through this attachment — CLAUDE.md: per-dispatch timings mis-rank by >100x).

Times, at the UNet's three self-attention shapes, the 77-token cross shapes, and
the VAE attention shape:
  - the packed-layout Pallas flash kernel at several q-block sizes
  - XLA mha_attention (materialized logits)

Each timing runs `iters` chained attention calls inside ONE jitted lax.scan, so
tunnel latency amortizes away. Prints ms/call per variant per shape.

Usage: python tools/sweep_attn.py [--iters 50] [--repeats 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp

from makeupdiffuse_tpu.ops import pallas_attention
from makeupdiffuse_tpu.ops.attention import mha_attention


def flash_with_bq(bq):
    def fn(q, k, v):
        old = pallas_attention.FLASH_BLOCK_Q
        pallas_attention.FLASH_BLOCK_Q = bq  # read at trace time only
        try:
            return pallas_attention.flash_attention(q, k, v)
        finally:
            pallas_attention.FLASH_BLOCK_Q = old

    return fn


def time_chain(fn, q, k, v, iters, repeats):
    """ms/call for `fn` folded `iters` times inside one jitted scan."""

    @jax.jit
    def chain(q, k, v):
        def body(carry, _):
            o = fn(carry, k, v)
            # feed the output back in so XLA cannot hoist/dedupe the calls
            return o, ()

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    chain(q, k, v).block_until_ready()  # compile
    times = []
    for r in range(repeats):
        # distinct args per repeat — identical (executable, args) re-dispatches
        # can be served ~for-free by the attachment layer, making min() a lie
        qr = (q * (1.0 + 1e-3 * (r + 1))).block_until_ready()
        t0 = time.time()
        chain(qr, k, v).block_until_ready()
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2] * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    # (label, B, N, S, H, D) — CFG batch 16; UNet levels 32²/16²/8², ch 320/640/1280
    shapes = [
        ("self 1024x40", 16, 1024, 1024, 8, 40),
        ("self 256x80", 16, 256, 256, 8, 80),
        ("self 64x160", 16, 64, 64, 8, 160),
        ("cross 1024x77x40", 16, 1024, 77, 8, 40),
        ("cross 256x77x80", 16, 256, 77, 8, 80),
        ("vae 1024x512", 16, 1024, 1024, 1, 512),
    ]
    variants = [
        ("xla", lambda q, k, v: mha_attention(q, k, v)),
        ("flash bq128", flash_with_bq(128)),
        ("flash bq256", flash_with_bq(256)),
        ("flash bq512", flash_with_bq(512)),
        ("flash bq1024", flash_with_bq(1024)),
    ]
    print(f"device={jax.devices()[0]}")
    for label, b, n, s, h, d in shapes:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
        print(f"\n== {label}  (B{b} N{n} S{s} H{h} D{d}) ==", flush=True)
        ref = None
        for vlabel, fn in variants:
            try:
                ms = time_chain(fn, q, k, v, args.iters, args.repeats)
                out = fn(q, k, v)
                if ref is None:
                    ref = out
                    err = 0.0
                else:
                    err = float(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32)).max())
                print(f"  {vlabel:22s} {ms:8.3f} ms/call   maxerr {err:.3e}", flush=True)
            except Exception as e:
                print(f"  {vlabel:22s} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
