"""Microbench: Pallas flash vs XLA attention at each UNet level's shapes.

Shapes come from the SD1.5 UNet at a 32x32 latent with CFG batch 16 (bench
default): level0 1024 tokens/320ch, level1 256/640, level2 64/1280, plus the
77-token cross-attention contexts. Used to set ops.pallas_attention.FLASH_MIN_SEQ.

Timing is a lax.scan of ITERS chained applications inside ONE compiled program —
per-dispatch wall times through the axon tunnel are dominated by RPC latency and
mis-rank ops by >100x (CLAUDE.md: scan benches are the trustworthy numbers).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from makeupdiffuse_tpu.ops.attention import mha_attention
from makeupdiffuse_tpu.ops.pallas_attention import flash_attention

ITERS = 50


def scan_time(fn, q, k, v, repeats=3):
    """Seconds per single attention application, from a 50-iteration in-graph chain."""

    @jax.jit
    def chained(q, k, v):
        def body(carry, _):
            out = fn(carry, k, v)
            # feed output back as q (same shape) so iterations can't be collapsed
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    out = chained(q, k, v)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(chained(q, k, v))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    b = 16  # CFG batch
    heads = 8
    cases = [
        ("self L0 1024tok d40", 1024, 1024, 40),
        ("self L1  256tok d80", 256, 256, 80),
        ("self L2   64tok d160", 64, 64, 160),
    ]
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}  batch={b} heads={heads} dtype=bf16 "
          f"scan x{ITERS}")
    for name, nq, nk, d in cases:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, nq, heads, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, nk, heads, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, nk, heads, d), jnp.bfloat16)
        t_x = scan_time(mha_attention, q, k, v)
        t_f = scan_time(flash_attention, q, k, v)
        err = jnp.max(jnp.abs(flash_attention(q, k, v).astype(jnp.float32)
                              - mha_attention(q, k, v).astype(jnp.float32)))
        print(f"{name:24s} xla {t_x*1e6:8.1f}us  flash {t_f*1e6:8.1f}us  "
              f"speedup {t_x/t_f:5.2f}x  maxerr {float(err):.4f}")


if __name__ == "__main__":
    main()
