"""Probe: does XLA:TPU run int8 conv/matmul at the MXU's 2x int8 rate?

Decides whether a w8a8 quantized inference mode is worth building
(v5e: 394 int8 TOPs vs 197 bf16 TFLOPs peak — SURVEY §6 perf context).
The reference has no quantized path at all; this explores a beyond-reference
serving lever on the compute-bound sampler (PERF.md: 53% MFU, XLA fusions 72%).

Methodology per CLAUDE.md timing rules: lax.scan chains (per-dispatch timings
through the axon tunnel mis-rank ops), fresh-noise varied inputs per repeat,
and a terminal scalar fetch (block_until_ready can lie through axon).

Variants, each a 50-iteration scan of one op:
  conv_bf16   : 3x3 conv, bf16 x bf16 -> bf16 (the production body)
  conv_s8_raw : 3x3 conv, s8 x s8 -> s32 (pure MXU rate, no quant overhead)
  conv_s8_dyn : quantize(x) -> s8 conv -> dequant (the deployable w8a8 body;
                weights pre-quantized outside the loop, activations dynamic)
  mm_bf16 / mm_s8_raw / mm_s8_dyn : same trio for a [4096,2048]x[2048,2048] gemm

Usage: python tools/probe_int8.py [--cpu] [--iters 50] [--repeat 3]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(f"# device: {dev}")

    B, H, W, C = 8, 32, 32, 1280
    KH = KW = 3
    M, K, N = 4096, 2048, 2048
    conv_flops = 2 * B * H * W * C * C * KH * KW * args.iters
    mm_flops = 2 * M * K * N * args.iters

    def quant_sym(v, axes, dtype=jnp.int8):
        s = jnp.maximum(jnp.max(jnp.abs(v), axis=axes, keepdims=True), 1e-8) / 127.0
        q = jnp.clip(jnp.round(v / s), -127, 127).astype(dtype)
        return q, s

    def conv(x, w, pet=None):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    # --- scan bodies ------------------------------------------------------
    def conv_bf16_chain(x, w):
        def body(h, _):
            h = conv(h, w)
            h = jnp.tanh(h)  # keep magnitudes bounded through 50 iterations
            return h, ()
        h, _ = lax.scan(body, x, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    def conv_s8_raw_chain(xq, wq):
        def body(h, _):
            o = conv(h, wq, pet=jnp.int32)
            # cheapest bounded re-feed: shift back into s8 range
            h = (o >> 12).astype(jnp.int8)
            return h, ()
        h, _ = lax.scan(body, xq, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    def conv_s8_dyn_chain(x, wq, sw):
        def body(h, _):
            q, sx = quant_sym(h, axes=(0, 1, 2, 3))
            o = conv(q, wq, pet=jnp.int32)
            h = jnp.tanh(o.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
            return h, ()
        h, _ = lax.scan(body, x, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    def mm_bf16_chain(x, w):
        def body(h, _):
            return jnp.tanh(h @ w), ()
        h, _ = lax.scan(body, x, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    def mm_s8_raw_chain(xq, wq):
        def body(h, _):
            o = lax.dot_general(h, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return (o >> 12).astype(jnp.int8), ()
        h, _ = lax.scan(body, xq, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    def mm_s8_dyn_chain(x, wq, sw):
        def body(h, _):
            q, sx = quant_sym(h, axes=(0, 1))
            o = lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return jnp.tanh(o.astype(jnp.float32) * (sx * sw)).astype(x.dtype), ()
        h, _ = lax.scan(body, x, None, length=args.iters)
        return jnp.sum(h.astype(jnp.float32))

    rng = np.random.default_rng(0)
    w_conv = jnp.asarray(rng.standard_normal((KH, KW, C, C)) * 0.02, jnp.bfloat16)
    wq_conv, sw_conv = quant_sym(w_conv.astype(jnp.float32), axes=(0, 1, 2))
    w_mm = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    wq_mm, sw_mm = quant_sym(w_mm.astype(jnp.float32), axes=(0,))

    cases = {
        "conv_bf16": (jax.jit(conv_bf16_chain),
                      lambda r: (jnp.asarray(r.standard_normal((B, H, W, C)), jnp.bfloat16), w_conv),
                      conv_flops),
        "conv_s8_raw": (jax.jit(conv_s8_raw_chain),
                        lambda r: (jnp.asarray(r.integers(-127, 128, (B, H, W, C)), jnp.int8), wq_conv),
                        conv_flops),
        "conv_s8_dyn": (jax.jit(conv_s8_dyn_chain),
                        lambda r: (jnp.asarray(r.standard_normal((B, H, W, C)), jnp.bfloat16), wq_conv, sw_conv.astype(jnp.float32)),
                        conv_flops),
        "mm_bf16": (jax.jit(mm_bf16_chain),
                    lambda r: (jnp.asarray(r.standard_normal((M, K)) * 0.1, jnp.bfloat16), w_mm),
                    mm_flops),
        "mm_s8_raw": (jax.jit(mm_s8_raw_chain),
                      lambda r: (jnp.asarray(r.integers(-127, 128, (M, K)), jnp.int8), wq_mm),
                      mm_flops),
        "mm_s8_dyn": (jax.jit(mm_s8_dyn_chain),
                      lambda r: (jnp.asarray(r.standard_normal((M, K)) * 0.1, jnp.bfloat16), wq_mm, sw_mm.astype(jnp.float32)),
                      mm_flops),
    }

    for name, (fn, mk, flops) in cases.items():
        try:
            # warm compile (untimed)
            float(fn(*mk(np.random.default_rng(1))))
        except Exception as e:
            print(f"{name:12s}  FAILED to compile/run: {type(e).__name__}: {e}")
            continue
        best = float("inf")
        for r in range(args.repeat):
            ins = mk(np.random.default_rng(100 + r))  # varied per repeat
            t0 = time.perf_counter()
            s = float(fn(*ins))  # scalar fetch = the only honest sync
            dt = time.perf_counter() - t0
            best = min(best, dt)
        tflops = flops / best / 1e12
        print(f"{name:12s}  best {best*1e3:8.2f} ms   {tflops:7.1f} T{'OP' if 's8' in name else 'FLOP'}S  (checksum {s:.3e})")


if __name__ == "__main__":
    main()
