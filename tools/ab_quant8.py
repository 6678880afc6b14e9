"""Whole-pipeline A/B: bf16 vs w8a8 int8 (ops/quant.py) on the flagship chain.

Decides the quant8 default per the PERF.md discipline: ONE process, identical
inputs/rng for both arms, the full 50-step cDDIM CFG9 batch-8 product pipeline
(bench.py's north-star config), honest timing (varied inputs per repeat,
terminal scalar fetch — CLAUDE.md axon rules), plus the numerics cost as PSNR
of the w8a8 output against the bf16 output on the SAME noise.

The reference has no quantized path (fp32 everywhere,
/root/reference/runs/test.py:55); this is a beyond-reference serving lever —
v5e MXU int8 peak is 2x bf16, and PERF.md r3 shows the pipeline compute-bound
at 53% MFU, so the ceiling-level win is large IF XLA actually hits the int8
rate on these shapes (tools/probe_int8.py measures the raw rates).

Usage: python tools/ab_quant8.py [--steps 50] [--batch 8] [--repeats 3] [--cpu]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cfg-scale", type=float, default=9.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from makeupdiffuse_tpu import ops
    from makeupdiffuse_tpu.config import ModelConfig, tiny_test_config
    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import (fast_init_model,
                                                         init_model,
                                                         make_denoiser)
    from makeupdiffuse_tpu.ops import quant

    if not args.cpu:
        ops.enable_tpu_kernels_if_tpu()

    if args.tiny:
        cfg = tiny_test_config().model
        model, params = init_model(cfg, jax.random.PRNGKey(0))
    else:
        base = ModelConfig()
        cfg = dataclasses.replace(
            base,
            unet=dataclasses.replace(base.unet, use_checkpoint=False),
            control=dataclasses.replace(base.control, use_checkpoint=False),
        )
        model, params = fast_init_model(cfg, param_dtype=jnp.bfloat16)
    # Fresh init has ZERO-INIT output convs (zero_module parity) → eps ≡ 0
    # bit-exactly in BOTH arms, so every quantized GEMM is multiplied away and
    # the numerics comparison degenerates to 0 (the r5 first-run 126 dB artifact).
    # Perturb exactly the all-zero kernels so signal flows through the network;
    # timing is value-independent either way.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    n_zero = 0
    rng_h = np.random.default_rng(42)
    for i, l in enumerate(leaves):
        # HOST-side zero check + fill: fast_init leaves are host numpy; a
        # jnp.any per leaf would upload all ~2.8G of bf16 params through the
        # tunnel one leaf at a time (measured: stalls >14 min)
        arr = np.asarray(l)
        if arr.ndim >= 2 and not np.any(arr != 0):
            leaves[i] = (0.02 * rng_h.standard_normal(arr.shape)).astype(arr.dtype)
            n_zero += 1
    params = jax.device_put(treedef.unflatten(leaves))  # one bulk upload —
    # leaving host numpy here would re-ship ~2.8G per pipeline call
    print(f"# perturbed {n_zero} zero-init kernels (signal now flows through "
          f"every quantized GEMM)", file=sys.stderr, flush=True)

    sched = DiffusionSchedule.create(timesteps=cfg.timesteps)
    tables = DDIMTables.create(sched, num_steps=args.steps, eta=0.0)

    b, H = args.batch, cfg.image_size
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    src = jax.random.uniform(ks[0], (b, H, H, 3))
    ref = jax.random.uniform(ks[1], (b, H, H, 3))
    ctx = jax.random.normal(ks[2], (b, cfg.clip.max_length, cfg.unet.context_dim))
    uc = jax.random.normal(ks[3], (b, cfg.clip.max_length, cfg.unet.context_dim))
    pgt = jax.random.uniform(ks[4], (b, H, H, 3)) * 2 - 1

    def build_pipeline():
        """Fresh jit per arm: QUANT8 is trace-time state, so each arm needs its
        own trace (a shared jit object would silently reuse the first trace)."""

        @jax.jit
        def pipeline(params, pgt, src, ref, ctx, uc, rng):
            k_z, k_T = jax.random.split(rng)
            mean, logvar = model.apply(params, pgt, method=model.encode_moments)
            z = cfg.scale_factor * (
                mean + jnp.exp(0.5 * logvar) * jax.random.normal(k_z, mean.shape))
            hint = jnp.concatenate([src, ref], axis=-1)
            den = make_denoiser(model, params, ctx, hint, uncond_context=uc,
                                cfg_scale=args.cfg_scale)
            x_T = jax.random.normal(k_T, z.shape)
            z_out = ddim_sample(den, x_T, tables)
            img = model.apply(params, z_out, method=model.decode_latent)
            return jnp.clip(img, -1.0, 1.0), img, z_out

        return pipeline

    def build_eps():
        """One CFG eps forward — the per-step numerics cost, free of the
        clip/decode saturation that masks differences on untrained weights."""

        @jax.jit
        def eps(params, x, t, ctx, uc, src, ref):
            hint = jnp.concatenate([src, ref], axis=-1)
            den = make_denoiser(model, params, ctx, hint, uncond_context=uc,
                                cfg_scale=args.cfg_scale)
            return den(x, t)

        return eps

    h = cfg.latent_size
    x_eps = jax.random.normal(ks[5], (b, h, h, cfg.latent_channels))
    t_eps = jnp.full((b,), 401, jnp.int32)

    results = {}
    outs = {}
    for arm in ("bf16", "w8a8"):
        quant.QUANT8 = arm == "w8a8"
        pipe = build_pipeline()
        t0 = time.time()
        out, raw, z_out = pipe(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(1))
        jax.device_get(out[0, 0, 0, 0])
        compile_s = time.time() - t0
        outs[arm] = {
            "img": np.asarray(out, np.float32),  # same rng both arms → comparable
            "raw": np.asarray(raw, np.float32),
            "z": np.asarray(z_out, np.float32),
            "eps": np.asarray(build_eps()(params, x_eps, t_eps, ctx, uc, src, ref),
                              np.float32),
        }
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            o, _, _ = pipe(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(7 + i))
            jax.device_get(o[0, 0, 0, 0])
            times.append(time.time() - t0)
        best = min(times)
        results[arm] = dict(imgs_per_sec=round(b / best, 4),
                            best_s=round(best, 4),
                            compile_s=round(compile_s, 1))
        print(f"# {arm}: {b / best:.4f} img/s (best {best:.3f}s, "
              f"compile {compile_s:.1f}s)", file=sys.stderr, flush=True)
    quant.QUANT8 = False

    # numerics, w8a8 vs bf16 on the SAME noise. Clipped-image PSNR is the
    # production metric but saturates to "identical" on untrained weights
    # (both arms clip to ±1 nearly everywhere) — so also report the
    # saturation fraction and relative L2 on the PRE-clip decode, the latent
    # chain output, and one CFG eps forward (the honest per-step cost).
    a, w = outs["bf16"], outs["w8a8"]
    mse = float(np.mean((w["img"] - a["img"]) ** 2))
    psnr = float(10.0 * np.log10(4.0 / max(mse, 1e-12)))
    rel = lambda k: float(np.linalg.norm(w[k] - a[k])
                          / max(np.linalg.norm(a[k]), 1e-12))
    sat = float(np.mean(np.abs(a["img"]) >= 1.0))
    eps_mse = float(np.mean((w["eps"] - a["eps"]) ** 2))
    eps_range = float(a["eps"].max() - a["eps"].min())
    eps_psnr = float(10.0 * np.log10(eps_range**2 / max(eps_mse, 1e-12)))
    speedup = results["w8a8"]["imgs_per_sec"] / results["bf16"]["imgs_per_sec"]
    print(json.dumps({
        "ab": "quant8", "steps": args.steps, "batch": b,
        "bf16": results["bf16"], "w8a8": results["w8a8"],
        "speedup": round(speedup, 4),
        "psnr_w8a8_vs_bf16_db": round(psnr, 2),
        "bf16_clip_saturation": round(sat, 4),
        "rel_l2_preclip": round(rel("raw"), 6),
        "rel_l2_latent": round(rel("z"), 6),
        "rel_l2_eps": round(rel("eps"), 6),
        "psnr_eps_db": round(eps_psnr, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
