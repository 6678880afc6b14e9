"""Benchmark driver: full makeup-transfer pipeline on the real TPU chip.

Measures the BASELINE.json north-star config: 256×256 50-step cDDIM with CFG 9
(= 100 ControlNet+UNet forwards per image, the reference's inference cost,
/root/reference/diffmk/diffusion_makeup.py:201,292-303) + VAE encode/decode,
end-to-end, bf16 compute. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is measured / 4.0 (the ≥4 img/s/chip v5e target; the torch reference
publishes no numbers — BASELINE.md).

Usage: python bench.py [--batch 8] [--steps 50] [--repeats 3] [--config N]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

# persistent compile cache — amortizes the large one-off XLA compiles across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=9.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp"],
                    help="ddim = 50-step parity metric; dpmpp = DPM-Solver++(2M) fast path")
    args = ap.parse_args()

    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.dpm_solver import DPMTables, dpmpp_2m_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, make_denoiser
    from makeupdiffuse_tpu.ops import pallas_attention

    # Pallas flash attention on the big self-attention layers: +10% end-to-end
    pallas_attention.FLASH_DEFAULT = True

    base = ModelConfig()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet, use_checkpoint=False),
        control=dataclasses.replace(base.control, use_checkpoint=False),
    )
    model, params = fast_init_model(cfg)
    params = jax.device_put(params, jax.devices()[0])
    sched = DiffusionSchedule.create(timesteps=cfg.timesteps)
    if args.sampler == "dpmpp":
        tables = DPMTables.create(sched, num_steps=args.steps)
        sample_fn = dpmpp_2m_sample
    else:
        tables = DDIMTables.create(sched, num_steps=args.steps, eta=0.0)
        sample_fn = ddim_sample

    b = args.batch
    H = cfg.image_size
    hs = cfg.latent_size
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    src = jax.random.uniform(ks[0], (b, H, H, 3))
    ref = jax.random.uniform(ks[1], (b, H, H, 3))
    ctx = jax.random.normal(ks[2], (b, cfg.clip.max_length, cfg.unet.context_dim))
    uc = jax.random.normal(ks[3], (b, cfg.clip.max_length, cfg.unet.context_dim))
    pgt = jax.random.uniform(ks[4], (b, H, H, 3)) * 2 - 1

    @jax.jit
    def pipeline(params, pgt, src, ref, ctx, uc, rng):
        """VAE encode → diffuse → steps×CFG-cDDIM → VAE decode (north-star cfg 4/5).

        params is an ARGUMENT (closing over it would bake 5.7GB of constants into
        the HLO and stall compilation)."""
        k_z, k_T = jax.random.split(rng)
        mean, logvar = model.apply(params, pgt, method=model.encode_moments)
        z = cfg.scale_factor * (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(k_z, mean.shape)
        )
        hint = jnp.concatenate([src, ref], axis=-1)
        den = make_denoiser(model, params, ctx, hint, uncond_context=uc,
                            cfg_scale=args.cfg_scale)
        x_T = jax.random.normal(k_T, z.shape)
        z_out = sample_fn(den, x_T, tables)
        img = model.apply(params, z_out, method=model.decode_latent)
        return jnp.clip(img, -1.0, 1.0)

    # compile + warmup
    t0 = time.time()
    out = pipeline(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(1))
    out.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        out = pipeline(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    imgs_per_sec = b / best

    result = {
        "metric": f"images/sec/chip, {H}x{H} {args.steps}-step "
                  f"{'DPM++2M' if args.sampler == 'dpmpp' else 'cDDIM'} "
                  f"CFG{args.cfg_scale:g}, batch {b}, bf16",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 4.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# compile {compile_s:.1f}s; per-batch best {best:.3f}s over {args.repeats} repeats; "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
