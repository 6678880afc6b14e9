"""FLOP/byte accounting for the bench pipeline via XLA cost analysis.

Computes MFU for the north-star config (50-step cDDIM CFG9 batch 8) from the
compiled HLO's own flop count — the trustworthy way to decide whether the
remaining gap to the perf target is fusion (bandwidth) or arithmetic (MXU-bound).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp


def main():
    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.ops import enable_tpu_kernels

    enable_tpu_kernels()
    base = ModelConfig()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet, use_checkpoint=False),
        control=dataclasses.replace(base.control, use_checkpoint=False),
    )
    model, params = fast_init_model(cfg)
    b = 16  # CFG-doubled bench batch
    h = cfg.latent_size
    x = jnp.zeros((b, h, h, cfg.latent_channels))
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, cfg.clip.max_length, cfg.unet.context_dim))
    hint = jnp.zeros((b, cfg.image_size, cfg.image_size, cfg.control.hint_channels))

    fn = jax.jit(lambda p, x, t, c, hnt: model.apply(p, x, t, c, hnt,
                                                     method=model.apply_eps))
    lowered = fn.lower(params, x, t, ctx, hint)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"single eps forward (CFG batch {b}): {flops/1e12:.3f} TFLOP, "
          f"{bytes_acc/1e9:.2f} GB accessed")
    # the CFG forward above IS the fused 2x batch, so a 50-step chain = 50 of these
    per_batch8 = 50 * flops
    print(f"50-step chain: {per_batch8/1e12:.1f} TFLOP per batch of 8 images")
    meas = _measured_per_batch_seconds()
    print(f"achieved at {meas:.3f} s/batch: {per_batch8/meas/1e12:.1f} TFLOPS "
          f"sustained (v5e bf16 peak ~197 => MFU ~{per_batch8/meas/197e12*100:.0f}%)")


def _measured_per_batch_seconds() -> float:
    """Per-batch seconds: --seconds CLI arg, else 8/value from the newest
    BENCH_r*.json (bench prints images/sec/chip at batch 8)."""
    import argparse
    import glob
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=None,
                    help="measured per-batch seconds (batch 8)")
    args, _ = ap.parse_known_args()
    if args.seconds:
        return args.seconds
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not benches:
        raise SystemExit("no BENCH_r*.json found; pass --seconds")
    with open(benches[-1]) as f:
        rec = json.load(f)
    val = rec["parsed"]["value"]
    print(f"(per-batch seconds derived from {os.path.basename(benches[-1])}: "
          f"{val} img/s/chip @ batch 8)")
    return 8.0 / val


if __name__ == "__main__":
    main()
