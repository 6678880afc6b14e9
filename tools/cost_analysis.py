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


def train_flops():
    """XLA's own flop count for the composite train step (bench.py --train
    program: b6, remat, ControlNet-only AdamW). Lowered eval-shape style on
    CPU — no tunnel compile, no execution; `lowered.cost_analysis()` reads the
    count from the StableHLO before backend compilation. Remat re-forwards are
    INCLUDED by XLA's count (they are real HLO ops)."""
    jax.config.update("jax_platforms", "cpu")
    from makeupdiffuse_tpu.config import Config
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.ops import enable_tpu_kernels
    from makeupdiffuse_tpu.training.train_state import TrainState, cast_frozen_to_bf16
    from makeupdiffuse_tpu.training.train_step import make_train_step

    enable_tpu_kernels(False)  # pallas custom-calls report 0 flops; XLA attn counts
    cfg = Config()
    m = cfg.model
    b = cfg.train.batch_size
    model, params = fast_init_model(m)
    params = cast_frozen_to_bf16(params, sd_locked=cfg.train.sd_locked)
    state = TrainState.create(params, cfg.train, m)
    sched = DiffusionSchedule.create(
        timesteps=m.timesteps, linear_start=m.linear_start,
        linear_end=m.linear_end, parameterization=m.parameterization)
    step_fn = make_train_step(model, sched, m)

    H = m.image_size
    f = lambda *s: jnp.zeros(s, jnp.float32)
    batch = dict(
        src_img=f(b, H, H, 3), ref_img=f(b, H, H, 3),
        nonmakeup_img=f(b, H, H, 3), makeup_img=f(b, H, H, 3),
        nonmakeup_seg=jnp.zeros((b, H, H), jnp.int32),
        mask_s_full=f(b, H, H, 4), pgt_sr=f(b, H, H, 3),
        makeup_pgt=f(b, H, H, 3),
        context=f(b, m.clip.max_length, m.unet.context_dim),
    )
    lowered = jax.jit(step_fn, donate_argnums=0).lower(
        state, batch, jax.random.PRNGKey(0))
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = ca.get("flops", float("nan"))
    print(f"composite train step (batch {b}, remat, XLA-attn flop count): "
          f"{flops/1e12:.2f} TFLOP")
    for secs, label in ((0.4926, "bench wall 492.6 ms"),
                        (0.4292, "device-busy 429.2 ms (profiled)")):
        print(f"  at {label}: {flops/secs/1e12:.1f} TFLOPS "
              f"=> MFU ~{flops/secs/197e12*100:.0f}% of v5e bf16 peak")


def main():
    if "--train" in sys.argv:
        train_flops()
        return
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
