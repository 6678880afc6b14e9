"""On-chip jax.profiler trace of the bench pipeline's hot op (VERDICT r2 #2).

Per-dispatch host timings through the axon tunnel mis-rank ops by >100x
(CLAUDE.md), but DEVICE-side trace events ("XLA Ops" on /device:TPU:0) are
recorded by the TPU itself and are trustworthy — a 2048^3 bf16 matmul shows
189 TFLOPS, consistent with v5e peak.

Traces the CFG-doubled eps forward (batch 16 = the 50x-repeated body of the
north-star 50-step chain) and, optionally (--full), the whole sampling
pipeline. Prints a per-category and top-op table of device time shares.

Usage: python tools/profile_chain.py [--full] [--batch 16] [--repeats 10]
"""
import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp


_KIND_RX = re.compile(r"[\s)}]([a-z][a-z0-9-]*)\(")


def hlo_kind(long_name: str) -> str:
    """Op KIND from the HLO text '%name = type[shape]{layout} kind(operands…)'.

    Two past attribution bugs live here — do not reintroduce them:
    1. substring-matching 'custom-call' against the whole line is WRONG —
       operand lists name custom-call-producing INPUTS, so plain fusions that
       merely consume a Pallas output get miscounted as custom calls (inflated
       the round-2/3 'custom_call_other' share ~4×; corrected 2026-08-18).
    2. requiring a single 'type[shape]{layout}' before the kind is WRONG —
       TUPLE-typed ops ('= (f32[..], bf16[..]) fusion(..)': conv weight-grad
       fusions, flash-attn bwd custom-calls) fell into 'other' (33% of the
       train-step trace; corrected 2026-08-19).
    The kind is the first lowercase word followed by '(' after the '='; layout
    tokens like T(8,128)/S(1) are uppercase and '(2,1)' starts with a digit, so
    neither can match."""
    _, eq, rhs = long_name.partition(" = ")
    m = _KIND_RX.search(rhs if eq else long_name)
    return m.group(1) if m else "?"


def categorize(name: str, long_name: str) -> str:
    kind = hlo_kind(long_name)
    if kind == "custom-call":
        n = name.lower()
        if "attn" in n or "flash" in n:
            return "pallas_flash_attn"
        if "norm" in n:
            return "pallas_fused_norm"
        return "custom_call_other"
    if kind == "fusion":
        n = name.lower()
        if "convolution" in n:
            return "convolution"
        return "fusion(matmul/conv/elementwise)"
    if kind in ("copy", "transpose", "bitcast", "reshape"):
        return "copy/transpose"
    if kind != "?":
        return kind
    return "other"


def parse_trace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    ops = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "device:TPU" not in pnames.get(e["pid"], ""):
            continue
        if tnames.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        args = e.get("args") or {}
        ops.append((e["name"], args.get("long_name", args.get("hlo_op", "")),
                    float(e.get("dur", 0.0))))
    return ops


def report(ops, total_label: str):
    total = sum(d for _, _, d in ops)
    by_cat = collections.Counter()
    by_op = collections.Counter()
    for name, long_name, dur in ops:
        by_cat[categorize(name, long_name)] += dur
        by_op[name] += dur
    print(f"\n== {total_label}: device busy {total/1e3:.3f} ms across {len(ops)} op events ==")
    print(f"{'category':24s} {'ms':>10s} {'share':>7s}")
    for cat, dur in by_cat.most_common():
        print(f"{cat:24s} {dur/1e3:10.3f} {100*dur/total:6.1f}%")
    print("\ntop 25 ops by device time:")
    for name, dur in by_op.most_common(25):
        print(f"  {100*dur/total:5.1f}%  {dur/1e3:9.3f} ms  {name}")
    return total, by_cat


def profile_train_step(args):
    """Per-op-kind device-time shares for the composite train step (VERDICT r3 #7).

    Traces the SAME program bench.py --train times: flagship 5-term composite
    loss (reference semantics: /root/reference/diffmk/diffusion_makeup.py
    training_step), ControlNet-only AdamW, batch 6, Pallas kernels + remat +
    cast_frozen_to_bf16, donated state. Repeats vary the rng so no dispatch is
    a bitwise-identical re-serve."""
    from makeupdiffuse_tpu.config import Config
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.ops import enable_tpu_kernels
    from makeupdiffuse_tpu.training.train_state import TrainState, cast_frozen_to_bf16
    from makeupdiffuse_tpu.training.train_step import make_train_step

    enable_tpu_kernels(not args.no_kernels)
    cfg = Config()  # remat ON — required to fit b6 in 16G HBM
    m = cfg.model
    b = args.batch or cfg.train.batch_size
    print(f"# init flagship model (batch {b})...", file=sys.stderr, flush=True)
    model, params = fast_init_model(m)
    params = cast_frozen_to_bf16(params, sd_locked=cfg.train.sd_locked)
    state = TrainState.create(params, cfg.train, m)
    sched = DiffusionSchedule.create(
        timesteps=m.timesteps, linear_start=m.linear_start,
        linear_end=m.linear_end, parameterization=m.parameterization)
    step_fn = make_train_step(model, sched, m)

    H = m.image_size
    ks = jax.random.split(jax.random.PRNGKey(1), 9)
    u = lambda k, *s: jax.random.uniform(k, s)
    batch = dict(
        src_img=u(ks[0], b, H, H, 3),
        ref_img=u(ks[1], b, H, H, 3),
        nonmakeup_img=u(ks[2], b, H, H, 3) * 2 - 1,
        makeup_img=u(ks[3], b, H, H, 3) * 2 - 1,
        nonmakeup_seg=jax.random.randint(ks[4], (b, H, H), 0, 14),
        mask_s_full=(u(ks[5], b, H, H, 4) > 0.7).astype(jnp.float32),
        pgt_sr=u(ks[6], b, H, H, 3) * 2 - 1,
        makeup_pgt=u(ks[7], b, H, H, 3) * 2 - 1,
        context=jax.random.normal(ks[8], (b, m.clip.max_length, m.unet.context_dim)),
    )

    print("# compiling composite train step (minutes through the tunnel)...",
          file=sys.stderr, flush=True)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    jax.device_get(metrics["loss"])  # host fetch = the only true sync

    repeats = args.repeats
    tdir = tempfile.mkdtemp(prefix="mdt_prof_train_")
    t0 = time.time()
    with jax.profiler.trace(tdir):
        for i in range(repeats):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
            jax.device_get(metrics["loss"])
    wall = time.time() - t0
    ops = parse_trace(tdir)
    total, _ = report(ops, f"composite train step x{repeats} (batch {b})")
    per_step = total / 1e3 / repeats
    print(f"\nper-step device time: {per_step:.1f} ms vs wall "
          f"{wall * 1e3 / repeats:.1f} ms/step "
          f"(gap = host/dispatch/fetch idle)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="CFG-doubled batch (default 16; train mode: config b6)")
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--full", action="store_true",
                    help="also trace the full 50-step pipeline (one call)")
    ap.add_argument("--train", action="store_true",
                    help="trace the composite train step instead (b6, kernels + "
                         "remat + bf16-frozen — the bench.py --train program)")
    ap.add_argument("--no-kernels", action="store_true",
                    help="profile with Pallas kernels disabled (XLA-only baseline)")
    args = ap.parse_args()

    if args.train:
        profile_train_step(args)
        return
    args.batch = args.batch or 16

    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, make_denoiser
    from makeupdiffuse_tpu.ops import enable_tpu_kernels

    enable_tpu_kernels(not args.no_kernels)
    base = ModelConfig()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet, use_checkpoint=False),
        control=dataclasses.replace(base.control, use_checkpoint=False),
    )
    model, params = fast_init_model(cfg, param_dtype=jnp.bfloat16)

    b = args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, cfg.latent_size, cfg.latent_size, 4))
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(ks[1], (b, cfg.clip.max_length, cfg.unet.context_dim))
    hint = jax.random.uniform(ks[2], (b, cfg.image_size, cfg.image_size, 6))

    # t/ctx/hint are ARGUMENTS — a closure would inline them as HLO constants and
    # the remote compile constant-folds for minutes (bench config-1 regression)
    fwd = jax.jit(lambda p, x, t, c, h: model.apply(p, x, t, c, h,
                                                    method=model.apply_eps))
    fwd(params, x, t, ctx, hint).block_until_ready()  # compile outside the trace

    tdir = tempfile.mkdtemp(prefix="mdt_prof_")
    with jax.profiler.trace(tdir):
        for _ in range(args.repeats):
            fwd(params, x, t, ctx, hint).block_until_ready()
    ops = parse_trace(tdir)
    total, _ = report(ops, f"eps forward x{args.repeats} (CFG batch {b})")
    per_fwd_ms = total / 1e3 / args.repeats
    print(f"\nper-forward device time: {per_fwd_ms:.2f} ms "
          f"-> 50-step chain lower bound {50*per_fwd_ms/1e3:.3f} s/batch "
          f"({8/(50*per_fwd_ms/1e3):.2f} img/s at batch 8)")

    if args.full:
        H = cfg.image_size
        b8 = 8
        sched = DiffusionSchedule.create(timesteps=cfg.timesteps)
        tables = DDIMTables.create(sched, num_steps=50, eta=0.0)
        src = jax.random.uniform(ks[3], (b8, H, H, 3))
        ref = jax.random.uniform(ks[4], (b8, H, H, 3))
        c8 = jax.random.normal(ks[5], (b8, cfg.clip.max_length, cfg.unet.context_dim))
        u8 = jax.random.normal(ks[6], (b8, cfg.clip.max_length, cfg.unet.context_dim))
        pgt = jax.random.uniform(ks[7], (b8, H, H, 3)) * 2 - 1

        @jax.jit
        def pipeline(params, pgt, src, ref, ctx, uc, rng):
            k_z, k_T = jax.random.split(rng)
            mean, logvar = model.apply(params, pgt, method=model.encode_moments)
            z = cfg.scale_factor * (
                mean + jnp.exp(0.5 * logvar) * jax.random.normal(k_z, mean.shape))
            hint = jnp.concatenate([src, ref], axis=-1)
            den = make_denoiser(model, params, ctx, hint, uncond_context=uc,
                                cfg_scale=9.0)
            x_T = jax.random.normal(k_T, z.shape)
            z_out = ddim_sample(den, x_T, tables)
            img = model.apply(params, z_out, method=model.decode_latent)
            return jnp.clip(img, -1.0, 1.0)

        pipeline(params, pgt, src, ref, c8, u8, jax.random.PRNGKey(1)).block_until_ready()
        t0 = time.time()
        tdir2 = tempfile.mkdtemp(prefix="mdt_prof_full_")
        with jax.profiler.trace(tdir2):
            pipeline(params, pgt, src, ref, c8, u8,
                     jax.random.PRNGKey(2)).block_until_ready()
        wall = time.time() - t0
        ops2 = parse_trace(tdir2)
        total2, _ = report(ops2, "full pipeline, one call (50-step cDDIM CFG9 b8)")
        print(f"\nwall {wall:.3f} s vs device busy {total2/1e6:.3f} s "
              f"(gap = host/dispatch/transfer idle)")


if __name__ == "__main__":
    main()
