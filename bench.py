"""Benchmark driver: the BASELINE.json configs on the real TPU chip.

Default (no flags) = the north-star metric: 256×256 50-step cDDIM with CFG 9
(= 100 ControlNet+UNet forwards per image, the reference's inference cost,
/root/reference/diffmk/diffusion_makeup.py:201,292-303) + VAE encode/decode, batch 8,
bf16, Pallas flash attention. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline = measured / 4.0 (the ≥4 img/s/chip v5e target; the torch reference
publishes no numbers — BASELINE.md).

--config N instruments the other BASELINE.json configs:
  1 histogram-matching pseudo-label generation, one MT pair (host CPU)
  2 teacher module forward: preliminary transfer x_p at 256², batch 1
  3 single denoise step: dual-ControlNet UNet on 32² latent
  4 full pipeline, batch 1
  5 batched transfer + makeup interpolation sweep, batch 8  (the default)
--sampler dpmpp benches the DPM-Solver++(2M) fast path instead of cDDIM.
"""
import argparse
import dataclasses
import functools
import json
import os
import sys
import time

# persistent compile cache — amortizes the large one-off XLA compiles across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp


def _timeit(fn, repeats):
    """fn(i) -> output. Repeats pass distinct i so inputs VARY per repeat —
    bitwise-identical re-dispatches can be served ~free by the axon attachment
    (CLAUDE.md); each timing ends with a scalar fetch (block_until_ready alone
    can return while the computation is still in flight through the tunnel)."""
    out = fn(0)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    times = []
    for i in range(repeats):
        t0 = time.time()
        out = fn(i + 1)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        times.append(time.time() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=9.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp"])
    ap.add_argument("--train", action="store_true",
                    help="bench one composite train step (batch 6, flagship, "
                         "kernels on) instead of the sampling configs")
    ap.add_argument("--quant8", action="store_true",
                    help="route UNet/ControlNet conv+projection GEMMs through the "
                         "w8a8 int8 MXU path (ops/quant.py; inference configs only; "
                         "also honored via env MDT_QUANT8=1)")
    ap.add_argument("--cycle", action="store_true",
                    help="bench one cycle-finetune train step (grads THROUGH the "
                         "sampler scan, models/cycle_finetune.py) instead of the "
                         "sampling configs")
    args = ap.parse_args()

    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.dpm_solver import DPMTables, dpmpp_2m_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, make_denoiser
    from makeupdiffuse_tpu.ops import enable_quant8, enable_tpu_kernels

    enable_tpu_kernels()  # flash attention (+10% e2e on v5e) + fused GroupNorm+SiLU
    quant8 = args.quant8 or os.environ.get("MDT_QUANT8") == "1"
    if quant8:
        if args.train or args.cycle:
            sys.exit("--quant8 is inference-only (round/clip kills weight "
                     "gradients — ops/quant.py); drop it for --train/--cycle")
        enable_quant8(True)

    if args.cycle:
        _bench_cycle_step(args)
        return

    if args.train:
        _bench_train_step(args)
        return

    base = ModelConfig()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet, use_checkpoint=False),
        control=dataclasses.replace(base.control, use_checkpoint=False),
    )
    H = cfg.image_size
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # ---- config 1: histogram-matching PGT, one pair, host CPU ---------------------
    if args.config == 1:
        from makeupdiffuse_tpu.teacher.pgt import compose_pgt

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            srcs = [jax.random.uniform(jax.random.fold_in(ks[0], i), (1, H, H, 3)) * 2 - 1
                    for i in range(args.repeats + 1)]
            img_r = jax.random.uniform(ks[1], (1, H, H, 3)) * 2 - 1
            mask = (jax.random.uniform(ks[2], (1, H, H, 4)) > 0.7).astype(jnp.float32)
            alphas = jnp.asarray([0.1, 0.6, 0.3])
            # arguments, not closures — closures constant-fold at compile time
            fn = jax.jit(compose_pgt)
            best = _timeit(lambda i: fn(srcs[i], img_r, mask, mask, alphas), args.repeats)
        result = {
            "metric": "PGT pseudo-label pairs/sec, one 2562 MT pair, host CPU",
            "value": round(1.0 / best, 4), "unit": "pairs/sec",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        return

    # inference-grade weights: bf16 on device. Keeps 2.85 GB (not 5.7) of weight
    # traffic per forward and drops the per-use f32→bf16 casts; norms still
    # compute in f32 internally (GroupNorm32/LayerNorm upcast their inputs).
    # Casting host-side ALSO halves the 5.6 GB startup transfer to the chip.
    model, params = fast_init_model(cfg, param_dtype=jnp.bfloat16)
    sched = DiffusionSchedule.create(timesteps=cfg.timesteps)

    # ---- config 2: teacher forward x_p at 256², batch 1 ---------------------------
    if args.config == 2:
        from makeupdiffuse_tpu.teacher.elegant import EleGANtTeacher

        teacher = EleGANtTeacher()
        teacher.params = jax.device_put(teacher.params, jax.devices()[0])
        srcs = [jax.random.uniform(jax.random.fold_in(ks[0], i), (1, H, H, 3)) * 2 - 1
                for i in range(args.repeats + 1)]
        img_r = jax.random.uniform(ks[1], (1, H, H, 3)) * 2 - 1
        mask = (jax.random.uniform(ks[2], (1, H, H, 4)) > 0.7).astype(jnp.float32)
        diff = jax.random.normal(ks[3], (1, H, H, 136))
        fn = jax.jit(lambda p, img_s: teacher.model.apply(
            p, img_s, img_r,
            jnp.concatenate([mask[..., :1], mask[..., 1:].sum(-1, keepdims=True)], -1),
            jnp.concatenate([mask[..., :1], mask[..., 1:].sum(-1, keepdims=True)], -1),
            diff, diff))
        best = _timeit(lambda i: fn(teacher.params, srcs[i]), args.repeats)
        result = {
            # architecture timing only: without converted weights the zero-init
            # residual head makes the OUTPUT an identity transfer (VERDICT r2
            # Weak #5) — the compute cost benchmarked is the real topology's
            "metric": "teacher fwd/sec (EleGANt-style topology, random init), 256x256, batch 1",
            "value": round(1.0 / best, 4), "unit": "transfers/sec",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        return

    # ---- config 3: single dual-ControlNet denoise step ----------------------------
    if args.config == 3:
        b = args.batch or 1
        reps = max(args.repeats, 10)
        xs = [jax.random.normal(jax.random.fold_in(ks[0], i),
                                (b, cfg.latent_size, cfg.latent_size, 4))
              for i in range(reps + 1)]
        t = jnp.full((b,), 500, jnp.int32)
        ctx = jax.random.normal(ks[1], (b, cfg.clip.max_length, cfg.unet.context_dim))
        hint = jax.random.uniform(ks[2], (b, H, H, 6))
        fn = jax.jit(lambda p, x: model.apply(p, x, t, ctx, hint, method=model.apply_eps))
        best = _timeit(lambda i: fn(params, xs[i]), reps)
        result = {
            "metric": f"denoise steps/sec, dual-ControlNet+UNet 32x32 latent, "
                      f"batch {b}, {'w8a8' if quant8 else 'bf16'}",
            "value": round(b / best, 2), "unit": "steps/sec",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        print(f"# {best*1000:.2f} ms/step", file=sys.stderr)
        return

    # ---- configs 4/5: full pipeline ------------------------------------------------
    b = args.batch or (1 if args.config == 4 else 8)
    if args.sampler == "dpmpp":
        tables = DPMTables.create(sched, num_steps=args.steps)
        sample_fn = dpmpp_2m_sample
    else:
        tables = DDIMTables.create(sched, num_steps=args.steps, eta=0.0)
        sample_fn = ddim_sample

    src = jax.random.uniform(ks[0], (b, H, H, 3))
    ref = jax.random.uniform(ks[1], (b, H, H, 3))
    ctx = jax.random.normal(ks[2], (b, cfg.clip.max_length, cfg.unet.context_dim))
    uc = jax.random.normal(ks[3], (b, cfg.clip.max_length, cfg.unet.context_dim))
    pgt = jax.random.uniform(ks[4], (b, H, H, 3)) * 2 - 1

    @jax.jit
    def pipeline(params, pgt, src, ref, ctx, uc, rng):
        """VAE encode → diffuse → steps×CFG sampling → VAE decode.

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

    t0 = time.time()
    out = pipeline(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(1))
    jax.device_get(out[0, 0, 0, 0])  # block_until_ready can lie through axon
    compile_s = time.time() - t0

    # the rng argument varies per repeat, which varies the initial noise and the
    # posterior sample — no two dispatches are bitwise-identical
    best = _timeit(
        lambda i: pipeline(params, pgt, src, ref, ctx, uc, jax.random.PRNGKey(7 + i)),
        args.repeats,
    )
    imgs_per_sec = b / best
    name = "DPM++2M" if args.sampler == "dpmpp" else "cDDIM"
    result = {
        "metric": f"images/sec/chip, {H}x{H} {args.steps}-step {name} "
                  f"CFG{args.cfg_scale:g}, batch {b}, "
                  f"{'w8a8' if quant8 else 'bf16'}",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 4.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# compile {compile_s:.1f}s; per-batch best {best:.3f}s over {args.repeats} "
        f"repeats; device={jax.devices()[0]}",
        file=sys.stderr,
    )


def _bench_cycle_step(args):
    """One flagship cycle-finetune step (gradients THROUGH the 10-step cDDIM
    sampler ×6 generations, models/cycle_finetune.py — the reference's
    makeups.py:90-117 memory-hard path, SURVEY §7 "hard parts"). Measured
    on-chip per VERDICT r4 Weak #3: ms/step + the HBM-fit configuration.

    batch defaults to 1 (the reference also trains this mode at batch 1,
    /root/reference/diffmk/makeups.py DataLoader usage); remat_sampler +
    remat'd decode + cast_frozen_to_bf16 are what make it fit 16G."""
    import dataclasses as dc

    from makeupdiffuse_tpu.config import Config
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.models.cycle_finetune import (
        CycleFinetuneConfig, cycle_finetune_loss,
    )
    from makeupdiffuse_tpu.training.train_state import TrainState, cast_frozen_to_bf16

    cfg = Config()
    m = dc.replace(
        cfg.model,
        hint_mode="single_ref",
        control=dc.replace(cfg.model.control, hint_channels=3),
    )
    b = args.batch or 1
    print(f"# init flagship model (cycle-finetune, batch {b})...",
          file=sys.stderr, flush=True)
    model, params = fast_init_model(m)
    params = cast_frozen_to_bf16(params, sd_locked=cfg.train.sd_locked)
    state = TrainState.create(params, cfg.train, m)
    cyc = CycleFinetuneConfig()  # t0=100, iter_finetune=10, all terms on
    tables = cyc.tables(cyc.truncated_schedule(m))

    def loss_fn(p, batch):
        return cycle_finetune_loss(model, p, cyc, tables, batch)

    # donate the state: without donation TWO param+opt copies are live across
    # apply_gradients and the 16G chip OOMs (same rationale as make_train_step)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        return state.apply_gradients(grads), ld

    H, h = m.image_size, m.latent_size
    ks = jax.random.split(jax.random.PRNGKey(1), 7)

    def mk_batch(i):
        kk = jax.random.fold_in(ks[0], i)
        return dict(
            src_inv=jax.random.normal(kk, (b, h, h, 4)) * 0.2,
            ref_inv=jax.random.normal(ks[1], (b, h, h, 4)) * 0.2,
            src_img=jax.random.uniform(ks[2], (b, H, H, 3)),
            ref_img=jax.random.uniform(ks[3], (b, H, H, 3)),
            src_msk=jax.random.randint(ks[4], (b, H, H), 0, 14),
            ref_msk=jax.random.randint(ks[5], (b, H, H), 0, 14),
            context=jax.random.normal(ks[6], (b, m.clip.max_length,
                                              m.unet.context_dim)),
        )

    print("# compiling cycle step (grads through 2 stacked reconstructs = "
          "60 UNet fwd + bwd; several minutes remote)...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    state, ld = step_fn(state, mk_batch(0))
    fetched = {k: float(v) for k, v in ld.items()}
    compile_s = time.time() - t0
    print(f"# step-1 metrics: { {k: round(v, 4) for k, v in fetched.items()} }",
          file=sys.stderr, flush=True)

    times = []
    for i in range(max(args.repeats, 3)):
        t0 = time.time()
        state, ld = step_fn(state, mk_batch(i + 1))  # varied inputs per repeat
        jax.device_get(ld["loss"])
        times.append(time.time() - t0)
    best = min(times)
    result = {
        "metric": f"cycle-finetune steps/sec, grads through 10-step sampler x6 "
                  f"gens, batch {b}, flagship, bf16-frozen + remat",
        "value": round(1.0 / best, 4),
        "unit": "steps/sec",
        "vs_baseline": None,
        "ms_per_step": round(best * 1000, 1),
    }
    print(json.dumps(result))
    print(f"# {best*1000:.1f} ms/step fetch-synced; compile {compile_s:.1f}s; "
          f"device={jax.devices()[0]}", file=sys.stderr)


def _bench_train_step(args):
    """One flagship composite train step (5-term MakeupDiffuse loss, ControlNet-only
    AdamW), batch 6, kernels + remat + cast_frozen_to_bf16 — the production train
    path of scripts/train.py, measured (VERDICT r2 Weak #3)."""
    from makeupdiffuse_tpu.config import Config
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.training.train_state import TrainState, cast_frozen_to_bf16
    from makeupdiffuse_tpu.training.train_step import make_train_step

    cfg = Config()  # remat ON (use_checkpoint) — required to fit b6 in 16G HBM
    m = cfg.model
    b = args.batch or cfg.train.batch_size  # reference trains at batch 6
    print(f"# init flagship model (batch {b})...", file=sys.stderr, flush=True)
    model, params = fast_init_model(m)
    params = cast_frozen_to_bf16(params, sd_locked=cfg.train.sd_locked)
    state = TrainState.create(params, cfg.train, m)
    print("# init done; compiling composite train step (first call is the "
          "compile — several minutes through the remote tunnel)...",
          file=sys.stderr, flush=True)
    sched = DiffusionSchedule.create(
        timesteps=m.timesteps, linear_start=m.linear_start, linear_end=m.linear_end,
        parameterization=m.parameterization,
    )
    # donate=True (production setting): the repeat loop threads the returned
    # state back in, so the old buffers are donated — donate=False would hold
    # TWO full param+opt copies live and OOM the 16G chip
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

    t0 = time.time()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    fetched = {k: float(v) for k, v in metrics.items()}  # host fetch = true sync
    compile_s = time.time() - t0
    print(f"# step-1 metrics: { {k: round(v, 4) for k, v in fetched.items()} }",
          file=sys.stderr, flush=True)
    times = []
    for i in range(max(args.repeats, 5)):
        t0 = time.time()
        # the rng varies per repeat (t draws + noise), so no repeat is a
        # bitwise-identical dispatch the attachment could serve for free
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
        jax.device_get(metrics["loss"])
        times.append(time.time() - t0)
    best = min(times)

    # Pipelined regime: K steps dispatched back-to-back (state threads through,
    # rng varies per step), ONE terminal scalar fetch. This is how
    # training/loop.fit actually runs (async metrics — loop.py), so it is the
    # deployment-truth wall; the per-step number above pays the axon tunnel's
    # per-dispatch host gap (PERF.md r4: 429.2 ms device-busy vs 492.6 ms
    # fetch-synced wall). Steps serialize on the device via the state
    # dependency, so wall/K cannot under-report compute.
    K = 10
    t0 = time.time()
    for i in range(K):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
    jax.device_get(metrics["loss"])  # one true sync for the whole chain
    piped = (time.time() - t0) / K

    result = {
        "metric": f"train steps/sec, composite 5-term loss, batch {b}, flagship, "
                  "bf16-frozen + remat",
        "value": round(1.0 / best, 4),
        "unit": "steps/sec",
        "vs_baseline": None,
        "pipelined_steps_per_sec": round(1.0 / piped, 4),
        "pipelined_ms_per_step": round(piped * 1000, 1),
    }
    print(json.dumps(result))
    print(f"# {best*1000:.1f} ms/step fetch-synced, {piped*1000:.1f} ms/step "
          f"pipelined x{K} (prev recorded 748 ms b6); compile "
          f"{compile_s:.1f}s; device={jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
