"""Fill-circles end-to-end learning proof — the control pathway demonstrably learns.

The reference's own sanity pattern is Fill50k (/root/reference/diffdata/datasets.py:
221-262): train ControlNet on a toy circle task to validate the control pathway
independently of faces. The reference starts from pretrained SD weights; in this
environment there are none, so the proof bootstraps its own "pretrained" base first:

  A1. VAE reconstruction pretrain on circle images (recon + tiny KL)
  A2. unconditional latent-diffusion pretrain of the UNet (hint=None — the
      NoControlModel path, diffusion_makeup.py:414-437)
  B.  ControlNet-ONLY training (the production sd_locked split,
      runs/train.py:17,70-71) with the circle outline as hint — the stage whose
      loss curve is the learning proof for the control pathway.

Artifacts (committed under artifacts/learnproof/): per-stage loss curves
(loss_*.jsonl), before/after sample grids for fixed eval hints, and summary.json
with first/last-window loss means + sample-vs-target MSE before/after B and a
SHUFFLED-hint control (same trained model, hints rolled by one — what the samples
look like when the hint is wrong). Decisive = after-control MSE beats both the
before-control and shuffled-hint MSE by ``--decisive-factor`` (default 5×): the
samples must visibly follow the hinted position/color, not merely move the loss.

Usage: python scripts/learnproof.py [--cpu] [--steps-a1 N --steps-a2 N --steps-b N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import numpy as np


def batcher(size: int, batch: int, seed: int):
    """Vectorized FillCirclesDataset batches (same distribution as the per-item
    class, drawn B at a time — the host must keep up with scan-chunked steps)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    lo, hi = size // 4, 3 * size // 4
    while True:
        cy = rng.randint(lo, hi, (batch, 1, 1))
        cx = rng.randint(lo, hi, (batch, 1, 1))
        r = rng.randint(size // 16, size // 4, (batch, 1, 1))
        dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        outline = (np.abs(dist - r) < 2).astype(np.float32)[..., None]
        fill = (dist <= r).astype(np.float32)[..., None]
        color = rng.uniform(0.1, 1, (batch, 1, 1, 3)).astype(np.float32)
        hint = outline * color
        target = fill * color + (1 - fill) * 0.5
        yield {"jpg": (target * 2 - 1).astype(np.float32),
               "hint": hint.astype(np.float32)}


def proof_config(preset: str):
    """Model for the proof. ``tiny`` = the shared test config (fast CI). ``small``
    = enough capacity that the from-scratch base model actually generates: the
    round-3 run showed a 32-ch/1-resblock UNet over an 8² latent never produces
    structured samples, so the control stage had nothing visible to steer."""
    from makeupdiffuse_tpu.config import tiny_test_config

    cfg = tiny_test_config()
    if preset == "tiny":
        return cfg
    assert preset == "small", preset
    from dataclasses import replace

    m = cfg.model
    unet = replace(m.unet, model_channels=64, num_res_blocks=2,
                   attention_resolutions=(1, 2))
    ctrl = replace(m.control, model_channels=64, num_res_blocks=2,
                   attention_resolutions=(1, 2))
    vae = replace(m.vae, ch=32)
    return replace(cfg, model=replace(m, unet=unet, control=ctrl, vae=vae))


def run(args):
    import jax
    import jax.numpy as jnp
    import optax

    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.data.synthetic import FillCirclesDataset
    from makeupdiffuse_tpu.losses import simple_diffusion_loss
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, make_denoiser
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.training.logging import make_grid, to_uint8

    cfg = proof_config(args.model)
    m = cfg.model
    model, params = fast_init_model(m, seed=args.seed)
    sched = DiffusionSchedule.create(
        timesteps=m.timesteps, linear_start=m.linear_start, linear_end=m.linear_end,
        parameterization=m.parameterization,
    )
    ds = FillCirclesDataset(size=m.image_size, length=10_000, seed=args.seed)
    batches = batcher(m.image_size, args.batch, args.seed + 1)

    # fixed text context — exercises the cross-attention path; the task itself is
    # text-free (reference Fill50k uses a constant prompt, datasets.py:257)
    enc = lambda p, i: model.apply(p, i, method=model.encode_text)
    ctx_row = precompute_prompt_bank(enc, params, m.clip.max_length)["makeup transfer"]
    ctx = lambda b: jnp.broadcast_to(ctx_row[None], (b,) + ctx_row.shape)

    os.makedirs(args.out, exist_ok=True)

    def subtree_opt(prefixes, lr):
        """AdamW on leaves under `prefixes`, zero elsewhere."""
        import flax

        flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
        labels = {
            k: "train" if any(k.startswith(p) for p in prefixes) else "freeze"
            for k in flat
        }
        labels = {"params": flax.traverse_util.unflatten_dict(labels, sep="/")}
        return optax.multi_transform(
            {"train": optax.adamw(lr), "freeze": optax.set_to_zero()}, labels
        )

    def train_stage(name, loss_fn, prefixes, lr, steps, p):
        tx = subtree_opt(prefixes, lr)
        # eval_shape + host zeros: eager tx.init is one remote mini-compile PER
        # LEAF through the axon attachment (training/train_state.py:89 rationale);
        # adamw/set_to_zero states are all zero-initialized so this is exact
        opt = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), jax.eval_shape(tx.init, p))
        K = max(1, min(args.chunk, steps))  # optimizer steps per device dispatch

        # lax.scan chunking: K steps ride ONE dispatch. Through the axon tunnel
        # each dispatch + loss fetch costs ~0.3 s of pure latency — per-step
        # dispatch made the round-3 budget (800 control steps) the most the
        # wall clock allowed, which is exactly why its samples stayed noise.
        @jax.jit
        def chunk(p, opt, data, keys):
            def body(carry, inp):
                cp, copt = carry
                batch, key = inp
                (loss, _aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(cp, batch, key)
                updates, copt = tx.update(grads, copt, cp)
                return (optax.apply_updates(cp, updates), copt), loss
            (p, opt), losses = jax.lax.scan(body, (p, opt), (data, keys))
            return p, opt, losses

        # Deterministic learning probe: the SAME (batch, noise key) evaluated before
        # and after the run. The per-step curve draws fresh timesteps/noise each step,
        # so at short step counts first-vs-last window means measure sampling variance,
        # not learning; the fixed probe isolates the parameter update's effect.
        eval_loss = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
        probe = {kk: jnp.asarray(v) for kk, v in next(batches).items()}
        probe_key = jax.random.PRNGKey(args.seed + 99)
        probe_first = float(eval_loss(p, probe, probe_key))

        losses, key = [], jax.random.PRNGKey(args.seed + hash(name) % 1000)
        path = os.path.join(args.out, f"loss_{name}.jsonl")
        t0 = time.time()
        with open(path, "w") as f:
            done = 0
            while done < steps:
                k_now = min(K, steps - done)
                chunk_batches = [next(batches) for _ in range(k_now)]
                data = {kk: jnp.asarray(np.stack([b[kk] for b in chunk_batches]))
                        for kk in ("jpg", "hint")}
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, k_now)
                # a trailing remainder chunk just compiles one smaller program
                p, opt, closs = chunk(p, opt, data, keys)
                for i, lv in enumerate(np.asarray(closs)):  # fetch = chunk sync
                    losses.append(float(lv))
                    f.write(json.dumps({"step": done + i, "loss": losses[-1]}) + "\n")
                done += k_now
        probe_last = float(eval_loss(p, probe, probe_key))
        w = max(1, min(50, steps // 4))
        first, last = float(np.mean(losses[:w])), float(np.mean(losses[-w:]))
        print(f"[{name}] {steps} steps in {time.time()-t0:.1f}s  "
              f"first-{w} mean {first:.4f} -> last-{w} mean {last:.4f}  "
              f"probe {probe_first:.4f} -> {probe_last:.4f}", flush=True)
        return p, {"first": first, "last": last, "window": w, "steps": steps,
                   "probe_first": probe_first, "probe_last": probe_last}

    # ---- A1: VAE recon ------------------------------------------------------------
    def vae_loss(p, batch, key):
        x = batch["jpg"]
        mean, logvar = model.apply(p, x, method=model.encode_moments)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        # decode_latent divides by scale_factor; feed scaled z so it cancels
        xh = model.apply(p, m.scale_factor * z, method=model.decode_latent)
        recon = jnp.mean((xh - x) ** 2)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return recon + 1e-4 * kl, {"recon": recon}

    params, s_a1 = train_stage("a1_vae", vae_loss, ("first_stage_model",),
                               args.lr_vae, args.steps_a1, params)

    # ---- A2: unconditional UNet ---------------------------------------------------
    def uncond_loss(p, batch, key):
        loss, ld = simple_diffusion_loss(
            model, p, sched, m, batch["jpg"], None, ctx(batch["jpg"].shape[0]), key
        )
        return loss, ld

    params, s_a2 = train_stage("a2_unet", uncond_loss, ("diffusion_model",),
                               args.lr_unet, args.steps_a2, params)

    # ---- eval harness (fixed hints) ----------------------------------------------
    n_eval = 8
    eval_items = [ds[i] for i in range(n_eval)]
    eval_hint3 = jnp.asarray(np.stack([it["hint"] for it in eval_items]))
    eval_target = np.stack([it["jpg"] for it in eval_items])
    eval_hint6 = jnp.concatenate([eval_hint3, eval_hint3], axis=-1)
    tables = DDIMTables.create(sched, num_steps=args.sample_steps, eta=0.0)

    def sample_grid(p, tag, hint6=eval_hint6, hint3=None):
        if hint3 is None:
            hint3 = eval_hint3
        den = make_denoiser(model, p, ctx(n_eval), hint6, schedule=sched)
        x_T = jax.random.normal(jax.random.PRNGKey(7),
                                (n_eval, m.latent_size, m.latent_size, m.latent_channels))
        z = ddim_sample(jax.jit(den), x_T, tables)
        img = np.asarray(jnp.clip(
            model.apply(p, z, method=model.decode_latent), -1, 1))
        mse = float(np.mean((img - eval_target) ** 2))
        tiles = np.concatenate(
            [np.asarray(hint3) * 2 - 1, img, eval_target], axis=0)
        grid = make_grid(to_uint8(tiles), nrow=n_eval)
        try:
            from PIL import Image

            Image.fromarray(grid).save(os.path.join(args.out, f"samples_{tag}.png"))
        except Exception as e:  # grid still recorded as npy if PIL is absent
            np.save(os.path.join(args.out, f"samples_{tag}.npy"), grid)
            print(f"(png save failed: {e})", flush=True)
        print(f"[samples {tag}] vs-target mse {mse:.4f}", flush=True)
        return mse

    # base-model sanity grid: what the unconditional model draws after A2 — if
    # this is unstructured noise, stage B has nothing visible to steer and the
    # budget/capacity must grow before the control proof can mean anything
    sample_grid(params, "uncond_after_a2", hint6=None)
    mse_before = sample_grid(params, "before_control")

    # ---- B: ControlNet only (production sd_locked split) --------------------------
    def control_loss(p, batch, key):
        hint6 = jnp.concatenate([batch["hint"], batch["hint"]], axis=-1)
        return simple_diffusion_loss(
            model, p, sched, m, batch["jpg"], hint6, ctx(batch["jpg"].shape[0]), key
        )

    params, s_b = train_stage("b_control", control_loss, ("control_model",),
                              args.lr_control, args.steps_b, params)
    mse_after = sample_grid(params, "after_control")
    # shuffled-hint control: the SAME trained model steered by the wrong hint.
    # If control truly drives the output, these samples match the wrong target
    # and the MSE vs the true targets stays high.
    roll = np.roll(np.arange(n_eval), 1)
    mse_shuffled = sample_grid(
        params, "shuffled_hint",
        hint6=eval_hint6[roll], hint3=np.asarray(eval_hint3)[roll])

    f_before = mse_before / max(mse_after, 1e-12)
    f_shuffled = mse_shuffled / max(mse_after, 1e-12)
    summary = {
        "a1_vae": s_a1, "a2_unet": s_a2, "b_control": s_b,
        "sample_vs_target_mse": {"before_control": mse_before,
                                 "after_control": mse_after,
                                 "shuffled_hint": mse_shuffled},
        "decisive_factor": {"vs_before": f_before, "vs_shuffled": f_shuffled,
                            "required": args.decisive_factor},
        "batch": args.batch, "image_size": m.image_size, "model": args.model,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    ok = all(s["probe_last"] < s["probe_first"] for s in (s_a1, s_a2, s_b))
    msg = "OK — every stage's fixed-probe loss decreased" if ok else "FAILED"
    if args.decisive_factor > 0:
        decisive = f_before >= args.decisive_factor and f_shuffled >= args.decisive_factor
        ok = ok and decisive
        msg += (f"; DECISIVE (before {f_before:.1f}x, shuffled {f_shuffled:.1f}x "
                f">= {args.decisive_factor}x)") if decisive else (
            f"; NOT decisive (before {f_before:.1f}x, shuffled {f_shuffled:.1f}x, "
            f"need {args.decisive_factor}x)")
    print("learning proof: " + msg)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model", choices=("tiny", "small"), default="small")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps-a1", type=int, default=2000)
    ap.add_argument("--steps-a2", type=int, default=4000)
    ap.add_argument("--steps-b", type=int, default=6000)
    ap.add_argument("--sample-steps", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=25,
                    help="optimizer steps per device dispatch (lax.scan chunk)")
    ap.add_argument("--decisive-factor", type=float, default=5.0,
                    help="after-control MSE must beat before/shuffled by this "
                         "factor for rc=0; 0 disables the gate")
    ap.add_argument("--lr-vae", type=float, default=1e-3)
    ap.add_argument("--lr-unet", type=float, default=3e-4)
    ap.add_argument("--lr-control", type=float, default=4e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/learnproof")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.exit(run(args))


if __name__ == "__main__":
    main()
