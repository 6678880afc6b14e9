"""Makeup-recipe end-to-end learning proof — the FULL composite path learns transfer.

Extends scripts/learnproof.py (which proves the control pathway on fill-circles)
to the actual product recipe: the PGT histogram-matching teacher + the 7-term
composite loss (losses.composite_loss — ``BaseMakeUpDiffuse.p_losses`` parity,
/root/reference/diffmk/makeup_diffuse.py:106-150, teacher_type ELEGANT_PGT
/root/reference/diffmk/teacher.py:96-112), trained on parametric "faces" whose
parse maps and per-region makeup colors are analytically known
(data/synthetic.ParametricFaceDataset). Because the ground truth is known, the
claim "training with the real recipe moves makeup onto the source while
preserving identity/background" becomes measurable:

  A1. VAE reconstruction pretrain on the face distribution
  A2. unconditional latent-diffusion pretrain of the UNet
  C.  composite_loss training, ControlNet-ONLY (the production sd_locked split,
      runs/train.py:17,70-71), hint = src‖ref, PGT targets composed on-device
      for the whole data pool up front (the scripts/precompute.py production
      pattern; full-strength alphas (1,1,1) so the expected post-transfer color
      of every region IS the reference's region color — the production anneal
      schedule stays the default elsewhere, teacher/pgt.py:31-43)

Verdicts (summary.json; decisive = both ratios >= --decisive-factor):
  * per-region color error: mean MSE of sampled-transfer pixels inside the
    SOURCE's lip / eyeshadow / skin regions vs the REFERENCE's known region
    colors — after-C must beat both the before-C model and a SHUFFLED-ref
    control (same trained model, wrong reference) by the factor
  * background preservation: MSE of the sample vs the source image on the
    background (seg==0) stays under --bg-bound

Usage: python scripts/learnproof_makeup.py [--cpu] [--steps-a1 N ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import numpy as np


def proof_config(preset: str):
    """Same capacity ladder as scripts/learnproof.py:57 (tiny = CI, small =
    enough capacity that the base model actually generates structure)."""
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


def build_pool(n: int, size: int, seed: int, cache_dir: str = None):
    """Host-side pool of parametric face pairs (one-time cost; batches are
    drawn from it so per-step host work stays trivial on the single core).
    Deterministic given (n, size, seed) — cached to disk so reruns skip the
    ~15 min of host-side mask dilation on the single core."""
    # v2: mask_full ch1 is the parse-skin analog (lip/eye-free) — synthetic.py
    cache = (os.path.join(cache_dir, f"pool_v2_{n}_{size}_{seed}.npz")
             if cache_dir else None)
    if cache and os.path.exists(cache):
        print(f"# pool cache hit: {cache}", flush=True)
        return dict(np.load(cache))
    from makeupdiffuse_tpu.data.synthetic import ParametricFaceDataset

    ds = ParametricFaceDataset(size=size, seed=seed)
    pairs = [ds.pair(i) for i in range(n)]
    st = lambda side, key: np.stack([p[side][key] for p in pairs])
    pool = {
        "non_img": st("src", "img"), "mk_img": st("ref", "img"),
        "seg_s": st("src", "seg"),
        "mask_s": st("src", "mask_full"), "mask_r": st("ref", "mask_full"),
        "ref_colors": st("ref", "colors"),            # [N,3regions,3] in [0,1]
        "reg_lip": st("src", "region_lip"),
        "reg_shadow": st("src", "region_shadow"),
        "reg_skin": st("src", "region_skin"),
    }
    if cache:
        np.savez(cache, **pool)
    return pool


def run(args):
    import jax
    import jax.numpy as jnp
    import optax

    from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.losses import composite_loss, simple_diffusion_loss
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, make_denoiser
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.teacher.pgt import compose_pgt
    from makeupdiffuse_tpu.training.logging import make_grid, to_uint8

    cfg = proof_config(args.model)
    m = cfg.model
    assert m.hint_mode == "double", "the makeup proof drives the src‖ref recipe"
    model, params = fast_init_model(m, seed=args.seed)
    sched = DiffusionSchedule.create(
        timesteps=m.timesteps, linear_start=m.linear_start, linear_end=m.linear_end,
        parameterization=m.parameterization,
    )
    H = m.image_size

    os.makedirs(args.out, exist_ok=True)
    print(f"# building pool of {args.pool} pairs...", flush=True)
    pool = build_pool(args.pool, H, args.seed + 1, cache_dir=args.out)
    n_pool = args.pool

    # PGT targets for the WHOLE pool, composed on-device once (production
    # precompute pattern). Full-strength alphas: pgt = src geometry with the
    # ref's region colors — the analytically known transfer target.
    alphas = jnp.asarray(args.alphas, jnp.float32)
    compose = jax.jit(lambda s, r, ms, mr: compose_pgt(s, r, ms, mr, alphas))
    pgt_chunks = []
    cb = 64
    for i in range(0, n_pool, cb):
        pgt_chunks.append(np.asarray(compose(
            pool["non_img"][i:i + cb], pool["mk_img"][i:i + cb],
            pool["mask_s"][i:i + cb], pool["mask_r"][i:i + cb])))
    pool["pgt"] = np.concatenate(pgt_chunks)

    enc = lambda p, i: model.apply(p, i, method=model.encode_text)
    ctx_row = precompute_prompt_bank(enc, params, m.clip.max_length)["makeup transfer"]
    ctx = lambda b: jnp.broadcast_to(ctx_row[None], (b,) + ctx_row.shape)

    os.makedirs(args.out, exist_ok=True)
    rng_idx = np.random.RandomState(args.seed + 7)

    def subtree_opt(prefixes, lr):
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

    import pickle

    def save_stage(p, name, stats=None):
        with open(os.path.join(args.out, f"params_{name}.pkl"), "wb") as f:
            pickle.dump(jax.device_get(p), f)
        if stats is not None:
            with open(os.path.join(args.out, f"stage_{name}.json"), "w") as f:
                json.dump(stats, f)

    def load_stage(name):
        with open(os.path.join(args.out, f"params_{name}.pkl"), "rb") as f:
            p = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
        sp = os.path.join(args.out, f"stage_{name}.json")
        stats = json.load(open(sp)) if os.path.exists(sp) else {"loaded": True}
        return p, stats

    def train_stage(name, loss_fn, data_keys, prefixes, lr, steps, p,
                    n_items=None, on_eval=None, eval_every=0):
        """scan-chunked stage (learnproof.py:124 pattern): K optimizer steps per
        dispatch; fixed-probe eval isolates the parameter update's effect."""
        tx = subtree_opt(prefixes, lr)
        # eval_shape + host zeros — not eager tx.init (one remote mini-compile
        # per leaf through axon; training/train_state.py:89)
        opt = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), jax.eval_shape(tx.init, p))
        K = max(1, min(args.chunk, steps))

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

        def draw(k):  # [K*B] pool rows → per-key [K,B,...] device arrays
            idx = rng_idx.randint(0, n_items or n_pool, k * args.batch)
            out = {}
            for kk, fn in data_keys.items():
                arr = np.asarray(fn(idx))
                out[kk] = jnp.asarray(
                    arr.reshape((k, args.batch) + arr.shape[1:]))
            return out

        eval_loss = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
        probe = {kk: v[0] for kk, v in draw(1).items()}
        probe_key = jax.random.PRNGKey(args.seed + 99)
        probe_first = float(eval_loss(p, probe, probe_key))

        losses, key = [], jax.random.PRNGKey(args.seed + abs(hash(name)) % 1000)
        path = os.path.join(args.out, f"loss_{name}.jsonl")
        t0 = time.time()
        with open(path, "w") as f:
            done = 0
            while done < steps:
                k_now = min(K, steps - done)
                data = draw(k_now)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, k_now)
                p, opt, closs = chunk(p, opt, data, keys)
                for i, lv in enumerate(np.asarray(closs)):
                    losses.append(float(lv))
                    f.write(json.dumps({"step": done + i, "loss": losses[-1]}) + "\n")
                done += k_now
                if on_eval and eval_every and done % eval_every == 0 \
                        and done < steps:
                    on_eval(p, done)
        probe_last = float(eval_loss(p, probe, probe_key))
        w = max(1, min(50, steps // 4))
        first, last = float(np.mean(losses[:w])), float(np.mean(losses[-w:]))
        print(f"[{name}] {steps} steps in {time.time()-t0:.1f}s  "
              f"first-{w} mean {first:.4f} -> last-{w} mean {last:.4f}  "
              f"probe {probe_first:.4f} -> {probe_last:.4f}", flush=True)
        return p, {"first": first, "last": last, "window": w, "steps": steps,
                   "probe_first": probe_first, "probe_last": probe_last}

    # the base distribution: nonmakeup + makeup + PGT composites, round-robin
    all_imgs = np.concatenate([pool["non_img"], pool["mk_img"], pool["pgt"]])

    # ---- A1: VAE recon -------------------------------------------------------
    def vae_loss(p, batch, key):
        x = batch["jpg"]
        mean, logvar = model.apply(p, x, method=model.encode_moments)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        xh = model.apply(p, m.scale_factor * z, method=model.decode_latent)
        recon = jnp.mean((xh - x) ** 2)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return recon + 1e-4 * kl, {"recon": recon}

    STAGES = ("a1", "a2", "c", "eval")
    start = STAGES.index(args.from_stage)

    imgs_of = lambda idx: all_imgs[idx]
    if start <= STAGES.index("a1"):
        params, s_a1 = train_stage(
            "a1_vae", vae_loss, {"jpg": imgs_of}, ("first_stage_model",),
            args.lr_vae, args.steps_a1, params, n_items=len(all_imgs))
        save_stage(params, "a1", s_a1)
    else:
        params, s_a1 = load_stage("a1")

    # ---- A2: unconditional UNet ----------------------------------------------
    def uncond_loss(p, batch, key):
        return simple_diffusion_loss(
            model, p, sched, m, batch["jpg"], None, ctx(batch["jpg"].shape[0]), key)

    if start <= STAGES.index("a2"):
        params, s_a2 = train_stage(
            "a2_unet", uncond_loss, {"jpg": imgs_of}, ("diffusion_model",),
            args.lr_unet, args.steps_a2, params, n_items=len(all_imgs))
        save_stage(params, "a2", s_a2)
    else:
        params, s_a2 = load_stage("a2")

    # ---- eval harness (held-out pairs, known colors) --------------------------
    from makeupdiffuse_tpu.data.synthetic import ParametricFaceDataset

    n_eval = 8
    eds = ParametricFaceDataset(size=H, seed=args.seed + 5000)
    epairs = [eds.pair(i) for i in range(n_eval)]
    est = lambda side, key: np.stack([p[side][key] for p in epairs])
    e_src, e_ref = est("src", "img"), est("ref", "img")
    e_src01, e_ref01 = (e_src + 1) / 2, (e_ref + 1) / 2
    e_colors = est("ref", "colors") * 2 - 1          # [-1,1] expected colors
    e_regions = np.stack([est("src", "region_lip"),
                          est("src", "region_shadow"),
                          est("src", "region_skin")], 1)  # [B,3,H,W]
    e_bg = (est("src", "seg") == 0).astype(np.float32)
    e_pgt = np.asarray(compose(e_src, e_ref,
                               est("src", "mask_full"), est("ref", "mask_full")))
    tables = DDIMTables.create(sched, num_steps=args.sample_steps, eta=0.0)

    def region_metrics(img):
        """mean over regions of masked MSE vs the known expected flat color."""
        errs = []
        for r in range(3):
            mask = e_regions[:, r][..., None]
            c = e_colors[:, r][:, None, None, :]
            errs.append(((img - c) ** 2 * mask).sum() / (mask.sum() * 3))
        bg = float(((img - e_src) ** 2 * e_bg[..., None]).sum()
                   / (e_bg.sum() * 3))
        return {"color_err": float(np.mean(errs)),
                "lip": float(errs[0]), "shadow": float(errs[1]),
                "skin": float(errs[2]), "bg_mse": bg}

    def sample_transfers(p, tag, ref01=None):
        """Production-parity sampling: 50-step DDIM at CFG --eval-cfg
        (reference inference is CFG 9.0, diffusion_makeup.py:201,292-303).
        The prompt is constant in the proof, so the conditioning channel is
        the ControlNet hint: uncond = the control-free UNet forward (the
        reference's own NoControlModel ablation path, c_concat=None,
        diffusion_makeup.py:414-437) — which stage A2 trained directly, so
        both CFG arms are in-distribution. The before-C arm is CFG-invariant
        by construction (zero-init ControlNet output convs ⇒ e_cond ≡
        e_uncond), so the decisive ratios compare like with like."""
        ref01_ = e_ref01 if ref01 is None else ref01
        hint = jnp.asarray(np.concatenate([e_src01, ref01_], -1))
        den_c = make_denoiser(model, p, ctx(n_eval), hint, schedule=sched)
        if args.eval_cfg and args.eval_cfg != 1.0:
            den_u = make_denoiser(model, p, ctx(n_eval), None, schedule=sched)
            s = args.eval_cfg

            def den(x, t):
                eu, ec = den_u(x, t), den_c(x, t)
                return eu + s * (ec - eu)
        else:
            den = den_c
        x_T = jax.random.normal(jax.random.PRNGKey(7),
                                (n_eval, m.latent_size, m.latent_size,
                                 m.latent_channels))
        # the axon remote-compile RPC can drop transiently mid-run (run 2 lost
        # its final eval to "response body closed"); one retry re-traces and
        # recovers without losing the trained params
        for attempt in (0, 1):
            try:
                z = ddim_sample(jax.jit(den), x_T, tables)
                img = np.asarray(jnp.clip(
                    model.apply(p, z, method=model.decode_latent), -1, 1))
                break
            except Exception:
                if attempt:
                    raise
                print(f"[samples {tag}] transient failure, retrying...",
                      flush=True)
                time.sleep(30)
        met = region_metrics(img)
        tiles = np.concatenate([e_src, ref01_ * 2 - 1, e_pgt, img], axis=0)
        grid = make_grid(to_uint8(tiles), nrow=n_eval)
        try:
            from PIL import Image

            Image.fromarray(grid).save(os.path.join(args.out, f"samples_{tag}.png"))
        except Exception as e:
            np.save(os.path.join(args.out, f"samples_{tag}.npy"), grid)
            print(f"(png save failed: {e})", flush=True)
        print(f"[samples {tag}] color_err {met['color_err']:.4f} "
              f"(lip {met['lip']:.4f} shadow {met['shadow']:.4f} "
              f"skin {met['skin']:.4f}) bg_mse {met['bg_mse']:.4f}", flush=True)
        return met

    before_path = os.path.join(args.out, "eval_before.json")
    if start <= STAGES.index("c"):
        met_before = sample_transfers(params, "before_composite")
        with open(before_path, "w") as f:
            json.dump(met_before, f)
    else:
        # eval-only rerun: the before-C arm was measured (and saved) when the
        # pre-C params still existed; re-measuring it with trained params
        # would be wrong
        met_before = json.load(open(before_path))

    # ---- C: the REAL composite recipe, ControlNet only ------------------------
    def composite(p, batch, key):
        return composite_loss(model, p, sched, m, batch, key, t_min=0)

    pool["src01"] = ((pool["non_img"] + 1) / 2).astype(np.float32)
    pool["ref01"] = ((pool["mk_img"] + 1) / 2).astype(np.float32)
    comp_keys = {
        "src_img": lambda i: pool["src01"][i],
        "ref_img": lambda i: pool["ref01"][i],
        "nonmakeup_img": lambda i: pool["non_img"][i],
        "makeup_img": lambda i: pool["mk_img"][i],
        "nonmakeup_seg": lambda i: pool["seg_s"][i],
        "mask_s_full": lambda i: pool["mask_s"][i],
        "pgt_sr": lambda i: pool["pgt"][i],
        "makeup_pgt": lambda i: pool["pgt"][i],
        "context": lambda i, _c=np.asarray(ctx_row): np.broadcast_to(
            _c[None], (len(i),) + _c.shape),
    }
    c_traj = []

    def mid_eval(p, done):
        met = sample_transfers(p, f"c{done}")
        c_traj.append({"step": done, **met})

    if start <= STAGES.index("c"):
        params, s_c = train_stage(
            "c_composite", composite, comp_keys, ("control_model",),
            args.lr_control, args.steps_c, params,
            on_eval=mid_eval, eval_every=args.eval_every)
        save_stage(params, "c", s_c)
    else:
        params, s_c = load_stage("c")

    met_after = sample_transfers(params, "after_composite")
    roll = np.roll(np.arange(n_eval), 1)
    met_shuffled = sample_transfers(params, "shuffled_ref", ref01=e_ref01[roll])

    f_before = met_before["color_err"] / max(met_after["color_err"], 1e-12)
    f_shuffled = met_shuffled["color_err"] / max(met_after["color_err"], 1e-12)
    summary = {
        "a1_vae": s_a1, "a2_unet": s_a2, "c_composite": s_c,
        "region_color_err": {"before_composite": met_before,
                             "after_composite": met_after,
                             "shuffled_ref": met_shuffled},
        "decisive_factor": {"vs_before": f_before, "vs_shuffled": f_shuffled,
                            "required": args.decisive_factor},
        "bg_bound": args.bg_bound, "alphas": list(args.alphas),
        "batch": args.batch, "pool": args.pool,
        "image_size": H, "model": args.model,
        "eval_cfg": args.eval_cfg, "c_trajectory": c_traj,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    ok = all(s.get("probe_last", 0.0) < s.get("probe_first", 1.0)
             for s in (s_a1, s_a2, s_c))
    msg = "OK — every stage's fixed-probe loss decreased" if ok else "FAILED"
    if args.decisive_factor > 0:
        decisive = (f_before >= args.decisive_factor
                    and f_shuffled >= args.decisive_factor
                    and met_after["bg_mse"] <= args.bg_bound)
        ok = ok and decisive
        msg += (f"; DECISIVE (before {f_before:.1f}x, shuffled {f_shuffled:.1f}x "
                f">= {args.decisive_factor}x; bg {met_after['bg_mse']:.4f} "
                f"<= {args.bg_bound})") if decisive else (
            f"; NOT decisive (before {f_before:.1f}x, shuffled {f_shuffled:.1f}x "
            f"need {args.decisive_factor}x; bg {met_after['bg_mse']:.4f} "
            f"bound {args.bg_bound})")
    print("makeup-recipe learning proof: " + msg)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model", choices=("tiny", "small"), default="small")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pool", type=int, default=1536)
    ap.add_argument("--steps-a1", type=int, default=2000)
    ap.add_argument("--steps-a2", type=int, default=4000)
    ap.add_argument("--steps-c", type=int, default=4000)
    ap.add_argument("--sample-steps", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--alphas", type=float, nargs=3, default=(1.0, 1.0, 1.0),
                    help="PGT (lip, eye, skin) blend strengths for the proof; "
                         "production anneal stays the default elsewhere")
    ap.add_argument("--eval-cfg", type=float, default=9.0,
                    help="CFG scale for the eval sampling arms (production "
                         "inference parity: 9.0, diffusion_makeup.py:201); "
                         "conditioning channel = the ControlNet hint (prompt "
                         "is constant in the proof), uncond = control-free")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="sample + score the eval arm every N C-steps "
                         "(trajectory lands in summary.json)")
    ap.add_argument("--from-stage", choices=("a1", "a2", "c", "eval"),
                    default="a1",
                    help="resume from a stage's saved params_<stage>.pkl in "
                         "--out (a2: skip A1; c: skip A1+A2; eval: only sample)")
    ap.add_argument("--decisive-factor", type=float, default=5.0)
    ap.add_argument("--bg-bound", type=float, default=0.03,
                    help="after-composite background MSE vs the source must "
                         "stay under this")
    ap.add_argument("--lr-vae", type=float, default=1e-3)
    ap.add_argument("--lr-unet", type=float, default=3e-4)
    ap.add_argument("--lr-control", type=float, default=4e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/learnproof_makeup")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.exit(run(args))


if __name__ == "__main__":
    main()
