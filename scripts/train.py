"""Train driver — /root/reference/runs/train.py parity, CLI-flagged instead of
edit-in-place constants (:12-21), no env vars (DATAROOT → --data-root).

Flow (same skeleton): build model from config → dataset + loader → loggers +
checkpointing → weight load with hint-widening surgery (via the converter) →
fit loop. The hyperparameter-encoded log-dir path mirrors :38-46.
"""
import argparse
import dataclasses
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent compile cache: restart-after-crash (auto-resume below) must not
# pay the multi-minute train-step compile a second time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=False, default=None,
                    help="MT-Dataset root (images/, segs/, scgan_segs/, lms/, *.txt)")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on the synthetic face task (no dataset needed)")
    ap.add_argument("--config", default=None, help="json config (default: reference knobs)")
    ap.add_argument("--init-params", default=None,
                    help="converted torch params (tools/convert_torch_ckpt.py output)")
    ap.add_argument("--resume", default=None, help="orbax checkpoint dir to resume")
    ap.add_argument("--log-root", default="./results")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=None,
                    help="checkpoint every N steps (default: reference's 200, "
                         "runs/train.py:50)")
    ap.add_argument("--allow-placeholder-prompts", action="store_true",
                    help="proceed with placeholder CLIP prompt ids (wrong-word "
                         "conditioning) on converted weights")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI/smoke)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        # before any jax.devices() call — the axon plugin ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")

    from makeupdiffuse_tpu.config import Config, load_config, tiny_test_config
    from makeupdiffuse_tpu.ops import enable_tpu_kernels_if_tpu

    enable_tpu_kernels_if_tpu()  # Pallas flash attention + fused norms on the chip
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank, PROMPT_IDS
    from makeupdiffuse_tpu.models.controlled_ldm import ControlledLDM, fast_init_model, init_model
    from makeupdiffuse_tpu.training.loop import fit
    from makeupdiffuse_tpu.training.train_state import TrainState, cast_frozen_to_bf16
    from makeupdiffuse_tpu.training.checkpoint import CheckpointManager

    cfg = (load_config(args.config) if args.config
           else (tiny_test_config() if args.tiny else Config()))
    if args.batch_size:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size))
    if args.ckpt_every:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, ckpt_every_steps=args.ckpt_every))

    m = cfg.model
    if args.tiny:
        model, params = init_model(m, jax.random.PRNGKey(cfg.train.seed))
    else:
        model, params = fast_init_model(m, seed=cfg.train.seed)
    loaded = None
    if args.init_params:
        with open(args.init_params, "rb") as f:
            loaded = pickle.load(f)
        params = {"params": loaded["params"]}
        params = jax.tree_util.tree_map(jnp.asarray, params)
    if not args.tiny:
        # frozen UNet/VAE/CLIP in bf16: ~2.1G HBM saved, required to fit the
        # batch-6 composite step on a 16G chip
        params = cast_frozen_to_bf16(params, sd_locked=cfg.train.sd_locked)

    state = TrainState.create(params, cfg.train, m)

    # hyperparameter-encoded log dir (runs/train.py:38-46 parity)
    log_dir = os.path.join(
        args.log_root,
        "w_id_s-%.2f+w_id_r-%.2f+w_bk-%.2f+w_c_s-%.2f+w_c_r-%.2f+w_mkup-%.2f"
        % (m.w_idt_src, m.w_idt_ref, m.w_bkgrd, m.w_cycle_content, m.w_cycle_makeup, m.w_makeup),
        "l_lip-%d+l_eye-%f+l_skin-%.2f" % (m.lambda_lip, m.lambda_eye, m.lambda_skin),
        "tmin-%d+tmax-%d+lr-%f" % (m.t_min, m.t_max, cfg.train.learning_rate),
        m.parameterization, m.teacher_type,
    )
    os.makedirs(log_dir, exist_ok=True)

    # failure recovery: explicit --resume, or automatic pickup of this run's
    # latest checkpoint (restart-after-crash without flags)
    resume_dir = args.resume or os.path.join(log_dir, "checkpoints")
    if os.path.isdir(resume_dir):
        ckpt = CheckpointManager(resume_dir)
        if ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            print(f"resumed from step {int(state.step)} (t_min={int(state.t_min)})")

    # context: fixed-prompt bank ("makeup transfer", datasets.py:633). Converted
    # checkpoints carry the context vectors exported at conversion time; otherwise
    # (fresh/fast-init weights) encode the fixed prompts with the live tower.
    enc = lambda p, ids: model.apply(p, ids, method=model.encode_text)
    if loaded is not None:
        from makeupdiffuse_tpu.models.clip_text import load_context_bank

        bank = load_context_bank(loaded, enc, params, max_length=m.clip.max_length,
                                 allow_placeholder=args.allow_placeholder_prompts)
    else:
        bank = precompute_prompt_bank(enc, params, max_length=m.clip.max_length)
    ctx_row = bank["makeup transfer"]
    uncond_row = bank[""]  # encoded empty prompt — the CFG unconditional

    def context_fn(b):
        return jnp.tile(ctx_row[None], (b, 1, 1))

    def uncond_context_fn(b):
        return jnp.tile(uncond_row[None], (b, 1, 1))

    steps = args.steps_per_epoch or cfg.train.steps_per_epoch or None
    if args.synthetic:
        from makeupdiffuse_tpu.data.synthetic import synthetic_face_batch

        def data(epoch):
            n = steps or 10
            for i in range(n):
                yield synthetic_face_batch(cfg.train.batch_size, m.image_size,
                                           m.unet.context_dim, m.clip.max_length,
                                           seed=epoch * 100000 + i,
                                           # 136-ch diff fields only feed the
                                           # ELEGANT teacher; skipping them cuts
                                           # host gen ~10x on the single core
                                           with_diff=m.teacher_type == "ELEGANT")
    else:
        assert args.data_root, "--data-root or --synthetic required"
        from makeupdiffuse_tpu.data.mt_dataset import MTDataset, data_loader

        dataset = MTDataset(args.data_root, img_size=m.image_size)

        def data(epoch):
            return data_loader(dataset, cfg.train.batch_size, num_steps=steps,
                               seed=cfg.train.seed + epoch)

    state = fit(cfg, model, state, data, context_fn, log_dir=log_dir,
                num_epochs=args.epochs, uncond_context_fn=uncond_context_fn)
    print(f"done at step {int(state.step)}; logs in {log_dir}")


if __name__ == "__main__":
    main()
