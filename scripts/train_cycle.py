"""Cycle-finetune train driver — the makeups.py/mkups.py training mode.

Trains ControlNet(3-ch hint) THROUGH the cDDIM sampler on precomputed inverted
latents (tools/invert_latents.py output), with the background/idt/cycle/histogram
losses of /root/reference/diffmk/makeups.py. mkups.py's OnlyCycle / OnlyMakeup /
CycleMakeup variants are weight presets (--preset).
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
import numpy as np

PRESETS = {
    # makeups.py defaults — all terms on
    "full": dict(weight_loss_cycle=1.0, weight_loss_makeup=1.0,
                 weight_loss_idt=1.0, weight_loss_background=1.0),
    # mkups.py OnlyCycle / CycleMakeupModel / OnlyMakeupModel (mkups.py:11-378)
    "only_cycle": dict(weight_loss_cycle=1.0, weight_loss_makeup=0.0,
                       weight_loss_idt=1.0, weight_loss_background=1.0),
    "cycle_makeup": dict(weight_loss_cycle=1.0, weight_loss_makeup=1.0,
                         weight_loss_idt=0.0, weight_loss_background=1.0),
    "only_makeup": dict(weight_loss_cycle=0.0, weight_loss_makeup=1.0,
                        weight_loss_idt=0.0, weight_loss_background=1.0),
    # BasePseudoModel adds the pseudo-GT L2 (makeups.py:289-343)
    "pseudo": dict(weight_loss_cycle=1.0, weight_loss_makeup=1.0,
                   weight_loss_idt=1.0, weight_loss_background=1.0,
                   weight_loss_pseudo=1.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--preset", default="full", choices=sorted(PRESETS))
    ap.add_argument("--t0", type=int, default=100)
    ap.add_argument("--iter-finetune", type=int, default=10)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--log-dir", default="./results/cycle")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (small runs / remote-compile TPUs)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from makeupdiffuse_tpu.config import Config, tiny_test_config
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, init_model
    from makeupdiffuse_tpu.models.cycle_finetune import (
        CycleFinetuneConfig, cycle_finetune_loss,
    )
    from makeupdiffuse_tpu.training.checkpoint import CheckpointManager
    from makeupdiffuse_tpu.training.logging import MetricsLogger
    from makeupdiffuse_tpu.training.train_state import TrainState

    cfg = tiny_test_config() if args.tiny else Config()
    # single-image hint ControlNet (makeups.py c_concat = one image)
    m = dataclasses.replace(
        cfg.model,
        hint_mode="single_ref",
        control=dataclasses.replace(cfg.model.control, hint_channels=3),
    )
    cfg = dataclasses.replace(
        cfg, model=m,
        train=dataclasses.replace(cfg.train, learning_rate=args.lr,
                                  batch_size=args.batch_size),
    )
    if args.tiny:
        model, params = init_model(m, jax.random.PRNGKey(0))
    else:
        model, params = fast_init_model(m)

    cyc = CycleFinetuneConfig(t0=args.t0, iter_finetune=args.iter_finetune,
                              **PRESETS[args.preset])
    sched = cyc.truncated_schedule(m)
    tables = cyc.tables(sched)
    state = TrainState.create(params, cfg.train, m)
    metrics_log = MetricsLogger(args.log_dir)
    ckpt = CheckpointManager(os.path.join(args.log_dir, "checkpoints"),
                             every_steps=cfg.train.ckpt_every_steps)

    def loss_fn(p, batch):
        return cycle_finetune_loss(model, p, cyc, tables, batch)

    @jax.jit
    def step(state, batch):
        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        return state.apply_gradients(grads), ld

    if args.synthetic:
        def batches():
            h, H = m.latent_size, m.image_size
            for i in range(args.steps):
                ks = jax.random.split(jax.random.PRNGKey(i), 6)
                yield dict(
                    src_inv=jax.random.normal(ks[0], (args.batch_size, h, h, 4)) * 0.2,
                    ref_inv=jax.random.normal(ks[1], (args.batch_size, h, h, 4)) * 0.2,
                    src_img=jax.random.uniform(ks[2], (args.batch_size, H, H, 3)),
                    ref_img=jax.random.uniform(ks[3], (args.batch_size, H, H, 3)),
                    src_msk=jax.random.randint(ks[4], (args.batch_size, H, H), 0, 14),
                    ref_msk=jax.random.randint(ks[5], (args.batch_size, H, H), 0, 14),
                    context=jax.random.normal(ks[0], (args.batch_size, m.clip.max_length,
                                                      m.unet.context_dim)),
                )
    else:
        assert args.data_root, "--data-root or --synthetic required"
        from makeupdiffuse_tpu.data.dataset_zoo import InversionPairDataset
        from makeupdiffuse_tpu.data.mt_dataset import collate, data_loader
        ds = InversionPairDataset(args.data_root, img_size=m.image_size,
                                  t0=args.t0, inv_steps=cyc.inv_steps)

        def batches():
            # context from the fixed-prompt bank
            from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
            bank = precompute_prompt_bank(
                lambda p, ids: model.apply(p, ids, method=model.encode_text),
                state.params, max_length=m.clip.max_length)
            row = bank["makeup style transfer"]
            for hb in data_loader(ds, args.batch_size, num_steps=args.steps):
                hb = {k: jnp.asarray(v) for k, v in hb.items() if k != "txt"}
                hb["context"] = jnp.tile(row[None], (args.batch_size, 1, 1))
                yield hb

    for batch in batches():
        state, ld = step(state, batch)
        metrics_log.log(int(state.step), {k: float(v) for k, v in ld.items()})
        ckpt.maybe_save(state)
        if int(state.step) % 10 == 0:
            print(f"step {int(state.step)}: loss {float(ld['loss']):.4f}")
    ckpt.maybe_save(state, force=True)
    ckpt.wait()
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
