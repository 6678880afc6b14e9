"""Test driver — /root/reference/runs/test.py parity: fixed pair list in, per-pair
artifact PNG grids + pair manifest out (TestDoubleControlModel.test_step →
log_results → save_local, diffusion_makeup.py:385-464).
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--params", default=None, help="converted/trained params pickle")
    ap.add_argument("--ckpt-dir", default=None, help="orbax checkpoint dir")
    ap.add_argument("--saved-dir", default="./test_outputs")
    ap.add_argument("--model-name", default="makeupdiffuse_tpu")
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=9.0)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--num-pairs", type=int, default=None)
    ap.add_argument("--allow-placeholder-prompts", action="store_true",
                    help="proceed with placeholder CLIP prompt ids (wrong-word "
                         "conditioning) on converted weights")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from makeupdiffuse_tpu.api import transfer_artifacts
    from makeupdiffuse_tpu.config import Config, tiny_test_config
    from makeupdiffuse_tpu.ops import enable_tpu_kernels_if_tpu

    enable_tpu_kernels_if_tpu()  # Pallas flash attention + fused norms on the chip
    from makeupdiffuse_tpu.core.ddim import DDIMTables
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, init_model
    from makeupdiffuse_tpu.teacher.pgt import PGTTeacher
    from makeupdiffuse_tpu.training.logging import TestArtifactWriter

    cfg = tiny_test_config() if args.tiny else Config()
    m = cfg.model
    if args.tiny:
        model, params = init_model(m, jax.random.PRNGKey(0))
    else:
        model, params = fast_init_model(m)
    loaded = None
    if args.params:
        with open(args.params, "rb") as f:
            loaded = pickle.load(f)
        params = {"params": loaded["params"]}
        params = jax.tree_util.tree_map(jnp.asarray, params)

    sched = DiffusionSchedule.create(timesteps=m.timesteps, linear_start=m.linear_start,
                                     linear_end=m.linear_end)
    tables = DDIMTables.create(sched, num_steps=args.ddim_steps)
    teacher = PGTTeacher()

    enc = lambda p, ids: model.apply(p, ids, method=model.encode_text)
    if loaded is not None:
        from makeupdiffuse_tpu.models.clip_text import load_context_bank

        bank = load_context_bank(loaded, enc, params, max_length=m.clip.max_length,
                                 allow_placeholder=args.allow_placeholder_prompts)
    else:
        bank = precompute_prompt_bank(enc, params, max_length=m.clip.max_length)
    writer = TestArtifactWriter(args.saved_dir, args.model_name)

    if args.synthetic:
        from makeupdiffuse_tpu.data.synthetic import synthetic_face_batch
        batches = []
        for i in range(args.num_pairs or 2):
            hb = synthetic_face_batch(args.batch_size, m.image_size, m.unet.context_dim,
                                      m.clip.max_length, seed=i)
            hb["img_name"] = [f"syn{i:03d}-s&syn{i:03d}-r"] * args.batch_size
            batches.append(hb)
    else:
        assert args.data_root, "--data-root or --synthetic required"
        from makeupdiffuse_tpu.data.mt_dataset import TestFixedDataset, collate
        ds = TestFixedDataset(args.data_root, img_size=m.image_size)
        n = min(args.num_pairs or len(ds), len(ds))
        batches = []
        for i in range(0, n, args.batch_size):
            items = [ds[j] for j in range(i, min(i + args.batch_size, n))]
            batches.append(collate(items))

    ctx_row = bank["makeup transfer"]
    uc_row = bank[""]

    run = jax.jit(
        lambda params, pgt, src, ref, ctx, uc, rng: transfer_artifacts(
            model, params, sched, tables, pgt, src, ref, ctx, uc, rng,
            t_min=m.t_min, cfg_scale=args.cfg_scale,
        )
    )

    for bi, hb in enumerate(batches):
        b = hb["src_img"].shape[0]
        image_s = jnp.asarray(hb["nonmakeup_img"])
        image_r = jnp.asarray(hb["makeup_img"])
        pgt = teacher(image_s, image_r, jnp.asarray(hb["mask_s_full"]),
                      jnp.asarray(hb["mask_r_full"]))
        ctx = jnp.tile(ctx_row[None], (b, 1, 1))
        uc = jnp.tile(uc_row[None], (b, 1, 1))
        arts = run(params, pgt, jnp.asarray(hb["src_img"]), jnp.asarray(hb["ref_img"]),
                   ctx, uc, jax.random.PRNGKey(bi))
        writer.add_pairs(bi, hb.get("img_name", [f"{bi:04d}-s&{bi:04d}-r"] * b))
        writer.save_batch(bi, {k: np.asarray(v) for k, v in arts.items()})
        print(f"batch {bi}: wrote {sorted(arts)}")
    manifest = writer.write_manifest()
    print(f"manifest: {manifest}")


if __name__ == "__main__":
    main()
