"""Offline precompute driver — the reference's cache-generation stages.

Covers SURVEY §3.4's offline feeds:
  * `inv`  — DDIM-inverted latents → <root>/inv_{t0}_{steps}/*.npz
    (pre_dataset.py InvRec parity, consumed by InversionPairDataset)
  * `pgt`  — rendered pseudo-GT pair images → <root>/pgt/<s&r>.png
    (auxiliary/pseudos.py parity, consumed by DoubleControlPGTDataset)
  * `onlyrec` — VAE round-trip sanity dumps (pre_dataset.py OnlyRec parity)

Landmark caches (lms/*.npy) come from FacePipeline with a detector/landmarker
plugged in (dlib where available) — the reference's identical pattern.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["inv", "pgt", "onlyrec"])
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--t0", type=int, default=80)
    ap.add_argument("--inv-steps", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from makeupdiffuse_tpu.config import Config, tiny_test_config
    from makeupdiffuse_tpu.data.mt_dataset import MTDataset
    from makeupdiffuse_tpu.data.preprocess import load_image_batch

    cfg = tiny_test_config() if args.tiny else Config()
    m = cfg.model
    ds = MTDataset(args.data_root, img_size=m.image_size, keep_order=True)
    all_names = ds.non_makeup_names + ds.makeup_names
    if args.limit:
        all_names = all_names[: args.limit]

    if args.stage == "pgt":
        from PIL import Image
        from makeupdiffuse_tpu.teacher.pgt import PGTTeacher, generate_pseudo_gt_pair
        from makeupdiffuse_tpu.training.logging import to_uint8

        teacher = PGTTeacher()
        out_dir = os.path.join(args.data_root, "pgt")
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for name_s in (ds.non_makeup_names[: args.limit or None]):
            for name_r in (ds.makeup_names[: args.limit or None]):
                item = ds.make_item(name_s, name_r, swap=False)
                sr, rs = generate_pseudo_gt_pair(
                    jnp.asarray(item["nonmakeup_img"])[None],
                    jnp.asarray(item["makeup_img"])[None],
                    jnp.asarray(item["mask_s_full"])[None],
                    jnp.asarray(item["mask_r_full"])[None],
                    teacher.alphas(),
                )
                b_s = os.path.splitext(os.path.basename(name_s))[0]
                b_r = os.path.splitext(os.path.basename(name_r))[0]
                Image.fromarray(to_uint8(np.asarray(sr[0]))).save(
                    os.path.join(out_dir, f"{b_s}&{b_r}.png"))
                n += 1
        print(f"wrote {n} pgt pairs to {out_dir}")
        return

    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model, init_model

    if args.tiny:
        model, params = init_model(m, jax.random.PRNGKey(0))
    else:
        model, params = fast_init_model(m)

    def image_iter():
        for i in range(0, len(all_names), args.batch_size):
            names = all_names[i:i + args.batch_size]
            if len(names) < args.batch_size:  # static shapes: pad the tail
                names = names + [names[-1]] * (args.batch_size - len(names))
            imgs = load_image_batch(
                [os.path.join(args.data_root, "images", n) for n in names],
                m.image_size,
            )
            yield names, imgs

    if args.stage == "onlyrec":
        from PIL import Image
        from makeupdiffuse_tpu.tools.invert_latents import vae_roundtrip
        from makeupdiffuse_tpu.training.logging import to_uint8

        out_dir = os.path.join(args.data_root, "only_rec")
        rng = jax.random.PRNGKey(0)
        fn = jax.jit(lambda p, x, k: vae_roundtrip(model, p, x, k))
        n = 0
        for names, imgs in image_iter():
            rng, k = jax.random.split(rng)
            rec = fn(params, jnp.asarray(imgs), k)
            for i, name in enumerate(names):
                sub = os.path.dirname(name)
                os.makedirs(os.path.join(out_dir, "ori", sub), exist_ok=True)
                os.makedirs(os.path.join(out_dir, "rec", sub), exist_ok=True)
                Image.fromarray(to_uint8(imgs[i])).save(
                    os.path.join(out_dir, "ori", name))
                Image.fromarray(to_uint8(np.asarray(rec[i]))).save(
                    os.path.join(out_dir, "rec", name))
                n += 1
        print(f"wrote {n} ori/rec pairs to {out_dir}")
        return

    # stage == "inv"
    from makeupdiffuse_tpu.tools.invert_latents import precompute_inversions

    bank = precompute_prompt_bank(
        lambda p, ids: model.apply(p, ids, method=model.encode_text), params,
        max_length=m.clip.max_length,
    )
    row = bank["makeup style transfer"]
    count = precompute_inversions(
        model, params, m, image_iter(),
        context_fn=lambda b: jnp.tile(row[None], (b, 1, 1)),
        out_root=args.data_root, t0=args.t0, inv_steps=args.inv_steps,
    )
    print(f"wrote {count} inversion latents to {args.data_root}/inv_{args.t0}_{args.inv_steps}")


if __name__ == "__main__":
    main()
