"""Teacher smoke probe with wall-clock timing — tst_teacher.py parity
(/root/reference/diffmk/tst_teacher.py:175-217: instantiate a teacher, run one
batch, print load/transfer timings), generalized over all four teacher_types.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", default="ELEGANT_PGT",
                    choices=["ELEGANT_PGT", "ELEGANT", "SCGAN", "KEEP"])
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--save", default="test_teacher.png")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (avoids remote-compile latency)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from makeupdiffuse_tpu.data.synthetic import synthetic_face_batch
    from makeupdiffuse_tpu.teacher.base import build_teacher
    from makeupdiffuse_tpu.training.logging import make_grid, to_uint8

    t0 = time.time()
    kwargs = {}
    if args.teacher in ("ELEGANT", "SCGAN"):
        kwargs = dict(ch=32, image_size=args.size)
    teacher = build_teacher(args.teacher, **kwargs)
    print(f"load teacher [{args.teacher}]: {time.time() - t0:.2f}s")

    hb = synthetic_face_batch(args.batch, args.size, context_dim=8, max_length=4)
    image_s = jnp.asarray(hb["nonmakeup_img"])
    image_r = jnp.asarray(hb["makeup_img"])
    mask_s = jnp.asarray(hb["mask_s_full"])
    mask_r = jnp.asarray(hb["mask_r_full"])

    t0 = time.time()
    if args.teacher == "SCGAN":
        seg_s = jnp.asarray(hb["nonmakeup_seg"])
        out = teacher(image_r, image_s, seg_s, seg_s)
    else:
        out = teacher(image_s, image_r, mask_s, mask_r)
    out.block_until_ready()
    print(f"first transfer (incl. compile): {time.time() - t0:.2f}s")

    t0 = time.time()
    for _ in range(5):
        if args.teacher == "SCGAN":
            seg_s = jnp.asarray(hb["nonmakeup_seg"])
            out = teacher(image_r, image_s, seg_s, seg_s)
        else:
            out = teacher(image_s, image_r, mask_s, mask_r)
    out.block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"steady transfer: {dt * 1000:.1f} ms/batch ({args.batch / dt:.1f} img/s)")

    import numpy as np
    from PIL import Image
    grid = make_grid(to_uint8(np.asarray(out)), nrow=args.batch)
    Image.fromarray(grid).save(args.save)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
