"""Raw-image end-to-end demo: uint8 face picture → FacePipeline(parse_fallback)
→ masks/landmarks/diff-field → teacher PGT → transfer artifacts. No dlib, no
landmark cache, no detector — the zero-asset path a production deployment uses
before the optional dlib predictor is installed.

The reference cannot run this path at all without dlib
(/root/reference/diffdata/preprocessing.py:89-94,135-147 hard-requires the
detector + 68-point predictor); here the face box and approximate landmarks are
derived from the parse itself (faceparse.face_box_from_parse /
landmarks_from_parse — error-bounded in tests/test_faceparse.py).

Faces are PAINTED analytically (ellipse features with distinct colors) and the
"parser" is a color rule. That stub stands in for BiSeNet exactly where its real
checkpoint would plug in (the 79999_iter.pth converter exists —
tools/convert_bisenet.py; the weight file is asset-blocked in this image): the
demo exercises everything downstream of the parse, which is the fallback path
under test.

Usage: python scripts/demo_raw.py [--cpu] [--out artifacts/raw_demo]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# painted colors → 14-class parse (brow/eye split into l/r by x below)
PALETTE = {
    0: (230, 240, 250),   # background
    1: (224, 172, 138),   # skin
    2: (60, 40, 20),      # brows (split → 2/3)
    4: (40, 60, 160),     # eyes (split → 4/5)
    6: (240, 190, 150),   # nose
    7: (190, 40, 60),     # upper lip
    9: (150, 20, 40),     # lower lip
}


def paint_face(h=320, w=300, skin=(224, 172, 138), lip=((190, 40, 60), (150, 20, 40)),
               shift=0.0):
    """Analytic face: ellipse features at known positions; returns uint8 [h,w,3]."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = PALETTE[0]

    def ell(cy, cx, ry, rx):
        return ((yy - cy * h) / (ry * h)) ** 2 + ((xx - (cx + shift) * w) / (rx * w)) ** 2 <= 1

    img[ell(0.52, 0.50, 0.40, 0.33)] = skin
    img[ell(0.36, 0.38, 0.015, 0.07)] = PALETTE[2]
    img[ell(0.36, 0.62, 0.015, 0.07)] = PALETTE[2]
    img[ell(0.43, 0.38, 0.022, 0.055)] = PALETTE[4]
    img[ell(0.43, 0.62, 0.022, 0.055)] = PALETTE[4]
    img[ell(0.54, 0.50, 0.09, 0.04)] = PALETTE[6]
    mouth = ell(0.70, 0.50, 0.05, 0.12)
    img[mouth & (yy <= 0.70 * h)] = lip[0]
    img[mouth & (yy > 0.70 * h)] = lip[1]
    return img


class ColorRuleParser:
    """Nearest-palette-color classifier at 512² — BiSeNet stand-in (see module
    docstring). Splits brow/eye classes into left/right halves like the 14-class
    palette expects (2/3 brows, 4/5 eyes)."""

    def __init__(self, skins):
        self.entries = [(cls, np.array(rgb, np.float64))
                        for cls, rgb in PALETTE.items() if cls != 1]
        self.entries += [(1, np.array(s, np.float64)) for s in skins]

    def parse(self, image):
        assert image.shape == (512, 512, 3)
        x = image.astype(np.float64)
        d = np.stack([((x - rgb) ** 2).sum(-1) for _, rgb in self.entries])
        seg = np.array([cls for cls, _ in self.entries], np.int32)[d.argmin(0)]
        face_x = np.nonzero(seg == 1)[1]
        if face_x.size:
            mid = (face_x.min() + face_x.max()) / 2.0
            xs = np.arange(512)[None, :]
            for base in (2, 4):  # brows, eyes → left keeps base, right = base+1
                part = seg == base
                seg[part & (xs >= mid)] = base + 1
        return seg


def overlay_lms(img01, lms, size):
    """img [-1,1] float → uint8 with green landmark dots."""
    u8 = np.clip((img01 + 1) * 127.5, 0, 255).astype(np.uint8).copy()
    for y, x in lms:
        y0, y1 = max(0, y - 1), min(size, y + 2)
        x0, x1 = max(0, x - 1), min(size, x + 2)
        u8[y0:y1, x0:x1] = (0, 255, 40)
    return u8


def seg_viz(seg):
    out = np.zeros(seg.shape + (3,), np.uint8)
    viz = dict(PALETTE)
    viz[3], viz[5] = (110, 80, 40), (90, 110, 220)  # right brow/eye shades
    for cls, rgb in viz.items():
        out[seg == cls] = rgb
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts/raw_demo")
    ap.add_argument("--ddim-steps", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from makeupdiffuse_tpu.api import transfer_artifacts
    from makeupdiffuse_tpu.config import tiny_test_config
    from makeupdiffuse_tpu.core.ddim import DDIMTables
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.data.preprocess import FacePipeline
    from makeupdiffuse_tpu.models.clip_text import precompute_prompt_bank
    from makeupdiffuse_tpu.models.controlled_ldm import init_model
    from makeupdiffuse_tpu.teacher.pgt import PGTTeacher
    from makeupdiffuse_tpu.training.logging import make_grid

    os.makedirs(args.out, exist_ok=True)

    # two raw "photos": source (light skin, red lips) vs reference makeup
    # (darker skin, plum lips), slightly shifted so the crops differ
    src_raw = paint_face(skin=(224, 172, 138), lip=((190, 40, 60), (150, 20, 40)))
    ref_raw = paint_face(skin=(198, 140, 110), lip=((120, 30, 120), (90, 20, 90)),
                         shift=0.03)
    parser = ColorRuleParser(skins=[(224, 172, 138), (198, 140, 110)])

    cfg = tiny_test_config()
    m = cfg.model
    pipe = FacePipeline(face_parser=parser, parse_fallback=True, img_size=m.image_size)

    outs = {}
    for tag, raw in (("src", src_raw), ("ref", ref_raw)):
        got = pipe(raw)
        assert got is not None, f"pipeline found no face in the {tag} image"
        img, mask4, diff, lms = got
        outs[tag] = dict(img=img, mask4=mask4, diff=diff, lms=lms)
        Image.fromarray(raw).save(os.path.join(args.out, f"{tag}_raw.png"))
        seg512 = parser.parse(np.asarray(
            Image.fromarray(raw).resize((512, 512), Image.BILINEAR)))
        Image.fromarray(seg_viz(seg512)).save(
            os.path.join(args.out, f"{tag}_parse.png"))
        Image.fromarray(overlay_lms(img, lms, m.image_size)).save(
            os.path.join(args.out, f"{tag}_landmarks.png"))
        print(f"{tag}: mask classes {sorted(np.unique(mask4.argmax(-1)))}, "
              f"lms y-range [{lms[:,0].min()},{lms[:,0].max()}]", flush=True)

    # the product call on the pipeline outputs (tiny from-scratch model — the
    # DEMO is the preprocessing path; artifact quality needs trained weights)
    model, params = init_model(m, jax.random.PRNGKey(0))
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=args.ddim_steps)
    enc = lambda p, i: model.apply(p, i, method=model.encode_text)
    bank = precompute_prompt_bank(enc, params, max_length=m.clip.max_length)
    teacher = PGTTeacher()

    s, r = outs["src"], outs["ref"]
    image_s = jnp.asarray(s["img"])[None]
    image_r = jnp.asarray(r["img"])[None]
    pgt = teacher(image_s, image_r, jnp.asarray(s["mask4"])[None],
                  jnp.asarray(r["mask4"])[None])
    arts = transfer_artifacts(
        model, params, sched, tables, pgt,
        (image_s + 1) / 2, (image_r + 1) / 2,
        jnp.asarray(bank["makeup transfer"])[None],
        jnp.asarray(bank[""])[None],
        jax.random.PRNGKey(0), t_min=m.t_min, cfg_scale=9.0)

    row = [s["img"], r["img"], np.asarray(pgt)[0]]
    row += [np.asarray(arts[k])[0] for k in ("reconstruction", "samples",
                                             "samples_cfg_scale_9.00")
            if k in arts]
    tiles = np.clip(np.stack(row), -1, 1)
    grid = make_grid(((tiles + 1) * 127.5).astype(np.uint8), nrow=len(row))
    Image.fromarray(grid).save(os.path.join(args.out, "transfer_grid.png"))
    print(f"wrote {args.out}: raw/parse/landmarks per side + transfer_grid.png "
          f"(cols: src, ref, teacher PGT, {[k for k in ('reconstruction','samples','samples_cfg_scale_9.00') if k in arts]})")


if __name__ == "__main__":
    main()
