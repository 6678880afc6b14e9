"""Landmark-fallback error on rich geometry + downstream sensitivity (VERDICT r4 #7).

The repo's 68-pt landmarks come from a parse-derived fallback
(data/faceparse.landmarks_from_parse) instead of the reference's dlib detector
(/root/reference/diffdata/preprocessing.py:92-94,159-166 — asset absent in this
image). tests/test_faceparse.py pins pixel bounds on AXIS-ALIGNED analytic
geometry; this tool extends the evidence two ways:

  1. ERROR vs richer geometry: rotated / offset / occluded analytic faces, with
     feature points (eye/brow/mouth centers, mouth corners, chin, nose bottom)
     computed from the true rotated shapes — per-case RMS pixel error of the
     fallback's corresponding landmark aggregates.
  2. DOWNSTREAM sensitivity: what a landmark error of the measured size does to
     the product —
       * the PGT teacher (production, teacher_type ELEGANT_PGT) ignores lms
         entirely (teacher/pgt.py:136-143): asserted bit-equal under
         perturbation → the fallback is exactly immaterial there;
       * the EleGANt-style teacher consumes lms only through the 136-ch diff
         field (data/preprocess.diff_field → MakeupAttention/SowAttention
         positional projections): PSNR between teacher outputs with clean vs
         ε-perturbed landmarks, for ε at the measured RMS and 2×/4×, with a
         1-px image-shift row for scale.

Prints one JSON line; the table lands in PARITY.md.
Usage: python tools/lms_sensitivity.py [--cpu] [--size 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import numpy as np


def build_parse(s, theta_deg=0.0, dy=0.0, dx=0.0, occlude=False):
    """Analytic 14-class parse with the WHOLE face rotated by theta about the
    image center and offset by (dy, dx) fractions; optional occlusion wipes a
    vertical strip over the left eye/brow (hair/hand failure mode). Returns
    (seg, truth) where truth maps feature names → (y, x) ground truth computed
    from the true rotated shapes."""
    seg = np.zeros((s, s), np.int32)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float64)
    th = np.deg2rad(theta_deg)
    # rotate image coords back into the face frame around the image center
    yc, xc = yy - s / 2, xx - s / 2
    yf = np.cos(th) * yc + np.sin(th) * xc + s / 2 - dy * s
    xf = -np.sin(th) * yc + np.cos(th) * xc + s / 2 - dx * s

    parts = [  # (label, cy, cx, ry, rx) in the face frame, fractions of s
        (1, 0.52, 0.50, 0.40, 0.30),   # face oval
        (2, 0.36, 0.38, 0.012, 0.060),  # left brow
        (3, 0.36, 0.62, 0.012, 0.060),  # right brow
        (4, 0.43, 0.38, 0.020, 0.050),  # left eye
        (5, 0.43, 0.62, 0.020, 0.050),  # right eye
        (6, 0.52, 0.50, 0.090, 0.035),  # nose
    ]
    masks = {}
    for lab, cy, cx, ry, rx in parts:
        m = ((yf - cy * s) / (ry * s)) ** 2 + ((xf - cx * s) / (rx * s)) ** 2 <= 1
        masks[lab] = m
        seg[m] = lab
    mouth = ((yf - 0.70 * s) / (0.045 * s)) ** 2 + \
            ((xf - 0.50 * s) / (0.110 * s)) ** 2 <= 1
    seg[mouth & (yf <= 0.70 * s)] = 7
    seg[mouth & (yf > 0.70 * s)] = 9
    masks["mouth"] = mouth

    def img_frame(cy, cx):  # face-frame fraction coords → image-frame pixels
        y0, x0 = (cy + dy) * s - s / 2, (cx + dx) * s - s / 2
        return (np.cos(th) * y0 - np.sin(th) * x0 + s / 2,
                np.sin(th) * y0 + np.cos(th) * x0 + s / 2)

    def lowest(mask):  # image-frame lowest point of a true mask (y max)
        ys, xs = np.nonzero(mask)
        i = np.argmax(ys)
        sel = ys == ys[i]
        return (float(ys[i]), float(np.mean(xs[sel])))

    def extreme_x(mask, side):  # image-frame leftmost/rightmost point
        ys, xs = np.nonzero(mask)
        v = xs.min() if side == "left" else xs.max()
        sel = xs == v
        return (float(np.mean(ys[sel])), float(v))

    truth = {
        "eye_l_center": img_frame(0.43, 0.38),
        "eye_r_center": img_frame(0.43, 0.62),
        "brow_l_center": img_frame(0.36, 0.38),
        "brow_r_center": img_frame(0.36, 0.62),
        "mouth_center": img_frame(0.70, 0.50),
        "mouth_left": extreme_x(mouth, "left"),
        "mouth_right": extreme_x(mouth, "right"),
        "chin": lowest(masks[1]),
        "nose_bottom": lowest(masks[6]),
    }
    if occlude:
        x_eye = int(truth["eye_l_center"][1])
        seg[:, max(0, x_eye - int(0.08 * s)):x_eye + int(0.08 * s)] = 0
    return seg, truth


def fallback_points(L):
    """The fallback landmarks' aggregates matching build_parse's truth keys."""
    return {
        "eye_l_center": L[36:42].mean(0), "eye_r_center": L[42:48].mean(0),
        "brow_l_center": L[17:22].mean(0), "brow_r_center": L[22:27].mean(0),
        "mouth_center": L[48:60].mean(0),
        "mouth_left": L[48], "mouth_right": L[54],
        "chin": L[8], "nose_bottom": L[33],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--teacher-ch", type=int, default=32)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from makeupdiffuse_tpu.data.faceparse import landmarks_from_parse
    from makeupdiffuse_tpu.data.preprocess import diff_field
    from makeupdiffuse_tpu.data.synthetic import ParametricFaceDataset
    from makeupdiffuse_tpu.teacher.elegant import EleGANtTeacher
    from makeupdiffuse_tpu.teacher.pgt import PGTTeacher

    s = args.size
    # ---- part 1: fallback error on rotated / offset / occluded geometry ------
    cases = [
        ("axis_aligned", dict()),
        ("rot8", dict(theta_deg=8)),
        ("rot15", dict(theta_deg=15)),
        ("rot25", dict(theta_deg=25)),
        ("offset", dict(dy=0.06, dx=0.08)),
        ("rot15_offset", dict(theta_deg=15, dy=0.06, dx=0.08)),
        ("occluded_eye", dict(occlude=True)),
        ("rot15_occluded", dict(theta_deg=15, occlude=True)),
    ]
    errors = {}
    for name, kw in cases:
        seg, truth = build_parse(s, **kw)
        pts = fallback_points(landmarks_from_parse(seg))
        per = {k: float(np.hypot(*(np.asarray(pts[k]) - np.asarray(truth[k]))))
               for k in truth}
        rms = float(np.sqrt(np.mean([v ** 2 for v in per.values()])))
        errors[name] = {"rms_px": round(rms, 2),
                        "rms_frac": round(rms / s, 4),
                        "worst": max(per, key=per.get),
                        "worst_px": round(max(per.values()), 2)}
        print(f"# {name:16s} rms {rms:6.2f} px ({rms/s*100:.2f}% of {s})  "
              f"worst {errors[name]['worst']} {errors[name]['worst_px']} px",
              flush=True)

    clean_rms = errors["axis_aligned"]["rms_px"]
    rot_rms = errors["rot15"]["rms_px"]

    # ---- part 2: downstream sensitivity --------------------------------------
    ds = ParametricFaceDataset(size=s, seed=11)
    pair = ds.pair(0)
    src, ref = pair["src"], pair["ref"]
    seg_s, _ = build_parse(s)
    seg_r, _ = build_parse(s, theta_deg=5, dx=0.02)
    lms_s = landmarks_from_parse(seg_s)
    lms_r = landmarks_from_parse(seg_r)
    img_s = jnp.asarray(src["img"][None])
    img_r = jnp.asarray(ref["img"][None])
    m_s = jnp.asarray(src["mask_full"][None])
    m_r = jnp.asarray(ref["mask_full"][None])

    # PGT teacher: lms are accepted-and-unused — bit-equal by construction
    pgt = PGTTeacher()
    rng = np.random.RandomState(0)
    out_a = np.asarray(pgt(img_s, img_r, m_s, m_r, lms_s=lms_s, lms_r=lms_r))
    out_b = np.asarray(pgt(img_s, img_r, m_s, m_r,
                           lms_s=lms_s + rng.normal(0, 50, lms_s.shape),
                           lms_r=lms_r))
    pgt_bit_equal = bool(np.array_equal(out_a, out_b))
    print(f"# PGT teacher bit-equal under 50-px landmark noise: {pgt_bit_equal}",
          flush=True)

    # EleGANt teacher: lms → diff field → attention positional projections.
    # The residual head is zero-init (identity teacher) — perturb every all-zero
    # kernel so the diff-field pathway actually reaches the output.
    teacher = EleGANtTeacher(ch=args.teacher_ch, image_size=s)
    leaves, td = jax.tree_util.tree_flatten(teacher.params)
    kz = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [0.05 * jax.random.normal(k, l.shape, l.dtype)
              if (l.ndim >= 2 and not jnp.any(l).item()) else l
              for l, k in zip(leaves, kz)]
    teacher.params = td.unflatten(leaves)

    def run(lms_s_used, img_s_used=img_s):
        d_s = jnp.asarray(diff_field(lms_s_used, s)[None])
        d_r = jnp.asarray(diff_field(lms_r, s)[None])
        return np.asarray(teacher.transfer(
            img_s_used, img_r, m_s, m_r, d_s, d_r), np.float32)

    base = run(lms_s)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(float(10 * np.log10(4.0 / max(mse, 1e-12))), 2)

    sens = {}
    for label, eps in (("eps_measured", rot_rms), ("eps_x2", 2 * rot_rms),
                       ("eps_x4", 4 * rot_rms), ("eps_clean", clean_rms)):
        noisy = lms_s + rng.normal(0, eps / np.sqrt(2), lms_s.shape)
        sens[label] = {"eps_px": round(float(eps), 2),
                       "teacher_psnr_db": psnr(base, run(noisy))}
    # scale row: what a mere 1-px source-image shift does to the same teacher
    shifted = jnp.roll(img_s, 1, axis=2)
    sens["image_shift_1px"] = {"teacher_psnr_db": psnr(base, run(lms_s, shifted))}

    for k, v in sens.items():
        print(f"# sensitivity {k:16s} {v}", flush=True)

    print(json.dumps({
        "lms_sensitivity": {"size": s, "errors": errors,
                            "pgt_bit_equal_under_lms_noise": pgt_bit_equal,
                            "teacher_sensitivity": sens}}), flush=True)


if __name__ == "__main__":
    main()
