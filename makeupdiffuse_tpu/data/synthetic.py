"""Synthetic sanity datasets — the reference's Fill50k pattern, generated in-process.

Capability parity: the ``Fill50k*`` family and gray-face colorization variant the
reference uses as fixtures to validate the control pathway independently of faces
(/root/reference/diffdata/datasets.py:221-262,362-493 and MT_ControlNET_V3 :36-89;
SURVEY.md §4 calls these "the closest thing to fake backends"). Instead of reading a
50k-image dump, we draw the circles procedurally — same task: hint = circle outline
on gray, target = filled colored circle.

Also provides synthetic face-like batches for the makeup trainer so the full
composite-loss path can run end-to-end without the MT-Dataset on disk.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class FillCirclesDataset:
    """hint: circle geometry rendering; jpg: colored fill — ControlNet toy task."""

    def __init__(self, size: int = 256, length: int = 1000, seed: int = 0):
        self.size = size
        self.length = length
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s]
        cy, cx = rng.randint(s // 4, 3 * s // 4, size=2)
        r = rng.randint(s // 16, s // 4)
        dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        outline = (np.abs(dist - r) < 2).astype(np.float32)
        fill = (dist <= r).astype(np.float32)
        color = rng.uniform(0.1, 1, size=3).astype(np.float32)
        # The hint fully determines the target (outline carries the fill color;
        # background is fixed gray) so sample-vs-target error measures ONLY what
        # the control pathway learned — with unhinted random colors the metric
        # floor is the ~0.67 MSE of two independent uniform colors and nothing a
        # perfect model does can move it.
        bg = np.full(3, 0.5, np.float32)
        hint = outline[..., None] * color
        target = fill[..., None] * color + (1 - fill[..., None]) * bg
        return dict(jpg=(target * 2 - 1).astype(np.float32), hint=hint.astype(np.float32),
                    txt="a colored circle")


def _dilate(mask: np.ndarray, margin: int) -> np.ndarray:
    """Binary dilation by `margin` px with a square window — numpy twin of
    ops.masks.expand_area (max-pool), so region geometry here matches what the
    PGT teacher and the region loss compute on-device."""
    if margin <= 0:
        return mask

    def axis_max(m, axis):  # Chebyshev-ball dilation is separable
        pad_shape = list(m.shape)
        pad_shape[axis] += 2 * margin
        pad = np.zeros(pad_shape, m.dtype)
        sl = [slice(None)] * m.ndim
        sl[axis] = slice(margin, margin + m.shape[axis])
        pad[tuple(sl)] = m
        out = np.zeros_like(m)
        for d in range(2 * margin + 1):
            sl[axis] = slice(d, d + m.shape[axis])
            np.maximum(out, pad[tuple(sl)], out)
        return out

    return axis_max(axis_max(mask, 0), 1)


def _ellipse(yy, xx, cy, cx, ry, rx):
    return (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0).astype(np.float32)


class ParametricFaceDataset:
    """Parametric 'faces' with exact parse maps and known region colors — the
    substrate for the makeup-recipe learning proof (scripts/learnproof_makeup.py).

    Each item is a (nonmakeup, makeup) pair of cartoon faces: an elliptical face
    (skin), two eyes, a mouth, on a flat background. Geometry (= identity) is
    random per face; the MAKEUP face additionally carries saturated random lip /
    eyeshadow / skin-tint colors, with the eyeshadow painted on exactly the
    region the PGT teacher histogram-matches (``expand_area(eyes, eye_margin) ∩
    face``, teacher/pgt.py:46-56) so the expected post-transfer color of every
    region is a known constant. Mirrors the MT dataset's role
    (/root/reference/diffdata/datasets.py:591-665) with analytically known
    ground truth; small per-region texture noise keeps the histograms
    non-degenerate for the matcher."""

    NOISE = 0.02

    def __init__(self, size: int = 64, eye_margin: int = 12, lip_margin: int = 4,
                 seed: int = 0):
        self.size, self.eye_margin, self.lip_margin, self.seed = (
            size, eye_margin, lip_margin, seed)

    def face(self, rng: np.random.RandomState, makeup: bool) -> Dict[str, np.ndarray]:
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        # geometry = identity
        cy, cx = rng.uniform(0.48, 0.54) * s, rng.uniform(0.46, 0.54) * s
        ry, rx = rng.uniform(0.32, 0.40) * s, rng.uniform(0.26, 0.33) * s
        face = _ellipse(yy, xx, cy, cx, ry, rx)
        lip = _ellipse(yy, xx, cy + 0.52 * ry, cx, 0.16 * ry, 0.42 * rx) * face
        eye_l = _ellipse(yy, xx, cy - 0.30 * ry, cx - 0.45 * rx,
                         0.11 * ry, 0.17 * rx) * face
        eye_r = _ellipse(yy, xx, cy - 0.30 * ry, cx + 0.45 * rx,
                         0.11 * ry, 0.17 * rx) * face
        eyes = np.clip(eye_l + eye_r, 0, 1)
        shadow = _dilate(eyes, self.eye_margin) * face * (1 - eyes)
        lip = lip * (1 - shadow)  # teacher regions are disjoint the same way
        if makeup:
            c_skin = rng.uniform(0.2, 0.9, 3).astype(np.float32)
            c_lip = rng.uniform(0.2, 0.9, 3).astype(np.float32)
            c_shadow = rng.uniform(0.2, 0.9, 3).astype(np.float32)
        else:  # neutral, narrow-band "no makeup" palette
            c_skin = np.float32([0.75, 0.62, 0.52]) + rng.uniform(-0.05, 0.05, 3)
            c_lip = np.float32([0.72, 0.50, 0.48]) + rng.uniform(-0.03, 0.03, 3)
            c_shadow = c_skin  # eyeshadow region is bare skin
        c_bg = np.full(3, rng.uniform(0.35, 0.65), np.float32)
        c_eye = np.full(3, 0.08, np.float32)  # dark iris, both faces
        img = np.empty((s, s, 3), np.float32)
        img[:] = c_bg
        skin = face * (1 - lip) * (1 - eyes) * (1 - shadow)
        for m, c in ((skin, c_skin), (shadow, c_shadow), (lip, c_lip), (eyes, c_eye)):
            img += m[..., None] * (c - img)
        img += rng.uniform(-self.NOISE, self.NOISE, img.shape).astype(np.float32)
        seg = (face * 1 + lip * 7 + eyes * 4).astype(np.int32)  # bg stays 0
        # mask_full ch1 is the parse "skin" analog: BiSeNet classes are mutually
        # exclusive, so the reference's face channel (classes {1,6}+brows,
        # preprocess.mask_channels) NEVER contains lip or eye pixels. Painting
        # the full ellipse here made the PGT's final skin pass overwrite the
        # lip match (teacher/pgt.py:72-75 composes skin last), capping the
        # learnproof lip fidelity at the untrained level.
        face_skin = face * (1 - lip) * (1 - eyes)
        return dict(
            img=np.clip(img * 2 - 1, -1, 1).astype(np.float32),
            mask_full=np.stack([lip, face_skin, eye_l, eye_r], -1).astype(np.float32),
            seg=seg, region_lip=lip, region_shadow=shadow, region_skin=skin,
            colors=np.stack([c_lip, c_shadow, c_skin]),  # [3 regions, rgb] in [0,1]
        )

    def pair(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 99991 + idx)
        return {"src": self.face(rng, makeup=False),
                "ref": self.face(rng, makeup=True)}


def synthetic_face_batch(batch: int, img_size: int, context_dim: int,
                         max_length: int = 77, seed: int = 0,
                         with_diff: bool = True) -> Dict[str, np.ndarray]:
    """A full composite-loss batch with plausible structure: oval face masks, random
    seg labels, consistent src/ref ranges — for e2e smoke/bench without MT-Dataset.

    ``with_diff=False`` skips the 136-ch landmark diff fields — they are only
    consumed by teacher_type ELEGANT (teacher/base.TARGET_BATCH_KEYS) and
    dominate the host cost of this generator (~3.5 s/batch at 256² on one core,
    vs ~0.3 s without)."""
    rng = np.random.RandomState(seed)
    H = img_size
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    cy, cx = H / 2, H / 2

    def face_mask(shift):
        d = ((yy - cy - shift) / (0.35 * H)) ** 2 + ((xx - cx) / (0.28 * H)) ** 2
        return (d < 1).astype(np.float32)

    def one(seed2):
        r = np.random.RandomState(seed2)
        img = r.uniform(-1, 1, (H, H, 3)).astype(np.float32) * 0.3 + \
            face_mask(0)[..., None] * r.uniform(-0.3, 0.3, 3).astype(np.float32)
        face = face_mask(0)
        lip = np.zeros((H, H), np.float32)
        lip[int(0.65 * H):int(0.72 * H), int(0.4 * H):int(0.6 * H)] = 1
        eye_l = np.zeros((H, H), np.float32)
        eye_l[int(0.4 * H):int(0.44 * H), int(0.3 * H):int(0.42 * H)] = 1
        eye_r = np.zeros((H, H), np.float32)
        eye_r[int(0.4 * H):int(0.44 * H), int(0.58 * H):int(0.7 * H)] = 1
        mask_full = np.stack([lip, face, eye_l, eye_r], -1)
        seg = (face * 1 + lip * 8 + eye_l * 5 + eye_r * 0).astype(np.int32)
        lms = np.stack([r.uniform(0.3 * H, 0.7 * H, 68),
                        r.uniform(0.3 * H, 0.7 * H, 68)], -1).astype(np.float32)
        return np.clip(img, -1, 1), mask_full, seg, lms

    from .preprocess import diff_field

    items = []
    for i in range(batch):
        items.append(one(seed * 7919 + 2 * i) + one(seed * 7919 + 2 * i + 1))

    stack = lambda j: np.stack([it[j] for it in items])
    s_img, s_mask, s_seg, s_lms = stack(0), stack(1), stack(2), stack(3)
    r_img, r_mask, r_seg, r_lms = stack(4), stack(5), stack(6), stack(7)
    pgt = np.clip(0.5 * s_img + 0.5 * r_img, -1, 1)
    return dict(
        src_img=((s_img + 1) / 2).astype(np.float32),
        ref_img=((r_img + 1) / 2).astype(np.float32),
        nonmakeup_img=s_img,
        makeup_img=r_img,
        nonmakeup_seg=s_seg,
        makeup_seg=r_seg,
        mask_s_full=s_mask.astype(np.float32),
        mask_r_full=r_mask.astype(np.float32),
        # landmark tuples for the GAN teachers (EleGANt conditioning)
        lms_s=s_lms, lms_r=r_lms,
        **(dict(diff_s=np.stack([diff_field(l, H) for l in s_lms]),
                diff_r=np.stack([diff_field(l, H) for l in r_lms]))
          if with_diff else {}),
        pgt_sr=pgt.astype(np.float32),
        makeup_pgt=pgt.astype(np.float32),
        context=rng.normal(size=(batch, max_length, context_dim)).astype(np.float32),
    )
