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


def synthetic_face_batch(batch: int, img_size: int, context_dim: int,
                         max_length: int = 77, seed: int = 0) -> Dict[str, np.ndarray]:
    """A full composite-loss batch with plausible structure: oval face masks, random
    seg labels, consistent src/ref ranges — for e2e smoke/bench without MT-Dataset."""
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
        diff_s=np.stack([diff_field(l, H) for l in s_lms]),
        diff_r=np.stack([diff_field(l, H) for l in r_lms]),
        pgt_sr=pgt.astype(np.float32),
        makeup_pgt=pgt.astype(np.float32),
        context=rng.normal(size=(batch, max_length, context_dim)).astype(np.float32),
    )
