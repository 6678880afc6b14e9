"""Segmentation-mask ops: class→component mapping, dilation, background compose.

Capability parity:
  * ``expand_area`` (EleGANt pseudo_gt, used at
    /root/reference/diffmk/makeup_diffuse.py:350) → max-pool dilation.
  * SCGAN seg-class remap lip{9,13}/skin{4,8,10}/eyes{6,1} with rebound_box
    (/root/reference/diffmk/teacher.py:25-80).
  * PreProcess.mask_process 4-channel [lip, face(+brows), eye_l, eye_r]
    (/root/reference/diffdata/preprocessing.py:55-73).
  * background selection seg∈{0,11,12} for the background loss
    (/root/reference/diffmk/makeup_diffuse.py:59-66) and the Fixbackground compose
    (/root/reference/diffmk/makeup_teacher.py:248-263).

All fixed-shape, jittable; the reference's nonzero-index bounding boxes become
mask-weighted min/max reductions.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# face-region palette, /root/reference/diffdata/datasets.py:19-33
AREA_INDEX = {
    "background": 0, "face": 1, "left-eyebrow": 2, "right-eyebrow": 3,
    "left-eye": 4, "right-eye": 5, "nose": 6, "upper-lip": 7, "teeth": 8,
    "under-lip": 9, "hair": 10, "left-ear": 11, "right-ear": 12, "neck": 13,
}


def class_mask(seg: jnp.ndarray, classes: Sequence[int]) -> jnp.ndarray:
    """Float {0,1} mask of pixels whose integer class is in `classes`."""
    m = jnp.zeros(seg.shape, jnp.float32)
    for c in classes:
        m = m + (seg == c).astype(jnp.float32)
    return jnp.clip(m, 0.0, 1.0)


def background_mask(seg: jnp.ndarray) -> jnp.ndarray:
    """seg∈{0,11,12} (background/teeth/hair in the scgan_segs labeling used by the
    background loss, makeup_diffuse.py:60-64)."""
    return class_mask(seg, (0, 11, 12))


def expand_area(mask: jnp.ndarray, margin: int) -> jnp.ndarray:
    """Binary dilation by `margin` pixels — max-pool with a (2m+1)² window.

    mask: [..., H, W] (trailing two dims are spatial)."""
    if margin <= 0:
        return mask
    k = 2 * margin + 1
    nd = mask.ndim
    window = (1,) * (nd - 2) + (k, k)
    strides = (1,) * nd
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, window, strides, padding="SAME"
    ).astype(mask.dtype)


def preprocess_mask_channels(
    mask: jnp.ndarray,
    lip_class=(7, 9),
    face_class=(1, 6),
    eyebrow_class=(2, 3),
    eye_class=(4, 5),
) -> jnp.ndarray:
    """BiSeNet face-parse classes → 4-channel [lip, face(+brows), eye_l, eye_r]
    stacked on the LAST axis (NHWC convention). Parity: preprocessing.py:55-73."""
    lip = class_mask(mask, lip_class)
    face = class_mask(mask, tuple(face_class) + tuple(eyebrow_class))
    eye_l = class_mask(mask, (eye_class[0],))
    eye_r = class_mask(mask, (eye_class[1],))
    return jnp.stack([lip, face, eye_l, eye_r], axis=-1)


def mask_bbox(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(x_min, x_max, y_min, y_max) of nonzero pixels, static-shape (big sentinels
    when the mask is empty). mask: [H, W]."""
    h, w = mask.shape[-2], mask.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    on = mask > 0
    big = jnp.int32(10**6)
    x_min = jnp.min(jnp.where(on, rows, big))
    x_max = jnp.max(jnp.where(on, rows, -big))
    y_min = jnp.min(jnp.where(on, cols, big))
    y_max = jnp.max(jnp.where(on, cols, -big))
    return x_min, x_max, y_min, y_max


def rebound_box(mask: jnp.ndarray, face_mask: jnp.ndarray, margin: int = 5) -> jnp.ndarray:
    """SCGAN's rebound_box (teacher.py:25-44): replace the mask inside the
    margin-expanded bounding box of its own support with the face mask there.

    mask, face_mask: [H, W] {0,1}. Static-shape via iota range tests."""
    x_min, x_max, y_min, y_max = mask_bbox(mask)
    h, w = mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_box = (
        (rows >= x_min - margin) & (rows <= x_max + margin)
        & (cols >= y_min - margin) & (cols <= y_max + margin)
    )
    return jnp.where(in_box, face_mask, mask)


def scgan_component_masks(seg: jnp.ndarray, apply_rebound: bool = False) -> jnp.ndarray:
    """scgan_segs classes → 3-channel [lip, skin, eyes] (last axis).

    Parity: Teacher_SCGAN.set_input (teacher.py:55-78): lip {9,13}, skin {4,8,10},
    eyes {6,1}; the reference rebound-boxes the *makeup* eye masks against face
    {4,8}. seg: [H, W] int."""
    lip = class_mask(seg, (9, 13))
    skin = class_mask(seg, (4, 8, 10))
    eye_l = class_mask(seg, (6,))
    eye_r = class_mask(seg, (1,))
    if apply_rebound:
        face = class_mask(seg, (4, 8))
        eye_l = rebound_box(eye_l, face)
        eye_r = rebound_box(eye_r, face)
    eyes = jnp.clip(eye_l + eye_r, 0.0, 1.0)
    return jnp.stack([lip, skin, eyes], axis=-1)


def fix_background(
    target: jnp.ndarray,  # [B,H,W,3] teacher output in [-1,1]
    nonmakeup_img: jnp.ndarray,  # [B,H,W,3] in [-1,1]
    nonmakeup_seg: jnp.ndarray,  # [B,H,W] int classes
) -> jnp.ndarray:
    """Paste the source's background/teeth/hair back over the teacher output
    (Fixbackground.get_target, makeup_teacher.py:248-263)."""
    bk = background_mask(nonmakeup_seg)[..., None]
    out = bk * ((nonmakeup_img + 1) / 2) + (1 - bk) * ((target + 1) / 2)
    return jnp.clip(out * 2.0 - 1.0, -1.0, 1.0)
