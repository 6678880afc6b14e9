"""Teacher interface + dispatch — the reference's teacher_type switch as a registry.

Capability parity: BaseDoubleControlModel.get_target's four-way dispatch
(SCGAN / ELEGANT / ELEGANT_PGT / KEEP, /root/reference/diffmk/diffusion_makeup.py:51-94)
plus the always-computed `makeup_pgt` side channel used by the background/makeup
losses (:87-93).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Protocol, Sequence

import jax.numpy as jnp

class Teacher(Protocol):
    """(image_s, image_r, mask_s_full, mask_r_full, lms_s, lms_r) → preliminary
    transfer x_p, [B,H,W,3] in [-1,1]."""

    def __call__(self, image_s, image_r, mask_s_full, mask_r_full, lms_s=None, lms_r=None):
        ...


class SourceTeacher:
    """teacher_type 'KEEP': identity (/root/reference/diffmk/teacher.py:143-148)."""

    def __call__(self, image_s, image_r=None, mask_s_full=None, mask_r_full=None,
                 lms_s=None, lms_r=None):
        return image_s


_REGISTRY: Dict[str, Callable[..., Teacher]] = {}


def register_teacher(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


def build_teacher(teacher_type: str, **kwargs) -> Teacher:
    """Factory over the reference's teacher_type strings."""
    if teacher_type == "KEEP":
        return SourceTeacher()
    if teacher_type in ("ELEGANT_PGT",):
        from .pgt import PGTTeacher
        return PGTTeacher(**kwargs)
    if teacher_type == "ELEGANT":
        # converted real-topology weights (tools/convert_elegant) → the faithful
        # sow-pyramid twin; otherwise the TPU-first re-architecture default
        if kwargs.pop("sow", False) or "sow_params" in kwargs:
            from .elegant_sow import ElegantSowTeacher
            return ElegantSowTeacher(kwargs.pop("sow_params"), **kwargs)
        from .elegant import EleGANtTeacher
        return EleGANtTeacher(**kwargs)
    if teacher_type == "SCGAN":
        # converted real-topology G.pth weights (tools/convert_scgen) → the
        # faithful MUNIT-topology twin; otherwise the TPU-first default
        if "munit_params" in kwargs:
            from .scgen_munit import SCGenMunitTeacher
            return SCGenMunitTeacher(kwargs.pop("munit_params"), **kwargs)
        from .scgan import SCGanTeacher
        return SCGanTeacher(**kwargs)
    if teacher_type in _REGISTRY:
        return _REGISTRY[teacher_type](**kwargs)
    raise ValueError(f"unknown teacher_type {teacher_type!r}")


# batch keys each teacher_type's target_fn consumes — the jit signature is the
# filtered dict, so it stays stable across steps
TARGET_BATCH_KEYS: Dict[str, Sequence[str]] = {
    "ELEGANT_PGT": ("nonmakeup_img", "makeup_img", "mask_s_full", "mask_r_full",
                    "nonmakeup_seg"),
    "KEEP": ("nonmakeup_img", "makeup_img", "mask_s_full", "mask_r_full",
             "nonmakeup_seg"),
    "ELEGANT": ("nonmakeup_img", "makeup_img", "mask_s_full", "mask_r_full",
                "diff_s", "diff_r", "nonmakeup_seg"),
    "SCGAN": ("nonmakeup_img", "makeup_img", "mask_s_full", "mask_r_full",
              "makeup_seg", "nonmakeup_seg"),
}


def make_target_fn(teacher_type: str, teacher: Optional[object] = None,
                   is_fixbkgrd: bool = False) -> Callable:
    """Build the jittable get_target dispatch — BaseDoubleControlModel.get_target
    parity (/root/reference/diffmk/diffusion_makeup.py:51-94):

      SCGAN       target = teacher(makeup, nonmakeup, segs), clamped (:57-59)
      ELEGANT     target = teacher.transfer(image_s, image_r, masks, diffs, lms) (:60-68)
      ELEGANT_PGT target = pgt_model(...) — the histogram compose itself (:69-77)
      KEEP        target = keep_source(image_s) (:78-86)

    plus the always-computed `makeup_pgt` side channel for the background/makeup
    losses (:87-93), and the optional Fixbackground paste of the source's
    background/teeth/hair over the target (makeup_teacher.py:248-263) when
    ``is_fixbkgrd`` — the knob the reference carries through the mixin chain.

    Returns ``target_fn(batch, alphas, teacher_params) -> (pgt_sr, makeup_pgt)``;
    `teacher_params` is the GAN teacher's param pytree (None for PGT/KEEP) so the
    whole thing jits with the frozen teacher weights as arguments."""
    from ..ops.masks import fix_background
    from .pgt import compose_pgt

    if teacher_type in ("ELEGANT", "SCGAN") and teacher is None:
        raise ValueError(f"teacher_type {teacher_type!r} needs a built teacher "
                         "(build_teacher) for its network forward")

    def target_fn(batch: Dict[str, jnp.ndarray], alphas: jnp.ndarray,
                  teacher_params=None):
        image_s, image_r = batch["nonmakeup_img"], batch["makeup_img"]
        mask_s, mask_r = batch["mask_s_full"], batch["mask_r_full"]
        # the side channel: AnnealingComposePGT(image_s, image_r, masks, lms)
        makeup_pgt = compose_pgt(image_s, image_r, mask_s, mask_r, alphas)
        if teacher_type == "ELEGANT_PGT":
            target = makeup_pgt
        elif teacher_type == "KEEP":
            target = image_s
        elif teacher_type == "ELEGANT":
            from .elegant import collapse_mask
            out = teacher.model.apply(
                teacher_params, image_s, image_r,
                collapse_mask(mask_s), collapse_mask(mask_r),
                batch["diff_s"], batch["diff_r"],
            )
            target = out
        elif teacher_type == "SCGAN":
            from .scgan import scgan_apply
            target = scgan_apply(teacher.model, teacher_params, image_r, image_s,
                                 batch["makeup_seg"], batch["nonmakeup_seg"])
        else:
            raise ValueError(f"unknown teacher_type {teacher_type!r}")
        target = jnp.clip(target, -1.0, 1.0)
        if is_fixbkgrd:
            target = fix_background(target, image_s, batch["nonmakeup_seg"])
        return target, jnp.clip(makeup_pgt, -1.0, 1.0)

    return target_fn
