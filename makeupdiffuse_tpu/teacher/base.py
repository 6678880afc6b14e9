"""Teacher interface + dispatch — the reference's teacher_type switch as a registry.

Capability parity: BaseDoubleControlModel.get_target's four-way dispatch
(SCGAN / ELEGANT / ELEGANT_PGT / KEEP, /root/reference/diffmk/diffusion_makeup.py:51-94)
plus the always-computed `makeup_pgt` side channel used by the background/makeup
losses (:87-93).
"""
from __future__ import annotations

from typing import Callable, Dict, Protocol

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
        from .elegant import EleGANtTeacher
        return EleGANtTeacher(**kwargs)
    if teacher_type == "SCGAN":
        from .scgan import SCGanTeacher
        return SCGanTeacher(**kwargs)
    if teacher_type in _REGISTRY:
        return _REGISTRY[teacher_type](**kwargs)
    raise ValueError(f"unknown teacher_type {teacher_type!r}")
