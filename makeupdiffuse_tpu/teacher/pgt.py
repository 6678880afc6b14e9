"""Histogram-matching pseudo-ground-truth teacher (EleGANt AnnealingComposePGT equiv).

Capability parity: ``diffmk.teacher.Ele_PGT_Teacher``
(/root/reference/diffmk/teacher.py:96-112) — margins eye=12/lip=4, alpha annealing
over milestones (0,12,24,50) with values skin (0.2,0.4,0.3,0.2), eye (0.6,0.8,0.6,0.4),
lip (0.05,0.2,0.1,0.0) — as dispatched by teacher_type 'ELEGANT_PGT' and the
`makeup_pgt` side channel (/root/reference/diffmk/diffusion_makeup.py:69-93).

Behavior: per makeup region (lip / expanded-eye / skin), histogram-match the source
image to the reference inside the region and alpha-blend the match back into the
source. Fully jitted (vmapped over batch), on-device — the reference's version runs
partially on the host.

Mask channel convention (PreProcess.mask_process): [lip, face(+brows), eye_l, eye_r].
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.histogram import masked_histogram_match
from ..ops.masks import expand_area

__all__ = ["PGTConfig", "annealed_alpha", "compose_pgt", "PGTTeacher"]


@dataclasses.dataclass(frozen=True)
class PGTConfig:
    eye_margin: int = 12
    lip_margin: int = 4
    milestones: Tuple[int, ...] = (0, 12, 24, 50)
    skin_alphas: Tuple[float, ...] = (0.2, 0.4, 0.3, 0.2)
    eye_alphas: Tuple[float, ...] = (0.6, 0.8, 0.6, 0.4)
    lip_alphas: Tuple[float, ...] = (0.05, 0.2, 0.1, 0.0)


def annealed_alpha(epoch: int, milestones: Tuple[int, ...], values: Tuple[float, ...]) -> float:
    """Piecewise-linear annealing over epoch milestones (AnnealingComposePGT.step)."""
    return float(np.interp(epoch, milestones, values))


def region_masks(mask_full: jnp.ndarray, eye_margin: int, lip_margin: int):
    """[H,W,4] full mask → (lip, eye, skin) region masks, each [H,W].

    lip = raw ch0 ; eye = expand(eye_l+eye_r, margin)·face ; skin = face·(1−eye)
    — exactly the regions the reference's p_loss_makeup uses
    (makeup_diffuse.py:346-357): only the EYE region is dilated (:350); the lip
    histogram source is the raw lip mask (:348). Dilating the lip mixes a
    skin-colored ring into the (small) lip histogram and garbles the per-channel
    rank matching — measured at 64²: core-lip MSE vs the known target color
    0.0005 undilated vs 0.34/0.68 at margin 1/4. `lip_margin` is kept for
    margins-dict signature parity with AnnealingComposePGT (teacher.py:109)."""
    del lip_margin
    lip = mask_full[..., 0]
    face = mask_full[..., 1]
    eyes = jnp.clip(mask_full[..., 2] + mask_full[..., 3], 0.0, 1.0)
    eye = expand_area(eyes, eye_margin) * face
    skin = face * (1.0 - eye)
    return lip, eye, skin


def _compose_single(
    image_s: jnp.ndarray,  # [H,W,3] in [-1,1]
    image_r: jnp.ndarray,
    mask_s_full: jnp.ndarray,  # [H,W,4]
    mask_r_full: jnp.ndarray,
    alphas: jnp.ndarray,  # [3] = (lip, eye, skin)
    eye_margin: int,
    lip_margin: int,
) -> jnp.ndarray:
    lip_s, eye_s, skin_s = region_masks(mask_s_full, eye_margin, lip_margin)
    lip_r, eye_r, skin_r = region_masks(mask_r_full, eye_margin, lip_margin)

    pgt = image_s
    for i, (m_s, m_r) in enumerate(((lip_s, lip_r), (eye_s, eye_r), (skin_s, skin_r))):
        matched = masked_histogram_match(image_s, image_r, m_s, m_r)
        w = (alphas[i] * m_s)[..., None]
        pgt = pgt * (1.0 - w) + matched * w
    return jnp.clip(pgt, -1.0, 1.0)


def compose_pgt(
    image_s: jnp.ndarray,  # [B,H,W,3]
    image_r: jnp.ndarray,
    mask_s_full: jnp.ndarray,  # [B,H,W,4]
    mask_r_full: jnp.ndarray,
    alphas: jnp.ndarray,  # [3] = (lip, eye, skin)
    eye_margin: int = 12,
    lip_margin: int = 4,
) -> jnp.ndarray:
    fn = lambda s, r, ms, mr: _compose_single(
        s, r, ms, mr, alphas, eye_margin, lip_margin
    )
    return jax.vmap(fn)(image_s, image_r, mask_s_full, mask_r_full)


def generate_pseudo_gt_pair(
    image_s: jnp.ndarray,
    image_r: jnp.ndarray,
    mask_s_full: jnp.ndarray,
    mask_r_full: jnp.ndarray,
    alphas: jnp.ndarray,
    eye_margin: int = 12,
    lip_margin: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(PGT_SR, PGT_RS) pair — the PseudoModel.generate_pseudo_GT capability
    (/root/reference/auxiliary/pseudos.py:30-41, consumed inside dataset workers at
    datasets.py:175,215-218). Here it is one jitted symmetric call instead of a CUDA
    model inside DataLoader processes."""
    sr = compose_pgt(image_s, image_r, mask_s_full, mask_r_full, alphas,
                     eye_margin, lip_margin)
    rs = compose_pgt(image_r, image_s, mask_r_full, mask_s_full, alphas,
                     eye_margin, lip_margin)
    return sr, rs


class PGTTeacher:
    """Stateful wrapper carrying the annealing epoch (mirrors AnnealingComposePGT)."""

    def __init__(self, cfg: PGTConfig = PGTConfig()):
        self.cfg = cfg
        self.epoch = 0
        self.margins = {"eye": cfg.eye_margin, "lip": cfg.lip_margin}

    def step(self) -> None:
        self.epoch += 1

    def alphas(self) -> jnp.ndarray:
        c = self.cfg
        return jnp.asarray(
            [
                annealed_alpha(self.epoch, c.milestones, c.lip_alphas),
                annealed_alpha(self.epoch, c.milestones, c.eye_alphas),
                annealed_alpha(self.epoch, c.milestones, c.skin_alphas),
            ],
            dtype=jnp.float32,
        )

    def __call__(self, image_s, image_r, mask_s_full, mask_r_full, lms_s=None, lms_r=None):
        """Signature parity with pgt_model(image_s, image_r, masks, lms)
        (makeup_diffuse.py:332-333); landmarks are accepted but unused by the
        histogram compose."""
        return compose_pgt(
            image_s, image_r, mask_s_full, mask_r_full, self.alphas(),
            self.cfg.eye_margin, self.cfg.lip_margin,
        )
