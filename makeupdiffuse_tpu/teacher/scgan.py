"""SCGAN-style teacher — the 'SCGAN' preliminary-transfer backend.

Capability parity: ``diffmk.teacher.Teacher_SCGAN`` wrapping the external
``scgan_models.SCGen`` (/root/reference/diffmk/teacher.py:9-93):
  * set_input: scgan_segs classes → 3-component masks lip{9,13} / skin{4,8,10} /
    eyes{6,1}, with rebound_box dilation of the makeup-side eye masks against face
    {4,8} (:25-78) — reproduced via ops/masks.scgan_component_masks;
  * empty-eye guard: if the reference face has no visible eyes the teacher bails
    (:72-73) — we return the source unchanged in that case;
  * forward: FIEnc(face-identity encoder) on the non-makeup face, PSEnc
    (part-style encoder) extracting per-component style codes from the makeup face,
    fuse(decoder) injecting the codes (:82-93 — the reference passes the makeup
    triple three times, i.e. full-face style from one reference).

Architecture re-expressed TPU-first: FIEnc = strided conv encoder; PSEnc = masked
average-pool style heads (one per component: lip/skin/eye) → style vectors; fuse =
decoder with per-component AdaIN-style modulation localized by the source masks.
Weight-exact parity with the torch G.pth is not claimed (external artifact); the
interface and conditioning structure match.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import scgan_component_masks


class FIEnc(nn.Module):
    """Face-identity encoder: 256² → 64² content features."""

    ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (7, 7), padding=3, dtype=self.dtype)(x)
        h = nn.silu(nn.GroupNorm(8)(h.astype(jnp.float32)).astype(h.dtype))
        h = nn.Conv(self.ch * 2, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.silu(nn.GroupNorm(8)(h.astype(jnp.float32)).astype(h.dtype))
        h = nn.Conv(self.ch * 4, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.silu(nn.GroupNorm(8)(h.astype(jnp.float32)).astype(h.dtype))
        return h  # [B, 64, 64, 4ch]


class PSEnc(nn.Module):
    """Part-style encoder: per-component masked pooling → style code per part."""

    style_dim: int = 192  # 3 parts × 64
    ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, makeup_img, makeup_seg3):
        # makeup_seg3: [B,H,W,3] component masks (lip, skin, eyes)
        h = nn.Conv(self.ch, (7, 7), padding=3, dtype=self.dtype)(makeup_img)
        h = nn.silu(h)
        h = nn.Conv(self.ch * 2, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.ch * 2, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.silu(h)  # [B, 64, 64, 2ch]
        hw = h.shape[1]
        seg = jax.image.resize(makeup_seg3, makeup_seg3.shape[:1] + (hw, hw, 3), "nearest")
        codes = []
        per = self.style_dim // 3
        for i, name in enumerate(("lip", "skin", "eye")):
            m = seg[..., i:i + 1]
            denom = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
            pooled = jnp.sum(h * m, axis=(1, 2)) / denom  # [B, 2ch]
            codes.append(nn.Dense(per, dtype=self.dtype, name=f"style_{name}")(pooled))
        return jnp.concatenate(codes, axis=-1)  # [B, style_dim]


class Fuse(nn.Module):
    """Decoder: content features modulated per component by style codes, localized
    with the source component masks, then upsampled to 256²."""

    ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, content, style, src_seg3, image_s):
        b, hw, _, c = content.shape
        per = style.shape[-1] // 3
        seg = jax.image.resize(src_seg3, (b, hw, hw, 3), "nearest")
        h = content
        for i, name in enumerate(("lip", "skin", "eye")):
            code = style[:, i * per:(i + 1) * per]
            gb = nn.Dense(2 * c, dtype=self.dtype, name=f"adain_{name}")(code)
            gamma, beta = jnp.split(gb[:, None, None, :], 2, axis=-1)
            m = seg[..., i:i + 1]
            h = h * (1.0 + gamma * m) + beta * m
        h = nn.Conv(self.ch * 2, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = jax.image.resize(h, (b, hw * 2, hw * 2, h.shape[-1]), "nearest")
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = jax.image.resize(h, (b, hw * 4, hw * 4, h.shape[-1]), "nearest")
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.silu(h)
        residual = nn.Conv(3, (7, 7), padding=3, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros_init())(h)
        return image_s + residual.astype(jnp.float32)


class SCGen(nn.Module):
    ch: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.fienc = FIEnc(self.ch, self.dtype)
        self.psenc = PSEnc(ch=self.ch, dtype=self.dtype)
        self.fuse = Fuse(self.ch, self.dtype)

    def __call__(self, makeup_img, nonmakeup_img, makeup_seg3, nonmakeup_seg3):
        content = self.fienc(nonmakeup_img)
        style = self.psenc(makeup_img, makeup_seg3)
        return self.fuse(content, style, nonmakeup_seg3, nonmakeup_img)


def scgan_apply(model: SCGen, params, makeup_img, nonmakeup_img, makeup_seg,
                nonmakeup_seg) -> jnp.ndarray:
    """Pure SCGAN teacher forward (Teacher_SCGAN.forward parity, teacher.py:82-93):
    seg remap + rebound_box on the makeup side, FIEnc/PSEnc/fuse, empty-eye guard.
    Jit-composable — params are an argument so the train loop can jit this."""
    seg_r = jax.vmap(lambda s: scgan_component_masks(s, apply_rebound=True))(makeup_seg)
    seg_s = jax.vmap(lambda s: scgan_component_masks(s, apply_rebound=False))(nonmakeup_seg)
    out = model.apply(params, makeup_img, nonmakeup_img, seg_r, seg_s)
    # empty-eye guard (teacher.py:72-73): no visible reference eyes → identity
    has_eyes = jnp.any(seg_r[..., 2] > 0, axis=(1, 2))[:, None, None, None]
    out = jnp.where(has_eyes, out, nonmakeup_img)
    return jnp.clip(out, -1.0, 1.0)


class SCGanTeacher:
    """teacher_type 'SCGAN': forward(makeup_img, nonmakeup_img, makeup_seg,
    nonmakeup_seg) parity with Teacher_SCGAN.forward (teacher.py:82-93) — note the
    SCGAN call order (makeup first)."""

    def __init__(self, params=None, ch: int = 64, seed: int = 0, image_size: int = 256):
        self.model = SCGen(ch=ch)
        if params is None:
            H = image_size
            dummy = (jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)),
                     jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), *dummy)
        self.params = params

    def forward(self, makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg):
        return scgan_apply(self.model, self.params, makeup_img, nonmakeup_img,
                           makeup_seg, nonmakeup_seg)

    # Teacher protocol (model-facing call in get_target, makeup_teacher.py:49)
    def __call__(self, makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg,
                 *unused_args):
        return self.forward(makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg)
