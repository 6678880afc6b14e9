"""EleGANt-style GAN teacher — the 'ELEGANT' preliminary-transfer backend.

Capability parity: ``diffmk.teacher.EleGANt_Teacher`` wrapping the external EleGANt
``Inference``/``solver.generate`` (/root/reference/diffmk/teacher.py:115-140; called
via get_elegant_target at /root/reference/diffmk/diffusion_makeup.py:18-21 with
(image_s, image_r, mask_s_full→2ch, mask_r_full→2ch, diff_s, diff_r, lms_s, lms_r)).

Architecture (EleGANt, ECCV'22 — re-expressed TPU-first in flax/NHWC):
  * shared conv encoder → feature pyramid (low 32², high 64² here at 256² input)
  * makeup-feature extraction from the reference, morphed onto the source by
    attention whose keys blend content features with the landmark-relative
    positional field ``diff`` (the reference pipeline's (136,H,W) channel —
    /root/reference/diffdata/preprocessing.py:109-120)
  * low-res full attention + high-res *sow* (shifted overlapped windows) attention
    — windowed attention with a half-window shift, averaging the two passes
  * decoder applies the morphed makeup as a per-pixel affine (γ, β) on the source
    features and upsamples back to 256²

Weight-exact parity with the torch checkpoint is NOT claimed (the GAN is an external
artifact); the interface, conditioning structure and mask semantics
(mask_full[:, 0:1] lip ‖ sum(rest) face — teacher.py:137-138) match, and
tools/convert_torch_ckpt.py-style mapping can be added once a checkpoint exists.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha_attention


def collapse_mask(mask_full: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,4] (lip, face, eye_l, eye_r) → [B,H,W,2] (lip, face+eyes) — the 4→2
    channel collapse of EleGANt_Teacher.transfer (teacher.py:137-138)."""
    lip = mask_full[..., 0:1]
    rest = jnp.sum(mask_full[..., 1:], axis=-1, keepdims=True)
    return jnp.concatenate([lip, jnp.clip(rest, 0, 1)], axis=-1)


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride), padding=1,
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch))(x.astype(jnp.float32)).astype(x.dtype)
        return nn.silu(x)


class Encoder(nn.Module):
    """256² → {64² (high), 32² (low)} feature pyramid."""

    ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.ch, 1, self.dtype)(x)          # 256
        h = ConvBlock(self.ch, 2, self.dtype)(h)          # 128
        h = ConvBlock(self.ch * 2, 2, self.dtype)(h)      # 64
        hi = ConvBlock(self.ch * 2, 1, self.dtype)(h)     # 64² high-res features
        lo = ConvBlock(self.ch * 4, 2, self.dtype)(hi)    # 32² low-res features
        lo = ConvBlock(self.ch * 4, 1, self.dtype)(lo)
        return hi, lo


def _resize_to(x: jnp.ndarray, hw: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    if h == hw:
        return x
    return jax.image.resize(x, (b, hw, hw, c), method="bilinear")


class MakeupAttention(nn.Module):
    """Cross-attention morphing: query = source (content ‖ pos-diff), key =
    reference (content ‖ pos-diff), value = reference makeup features → per-pixel
    (γ, β) applied to source features."""

    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_s, feat_r, diff_s, diff_r, mask_s, mask_r):
        b, h, w, c = feat_s.shape
        pos_s = nn.Dense(c, dtype=self.dtype, name="pos_proj_s")(diff_s)
        pos_r = nn.Dense(c, dtype=self.dtype, name="pos_proj_r")(diff_r)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(feat_s + pos_s)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(feat_r + pos_r)
        v = nn.Dense(2 * c, dtype=self.dtype, name="to_v")(feat_r * mask_r)
        d = c // self.heads
        qh = q.reshape(b, h * w, self.heads, d)
        kh = k.reshape(b, h * w, self.heads, d)
        vh = v.reshape(b, h * w, self.heads, 2 * d)
        out = mha_attention(qh, kh, vh).reshape(b, h, w, 2 * c)
        gamma, beta = jnp.split(out, 2, axis=-1)
        return (gamma * mask_s, beta * mask_s)


def _window(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[B,H,W,C] → [B·nH·nW, win², C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, win * win, c)


def _unwindow(x: jnp.ndarray, b: int, h: int, w: int, win: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


class SowAttention(nn.Module):
    """Shifted-overlapped-window attention: two windowed passes (one shifted by
    win/2) averaged — the high-res makeup morph.

    The shifted pass pads by win/2 instead of rolling, and masks attention to the
    padded keys, so windows never attend across opposite image borders (true
    non-wrapping shifted windows — EleGANt's sow semantics, unlike a jnp.roll
    wrap-around)."""

    win: int = 16
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_s, feat_r, diff_s, diff_r, mask_s, mask_r):
        b, h, w, c = feat_s.shape
        pos_s = nn.Dense(c, dtype=self.dtype, name="pos_proj_s")(diff_s)
        pos_r = nn.Dense(c, dtype=self.dtype, name="pos_proj_r")(diff_r)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(feat_s + pos_s)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(feat_r + pos_r)
        v = nn.Dense(2 * c, dtype=self.dtype, name="to_v")(feat_r * mask_r)

        def windowed(q, k, v, shift):
            d = c // self.heads
            mask = None
            hh, ww = h, w
            if shift:
                r = self.win // 2
                pad = ((0, 0), (r, r), (r, r), (0, 0))
                q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
                hh, ww = h + self.win, w + self.win
                valid = jnp.pad(jnp.ones((b, h, w, 1), q.dtype), pad)
                vw = _window(valid, self.win)  # [B·nw, win², 1]
                mask = (vw[:, None, None, :, 0] > 0)  # keys: padded → masked out
            qw = _window(q, self.win).reshape(-1, self.win**2, self.heads, d)
            kw = _window(k, self.win).reshape(-1, self.win**2, self.heads, d)
            vw_ = _window(v, self.win).reshape(-1, self.win**2, self.heads, 2 * d)
            ow = mha_attention(qw, kw, vw_, mask=mask).reshape(-1, self.win**2, 2 * c)
            o = _unwindow(ow, b, hh, ww, self.win)
            if shift:
                r = self.win // 2
                o = o[:, r:-r, r:-r]
            return o
        out = 0.5 * (windowed(q, k, v, False) + windowed(q, k, v, True))
        gamma, beta = jnp.split(out, 2, axis=-1)
        return (gamma * mask_s, beta * mask_s)


class EleGANtGenerator(nn.Module):
    """solver.generate capability: (image_s, image_r, masks, diffs, lms) → fake."""

    ch: int = 64
    diff_channels: int = 136
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_s, image_r, mask_s2, mask_r2, diff_s, diff_r):
        enc = Encoder(self.ch, self.dtype, name="encoder")
        hi_s, lo_s = enc(image_s)
        hi_r, lo_r = enc(image_r)

        face_s = jnp.sum(mask_s2, -1, keepdims=True)
        face_r = jnp.sum(mask_r2, -1, keepdims=True)
        lo_hw, hi_hw = lo_s.shape[1], hi_s.shape[1]
        m_lo_s, m_lo_r = _resize_to(face_s, lo_hw), _resize_to(face_r, lo_hw)
        m_hi_s, m_hi_r = _resize_to(face_s, hi_hw), _resize_to(face_r, hi_hw)
        d_lo_s, d_lo_r = _resize_to(diff_s, lo_hw), _resize_to(diff_r, lo_hw)
        d_hi_s, d_hi_r = _resize_to(diff_s, hi_hw), _resize_to(diff_r, hi_hw)

        g_lo, b_lo = MakeupAttention(dtype=self.dtype, name="low_attn")(
            lo_s, lo_r, d_lo_s, d_lo_r, m_lo_s, m_lo_r
        )
        g_hi, b_hi = SowAttention(dtype=self.dtype, name="sow_attn")(
            hi_s, hi_r, d_hi_s, d_hi_r, m_hi_s, m_hi_r
        )

        lo = lo_s * (1.0 + g_lo) + b_lo
        h = ConvBlock(self.ch * 4, 1, self.dtype)(lo)
        bsz, hh, ww, _ = h.shape
        h = jax.image.resize(h, (bsz, hh * 2, ww * 2, h.shape[-1]), "nearest")
        h = nn.Conv(self.ch * 2, (3, 3), padding=1, dtype=self.dtype)(h)  # 64²
        h = nn.silu(h)
        h = h + hi_s * g_hi + b_hi
        h = ConvBlock(self.ch * 2, 1, self.dtype)(h)
        h = jax.image.resize(h, (bsz, hh * 4, ww * 4, h.shape[-1]), "nearest")
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)  # 128²
        h = nn.silu(h)
        h = jax.image.resize(h, (bsz, hh * 8, ww * 8, h.shape[-1]), "nearest")
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)  # 256²
        h = nn.silu(h)
        # zero-init residual head → the teacher is the identity at init (a sane
        # untrained default; trained weights arrive via checkpoint conversion)
        residual = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros_init())(h)
        return image_s + residual.astype(jnp.float32)


class EleGANtTeacher:
    """teacher_type 'ELEGANT' backend with the reference wrapper's signature
    (transfer(image_s, image_r, mask_s_full, mask_r_full, diff_s, diff_r, lms_s,
    lms_r), teacher.py:136-140). Holds flax params; frozen at train time."""

    def __init__(self, params=None, ch: int = 64, seed: int = 0,
                 image_size: int = 256, diff_channels: int = 136):
        self.model = EleGANtGenerator(ch=ch, diff_channels=diff_channels)
        if params is None:
            H = image_size
            dummy = (
                jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)),
                jnp.zeros((1, H, H, 2)), jnp.zeros((1, H, H, 2)),
                jnp.zeros((1, H, H, diff_channels)), jnp.zeros((1, H, H, diff_channels)),
            )
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), *dummy)
        self.params = params

    def transfer(self, image_s, image_r, mask_s_full, mask_r_full, diff_s, diff_r,
                 lms_s=None, lms_r=None):
        m_s = collapse_mask(mask_s_full)
        m_r = collapse_mask(mask_r_full)
        out = self.model.apply(self.params, image_s, image_r, m_s, m_r, diff_s, diff_r)
        return jnp.clip(out, -1.0, 1.0)

    def __call__(self, image_s, image_r, mask_s_full, mask_r_full, lms_s=None,
                 lms_r=None, diff_s=None, diff_r=None):
        if diff_s is None:
            b, H = image_s.shape[0], image_s.shape[1]
            diff_s = jnp.zeros((b, H, H, self.model.diff_channels))
            diff_r = jnp.zeros_like(diff_s)
        return self.transfer(image_s, image_r, mask_s_full, mask_r_full, diff_s, diff_r)
