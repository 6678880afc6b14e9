"""Faithful-topology EleGANt sow-pyramid generator (flax twin, NHWC).

The 1:1 flax counterpart of ``tools/torch_elegant.ElegantSowTorch`` — the
module tree whose parameter names and math the converter
(tools/convert_elegant.convert_elegant_state_dict) maps the real
``sow_pyramid_a5_e3d2_remapped.pth`` key set onto (reference loads it at
/root/reference/diffmk/teacher.py:121-129).  Unlike ``teacher/elegant.py``
(a TPU-first re-architecture with GroupNorm/SiLU and a zero-init identity
head, used as the default untrained teacher), this module reproduces the
reconstructed torch topology operation-for-operation — Conv+InstanceNorm+ReLU
blocks, single-head attention, tanh head — so converted weights produce
numerically matching outputs (tests/test_teacher_convert.py pins torch-vs-flax
parity at <1e-4).

Layout: NHWC activations / HWIO kernels; InstanceNorm in f32 like all norms in
this codebase.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .elegant import collapse_mask

DIFF_CHANNELS = 136


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) parity: normalize each (H, W) slice per
    channel per sample, f32 statistics, learnable scale/bias. Matches torch's
    eps default (1e-5) and its use of biased variance."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class ConvIN(nn.Module):
    """Conv + InstanceNorm + ReLU — twin of torch_elegant.ConvIN."""

    cout: int
    k: int
    s: int
    p: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.cout, (self.k, self.k), strides=(self.s, self.s),
                    padding=self.p, dtype=self.dtype, name="conv")(x)
        x = InstanceNorm(name="norm")(x)
        return nn.relu(x)


class AttnProj(nn.Module):
    """q/k/v 1x1 projections; v → 2C for the (gamma, beta) split."""

    c: int
    dtype: Any = jnp.float32

    def setup(self):
        self.to_q = nn.Conv(self.c, (1, 1), dtype=self.dtype, name="to_q")
        self.to_k = nn.Conv(self.c, (1, 1), dtype=self.dtype, name="to_k")
        self.to_v = nn.Conv(2 * self.c, (1, 1), dtype=self.dtype, name="to_v")


def _global_attn(q, k, v):
    b, h, w, c = q.shape
    qf = q.reshape(b, h * w, c)
    kf = k.reshape(b, h * w, c)
    vf = v.reshape(b, h * w, -1)
    logits = jnp.einsum("bqc,bkc->bqk", qf, kf) / jnp.sqrt(jnp.float32(c)).astype(q.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, vf).reshape(b, h, w, -1)


def _window(x, win):
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, win * win, c)


def _unwindow(x, b, h, w, win):
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


def _sow_attn(q, k, v, win):
    """Plain + half-window-shifted (zero-padded, padded keys masked) window
    attention, averaged — op-for-op twin of torch_elegant._sow_attn."""
    b, h, w, c = q.shape

    def one(qp, kp, vp, mask=None):
        qw, kw, vw = _window(qp, win), _window(kp, win), _window(vp, win)
        logits = jnp.einsum("nqc,nkc->nqk", qw, kw) / jnp.sqrt(
            jnp.float32(c)).astype(q.dtype)
        if mask is not None:
            logits = jnp.where(mask[:, None, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = jnp.nan_to_num(attn)  # fully-padded window → zero output
        return jnp.einsum("nqk,nkc->nqc", attn, vw)

    plain = _unwindow(one(q, k, v), b, h, w, win)
    r = win // 2
    pad = ((0, 0), (r, r), (r, r), (0, 0))
    qs, ks, vs = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.pad(jnp.ones((b, h, w, 1), q.dtype), pad)
    vmask = _window(valid, win)[..., 0] > 0
    shifted = _unwindow(one(qs, ks, vs, vmask), b, h + win, w + win, win)
    shifted = shifted[:, r:-r, r:-r]
    return 0.5 * (plain + shifted)


def _resize_nearest(x, hw):
    """Torch F.interpolate(mode='nearest') parity: downsample picks index
    floor(i*in/out) — a stride slice for integer factors (jax.image.resize
    samples at centers instead, which diverges); upsample repeats pixels."""
    b, h, w, c = x.shape
    if h == hw:
        return x
    if h % hw == 0:
        f = h // hw
        return x[:, ::f, ::f, :]
    assert hw % h == 0, f"non-integer nearest resize {h}->{hw}"
    return _upsample2x(x, hw // h)


def _upsample2x(x, f=2):
    return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)


class ElegantSowGenerator(nn.Module):
    """sow_pyramid_a5_e3d2 twin: (image_s, image_r, mask2_s, mask2_r, diff_s,
    diff_r) → fake_sr in [-1, 1]."""

    conv_dim: int = 64
    window_size: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_s, image_r, mask_s, mask_r, diff_s, diff_r):
        c = self.conv_dim
        enc = [ConvIN(c, 7, 1, 3, self.dtype, name="encoder_0"),
               ConvIN(2 * c, 4, 2, 1, self.dtype, name="encoder_1"),
               ConvIN(4 * c, 4, 2, 1, self.dtype, name="encoder_2")]
        down = ConvIN(4 * c, 4, 2, 1, self.dtype, name="down")

        def encode(img):
            h = img
            for layer in enc:
                h = layer(h)
            return h, down(h)

        hi_s, lo_s = encode(image_s)
        hi_r, lo_r = encode(image_r)

        face_s = jnp.clip(jnp.sum(mask_s, -1, keepdims=True), 0, 1)
        face_r = jnp.clip(jnp.sum(mask_r, -1, keepdims=True), 0, 1)

        pos_low = nn.Conv(4 * c, (1, 1), dtype=self.dtype, name="pos_low")
        pos_high = nn.Conv(4 * c, (1, 1), dtype=self.dtype, name="pos_high")
        attn_low = AttnProj(4 * c, self.dtype, name="attn_low")
        attn_high = AttnProj(4 * c, self.dtype, name="attn_high")

        def level(attn, pos, f_s, f_r, is_sow):
            hw = f_s.shape[1]
            ds, dr = _resize_nearest(diff_s, hw), _resize_nearest(diff_r, hw)
            ms, mr = _resize_nearest(face_s, hw), _resize_nearest(face_r, hw)
            q = attn.to_q(f_s + pos(ds))
            k = attn.to_k(f_r + pos(dr))
            v = attn.to_v(f_r * mr)
            o = _sow_attn(q, k, v, self.window_size) if is_sow else _global_attn(q, k, v)
            gamma, beta = jnp.split(o, 2, axis=-1)
            return gamma * ms, beta * ms

        g_lo, b_lo = level(attn_low, pos_low, lo_s, lo_r, is_sow=False)
        g_hi, b_hi = level(attn_high, pos_high, hi_s, hi_r, is_sow=True)

        lo = lo_s * (1.0 + g_lo) + b_lo
        hi = hi_s * (1.0 + g_hi) + b_hi
        h = ConvIN(4 * c, 3, 1, 1, self.dtype, name="merge")(
            jnp.concatenate([_upsample2x(lo), hi], axis=-1))
        h = ConvIN(2 * c, 3, 1, 1, self.dtype, name="decoder_0")(_upsample2x(h))
        h = ConvIN(c, 3, 1, 1, self.dtype, name="decoder_1")(_upsample2x(h))
        out = nn.Conv(3, (7, 7), padding=3, dtype=self.dtype, name="head")(h)
        return jnp.tanh(out.astype(jnp.float32))


class ElegantSowTeacher:
    """teacher_type 'ELEGANT' backend over CONVERTED real-topology weights —
    same ``transfer`` signature as teacher/elegant.EleGANtTeacher / the
    reference wrapper (teacher.py:136-140)."""

    def __init__(self, params, conv_dim: int = 64, window_size: int = 16):
        self.model = ElegantSowGenerator(conv_dim=conv_dim, window_size=window_size)
        self.params = params

    def transfer(self, image_s, image_r, mask_s_full, mask_r_full, diff_s, diff_r,
                 lms_s=None, lms_r=None):
        m_s = collapse_mask(mask_s_full)
        m_r = collapse_mask(mask_r_full)
        out = self.model.apply(self.params, image_s, image_r, m_s, m_r,
                               diff_s, diff_r)
        return jnp.clip(out, -1.0, 1.0)

    def __call__(self, image_s, image_r, mask_s_full, mask_r_full, lms_s=None,
                 lms_r=None, diff_s=None, diff_r=None):
        if diff_s is None:
            b, H = image_s.shape[0], image_s.shape[1]
            diff_s = jnp.zeros((b, H, H, DIFF_CHANNELS))
            diff_r = jnp.zeros_like(diff_s)
        return self.transfer(image_s, image_r, mask_s_full, mask_r_full,
                             diff_s, diff_r)
