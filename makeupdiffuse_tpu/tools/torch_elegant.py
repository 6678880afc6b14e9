"""Torch twin of the EleGANt sow-pyramid generator — the conversion oracle.

The reference's production teacher loads ``sow_pyramid_a5_e3d2_remapped.pth``
into the external EleGANt ``Generator`` (/root/reference/diffmk/teacher.py:121-129
via ``ele_training.inference.Inference``).  That repo is not vendored and this
environment has zero egress, so this module RECONSTRUCTS the generator topology
from the published EleGANt architecture (ECCV'22, §3 + fig.2) and the checkpoint
tag's hyperparameters — ``e3`` encoder layers, ``d2`` decoder layers, sow
(shifted-overlapped-window) attention at the high-res pyramid level, global
attention at the low-res level, landmark-diff positional conditioning.

This torch module is the single patch point for key-name fidelity: its
``state_dict()`` key set IS the converter's expected key set
(tools/convert_elegant.expected_elegant_keys), every tensor is shape-asserted on
conversion, and tests/test_teacher_convert.py proves a synthetic
export → convert → forward roundtrip with NUMERIC torch-vs-flax parity.  If the
real checkpoint's names differ, edit the module names here; the converter and
flax twin follow mechanically.

Layout convention: torch NCHW / OIHW; the flax twin
(teacher/elegant_sow.ElegantSowGenerator) is NHWC / HWIO.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

DIFF_CHANNELS = 136  # 68 landmarks x (dy, dx) — preprocessing.py:109-120 field


class ConvIN(nn.Module):
    """Conv2d + InstanceNorm2d(affine) + ReLU — the PSGAN-family conv block."""

    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p)
        self.norm = nn.InstanceNorm2d(cout, affine=True)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class AttnProj(nn.Module):
    """q/k/v 1x1-conv projections of one makeup-transfer attention level.

    v projects to 2C: the attention output is split into the (gamma, beta)
    per-pixel makeup affine applied as ``x * (1 + gamma) + beta``."""

    def __init__(self, c):
        super().__init__()
        self.to_q = nn.Conv2d(c, c, 1)
        self.to_k = nn.Conv2d(c, c, 1)
        self.to_v = nn.Conv2d(c, 2 * c, 1)


def _global_attn(q, k, v):
    """[B,C,H,W] q/k, [B,2C,H,W] v → [B,2C,H,W]; softmax((q·k)/sqrt(C))·v."""
    b, c, h, w = q.shape
    qf = q.flatten(2).transpose(1, 2)              # [B, HW, C]
    kf = k.flatten(2).transpose(1, 2)
    vf = v.flatten(2).transpose(1, 2)              # [B, HW, 2C]
    attn = torch.softmax(qf @ kf.transpose(1, 2) / math.sqrt(c), dim=-1)
    return (attn @ vf).transpose(1, 2).reshape(b, -1, h, w)


def _window(x, win):
    """[B,C,H,W] → [B·nH·nW, win², C]."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // win, win, w // win, win)
    x = x.permute(0, 2, 4, 3, 5, 1)
    return x.reshape(-1, win * win, c)


def _unwindow(x, b, h, w, win):
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.permute(0, 5, 1, 3, 2, 4)
    return x.reshape(b, c, h, w)


def _sow_attn(q, k, v, win):
    """Shifted-overlapped-window attention: plain-window pass + a pass shifted by
    win/2 (zero-padded, padded keys masked out — windows never wrap across the
    image border), averaged."""
    b, c, _, _ = q.shape

    def one(qp, kp, vp, mask=None):
        qw, kw, vw = _window(qp, win), _window(kp, win), _window(vp, win)
        logits = qw @ kw.transpose(1, 2) / math.sqrt(c)
        if mask is not None:
            logits = logits.masked_fill(~mask[:, None, :], float("-inf"))
        # a fully-padded window has no valid key: nan-safe zero output there
        out = torch.softmax(logits, dim=-1)
        out = torch.nan_to_num(out) @ vw
        return out

    h, w = q.shape[2], q.shape[3]
    plain = _unwindow(one(q, k, v), b, h, w, win)
    r = win // 2
    pad = (r, r, r, r)
    qs, ks, vs = F.pad(q, pad), F.pad(k, pad), F.pad(v, pad)
    valid = F.pad(torch.ones(b, 1, h, w, dtype=torch.bool, device=q.device), pad)
    vmask = _window(valid.float(), win)[..., 0] > 0   # [B·nw, win²] key validity
    shifted = _unwindow(one(qs, ks, vs, vmask), b, h + win, w + win, win)
    shifted = shifted[:, :, r:-r, r:-r]
    return 0.5 * (plain + shifted)


class ElegantSowTorch(nn.Module):
    """sow_pyramid_a5_e3d2 generator reconstruction.

    forward(image_s, image_r, mask_s, mask_r, diff_s, diff_r) → fake_sr in
    [-1, 1]; masks are the 2-channel (lip, face+eyes) collapse the reference
    wrapper feeds it (teacher.py:137-138), diffs the 136-ch landmark field."""

    def __init__(self, conv_dim: int = 64, window_size: int = 16):
        super().__init__()
        c = conv_dim
        self.window_size = window_size
        self.encoder = nn.ModuleList([
            ConvIN(3, c, 7, 1, 3),          # 256²,  C
            ConvIN(c, 2 * c, 4, 2, 1),      # 128², 2C
            ConvIN(2 * c, 4 * c, 4, 2, 1),  # 64²,  4C  = high-res level
        ])
        self.down = ConvIN(4 * c, 4 * c, 4, 2, 1)       # 32², 4C = low-res level
        self.pos_low = nn.Conv2d(DIFF_CHANNELS, 4 * c, 1)
        self.pos_high = nn.Conv2d(DIFF_CHANNELS, 4 * c, 1)
        self.attn_low = AttnProj(4 * c)
        self.attn_high = AttnProj(4 * c)
        self.merge = ConvIN(8 * c, 4 * c, 3, 1, 1)
        self.decoder = nn.ModuleList([
            ConvIN(4 * c, 2 * c, 3, 1, 1),  # after 2x up: 128²
            ConvIN(2 * c, c, 3, 1, 1),      # after 2x up: 256²
        ])
        self.head = nn.Conv2d(c, 3, 7, 1, 3)

    def encode(self, img):
        h = img
        for layer in self.encoder:
            h = layer(h)
        return h, self.down(h)  # (high 64², low 32²)

    def forward(self, image_s, image_r, mask_s, mask_r, diff_s, diff_r):
        hi_s, lo_s = self.encode(image_s)
        hi_r, lo_r = self.encode(image_r)

        face_s = mask_s.sum(1, keepdim=True).clamp(0, 1)
        face_r = mask_r.sum(1, keepdim=True).clamp(0, 1)

        def level(attn, pos, f_s, f_r, d_s, d_r, is_sow):
            hw = f_s.shape[2]
            ds = F.interpolate(d_s, size=(hw, hw), mode="nearest")
            dr = F.interpolate(d_r, size=(hw, hw), mode="nearest")
            ms = F.interpolate(face_s, size=(hw, hw), mode="nearest")
            mr = F.interpolate(face_r, size=(hw, hw), mode="nearest")
            q = attn.to_q(f_s + pos(ds))
            k = attn.to_k(f_r + pos(dr))
            v = attn.to_v(f_r * mr)
            o = (_sow_attn(q, k, v, self.window_size) if is_sow
                 else _global_attn(q, k, v))
            gamma, beta = o.chunk(2, dim=1)
            return gamma * ms, beta * ms

        g_lo, b_lo = level(self.attn_low, self.pos_low, lo_s, lo_r,
                           diff_s, diff_r, is_sow=False)
        g_hi, b_hi = level(self.attn_high, self.pos_high, hi_s, hi_r,
                           diff_s, diff_r, is_sow=True)

        lo = lo_s * (1.0 + g_lo) + b_lo
        hi = hi_s * (1.0 + g_hi) + b_hi
        lo_up = F.interpolate(lo, scale_factor=2, mode="nearest")
        h = self.merge(torch.cat([lo_up, hi], dim=1))
        h = self.decoder[0](F.interpolate(h, scale_factor=2, mode="nearest"))
        h = self.decoder[1](F.interpolate(h, scale_factor=2, mode="nearest"))
        return torch.tanh(self.head(h))
