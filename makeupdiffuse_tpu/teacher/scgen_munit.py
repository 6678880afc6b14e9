"""Faithful-topology SCGen (flax twin, NHWC) — converted-``G.pth`` backend.

1:1 counterpart of ``tools/torch_scgen.SCGenTorch`` (see its docstring for the
reconstruction provenance; the reference drives the real module at
/root/reference/diffmk/teacher.py:88-93).  Module names mirror the torch tree
mechanically (``model.N`` ↔ ``model_N``) so the converter
(tools/convert_scgen.convert_scgen_state_dict) is a pure regex map with hard
shape asserts; tests/test_teacher_convert.py pins numeric torch-vs-flax output
parity.  Unlike ``teacher/scgan.py`` (the TPU-first re-architecture used as the
untrained default), every op here matches torch semantics: reflect padding,
InstanceNorm(affine=False), MUNIT LayerNorm over (H, W, C), runtime-assigned
AdaIN, nearest (pixel-repeat) upsampling.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _reflect_pad(x, p):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _instance_norm(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class MunitLayerNorm(nn.Module):
    """MUNIT LayerNorm: normalize over (H, W, C) per sample, affine gamma/beta."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return y.astype(x.dtype)


def _adain(x, weight, bias, eps=1e-5):
    """AdaptiveInstanceNorm2d with per-sample (weight, bias) rows."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight[:, None, None, :] + bias[:, None, None, :]
    return y.astype(x.dtype)


class Conv2dBlock(nn.Module):
    """reflect pad → conv → norm → activation; twin of torch Conv2dBlock.
    'adain' blocks take the per-sample (weight, bias) via the second arg."""

    cout: int
    k: int
    s: int
    p: int
    norm: str = "none"
    activ: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ada: Optional[tuple] = None):
        x = _reflect_pad(x, self.p)
        x = nn.Conv(self.cout, (self.k, self.k), strides=(self.s, self.s),
                    padding="VALID", dtype=self.dtype, name="conv")(x)
        if self.norm == "in":
            x = _instance_norm(x)
        elif self.norm == "ln":
            x = MunitLayerNorm(self.cout, name="norm")(x)
        elif self.norm == "adain":
            assert ada is not None
            x = _adain(x, *ada)
        if self.activ == "relu":
            x = nn.relu(x)
        elif self.activ == "tanh":
            x = jnp.tanh(x.astype(jnp.float32)).astype(x.dtype)
        return x


class ResBlock(nn.Module):
    dim: int
    norm: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ada=None):
        h = Conv2dBlock(self.dim, 3, 1, 1, self.norm, "relu", self.dtype,
                        name="model_0")(x, None if ada is None else ada[0])
        h = Conv2dBlock(self.dim, 3, 1, 1, self.norm, "none", self.dtype,
                        name="model_1")(h, None if ada is None else ada[1])
        return x + h


class ResBlocksSeq(nn.Module):
    """MUNIT ResBlocks container — children named model_j like the torch
    Sequential, so the flattened path mirrors ``<name>.model.j.model.k``."""

    n: int
    dim: int
    norm: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adas=None):
        for j in range(self.n):
            x = ResBlock(self.dim, self.norm, self.dtype, name=f"model_{j}")(
                x, None if adas is None else adas[j])
        return x


class FIEnc(nn.Module):
    """ContentEncoder twin: 7x7 'in' stem + 2 strided downs + n_res resblocks."""

    dim: int = 64
    n_downsample: int = 2
    n_res: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        x = Conv2dBlock(d, 7, 1, 3, "in", "relu", self.dtype, name="model_0")(x)
        for i in range(self.n_downsample):
            x = Conv2dBlock(2 * d, 4, 2, 1, "in", "relu", self.dtype,
                            name=f"model_{i + 1}")(x)
            d *= 2
        x = ResBlocksSeq(self.n_res, d, "in", self.dtype,
                         name=f"model_{self.n_downsample + 1}")(x)
        return x


class PSEnc(nn.Module):
    """PartStyleEncoder twin: shared normless trunk on the component-masked
    image, masked global average pool, 1x1 fc → per-part code."""

    dim: int = 64
    part_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_lip, seg_lip, img_skin, seg_skin, img_eye, seg_eye):
        trunk = [
            Conv2dBlock(self.dim, 7, 1, 3, "none", "relu", self.dtype,
                        name="model_0"),
            Conv2dBlock(2 * self.dim, 4, 2, 1, "none", "relu", self.dtype,
                        name="model_1"),
            Conv2dBlock(4 * self.dim, 4, 2, 1, "none", "relu", self.dtype,
                        name="model_2"),
            Conv2dBlock(4 * self.dim, 4, 2, 1, "none", "relu", self.dtype,
                        name="model_3"),
        ]
        fc = nn.Conv(self.part_dim, (1, 1), dtype=self.dtype, name="fc")

        def one(img, comp_mask):
            h = img * comp_mask
            for layer in trunk:
                h = layer(h)
            f = h.shape[1]
            m = comp_mask[:, ::comp_mask.shape[1] // f, ::comp_mask.shape[2] // f]
            pooled = jnp.sum(h * m, axis=(1, 2), keepdims=True) / \
                jnp.clip(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0, None)
            return fc(pooled).reshape(pooled.shape[0], -1)

        return jnp.concatenate([
            one(img_lip, seg_lip[..., 0:1]),
            one(img_skin, seg_skin[..., 1:2]),
            one(img_eye, seg_eye[..., 2:3]),
        ], axis=1)


class MLP(nn.Module):
    cout: int
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="model_0")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="model_2")(x))
        return nn.Dense(self.cout, dtype=self.dtype, name="model_4")(x)


def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Fuse(nn.Module):
    """Decoder twin: MLP(code₁‖code₂) → AdaIN params for n_res resblocks, then
    2 x (nearest up + 5x5 'ln' conv) + 7x7 tanh head."""

    dim: int = 256
    n_res: int = 3
    style_dim: int = 192
    mlp_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, content, code_a, code_b):
        n_adain = 2 * 2 * self.n_res * self.dim
        params = MLP(n_adain, self.mlp_dim, self.dtype, name="mlp")(
            jnp.concatenate([code_a, code_b], axis=1))
        c = self.dim
        i = 0
        adas = []
        for _ in range(self.n_res):
            ada = []
            for _ in range(2):
                w = 1.0 + params[:, i:i + c]
                b = params[:, i + c:i + 2 * c]
                ada.append((w.astype(jnp.float32), b.astype(jnp.float32)))
                i += 2 * c
            adas.append(ada)
        x = ResBlocksSeq(self.n_res, c, "adain", self.dtype,
                         name="resblocks")(content, adas)
        x = Conv2dBlock(c // 2, 5, 1, 2, "ln", "relu", self.dtype,
                        name="model_1")(_upsample2x(x))
        x = Conv2dBlock(c // 4, 5, 1, 2, "ln", "relu", self.dtype,
                        name="model_3")(_upsample2x(x))
        return Conv2dBlock(3, 7, 1, 3, "none", "tanh", self.dtype,
                           name="model_4")(x)


class SCGenMunit(nn.Module):
    """SCGen twin with the reference call contract (teacher.py:88-93):
    forward(makeup, nonmakeup, makeup_seg, nonmakeup_seg) → fake; segs are the
    3-component NHWC masks (lip, skin, eye)."""

    dim: int = 64
    style_dim: int = 192
    n_downsample: int = 2
    n_res: int = 3
    mlp_dim: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        d_out = self.dim * (2 ** self.n_downsample)
        self.FIEnc = FIEnc(self.dim, self.n_downsample, self.n_res, self.dtype)
        self.PSEnc = PSEnc(self.dim, self.style_dim // 3, self.dtype)
        self.fuse = Fuse(d_out, self.n_res, self.style_dim, self.mlp_dim,
                         self.dtype)

    def __call__(self, makeup, nonmakeup, makeup_seg, nonmakeup_seg):
        fid = self.FIEnc(nonmakeup)
        code = self.PSEnc(makeup, makeup_seg, makeup, makeup_seg,
                          makeup, makeup_seg)
        return self.fuse(fid, code, code)


class SCGenMunitTeacher:
    """teacher_type 'SCGAN' backend over CONVERTED real-topology G.pth weights —
    same call contract as teacher/scgan.SCGanTeacher (seg remap + rebound_box +
    empty-eye guard come from scgan_apply, teacher.py:82-93)."""

    def __init__(self, params, **model_kw):
        self.model = SCGenMunit(**model_kw)
        self.params = params

    def forward(self, makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg):
        from .scgan import scgan_apply
        return scgan_apply(self.model, self.params, makeup_img, nonmakeup_img,
                           makeup_seg, nonmakeup_seg)

    def __call__(self, makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg,
                 *unused_args):
        return self.forward(makeup_img, nonmakeup_img, makeup_seg, nonmakeup_seg)
