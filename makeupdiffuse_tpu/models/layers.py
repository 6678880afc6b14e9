"""Shared building blocks for the SD1.5 UNet / ControlNet / VAE (flax.linen, NHWC).

Capability parity with the external backbones the reference imports
(SURVEY.md §2b): openai-UNet ResBlock/SpatialTransformer/up-down sampling and the
ldm timestep embedding, re-expressed TPU-first:
  * NHWC activations + HWIO kernels (XLA's native TPU conv layout — no transposes).
  * Zero-initialized projections where the reference uses ``zero_module`` (ControlNet
    zero-convs, transformer proj_out, UNet final conv).
  * Norm/activation kept in f32 while matmuls/convs run in the compute dtype (bf16).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pallas_attention, pallas_norm, quant

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-first ordering (ldm util semantics)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def zero_init() -> Callable:
    return nn.initializers.zeros_init()


class QConv(nn.Module):
    """nn.Conv drop-in (identical param tree: <name>/kernel HWIO + bias) whose
    GEMM routes through the int8 MXU path when ``ops.quant.QUANT8`` is on.

    With the knob off it emits the exact lax.conv_general_dilated HLO nn.Conv
    emits (promote-to-dtype, NHWC·HWIO, bias broadcast), so parity tests and
    checkpoints see no difference; with it on, weights quantize per-output-
    channel and activations per-tensor in-graph (ops/quant.py rationale)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if quant.QUANT8:
            return quant.qconv(x, kernel, bias, tuple(self.strides), pad,
                               out_dtype=self.dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, tuple(self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y


class QDense(nn.Module):
    """nn.Dense drop-in (identical param tree) with the same QUANT8 dispatch as
    QConv — used for the attention/FF projection GEMMs in the eps hot path."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros_init(), (self.features,))
                if self.use_bias else None)
        if quant.QUANT8:
            return quant.qdense(x, kernel, bias, out_dtype=self.dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel,
                                (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + bias
        return y


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32, cast back to the working dtype.

    Hand-rolled (not nn.GroupNorm) so `scale`/`bias` live directly at this module's
    path — keeping the torch-checkpoint name mapping flat (tools/convert_torch_ckpt).

    ``act="silu"`` and ``add`` fuse the surrounding SiLU / time-embedding add into
    the norm — a single-pass Pallas kernel on TPU (ops.pallas_norm), identical jnp
    math elsewhere."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = x.shape[-1]
        # production channel counts are multiples of 32; the gcd fallback only
        # triggers in miniature test configs
        groups = self.num_groups if c % self.num_groups == 0 else math.gcd(c, self.num_groups)
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        return pallas_norm.group_norm_silu(
            x, scale, bias, groups=groups, eps=self.epsilon, act=self.act, add=add
        )


class ResBlock(nn.Module):
    """openai-UNet ResBlock: GN/SiLU/conv → +time-emb → GN/SiLU/zero-conv, skip 1×1."""

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(act="silu", name="in_norm")(x)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        # time-emb add fuses into the norm's single VMEM pass (ops.pallas_norm)
        h = GroupNorm32(act="silu", name="out_norm")(h, add=emb_out)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=True)(h)
        h = QConv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=zero_init(), bias_init=zero_init(), name="out_conv",
        )(h)

        if in_ch != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class _ProjKernel(nn.Module):
    """Bare projection weight with nn.Dense's exact param layout (<name>/kernel) —
    lets the fused-qkv path read the same checkpoint tree the Dense path writes."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features))


class CrossAttention(nn.Module):
    """ldm CrossAttention: context=None → self-attention.

    With ``pallas_attention.FUSE_QKV`` on, self-attention computes q/k/v as ONE
    matmul against the concatenated [d_in, 3·inner] weight: the concat is
    loop-invariant (params don't change inside the sampling scan) so XLA hoists
    it, replacing three kernel launches per layer with one. Param tree paths
    (to_q/to_k/to_v · kernel) are identical either way — the torch converter and
    the TP sharding rules see the same leaves."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        if context is None and pallas_attention.FUSE_QKV:
            d_in = x.shape[-1]
            w = jnp.concatenate([
                _ProjKernel(inner, name="to_q")(d_in),
                _ProjKernel(inner, name="to_k")(d_in),
                _ProjKernel(inner, name="to_v")(d_in),
            ], axis=1)
            xc, wc = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
            q, k, v = jnp.split(xc @ wc, 3, axis=-1)
        else:
            q = QDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = QDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = QDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, self.heads, self.dim_head)
        k = k.reshape(b, nk, self.heads, self.dim_head)
        v = v.reshape(b, nk, self.heads, self.dim_head)
        # dispatches to the Pallas flash kernel when FLASH_DEFAULT is on (TPU)
        out = pallas_attention.attention(q, k, v).reshape(b, nq, inner)
        return QDense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    """ldm FeedForward with GEGLU: proj to 2·(4·dim), x·gelu(gate), proj back."""

    dtype: Dtype = jnp.float32
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        xg = QDense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        x1, gate = jnp.split(xg, 2, axis=-1)
        h = x1 * nn.gelu(gate, approximate=False)
        return QDense(dim, dtype=self.dtype, name="proj_out")(h)


class _LNParams(nn.Module):
    """LayerNorm scale/bias with nn.LayerNorm's exact param layout."""

    @nn.compact
    def __call__(self, c: int):
        return (self.param("scale", nn.initializers.ones_init(), (c,)),
                self.param("bias", nn.initializers.zeros_init(), (c,)))


class _DenseParams(nn.Module):
    """Dense kernel(+bias) with nn.Dense's exact param layout and initializers."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        if not self.use_bias:
            return w, None
        return w, self.param("bias", nn.initializers.zeros_init(), (self.features,))


class _Attn1Params(nn.Module):
    """CrossAttention's param tree (to_q/to_k/to_v/to_out) without applying it —
    feeds the fused-block kernel the same leaves the unfused path trains/loads."""

    inner: int
    out_features: int

    @nn.compact
    def __call__(self, c: int):
        wq, _ = _DenseParams(self.inner, use_bias=False, name="to_q")(c)
        wk, _ = _DenseParams(self.inner, use_bias=False, name="to_k")(c)
        wv, _ = _DenseParams(self.inner, use_bias=False, name="to_v")(c)
        wo, bo = _DenseParams(self.out_features, name="to_out")(self.inner)
        return wq, wk, wv, wo, bo


class BasicTransformerBlock(nn.Module):
    """LN→self-attn, LN→cross-attn(context), LN→GEGLU-FF, all residual.

    With ``pallas_attention.FUSED_BLOCK`` on, the first (self-attention)
    sub-block runs as ONE Pallas program per batch item — LN1, the qkv
    projections, per-head softmax·V, the output projection and the residual add
    all VMEM-resident (see ops/pallas_attention.fused_attention_block). Param
    tree is identical either way."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        n, c = x.shape[1], x.shape[-1]
        inner = self.heads * self.dim_head
        if (pallas_attention.FUSED_BLOCK and inner == c
                and pallas_attention.FLASH_MIN_SEQ <= n
                <= pallas_attention.FUSED_BLOCK_MAX_SEQ):
            lns, lnb = _LNParams(name="norm1")(c)
            wq, wk, wv, wo, bo = _Attn1Params(inner, c, name="attn1")(c)
            x = pallas_attention.fused_attention_block(
                x.astype(self.dtype), lns, lnb, wq, wk, wv, wo, bo, self.heads
            ).astype(x.dtype)
        else:
            x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn1")(
                nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
            )
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(x.dtype), context
        )
        x = x + FeedForwardGEGLU(dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(x.dtype)
        )
        return x


class SpatialTransformer(nn.Module):
    """GN(ε=1e-6) → 1×1 proj_in → depth× BasicTransformerBlock → zero 1×1 proj_out + residual."""

    heads: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        dim_head = c // self.heads
        x_in = x
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = QConv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, dim_head, self.dtype, name=f"block_{i}"
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = QConv(
            c, (1, 1), dtype=self.dtype,
            kernel_init=zero_init(), bias_init=zero_init(), name="proj_out",
        )(x)
        return x + x_in


class Downsample(nn.Module):
    """Stride-2 3×3 conv (openai-UNet Downsample, conv_resample=True)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return QConv(self.channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2× then 3×3 conv (openai-UNet Upsample)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class TimeEmbedding(nn.Module):
    """Linear(model_ch→4·model_ch) → SiLU → Linear (openai-UNet time_embed)."""

    model_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t, self.model_channels)
        dim = self.model_channels * 4
        emb = nn.Dense(dim, dtype=self.dtype, name="fc1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        return nn.Dense(dim, dtype=self.dtype, name="fc2")(emb)
