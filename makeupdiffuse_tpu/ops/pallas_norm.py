"""Pallas TPU fused GroupNorm(+pre-add)(+SiLU) for the ResBlock stacks.

Why: XLA lowers GroupNorm as reduce → normalize, and the SiLU + time-embedding
add around it as separate elementwise passes; each pass is an HBM round-trip over
the [B,H,W,C] activation. At the UNet's hot shapes ([16,32,32,320] f32 = 20 MB per
pass) the norm chain is bandwidth-bound. This kernel loads each batch item's
[HW, C] slab into VMEM once and does add → group stats → normalize → SiLU in one
pass: 1 read + 1 write of the activation instead of ~4.

Group statistics use a one-hot channel→group matrix on the MXU: per-channel
column sums (VPU reduce over HW) are contracted with M [C,G] to group sums, and
group means/rsigmas are broadcast back per-channel through Mᵀ — no lane-granular
slicing of the 128-wide vector registers (C/G = 10 lanes for C=320 would fight
the tiling; two tiny matmuls don't).

Numerics match models.layers.GroupNorm32 (two-pass mean/var, f32 throughout).
Shapes that would overflow VMEM (the VAE decoder's 256²×128 slabs) or ragged
channel counts fall back to the identical jnp math. Backward recomputes the jnp
path via custom_vjp (training numerics unchanged; the kernel serves the
inference/forward path).

Reference behavior reproduced: torch GroupNorm(32, eps) + SiLU as used by
ldm/openai UNet ResBlocks (see /root/reference/diffmodels/base_diffusion_makeup.yaml:69-84
model topology; norm→silu→conv chains in cldm/ldm resblocks).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_silu", "FUSED_DEFAULT"]

# module-level switch (same pattern as ops.pallas_attention.FLASH_DEFAULT):
# models consult this when their own flag is unset; bench/TPU drivers enable it.
FUSED_DEFAULT = False
INTERPRET = False  # CPU tests flip this to run the kernel in interpreter mode

# per-program VMEM budget for the [HW, C] slab (f32). v5e has ~16 MB/core and the
# kernel holds BOTH the input and output blocks (2× slab) plus double-buffering of
# the next grid step's input — 4 MB covers every UNet shape (max 2.6 MB: the
# level-0 up-path concat) while the VAE's big spatial slabs fall back to XLA.
_VMEM_SLAB_BYTES = 4 * 1024 * 1024


def _norm_kernel(x_ref, add_ref, scale_ref, bias_ref, m_ref, o_ref, *,
                 eps: float, act: Optional[str], count: float, has_add: bool):
    """One batch item: o = act((x + add − μ_g)·rsqrt(σ²_g + eps)·scale + bias)."""
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    if has_add:
        x = x + add_ref[0].astype(jnp.float32)  # [1, C] broadcast over rows
    m = m_ref[...]  # [C, G] one-hot channel→group
    # group means: per-channel column sums (VPU) → group sums (MXU), /count
    col_sum = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    mean_g = jax.lax.dot_general(
        col_sum, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / count  # [1, G]
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, C]
    d = x - mean_c
    sq_sum = jnp.sum(d * d, axis=0, keepdims=True)  # [1, C]
    var_g = jax.lax.dot_general(
        sq_sum, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / count
    rsig_c = jax.lax.dot_general(
        jax.lax.rsqrt(var_g + eps), m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, C]
    y = d * rsig_c * scale_ref[...] + bias_ref[...]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _jnp_group_norm(x, scale, bias, groups, eps, act, add):
    """Fallback path — bit-identical math to models.layers.GroupNorm32."""
    dtype = x.dtype
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    if add is not None:
        xf = xf + add.astype(jnp.float32).reshape(
            (add.shape[0],) + (1,) * (x.ndim - 2) + (c,))
    shape = xf.shape[:-1] + (groups, c // groups)
    xg = xf.reshape(shape)
    red = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
    mean = jnp.mean(xg, axis=red, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=red, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(xf.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(dtype)


def _fused_impl(x, scale, bias, add, *, groups: int, eps: float, act: Optional[str]):
    b = x.shape[0]
    c = x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(b, hw, c)
    has_add = add is not None
    onehot = jnp.asarray(
        np.equal.outer(np.arange(c) // (c // groups), np.arange(groups)),
        dtype=jnp.float32,
    )  # [C, G]
    add3 = (add.astype(jnp.float32).reshape(b, 1, c) if has_add
            else jnp.zeros((b, 1, c), jnp.float32))
    out = pl.pallas_call(
        functools.partial(
            _norm_kernel, eps=eps, act=act,
            count=float(hw * (c // groups)), has_add=has_add,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, groups), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * hw * c,
            bytes_accessed=2 * b * hw * c * x.dtype.itemsize,
            transcendentals=b * hw * c if act else 0,
        ),
        interpret=INTERPRET,
    )(
        x3,
        add3,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
        onehot,
    )
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_op(x, scale, bias, add, groups, eps, act):
    return _fused_impl(x, scale, bias, add, groups=groups, eps=eps, act=act)


def _fused_fwd(x, scale, bias, add, groups, eps, act):
    return _fused_impl(x, scale, bias, add, groups=groups, eps=eps, act=act), (
        x, scale, bias, add)


def _fused_bwd(groups, eps, act, res, g):
    # backward differentiates the identical jnp math (training memory/precision
    # equals the unfused status quo; the fused kernel serves the forward)
    x, scale, bias, add = res
    if add is None:
        out, vjp = jax.vjp(
            lambda x, s, b: _jnp_group_norm(x, s, b, groups, eps, act, None),
            x, scale, bias)
        dx, ds, db = vjp(g)
        return dx, ds, db, None
    out, vjp = jax.vjp(
        lambda x, s, b, a: _jnp_group_norm(x, s, b, groups, eps, act, a),
        x, scale, bias, add)
    return vjp(g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def group_norm_silu(
    x: jnp.ndarray,               # [B, ..., C] (NHWC in practice)
    scale: jnp.ndarray,           # [C]
    bias: jnp.ndarray,            # [C]
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = "silu",
    add: Optional[jnp.ndarray] = None,  # [B, C] pre-norm bias (time embedding)
    use_fused: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm with optional pre-add and fused SiLU.

    Dispatches to the single-pass Pallas kernel when enabled and the per-item
    [HW, C] slab fits VMEM; identical jnp math otherwise."""
    fused = FUSED_DEFAULT if use_fused is None else use_fused
    c = x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    fits = hw * c * 4 <= _VMEM_SLAB_BYTES and hw >= 8
    if fused and fits and c % groups == 0 and c // groups >= 1:
        return _fused_op(x, scale, bias, add, groups, eps, act)
    return _jnp_group_norm(x, scale, bias, groups, eps, act, add)
