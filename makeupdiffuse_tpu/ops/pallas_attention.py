"""Pallas TPU flash attention for the UNet's spatial/cross attention.

Why: XLA's unfused attention materializes the [B·H, N, S] f32 logits in HBM — at the
UNet's level-0 resolution (N=S=1024, batch 16, 8 heads) that is ~0.5 GB of traffic
per attention layer per step. This kernel keeps K/V and the per-block softmax wholly
in VMEM: sequences here are short (S ≤ 1024 spatial tokens, 77 text tokens —
SURVEY.md §5 "long-context: not applicable"), so each (batch·head) program loads all
of K/V once (≤1.3 MB) and streams 128-row query blocks — flash attention degenerate
case with a single K block, no online rescaling needed.

Head dims are SD's 40/80/160 → zero-padded to the 128-lane tile; K-sequence padding
is masked with -inf before the softmax.

Backward is Pallas too: one program per (batch·head), streaming 128-row query
blocks against the full K/V (which fit VMEM at these lengths). dK/dV output blocks
map to the same VMEM block across the query-block grid dim, so they accumulate
in-place without an HBM round-trip per block — the sequential TPU grid makes this
a plain revisit, not a race. Softmax is recomputed from (q, k, v) residuals
(flash-standard: cheaper than storing the [N, S] probabilities), and
δ = Σ_j P∘dP replaces the usual Σ dO∘O so the forward output need not be saved.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha_attention

__all__ = ["flash_attention", "attention"]

INTERPRET = False  # CPU tests flip this to run the kernels in interpreter mode


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_valid: int):
    """One (batch·head, q-block) program: o = softmax(q·kᵀ·scale)·v, all in VMEM."""
    q = q_ref[0]  # [BQ, Dp]
    k = k_ref[0]  # [Sp, Dp]
    v = v_ref[0]  # [Sp, Dp]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Sp]
    sp = logits.shape[-1]
    if s_valid < sp:  # mask K padding
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_valid, logits, jnp.finfo(jnp.float32).min)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _flash_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q [B,N,H,D], k/v [B,S,H,D] → [B,N,H,D]."""
    b, n, h, d = q.shape
    s = k.shape[1]
    scale = float(d) ** -0.5

    dp = _round_up(d, 128)
    sp = _round_up(s, 128)
    bq = min(128, _round_up(n, 8))
    np_ = _round_up(n, bq)

    def to_bhnd(x, length, lp):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp - d)))

    qp = to_bhnd(q, n, np_)
    kp = to_bhnd(k, s, sp)
    vp = to_bhnd(v, s, sp)

    grid = (b * h, np_ // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_valid=s),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, dp), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * np_ * sp * dp,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * np_ * sp,
        ),
        interpret=INTERPRET,
    )(qp, kp, vp)
    out = out[:, :n, :d].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_fwd_impl(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, s_valid: int):
    """One (batch·head, q-block) program of the flash backward.

    dV = Pᵀ·dO, dP = dO·Vᵀ, δ = Σ_j P∘dP, dS = P∘(dP − δ)·scale,
    dQ = dS·K, dK += dSᵀ·Q — dK/dV blocks are revisited (accumulated) across the
    q-block grid dimension."""
    j = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, Dp]
    k = k_ref[0].astype(jnp.float32)  # [Sp, Dp]
    v = v_ref[0].astype(jnp.float32)  # [Sp, Dp]
    g = g_ref[0].astype(jnp.float32)  # [BQ, Dp]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Sp]
    sp = logits.shape[-1]
    if s_valid < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_valid, logits, jnp.finfo(jnp.float32).min)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [BQ, Sp]

    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, Sp]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [BQ, 1]
    ds = p * (dp - delta) * scale  # [BQ, Sp]

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Sp, Dp]
    dv_blk = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Sp, Dp]

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] += dk_blk.astype(dk_ref.dtype)
        dv_ref[0] += dv_blk.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, g):
    b, n, h, d = q.shape
    s = k.shape[1]
    scale = float(d) ** -0.5

    dp_ = _round_up(d, 128)
    sp = _round_up(s, 128)
    bq = min(128, _round_up(n, 8))
    np_ = _round_up(n, bq)

    def to_bhnd(x, length, lp):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp_ - d)))

    qp = to_bhnd(q, n, np_)
    kp = to_bhnd(k, s, sp)
    vp = to_bhnd(v, s, sp)
    gp = to_bhnd(g, n, np_)

    grid = (b * h, np_ // bq)
    kv_spec = pl.BlockSpec((1, sp, dp_), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, bq, dp_), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    # grads accumulate in f32 regardless of input dtype (bf16 += would lose bits)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, s_valid=s),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_, dp_), f32),
            jax.ShapeDtypeStruct((b * h, sp, dp_), f32),
            jax.ShapeDtypeStruct((b * h, sp, dp_), f32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * np_ * sp * dp_,
            bytes_accessed=2 * (qp.size + kp.size + vp.size + gp.size)
            * qp.dtype.itemsize,
            transcendentals=b * h * np_ * sp,
        ),
        interpret=INTERPRET,
    )(qp, kp, vp, gp)

    def from_bhnd(x, length, dtype):
        x = x[:, :length, :d].reshape(b, h, length, d)
        return jnp.transpose(x, (0, 2, 1, 3)).astype(dtype)

    return (from_bhnd(dq, n, q.dtype), from_bhnd(dk, s, k.dtype),
            from_bhnd(dv, s, v.dtype))


def _flash_bwd(res, g):
    q, k, v = res
    return _flash_bwd_impl(q, k, v, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# module-level switches: models consult these when their own flag is unset
FLASH_DEFAULT = False
FLASH_MIN_SEQ = 512  # self-attention length at which the kernel wins on v5e


def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel for large unmasked self-attention (where it
    beats/matches XLA's fused attention — measured on v5e), jnp/XLA otherwise.
    Small sequences and head dims pay more in 128-lane padding than they save."""
    flash = FLASH_DEFAULT if use_flash is None else use_flash
    large_self = q.shape[1] == k.shape[1] and k.shape[1] >= FLASH_MIN_SEQ
    if flash and mask is None and large_self:
        return flash_attention(q, k, v)
    return mha_attention(q, k, v, mask=mask)
