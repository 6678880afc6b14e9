"""Pallas TPU flash attention for the UNet's spatial/cross attention.

Why: XLA's unfused attention materializes the [B·H, N, S] f32 logits in HBM — at the
UNet's level-0 resolution (N=S=1024, batch 16, 8 heads) that is ~0.5 GB of traffic
per attention layer per step. This kernel keeps K/V and the per-block softmax wholly
in VMEM: sequences here are short (S ≤ 1024 spatial tokens, 77 text tokens —
SURVEY.md §5 "long-context: not applicable"), so each (batch, head) program loads all
of K/V once and streams query blocks — flash attention degenerate case with a single
K block, no online rescaling needed.

Layout: blocks carry the TRUE head dim (40/80/160) and true S (incl. 77 text
tokens) — no zero-padding to the 128 lane tile in HBM. Mosaic accepts non-tile
minor dims when the block spans the whole array dim, pads tiles in VMEM
internally, and the DMA moves only real bytes; an earlier version padded
D→128 in HBM, which cost 3.2× the kernel's memory traffic plus pad/slice copies
(~23% of forward device time was copies — v5e profile, round 3). The only repack
left is the [B,N,H,D]→[B·H,N,D] head transpose, which Mosaic's BlockSpec rules
force (a packed [B,N,H·D] block would need a 40-lane stride — rejected by the
lowering). S=77 cross-attention rides the same kernel: its K/V block is the whole
77-row array dim, no masking needed.

Backward is Pallas too, same layout/grid. dK/dV output blocks map to the same VMEM
block across the q-block grid dim (innermost), so they accumulate in-place without
an HBM round-trip per block — the sequential TPU grid makes this a plain revisit,
not a race. Softmax is recomputed from (q, k, v) residuals (flash-standard), and
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


def _pick_bq(n: int, want: int) -> int:
    """Largest q-block ≤ `want` that divides n (n is a power-of-two spatial count
    in production; the gcd walk covers odd test shapes)."""
    bq = min(want, n)
    while n % bq:
        bq -= 1
    return bq


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch·head, q-block) program: o = softmax(q·kᵀ·scale)·v, all in VMEM."""
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]  # [S, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _to_bhnd(x: jnp.ndarray) -> jnp.ndarray:
    b, n, h, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)


def _flash_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q [B,N,H,D], k/v [B,S,H,D] → [B,N,H,D]."""
    b, n, h, d = q.shape
    s = k.shape[1]
    scale = float(d) ** -0.5
    bq = _pick_bq(n, FLASH_BLOCK_Q)

    q2, k2, v2 = _to_bhnd(q), _to_bhnd(k), _to_bhnd(v)

    q_spec = pl.BlockSpec((1, bq, d), lambda i, l: (i, l, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s, d), lambda i, l: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b * h, n // bq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * s * d,
            bytes_accessed=(q2.size + k2.size + v2.size) * q2.dtype.itemsize,
            transcendentals=b * h * n * s,
        ),
        interpret=INTERPRET,
    )(q2, k2, v2)
    out = out.reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_fwd_impl(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    """One (batch·head, q-block) program of the flash backward.

    dV = Pᵀ·dO, dP = dO·Vᵀ, δ = Σ_j P∘dP, dS = P∘(dP − δ)·scale,
    dQ = dS·K, dK += dSᵀ·Q — dK/dV blocks are revisited (accumulated) across the
    q-block grid dimension."""
    l_idx = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [S, D]
    v = v_ref[0].astype(jnp.float32)  # [S, D]
    g = g_ref[0].astype(jnp.float32)  # [BQ, D]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [BQ, S]

    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [BQ, 1]
    ds = p * (dp - delta) * scale  # [BQ, S]

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, D]
    dv_blk = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, D]

    @pl.when(l_idx == 0)
    def _init():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(l_idx > 0)
    def _accum():
        dk_ref[0] += dk_blk.astype(dk_ref.dtype)
        dv_ref[0] += dv_blk.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, g):
    b, n, h, d = q.shape
    s = k.shape[1]
    scale = float(d) ** -0.5
    bq = _pick_bq(n, FLASH_BLOCK_Q)

    q2, k2, v2, g2 = _to_bhnd(q), _to_bhnd(k), _to_bhnd(v), _to_bhnd(g)

    q_spec = pl.BlockSpec((1, bq, d), lambda i, l: (i, l, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s, d), lambda i, l: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # grads accumulate in f32 regardless of input dtype (bf16 += would lose bits)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), f32),
            jax.ShapeDtypeStruct((b * h, s, d), f32),
            jax.ShapeDtypeStruct((b * h, s, d), f32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b * h, n // bq),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n * s * d,
            bytes_accessed=2 * (q2.size + k2.size + v2.size + g2.size)
            * q2.dtype.itemsize,
            transcendentals=b * h * n * s,
        ),
        interpret=INTERPRET,
    )(q2, k2, v2, g2)

    def unpack(x, length, dtype):
        x = x.reshape(b, h, length, d)
        return jnp.transpose(x, (0, 2, 1, 3)).astype(dtype)

    return unpack(dq, n, q.dtype), unpack(dk, s, k.dtype), unpack(dv, s, v.dtype)


def _flash_bwd(res, g):
    q, k, v = res
    return _flash_bwd_impl(q, k, v, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# module-level switches: models consult these when their own flag is unset
FLASH_DEFAULT = False
FLASH_MIN_SEQ = 512  # q-length at which the kernel wins on v5e
FLASH_MIN_KV = 512   # kv-length too: 77-token cross is faster unfused (sweep_attn)
FLASH_BLOCK_Q = 256  # q rows per program (clamped to divide N)


def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel only where it measurably wins on v5e —
    long-q AND long-KV unmasked attention (the 1024-token UNet level and the VAE
    block). The 77-token-KV cross layers and the 256-token self level run faster
    on XLA's unfused path (tools/sweep_attn.py, v5e, 2026-08-18: cross-1024
    0.689 ms XLA vs 0.737 ms flash; self-256 0.659 vs 0.702) — a round-3
    FLASH_MIN_SEQ=256 + cross-on-flash experiment regressed the e2e bench
    4.15→4.01 img/s and was reverted."""
    flash = FLASH_DEFAULT if use_flash is None else use_flash
    if (flash and mask is None and q.shape[1] >= FLASH_MIN_SEQ
            and k.shape[1] >= FLASH_MIN_KV):
        return flash_attention(q, k, v)
    return mha_attention(q, k, v, mask=mask)
