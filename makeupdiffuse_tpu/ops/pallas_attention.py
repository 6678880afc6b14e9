"""Pallas TPU flash attention for the UNet's spatial/cross attention.

Why: XLA's unfused attention materializes the [B·H, N, S] f32 logits in HBM — at the
UNet's level-0 resolution (N=S=1024, batch 16, 8 heads) that is ~0.5 GB of traffic
per attention layer per step. This kernel keeps K/V and the per-block softmax wholly
in VMEM: sequences here are short (S ≤ 1024 spatial tokens, 77 text tokens —
SURVEY.md §5 "long-context: not applicable"), so each program loads all of K/V once
and streams query blocks — flash attention degenerate case with a single K block,
no online rescaling needed.

Layout (v3, "packed"): blocks carry the model-native packed channel dim
[B, N, H·D] and the kernel loops heads over static lane slices. This removes BOTH
layout costs earlier versions paid in HBM:
  v1 padded D 40/80/160 → 128 lanes in HBM (3.2× memory traffic + pad/slice
     copies ≈ 23% of forward device time — v5e profile, PERF.md);
  v2 carried true-D blocks but still did the [B,N,H,D]→[B·H,N,D] head transpose
     in HBM (copy.138x ≈ 1.7 ms/forward).
Measured on v5e at the level-0 shape (B16 N1024 C320 H8, tools/exp_packed_attn.py):
XLA 1.45 ms, v2 transpose+kernel 0.64 ms, packed 0.35 ms per call. The per-head
lane slices (D=40/80/160 at D-aligned offsets) are VMEM-local relayouts, far
cheaper than the HBM transpose they replace.

Backward is Pallas too, same packed layout/grid. dK/dV output blocks map to the
same VMEM block across the q-block grid dim (innermost), so they accumulate
in-place without an HBM round-trip per block — the sequential TPU grid makes this
a plain revisit, not a race. Softmax is recomputed from (q, k, v) residuals
(flash-standard), and δ = Σ_j P∘dP replaces the usual Σ dO∘O so the forward
output need not be saved.

Reference behavior reproduced: ldm CrossAttention / AttnBlock softmax(QKᵀ/√d)V
(used via /root/reference/diffmk/makeup_teacher.py:100-118 apply_model's UNet).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha_attention

__all__ = ["flash_attention", "packed_flash_attention", "attention"]

INTERPRET = False  # CPU tests flip this to run the kernels in interpreter mode


def _pick_bq(n: int, want: int) -> int:
    """Largest q-block ≤ `want` that divides n (n is a power-of-two spatial count
    in production; the gcd walk covers odd test shapes)."""
    bq = min(want, n)
    while n % bq:
        bq -= 1
    return bq


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """One (batch, q-block) program: per head h, o_h = softmax(q_h·k_hᵀ·scale)·v_h,
    all in VMEM via static lane slices of the packed [rows, H·D] blocks.

    Softmax diet (r4, default ON — +1.05% e2e measured whole-pipeline): the
    1/Σp normalization is folded into the [BQ,D] OUTPUT (S/D ≈ 25× fewer
    division-elements) and exp runs as exp2 with log2(e) pre-folded into the
    logit scale — one fewer [BQ,S] VPU pass through the softmax chain. The diet
    body keeps one extra buffer live, so FLASH_BLOCK_Q ships at 512 (1024
    overflows Mosaic's 16M scoped VMEM at the level-0 and VAE shapes); the
    block size itself is timing-neutral (default body: 4.6389 @1024 vs 4.6358
    @512). MDT_FLASH_DIET=0 restores the round-3 body for A/B.

    Head packing (VERDICT r4 #4's candidate — P heads per MXU pass via
    block-diagonal K/V) is REFUTED, twice over: Mosaic cannot express it
    in-kernel ('unsupported shape cast' for the rank-3 softmax view;
    'result/input offset mismatch on non-concat dimension' for the 2-D
    block-diag concats), and MXU pass counting shows it cannot win anyway —
    logits passes are bounded by output tiles × K-chunks, and block-diag zeros
    add output columns exactly as fast as they deepen the contraction. See
    PERF.md."""
    d = q_ref.shape[-1] // heads
    s2 = scale * 1.4426950408889634  # scale·log2(e): softmax via exp2
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]  # [BQ, D]
        k = k_ref[0, :, sl]  # [S, D]
        v = v_ref[0, :, sl]  # [S, D]
        if FLASH_DIET:
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2  # [BQ, S]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)  # [BQ, 1]
            o = jax.lax.dot_general(  # unnormalized p·V, then row-scale
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [BQ, D]
            o_ref[0, :, sl] = (o * inv).astype(o_ref.dtype)
        else:  # round-3 body (A/B reference)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [BQ, S]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            o_ref[0, :, sl] = jax.lax.dot_general(
                w, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _packed_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     heads: int) -> jnp.ndarray:
    """q [B,N,C], k/v [B,S,C] with C = heads·D → [B,N,C]."""
    b, n, c = q.shape
    s = k.shape[1]
    scale = float(c // heads) ** -0.5
    bq = _pick_bq(n, FLASH_BLOCK_Q)

    q_spec = pl.BlockSpec((1, bq, c), lambda i, l: (i, l, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s, c), lambda i, l: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, n // bq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * s * c,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n * s * heads,
        ),
        interpret=INTERPRET,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           heads: int) -> jnp.ndarray:
    """Flash attention on model-native packed [B, N, H·D] tensors."""
    return _packed_fwd_impl(q, k, v, heads)


def _packed_fwd(q, k, v, heads):
    return _packed_fwd_impl(q, k, v, heads), (q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                heads: int, scale: float):
    """One (batch, q-block) program of the flash backward, per head:

    dV = Pᵀ·dO, dP = dO·Vᵀ, δ = Σ_j P∘dP, dS = P∘(dP − δ)·scale,
    dQ = dS·K, dK += dSᵀ·Q — dK/dV blocks are revisited (accumulated) across the
    q-block grid dimension."""
    l_idx = pl.program_id(1)
    d = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0, :, sl].astype(jnp.float32)  # [S, D]
        v = v_ref[0, :, sl].astype(jnp.float32)  # [S, D]
        g = g_ref[0, :, sl].astype(jnp.float32)  # [BQ, D]

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

        dq_ref[0, :, sl] = jax.lax.dot_general(
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
            dk_ref[0, :, sl] = dk_blk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv_blk.astype(dv_ref.dtype)

        @pl.when(l_idx > 0)
        def _accum():
            dk_ref[0, :, sl] += dk_blk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] += dv_blk.astype(dv_ref.dtype)


def _packed_bwd_impl(q, k, v, g, heads):
    b, n, c = q.shape
    s = k.shape[1]
    scale = float(c // heads) ** -0.5
    bq = _pick_bq(n, FLASH_BLOCK_Q_BWD)

    q_spec = pl.BlockSpec((1, bq, c), lambda i, l: (i, l, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s, c), lambda i, l: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # grads accumulate in f32 regardless of input dtype (bf16 += would lose bits)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), f32),
            jax.ShapeDtypeStruct((b, s, c), f32),
            jax.ShapeDtypeStruct((b, s, c), f32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, n // bq),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n * s * c,
            bytes_accessed=2 * (q.size + k.size + v.size + g.size)
            * q.dtype.itemsize,
            transcendentals=b * n * s * heads,
        ),
        interpret=INTERPRET,
    )(q, k, v, g)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _packed_bwd(heads, res, g):
    q, k, v = res
    return _packed_bwd_impl(q, k, v, g, heads)


packed_flash_attention.defvjp(_packed_fwd, _packed_bwd)


def _block_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                  bo_ref, o_ref, *, heads: int, eps: float):
    """One batch item of the fused self-attention sub-block:

        y = x + to_out(flash_attn(LayerNorm(x))) ,  qkv projections included.

    Everything after the single [N, C] load happens in VMEM: the LN stats, the
    three qkv matmuls (MXU), the per-head softmax·V (v3 lane-slice loop), the
    output projection and the residual add. This removes the HBM layout
    boundaries XLA otherwise inserts between the LN reduce, the projection
    fusions and the attention custom call (~0.2 ms copies per boundary at
    level-0 — tools/sweep_norm.py breakdown, PERF.md)."""
    x = x_ref[0]  # [N, C]
    xf = x.astype(jnp.float32)
    c = x.shape[-1]
    d = c // heads
    scale = float(d) ** -0.5
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * lns_ref[...] + lnb_ref[...]).astype(x.dtype)  # [N, C]
    q = jax.lax.dot_general(  # [N, C] @ [C, C], f32 accumulate on the MXU
        xn, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    k = jax.lax.dot_general(
        xn, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    v = jax.lax.dot_general(
        xn, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [N, N]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(jax.lax.dot_general(
            w, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
    att = jnp.concatenate(outs, axis=-1)  # [N, C]
    y = jax.lax.dot_general(
        att, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...] + xf
    o_ref[0] = y.astype(o_ref.dtype)


def _block_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps):
    b, n, c = x.shape
    x_spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cd = x.dtype
    return pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[x_spec, v_spec, v_spec, w_spec, w_spec, w_spec, w_spec,
                      v_spec],
            out_specs=x_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (4 * c + 2 * n),
            bytes_accessed=2 * b * n * c * x.dtype.itemsize + 4 * c * c,
            transcendentals=b * n * n * heads,
        ),
        interpret=INTERPRET,
    )(
        x,
        ln_scale.astype(jnp.float32).reshape(1, c),
        ln_bias.astype(jnp.float32).reshape(1, c),
        wq.astype(cd), wk.astype(cd), wv.astype(cd), wo.astype(cd),
        bo.astype(jnp.float32).reshape(1, c),
    )


def _block_reference(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps):
    """Identical jnp math — the backward path and the CPU/ragged fallback."""
    cd = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(cd)
    q, k, v = (xn @ wq.astype(cd), xn @ wk.astype(cd), xn @ wv.astype(cd))
    b, n, c = x.shape
    d = c // heads
    att = mha_attention(q.reshape(b, n, heads, d), k.reshape(b, n, heads, d),
                        v.reshape(b, n, heads, d)).reshape(b, n, c)
    # output projection kept in f32 before the residual add, matching the Pallas
    # kernel's f32 accumulator — the custom_vjp backward differentiates THIS
    # function, so fwd value and grad must agree at bf16 rounding scale
    y = att.astype(jnp.float32) @ wo.astype(jnp.float32) + bo.astype(jnp.float32) + xf
    return y.astype(cd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_attention_block(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                          heads: int, eps: float = 1e-5):
    """y = x + to_out(attn(LayerNorm(x))) as ONE Pallas program per batch item
    (models/layers.BasicTransformerBlock attn1 sub-block).

    MEASURED RESULT (v5e, 2026-08-18): numerics at bf16 scale, but e2e the
    monolith LOSES to the default path (4.53 vs 4.64 img/s): Mosaic's K=320
    projection matmuls run slower than XLA's gemm fusions, and the single
    kernel forfeits cross-op overlap — more than the ~0.2 ms/boundary layout
    copies it eliminates. Kept behind FUSED_BLOCK (default OFF) as the
    documented design point; the flash-attention-only kernel remains the
    shipped dispatch."""
    return _block_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps)


def _block_fwd(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps):
    out = _block_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, wo, bo)


def _block_bwd(heads, eps, res, g):
    # backward differentiates the identical jnp math (training numerics equal
    # the unfused status quo; the fused kernel serves the inference forward)
    x, ln_scale, ln_bias, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _block_reference(*a, heads, eps),
        x, ln_scale, ln_bias, wq, wk, wv, wo, bo)
    return vjp(g)


fused_attention_block.defvjp(_block_fwd, _block_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Head-split [B,N,H,D] convenience wrapper. The [B,N,H,D]↔[B,N,H·D]
    reshapes are free (contiguous), so this IS the packed kernel — no HBM
    layout work."""
    b, n, h, d = q.shape
    s = k.shape[1]
    out = packed_flash_attention(
        q.reshape(b, n, h * d), k.reshape(b, s, h * d), v.reshape(b, s, h * d), h
    )
    return out.reshape(b, n, h, d)


# module-level switches: models consult these when their own flag is unset
FLASH_DEFAULT = False
FLASH_DIET = True    # fwd softmax diet: exp2 + normalization folded into the output
                     # (+1.05% e2e measured; MDT_FLASH_DIET=0 restores r3 body)
FLASH_MIN_SEQ = 512  # q-length at which the kernel wins on v5e
FLASH_MIN_KV = 512   # kv-length too: 77-token cross is faster unfused (sweep_attn)
FUSE_QKV = False     # self-attn q/k/v as one matmul (models/layers.CrossAttention)
FUSED_BLOCK = False  # whole attn1 sub-block (LN+qkv+attn+proj+residual) as one kernel
FUSED_BLOCK_MAX_SEQ = 1024  # [N,N] f32 logits must fit VMEM alongside the slab
FLASH_BLOCK_Q = 512       # fwd q rows per program (clamped to divide N); 512 is
                          # required by the diet body's VMEM footprint and is
                          # timing-neutral for the r3 body (PERF.md r4 table)
FLASH_BLOCK_Q_BWD = 256   # bwd is ~3 live [BQ,S] f32 arrays per head — keep small


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
    from . import sp_attention  # lazy: sp_attention imports this module
    if sp_attention.applicable(q, k, mask):
        # spatial parallelism: sequence axis is sharded — run as a shard_map
        # island (all-gather K/V + per-device flash, or a ppermute ring) so the
        # Pallas kernel stays usable on sharded activations (ops/sp_attention.py)
        return sp_attention.sp_self_attention(q, k, v, use_flash=flash)
    if (flash and mask is None and q.shape[1] >= FLASH_MIN_SEQ
            and k.shape[1] >= FLASH_MIN_KV):
        return flash_attention(q, k, v)
    return mha_attention(q, k, v, mask=mask)
