"""Multi-head attention ops for the UNet's spatial transformers.

The reference gets attention from ldm's ``CrossAttention`` (softmax(QKᵀ/√d)V with
heads=8, dim_head=C/8) inside ``SpatialTransformer`` blocks at latent resolutions
{32,16,8} (yaml attention_resolutions [4,2,1], /root/reference/diffmodels/
base_diffusion_makeup.yaml:59,76) plus 77-token CLIP cross-attention.

TPU-first design:
  * Sequences are short (≤4096 spatial tokens, 77 text tokens) so the win is keeping
    the whole op in VMEM and fusing softmax with the two matmuls. `mha_attention`
    is the XLA path (einsum-fused, bf16-friendly, f32 softmax).
  * `flash_attention` is a Pallas kernel for the hot self-attention sizes: one
    (batch·head) program per grid step, K/V streamed in VMEM blocks with an online
    softmax — used on the inference path (see ops/pallas_attention.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha_attention(
    q: jnp.ndarray,  # [B, Nq, H, D]
    k: jnp.ndarray,  # [B, Nk, H, D]
    v: jnp.ndarray,  # [B, Nk, H, D]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Nq, Nk]
) -> jnp.ndarray:
    """Reference multi-head attention; softmax in float32, output in input dtype."""
    dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def causal_mask(n: int) -> jnp.ndarray:
    """[1, 1, n, n] lower-triangular mask (True = attend) for the CLIP text tower."""
    return jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]
