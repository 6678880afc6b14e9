"""Jitted histogram matching — the reference's CPU/numpy detour, rebuilt as XLA ops.

Capability parity: /root/reference/diffmk/histogram_matching.py. The reference builds
256-bin cumulative histograms per channel over *gathered masked pixel lists* on the
host (cal_hist :5-23), a monotone transfer table with an O(256²) Python loop
(cal_trans :26-38), applies it pixel-by-pixel, and round-trips GPU→CPU→GPU inside the
loss (:48-50,65).

TPU-first rebuild:
  * dense masks + weighted histograms instead of gather-by-nonzero (static shapes);
  * the table loop becomes one vectorized `searchsorted` over the two CDFs;
  * everything stays on device and jit-compiles; `stop_gradient` marks the matched
    image as a target (the reference's gradient flows only through the input side,
    /root/reference/diffmk/makeups.py:244).

Semantics notes (kept bit-faithful to cal_trans):
  * intensities are binned as floor(clip(x, 0, 255));
  * table[i] = first j ≥ 1 with ref_cdf[j-1] ≤ dst_cdf[i] ≤ ref_cdf[j], identity when
    no such j exists, table[255] = 255.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_cdf", "transfer_table", "histogram_matching", "masked_histogram_match"]

_BINS = 256


def masked_cdf(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 256-bin cumulative histogram of intensities in [0, 255].

    x: [...] float intensities; weight: same shape, mask/weights.
    Returns [256] CDF normalized to 1 (all-zero weight → zeros).
    """
    idx = jnp.clip(x, 0.0, 255.0).astype(jnp.int32).reshape(-1)
    w = weight.reshape(-1).astype(jnp.float32)
    hist = jnp.zeros((_BINS,), jnp.float32).at[idx].add(w)
    total = jnp.maximum(hist.sum(), 1e-12)
    return jnp.cumsum(hist) / total


def transfer_table(dst_cdf: jnp.ndarray, ref_cdf: jnp.ndarray) -> jnp.ndarray:
    """Monotone intensity map: dst intensity i → ref intensity table[i].

    Vectorized equivalent of the reference's cal_trans double loop
    (histogram_matching.py:26-38)."""
    ident = jnp.arange(_BINS, dtype=jnp.int32)
    j = jnp.clip(
        jnp.searchsorted(ref_cdf, dst_cdf, side="left"), 1, _BINS - 1
    ).astype(jnp.int32)
    found = ref_cdf[j - 1] <= dst_cdf
    table = jnp.where(found, j, ident)
    # loop starts at i=1 (i=0 keeps identity) and table[255] is forced to 255
    table = table.at[0].set(0).at[_BINS - 1].set(_BINS - 1)
    return table


def histogram_matching(
    dst: jnp.ndarray,  # [C, ...] or [..., C] float intensities in [0, 255]
    ref: jnp.ndarray,
    dst_mask: jnp.ndarray,  # broadcastable to one channel's shape, {0,1}
    ref_mask: jnp.ndarray,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Match dst's masked-region histogram to ref's, per channel; unmasked pixels
    pass through unchanged. Differentiable-adjacent: output is stop_gradient'ed."""
    dst_c = jnp.moveaxis(dst, channel_axis, 0)
    ref_c = jnp.moveaxis(ref, channel_axis, 0)

    def match_channel(d, r):
        d_cdf = masked_cdf(d, jnp.broadcast_to(dst_mask, d.shape))
        r_cdf = masked_cdf(r, jnp.broadcast_to(ref_mask, r.shape))
        table = transfer_table(d_cdf, r_cdf).astype(d.dtype)
        idx = jnp.clip(d, 0.0, 255.0).astype(jnp.int32)
        matched = table[idx]
        return jnp.where(jnp.broadcast_to(dst_mask, d.shape) > 0, matched, d)

    out = jax.vmap(match_channel)(dst_c, ref_c)
    return jax.lax.stop_gradient(jnp.moveaxis(out, 0, channel_axis))


def masked_histogram_match(
    dst_img: jnp.ndarray,  # [H, W, 3] in [-1, 1]
    ref_img: jnp.ndarray,  # [H, W, 3] in [-1, 1]
    dst_mask: jnp.ndarray,  # [H, W] {0,1}
    ref_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience wrapper over [-1,1] images (the loss-side scale the reference uses:
    (img+1)·127.5 before matching, /root/reference/diffmk/makeups.py:236-244)."""
    d255 = (dst_img + 1.0) * 127.5
    r255 = (ref_img + 1.0) * 127.5
    matched = histogram_matching(d255, r255, dst_mask, ref_mask, channel_axis=-1)
    return matched / 127.5 - 1.0
