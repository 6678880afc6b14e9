"""w8a8 dynamic-quantized conv / dense for the eps-forward hot path.

Beyond-reference serving lever: the reference (jiean001/MakeupDiffuse) runs
everything fp32 on GPU (`/root/reference/runs/test.py:55` — ``precision=32``)
and has no quantized path. On TPU v5e the MXU executes int8 at 2x the bf16
rate (394.7 TOPs vs 197 TFLOPs peak); MEASURED on-chip (PERF.md r5) the
dynamic-quant overhead caps the op-level gain at ~1.18x and the whole
50-step pipeline at **+5.7% img/s for 31.7 dB output PSNR vs bf16** — so the
hoped >10% is refuted and bf16 stays the default; this path is the measured
opt-in (`bench.py --quant8`, `scripts/serve.py --quant8`, `MDT_QUANT8=1`).

Scheme (standard w8a8 dynamic PTQ):
  * weights: symmetric per-output-channel int8, quantized in-graph from the
    live f32 params (no checkpoint surgery; scales are exact at every call).
    Zero-init layers (ControlNet zero-convs, ``zero_module`` parity) get a
    floor on the scale so 0-weights stay exactly 0 after dequant.
  * activations: symmetric per-tensor dynamic int8 (absmax each call) — one
    VPU reduce+scale pass, trivial next to the conv FLOPs at 32x32 latents.
  * accumulate s32 on the MXU (``preferred_element_type=int32``), dequantize
    with the folded ``s_x * s_w[o]`` per-output-channel factor, add bias.

The master knob ``QUANT8`` is trace-time state like the pallas knobs
(``ops.enable_tpu_kernels`` / env ``MDT_QUANT8``); toggling requires a fresh
trace, which every bench/driver already performs. Numerics cost is measured,
not assumed: tests pin quant error bounds, and PERF.md carries the
whole-pipeline A/B (img/s and output-PSNR-vs-bf16) that decides the default.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Master knob — read at TRACE time by QConv/QDense (models/layers.py).
QUANT8 = False


def quantize_symmetric(
    v: jnp.ndarray, axes: Optional[Sequence[int]] = None, eps: float = 1e-12
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization: returns (q, scale) with v ~= q * scale.

    ``axes=None`` -> one per-tensor scale; otherwise scales keep dims over
    ``axes`` (per-channel when axes = all-but-channel). The eps floor keeps
    all-zero tensors (zero-conv params) exact: q=0, scale=eps -> dequant 0.
    """
    vf = v.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(vf), axis=axes, keepdims=axes is not None)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def qconv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """NHWC x HWIO conv on the int8 MXU path; s32 accumulate, f32 dequant."""
    out_dtype = out_dtype or x.dtype
    kq, ks = quantize_symmetric(kernel, axes=(0, 1, 2))  # per-O scale [1,1,1,O]
    xq, xs = quantize_symmetric(x)  # per-tensor scale []
    o = lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * (xs * ks.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def qdense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """[..., K] @ [K, N] on the int8 MXU path; s32 accumulate, f32 dequant."""
    out_dtype = out_dtype or x.dtype
    kq, ks = quantize_symmetric(kernel, axes=(0,))  # per-N scale [1, N]
    xq, xs = quantize_symmetric(x)
    o = lax.dot_general(
        xq, kq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * (xs * ks.reshape((1,) * (x.ndim - 1) + (-1,)))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
