"""TPU-native ops: Pallas kernels (attention, fused norms) + image/mask utilities."""
from __future__ import annotations


def enable_tpu_kernels(enable: bool = True) -> bool:
    """Switch the Pallas fast paths (flash attention, fused GroupNorm+SiLU) on/off.

    Returns the value applied. Drivers call this once at startup on the real
    chip; the CPU test mesh leaves them off (kernels are covered separately in
    interpret mode, tests/test_pallas_kernels.py).

    Tuning overrides (whole-pipeline A/B knobs — per-dispatch timings through
    the axon tunnel mis-rank ops, CLAUDE.md): env vars MDT_FLASH_MIN_SEQ /
    MDT_FLASH_MIN_KV override the measured dispatch gates, and
    MDT_FUSED_NORM=0 / MDT_FLASH_ATTN=0 switch either kernel family off
    independently, when set."""
    import os

    from . import pallas_attention, pallas_norm

    pallas_attention.FLASH_DEFAULT = enable and os.environ.get("MDT_FLASH_ATTN") != "0"
    pallas_norm.FUSED_DEFAULT = enable and os.environ.get("MDT_FUSED_NORM") != "0"
    # both experiment knobs gate on `enable` so toggling the master switch in an
    # A/B sweep disables every fast path, pure-XLA rewrites included
    if os.environ.get("MDT_FUSE_QKV") is not None:
        pallas_attention.FUSE_QKV = enable and os.environ["MDT_FUSE_QKV"] == "1"
    if os.environ.get("MDT_FUSED_BLOCK") is not None:
        pallas_attention.FUSED_BLOCK = (enable
                                        and os.environ["MDT_FUSED_BLOCK"] == "1")
    for var, attr in (("MDT_FLASH_MIN_SEQ", "FLASH_MIN_SEQ"),
                      ("MDT_FLASH_MIN_KV", "FLASH_MIN_KV"),
                      ("MDT_FLASH_BLOCK_Q", "FLASH_BLOCK_Q")):
        val = os.environ.get(var)
        if val is not None:
            setattr(pallas_attention, attr, int(val))
    if os.environ.get("MDT_FLASH_DIET") is not None:
        pallas_attention.FLASH_DIET = (enable
                                       and os.environ["MDT_FLASH_DIET"] == "1")
    return enable


def enable_quant8(enable: bool = True) -> bool:
    """Switch the w8a8 dynamic-quantized UNet/ControlNet GEMM path on/off
    (ops/quant.py; QConv/QDense in models/layers.py read it at trace time).

    NUMERICS-CHANGING: int8 weights/activations on the MXU's 2x rate. Never
    implied by ``enable_tpu_kernels`` — drivers opt in explicitly
    (``bench.py --quant8``, ``scripts/serve.py --quant8``, env ``MDT_QUANT8=1``).
    Measured on-chip (PERF.md r5): +5.7% img/s, 31.7 dB output PSNR vs bf16 —
    bf16 stays the default. Inference-only: ``make_train_step`` refuses the
    knob (round/clip zeroes weight gradients)."""
    from . import quant

    quant.QUANT8 = bool(enable)
    return quant.QUANT8


def enable_tpu_kernels_if_tpu() -> bool:
    """Enable the Pallas fast paths iff the default JAX backend is a TPU-like
    device (the axon plugin registers as a non-cpu platform).

    NOTE: calling this initializes the JAX backend — drivers must invoke it
    AFTER any ``--cpu``/``jax_platforms`` handling (backend choice is frozen at
    first ``jax.devices()`` call; CLAUDE.md ordering constraint)."""
    import logging

    import jax

    try:
        platform = jax.devices()[0].platform
    except RuntimeError as e:  # no backend could initialize
        logging.getLogger(__name__).warning(
            "Pallas TPU kernels stay DISABLED: backend init failed (%s)", e)
        return False
    enabled = enable_tpu_kernels(platform not in ("cpu",))
    if not enabled:
        logging.getLogger(__name__).info(
            "Pallas TPU kernels disabled: default backend is %r", platform)
    return enabled
