"""Spatial parallelism (sp): shard ACTIVATIONS over the image height axis.

The reference is single-GPU (pl.Trainer(gpus=1), /root/reference/runs/train.py:55)
and its latency floor for one 256² transfer is one GPU's forward. Here a single
sample's eps forward can be spread over several chips by sharding the NHWC
activations on H — the TPU-native route to LATENCY scaling (batch=1, big image),
where DP/TP buy little:

* Convolutions: GSPMD spatially partitions them, inserting halo exchanges over
  ICI for the kernel overlap rows — no model-code changes, the placement IS the
  program (scaling-book recipe: annotate IO, let XLA insert collectives).
* Self-attention: the (B, H·W, C) flatten keeps H as the major axis of the
  merged sequence dim, so the sharding propagates; XLA gathers K/V along the
  sequence for the QKᵀ contraction — the Megatron sequence-parallel pattern,
  and like Megatron-SP the sp axis RIDES the ``model`` mesh axis (same ICI
  group as TP; dp×sp meshes therefore reuse make_mesh unchanged).
* GroupNorm's spatial reductions become psums over the model axis.

* Self-attention can instead run as a shard_map island (``sp_attn=`` below):
  all-gather K/V + the per-device Pallas flash kernel (the right collective at
  ≤1024 tokens), or a ppermute ring with online-softmax combine (the
  long-sequence pattern) — ops/sp_attention.py. This closes the round-3 "flash
  kernel needs a shard_map ring" deferral: the kernel now runs on
  sequence-sharded activations.

Equivalence vs the replicated forward is pinned on the 8-device CPU mesh
(tests/test_sharding.py::test_sp_forward_matches_replicated, ::test_sp_attention_modes)
and the driver's dryrun compiles + runs a dp2×sp4 segment, both GSPMD-attention
and flash-island variants (__graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def activation_spec(batch_sharded: bool = True) -> P:
    """NHWC activation spec: batch on ``data`` (optional), H on ``model``."""
    return P(DATA_AXIS if batch_sharded else None, MODEL_AXIS, None, None)


def sp_shard_inputs(mesh: Mesh, x, t, ctx, hint):
    """Place one eps-forward input set for a dp×sp mesh: images sharded on
    (data=batch, model=H), per-sample vectors on batch only."""
    nhwc = NamedSharding(mesh, activation_spec())
    vec = NamedSharding(mesh, P(DATA_AXIS))
    seq = NamedSharding(mesh, P(DATA_AXIS, None, None))
    return (jax.device_put(x, nhwc), jax.device_put(t, vec),
            jax.device_put(ctx, seq), jax.device_put(hint, nhwc))


def make_sp_eps_fn(model, mesh: Mesh, sp_attn: str | None = None):
    """Jit the eps forward with sp IO shardings: params replicated, latent/hint
    sharded (batch over ``data``, H over ``model``), eps out sharded the same.
    GSPMD propagates the spatial sharding through the UNet+ControlNet — halo
    exchanges for convs, sequence gathers for attention — purely from these
    annotations.

    ``sp_attn``: None (default) leaves attention to GSPMD; "allgather" or
    "ring" routes eligible self-attention calls through the shard_map island in
    ops/sp_attention.py (all-gather K/V + per-device flash kernel, or a
    ppermute ring). The switch is consulted at TRACE time, so it is set/cleared
    around the model.apply inside the jitted body — same global-switch pattern
    as the kernel knobs in ops/__init__.py."""
    nhwc = NamedSharding(mesh, activation_spec())
    rep = NamedSharding(mesh, P())
    vec = NamedSharding(mesh, P(DATA_AXIS))
    seq = NamedSharding(mesh, P(DATA_AXIS, None, None))

    def fn(p, x, t, ctx, hint):
        if sp_attn is None:
            return model.apply(p, x, t, ctx, hint, method=model.apply_eps)
        from ..ops import sp_attention
        prev = (sp_attention.MESH, sp_attention.MODE,
                sp_attention.DATA_AXIS, sp_attention.SEQ_AXIS)
        sp_attention.enable(mesh, mode=sp_attn,
                            data_axis=DATA_AXIS, seq_axis=MODEL_AXIS)
        try:
            return model.apply(p, x, t, ctx, hint, method=model.apply_eps)
        finally:
            (sp_attention.MESH, sp_attention.MODE,
             sp_attention.DATA_AXIS, sp_attention.SEQ_AXIS) = prev

    return jax.jit(fn, in_shardings=(rep, nhwc, vec, seq, nhwc),
                   out_shardings=nhwc)


def sp_shard_sample_inputs(mesh: Mesh, x_T, src, ref, ctx, uctx):
    """Place one product-transfer input set for a dp×sp mesh: latent noise and
    source/reference images sharded on (data=batch, model=H), CLIP contexts on
    batch only."""
    nhwc = NamedSharding(mesh, activation_spec())
    seq = NamedSharding(mesh, P(DATA_AXIS, None, None))
    put = jax.device_put
    return (put(x_T, nhwc), put(src, nhwc), put(ref, nhwc),
            put(ctx, seq), put(uctx, seq))


def make_sp_sample_fn(model, mesh: Mesh, tables, cfg_scale: float = 9.0,
                      sp_attn: str | None = None):
    """Jit the FULL product transfer chain — CFG denoiser → sampler scan → VAE
    decode (api.transfer's exact math) — with sp IO shardings, so one sample's
    latency is spread over the ``model`` axis. This is what spatial parallelism
    is FOR: the reference's latency floor is one GPU's 50-step chain
    (/root/reference/diffmk/diffusion_makeup.py:292-303, single device per
    runs/test.py:55); here the same chain runs with every activation's H axis
    sharded over ICI, batch-1 included.

    ``tables`` may be ``core.ddim.DDIMTables`` or ``core.dpm_solver.DPMTables``
    (the fast path), mirroring api.transfer. ``sp_attn`` as in make_sp_eps_fn:
    None → GSPMD attention; "allgather"/"ring" → shard_map islands around the
    Pallas kernel (ops/sp_attention.py).

    Returns ``fn(params, x_T, src_img, ref_img, context, uncond_context) ->
    [-1,1] image``, with inputs placed by ``sp_shard_sample_inputs``.
    Equivalence vs the replicated api.transfer chain is pinned in
    tests/test_sharding.py::test_sp_sample_matches_replicated."""
    import jax.numpy as jnp
    from ..core.ddim import DDIMTables, ddim_sample
    from ..core.dpm_solver import DPMTables, dpmpp_2m_sample
    from ..models.controlled_ldm import make_denoiser

    nhwc = NamedSharding(mesh, activation_spec())
    rep = NamedSharding(mesh, P())
    seq = NamedSharding(mesh, P(DATA_AXIS, None, None))

    if isinstance(tables, DPMTables):
        sample = dpmpp_2m_sample
    elif isinstance(tables, DDIMTables):
        sample = ddim_sample
    else:
        raise TypeError(f"tables must be DDIMTables or DPMTables, got {type(tables)}")

    def chain(p, x_T, src, ref, ctx, uctx):
        hint = jnp.concatenate([src, ref], axis=-1)
        den = make_denoiser(model, p, ctx, hint,
                            uncond_context=uctx, cfg_scale=cfg_scale)
        z = sample(den, x_T, tables)
        img = model.apply(p, z, method=model.decode_latent)
        return jnp.clip(img, -1.0, 1.0)

    def fn(p, x_T, src, ref, ctx, uctx):
        if sp_attn is None:
            return chain(p, x_T, src, ref, ctx, uctx)
        from ..ops import sp_attention
        prev = (sp_attention.MESH, sp_attention.MODE,
                sp_attention.DATA_AXIS, sp_attention.SEQ_AXIS)
        sp_attention.enable(mesh, mode=sp_attn,
                            data_axis=DATA_AXIS, seq_axis=MODEL_AXIS)
        try:
            return chain(p, x_T, src, ref, ctx, uctx)
        finally:
            (sp_attention.MESH, sp_attention.MODE,
             sp_attention.DATA_AXIS, sp_attention.SEQ_AXIS) = prev

    return jax.jit(fn, in_shardings=(rep, nhwc, nhwc, nhwc, seq, seq),
                   out_shardings=nhwc)
