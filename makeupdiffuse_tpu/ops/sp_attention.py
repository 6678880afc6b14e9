"""Self-attention on sequence-sharded activations (spatial parallelism).

Under sp (parallel/spatial.py) the NHWC activations are sharded over image H, so
the transformer blocks see q/k/v whose flattened H·W sequence axis is sharded
over the ``model`` mesh axis. GSPMD can run that attention by all-gathering K/V
itself, but it cannot call the Pallas flash kernel (a per-device program) on
sharded operands — the kernel disappears from the sp path. This module closes
that gap (the item spatial.py:19-22 deferred): the self-attention call becomes a
``jax.shard_map`` island inside the jitted forward, with two comm strategies:

* ``allgather`` (default): all-gather K/V along the sequence axis over ICI, then
  run the per-device flash kernel (or XLA attention) on the LOCAL query rows
  against the full K/V. For this model's sequence lengths (≤1024 spatial tokens,
  SURVEY.md §2c "long-context: not applicable") this is the right collective:
  K/V per (batch, layer) is ≤1024·C·2B ≈ 0.6 MB — one cheap all-gather versus a
  ring's n_sp pipelined hops, and the flash kernel already loads all of K/V per
  program (degenerate single-K-block flash, ops/pallas_attention.py:6-9), so the
  gathered operand is exactly what it wants. This is the Megatron-SP treatment
  of attention under sequence sharding.
* ``ring``: K/V chunks rotate around the ``model`` axis via ``lax.ppermute``
  with a flash-style online-softmax combine (f32 running max/denominator) — no
  device ever holds the full K/V. Memory-optimal and the canonical long-sequence
  pattern (Ring Attention); at the current 1024-token ceiling it only adds hop
  latency, so it ships as the documented long-sequence path, equivalence-pinned
  like everything else (tests/test_sharding.py::test_sp_attention_modes).

Both modes are numerically the reference softmax(QKᵀ/√d)V — the same op the
torch reference gets from ldm CrossAttention (used via
/root/reference/diffmk/makeup_teacher.py:100-118); sharding changes the
schedule, never the math.

Dispatch: models/layers.py calls ops.pallas_attention.attention(); that function
consults this module (enabled trace-time by parallel.spatial.make_sp_eps_fn) and
routes eligible self-attention calls here. Cross-attention (77-token K/V) stays
on the GSPMD path — each device attends its local query rows against the
replicated text context, no collective needed.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Trace-time configuration, set/cleared by parallel.spatial.make_sp_eps_fn.
# Plain module globals in the style of pallas_attention's switches: the values
# are consulted while jit TRACES the forward, so they must be set around the
# model.apply call, not around the jitted function's construction.
MESH = None              # jax.sharding.Mesh with (data, model)-style axes
MODE = "allgather"       # "allgather" | "ring"
DATA_AXIS = "data"       # batch axis name on MESH
SEQ_AXIS = "model"       # sequence/spatial axis name on MESH (sp rides model)


def enable(mesh, mode: str = "allgather",
           data_axis: str = "data", seq_axis: str = "model") -> None:
    global MESH, MODE, DATA_AXIS, SEQ_AXIS
    if mode not in ("allgather", "ring"):
        raise ValueError(f"sp attention mode {mode!r} not in (allgather, ring)")
    MESH, MODE, DATA_AXIS, SEQ_AXIS = mesh, mode, data_axis, seq_axis


def disable() -> None:
    global MESH
    MESH = None


def applicable(q: jnp.ndarray, k: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> bool:
    """True when this call should run as a shard_map island: sp is enabled and
    this is an unmasked self-attention whose batch/sequence divide the mesh."""
    if MESH is None or mask is not None:
        return False
    if q.shape[1] != k.shape[1]:  # cross-attention: replicated K/V, GSPMD path
        return False
    n_sp = MESH.shape[SEQ_AXIS]
    n_dp = MESH.shape[DATA_AXIS]
    return (n_sp > 1 and q.shape[1] % n_sp == 0 and q.shape[0] % n_dp == 0)


def _local_attention(q, k, v, use_flash: bool):
    """Per-device attention on local q rows vs (gathered or chunk) K/V. Imports
    lazily: pallas_attention imports this module's dispatch hook."""
    from . import pallas_attention as pa
    if (use_flash and q.shape[1] >= 1 and k.shape[1] >= pa.FLASH_MIN_KV):
        # the sp shard shortens q below the single-chip FLASH_MIN_SEQ gate; the
        # kernel's win was measured per-layer, not per-shard, so gate on K/V
        # length only (the full sequence after the gather) and let the caller's
        # use_flash carry the layer-level decision
        return pa.flash_attention(q, k, v)
    from .attention import mha_attention
    return mha_attention(q, k, v)


def _allgather_fn(q, k, v, *, seq_axis: str, use_flash: bool):
    """All-gather K/V over the sequence axis; flash locally on the q shard."""
    k = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
    v = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
    return _local_attention(q, k, v, use_flash)


def _ring_fn(q, k, v, *, seq_axis: str, n_shards: int, use_flash: bool):
    """Ring attention: rotate K/V chunks via ppermute, combine partial blocks
    with the flash online-softmax recurrence (f32 running max m, denominator l,
    unnormalized accumulator o). `use_flash` is accepted for signature parity;
    the chunk math is jnp (a stats-returning Pallas block variant is only
    measurable on real multi-chip hardware — single real chip here)."""
    del use_flash
    dtype = q.dtype
    scale = float(q.shape[-1]) ** -0.5

    def block(k, v):
        logits = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1)                       # [B, Nq, H]
        p = jnp.exp(logits - m[..., None])
        l = jnp.sum(p, axis=-1)                            # [B, Nq, H]
        o = jnp.einsum("bqhk,bkhd->bqhd", p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)  # [B, Nq, H, D] f32
        return o, m, l

    o, m, l = block(k, v)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(carry, _):
        k, v, o, m, l = carry
        k = jax.lax.ppermute(k, seq_axis, perm)
        v = jax.lax.ppermute(v, seq_axis, perm)
        o2, m2, l2 = block(k, v)
        mn = jnp.maximum(m, m2)
        c1 = jnp.exp(m - mn)[..., None]
        c2 = jnp.exp(m2 - mn)[..., None]
        return (k, v, o * c1 + o2 * c2, mn,
                l * c1[..., 0] + l2 * c2[..., 0]), None

    (_, _, o, _, l), _ = jax.lax.scan(step, (k, v, o, m, l), None,
                                      length=n_shards - 1)
    return (o / l[..., None]).astype(dtype)


def sp_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      use_flash: bool = False) -> jnp.ndarray:
    """[B, N, H, D] self-attention with N sharded over SEQ_AXIS, B over
    DATA_AXIS, as a shard_map island inside the enclosing jit. in_specs force
    the sp placement; if GSPMD arrived at something else, XLA inserts the
    reshard (a no-op when the annotations already match)."""
    n_sp = MESH.shape[SEQ_AXIS]
    spec = P(DATA_AXIS, SEQ_AXIS, None, None)
    if MODE == "ring":
        body = functools.partial(_ring_fn, seq_axis=SEQ_AXIS, n_shards=n_sp,
                                 use_flash=use_flash)
    else:
        body = functools.partial(_allgather_fn, seq_axis=SEQ_AXIS,
                                 use_flash=use_flash)
    fn = jax.shard_map(body, mesh=MESH, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)
