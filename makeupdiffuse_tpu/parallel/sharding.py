"""Parameter/optimizer sharding rules: tensor parallelism + FSDP over the mesh.

The reference trains strictly single-device (pl.Trainer(gpus=1),
/root/reference/runs/train.py:55) — multi-device scaling is a capability this
framework adds, TPU-first (SURVEY.md §2c): a 2-D ``(data, model)``
jax.sharding.Mesh, GSPMD sharding annotations, and XLA-inserted collectives over
ICI. No NCCL/MPI translation — placement of the param/optimizer arrays IS the
parallelism program.

Modes (composable):

* **DP** — params replicated, batch sharded on ``data`` (parallel/mesh.py). The
  default: the 1.4B-param model fits one chip, gradients all-reduce over ICI.
* **TP** (Megatron-style tensor parallelism over the ``model`` axis) — the
  transformer weights inside every SpatialTransformer block are sharded
  column-/row-parallel:
    - ``to_q/to_k/to_v`` kernels ``(c, heads*dh)`` → ``P(None, "model")``:
      each device holds ``heads/n_model`` attention heads end-to-end.
    - ``to_out`` kernel ``(heads*dh, c)`` → ``P("model", None)``: row-parallel;
      XLA inserts the psum that completes the contraction.
    - GEGLU ``ff/proj_in`` ``(c, 2*4c)`` → ``P(None, "model")`` and
      ``ff/proj_out`` ``(4c, c)`` → ``P("model", None)``.
  Convolutions/norms stay replicated — at SD1.5 sizes they are spatially large
  and channel-small, where TP buys little and costs a reshard per block edge.
* **FSDP** (ZeRO-3-style) — every weight is sharded on its largest
  ``data``-divisible axis; XLA all-gathers just-in-time per layer and
  reduce-scatters gradients. This is what makes the 1.4B AdamW state
  (params + mu + nu in f32 ≈ 17 GB) fit when training the FULL model rather
  than the ControlNet-only production recipe.

The same path-based rule maps params, AdamW ``mu``/``nu`` moments, and EMA
copies (their pytrees embed the param paths), so a whole TrainState shards with
one call. Numerical equivalence DP↔TP↔FSDP is pinned by tests/test_sharding.py
on the 8-device CPU mesh.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (path-regex, dim-index → mesh axis). Paths are "/"-joined pytree key strings;
# they match both raw flax param trees ("params/unet/.../attn1/to_q/kernel") and
# the same subtrees embedded inside optax state ("0/mu/params/...").
_TP_RULES = (
    (re.compile(r"/(attn\d+)/to_(q|k|v)/kernel$"), {1: MODEL_AXIS}),
    (re.compile(r"/(attn\d+)/to_out/kernel$"), {0: MODEL_AXIS}),
    (re.compile(r"/ff/proj_in/kernel$"), {1: MODEL_AXIS}),
    (re.compile(r"/ff/proj_out/kernel$"), {0: MODEL_AXIS}),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/" + "/".join(parts)


def spec_for(path_str: str, shape, mesh: Mesh, tp: bool, fsdp: bool) -> P:
    """PartitionSpec for one leaf under the given modes.

    TP rules fire first (path-matched); FSDP then shards the largest remaining
    axis divisible by the data-axis size. Leaves nothing sharded on axes that
    don't divide — a scalar or odd-shaped leaf stays replicated.
    """
    dims: list[Optional[str]] = [None] * len(shape)
    if tp and mesh.shape.get(MODEL_AXIS, 1) > 1:
        n_model = mesh.shape[MODEL_AXIS]
        for rx, assign in _TP_RULES:
            if rx.search(path_str):
                for d, ax in assign.items():
                    if shape[d] % n_model == 0:
                        dims[d] = ax
                break
    if fsdp and mesh.shape.get(DATA_AXIS, 1) > 1:
        n_data = mesh.shape[DATA_AXIS]
        free = [d for d in range(len(shape)) if dims[d] is None and shape[d] % n_data == 0
                and shape[d] >= n_data]
        if free:
            best = max(free, key=lambda d: shape[d])
            dims[best] = DATA_AXIS
    return P(*dims)


def tree_specs(tree, mesh: Mesh, tp: bool = False, fsdp: bool = False):
    """A PartitionSpec pytree mirroring ``tree`` (params, opt_state, or both)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), jnp.shape(leaf), mesh, tp, fsdp),
        tree,
    )


def shard_tree(mesh: Mesh, tree, tp: bool = False, fsdp: bool = False):
    """device_put every leaf with its rule-derived NamedSharding."""
    specs = tree_specs(tree, mesh, tp=tp, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def shard_train_state(mesh: Mesh, state, tp: bool = False, fsdp: bool = False):
    """Shard a TrainState in place: params/opt_state/ema by the rules, scalar
    bookkeeping (step, t_min) replicated."""
    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        t_min=jax.device_put(state.t_min, rep),
        params=shard_tree(mesh, state.params, tp=tp, fsdp=fsdp),
        opt_state=shard_tree(mesh, state.opt_state, tp=tp, fsdp=fsdp),
        ema_params=(None if state.ema_params is None
                    else shard_tree(mesh, state.ema_params, tp=tp, fsdp=fsdp)),
    )


def sharded_param_bytes(tree) -> int:
    """Per-device bytes actually resident for a sharded pytree (diagnostics)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards") and leaf.addressable_shards:
            s = leaf.addressable_shards[0]
            total += s.data.size * s.data.dtype.itemsize
        else:
            total += getattr(leaf, "nbytes", 0)
    return total
