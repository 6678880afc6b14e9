"""Device-mesh + sharding helpers — the framework's DP/ICI layer.

The reference is strictly single-device (pl.Trainer(gpus=1),
/root/reference/runs/train.py:55; SURVEY.md §2c). Here data parallelism is
first-class: a 1-D ``data`` mesh, batches sharded over ICI, parameters replicated
(the whole model is ~1.4B params ≈ 2.8 GB bf16 — fits any chip), gradient psums
inserted by XLA from the sharding annotations. A ``model`` axis slot is reserved in
the API for future tensor parallelism.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a batch pytree with its leading axis sharded on data."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, schedules) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
