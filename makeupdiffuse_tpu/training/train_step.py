"""The jitted train step: composite loss → grads (ControlNet only) → AdamW update.

Replaces the reference's Lightning training_step plumbing (SURVEY.md §3.1) with one
compiled program; under a sharded mesh the batch rides the ``data`` axis and XLA
inserts the gradient all-reduce over ICI automatically.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..core.schedule import DiffusionSchedule
from ..losses import composite_loss
from ..models.controlled_ldm import ControlledLDM
from .train_state import TrainState


def make_train_step(model: ControlledLDM, sched: DiffusionSchedule, cfg: ModelConfig,
                    donate: bool = True):
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`."""

    def loss_fn(params, batch, rng, t_min):
        return composite_loss(model, params, sched, cfg, batch, rng, t_min)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.t_min
        )
        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
