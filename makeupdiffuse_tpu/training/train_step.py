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
                    donate: bool = True, guard_nonfinite: bool = True):
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`.

    ``guard_nonfinite`` (default on, the production setting): a bad batch or a
    loss spike that produces a non-finite loss/gradient skips the parameter /
    optimizer / EMA update for that step instead of poisoning the weights
    forever. The check rides the already-computed global grad norm (a sum of
    squares, so any NaN/Inf anywhere in the gradient tree surfaces in it) and
    the gate is a traced scalar — no host round trip, dispatch pipelining
    intact. `metrics["skipped_nonfinite"]` reports the gate per step."""
    from ..ops import quant

    # w8a8 is inference-only: quantize_symmetric's round/clip has zero gradient
    # almost everywhere, so training under QUANT8 would silently freeze the
    # weights (ADVICE r4). Fail loudly at trace-build time instead.
    if quant.QUANT8:
        raise RuntimeError(
            "ops.quant.QUANT8 is on but make_train_step was requested — the "
            "w8a8 path is inference-only (round/clip kills weight gradients); "
            "call ops.enable_quant8(False) before building a train step")

    def loss_fn(params, batch, rng, t_min):
        return composite_loss(model, params, sched, cfg, batch, rng, t_min)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.t_min
        )
        grad_norm = optax_global_norm(grads)
        ok = None
        if guard_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        new_state = state.apply_gradients(grads, ok=ok)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        if ok is not None:
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
