"""Train state + optimizer with the reference's trainable-parameter split.

Capability parity: ``ControlLDM.configure_optimizers`` semantics as driven by the
reference's flags — AdamW at lr 1e-5 on the ControlNet parameters only when
``sd_locked`` (the production setting, /root/reference/runs/train.py:17,70-71);
unlocking adds the UNet's output blocks and final conv. The VAE / CLIP / teacher are
always frozen. t_min annealing state (AdjustTmin, makeup_diffuse.py:255-266) rides in
the state so the train step stays pure.
"""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig


def trainable_mask(params: Dict[str, Any], sd_locked: bool = True) -> Dict[str, Any]:
    """Pytree of bools: True = optimized. ControlNet always; UNet output side when
    not sd_locked (ControlLDM.configure_optimizers parity)."""

    def mark(path: str) -> bool:
        if path.startswith("control_model"):
            return True
        if not sd_locked and path.startswith("diffusion_model"):
            tail = path.split("/", 1)[1] if "/" in path else ""
            return tail.startswith("up_") or tail.startswith("out_norm") or tail.startswith("conv_out")
        return False

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    mask_flat = {k: mark(k) for k in flat}
    return flax.traverse_util.unflatten_dict(mask_flat, sep="/")


def make_optimizer(train_cfg: TrainConfig, params: Dict[str, Any]) -> optax.GradientTransformation:
    mask = trainable_mask(params["params"] if "params" in params else params,
                          sd_locked=train_cfg.sd_locked)
    if "params" in params:
        mask = {"params": mask}
    return optax.multi_transform(
        {
            # bf16 first moment: halves the largest optimizer buffer (~0.7G for
            # the ControlNet) with negligible effect at lr 1e-5
            "train": optax.adamw(train_cfg.learning_rate, mu_dtype=jnp.bfloat16),
            "freeze": optax.set_to_zero(),
        },
        jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask),
    )


def cast_frozen_to_bf16(params: Dict[str, Any], sd_locked: bool = True) -> Dict[str, Any]:
    """Cast the FROZEN parameter subtrees (UNet/VAE/CLIP under sd_locked) to bf16.

    They never receive updates, the hot path computes in bf16 anyway, and keeping
    f32 master copies of ~1.07B frozen weights costs ~2.1G HBM — the difference
    between fitting and OOMing the batch-6 composite train step on a 16G chip.
    Trainable (ControlNet) leaves stay f32 for the AdamW update quality."""
    inner = params["params"] if "params" in params else params
    mask = trainable_mask(inner, sd_locked=sd_locked)

    def cast(p, train):
        if train or not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        return p.astype(jnp.bfloat16)

    out = jax.tree_util.tree_map(cast, inner, mask)
    return {"params": out} if "params" in params else out


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    t_min: jnp.ndarray  # traced — annealed by AdjustTmin without recompiling
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # optional EMA of the trainable params (LatentDiffusion's use_ema knob —
    # the reference config ships use_ema: False, yaml:48; the capability exists)
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def create(cls, params, train_cfg: TrainConfig, model_cfg: ModelConfig,
               use_ema: bool = False, ema_decay: float = 0.9999) -> "TrainState":
        tx = make_optimizer(train_cfg, params)
        # Host-side optimizer init: eager `tx.init` dispatches one zeros_like per
        # leaf, and through the axon attachment EVERY eager op is a tiny remote
        # compile — ~20 min of round trips for the flagship tree (the same
        # pathology fast_init_model avoids for params). make_optimizer's states
        # are all zero-initialized (AdamW count/mu/nu, EmptyState), so eval_shape
        # + numpy zeros is exact; leaves move to device with the first jitted step.
        import numpy as np

        shapes = jax.eval_shape(tx.init, params)
        opt_state = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            t_min=jnp.asarray(model_cfg.t_min, jnp.int32),
            tx=tx,
            ema_params=jax.tree_util.tree_map(lambda x: x, params) if use_ema else None,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads, ok: jnp.ndarray | None = None) -> "TrainState":
        """One optimizer step. ``ok`` (scalar bool, traced) gates the update
        in-graph: when False the params / moments / EMA keep their old values
        and only ``step`` advances — the non-finite-step guard. The selects are
        elementwise and fuse into the update chain (no extra HBM pass), and
        nothing is fetched to host, so dispatch pipelining is preserved — the
        TPU-native version of a "skip this batch on NaN" trainer guard (the
        reference's Lightning harness has none; SURVEY.md §5 failure detection)."""
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        tm = jax.tree_util.tree_map
        if ok is not None:
            updates = tm(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
            new_opt = tm(lambda n, o: jnp.where(ok, n, o), new_opt, self.opt_state)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = tm(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
            if ok is not None:  # skipped step must leave the EMA untouched too
                new_ema = tm(lambda n, o: jnp.where(ok, n, o),
                             new_ema, self.ema_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )

    def adjust_t_min(self, delta_t: int, t_max: int) -> "TrainState":
        """AdjustTmin.on_train_epoch_end parity: t_min += Δt, capped at t_max."""
        return self.replace(t_min=jnp.minimum(self.t_min + delta_t, t_max))
