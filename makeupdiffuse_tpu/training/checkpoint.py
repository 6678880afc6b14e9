"""Orbax checkpointing — the framework's save/resume layer.

Capability parity (SURVEY.md §5): Lightning's ModelCheckpoint(every_n_train_steps=200)
(/root/reference/runs/train.py:50) + manual resume via load_state_dict (:59-69).
The torch-side surgeries (hint widening, teacher injection) live in
tools/convert_torch_ckpt.py; this module handles native checkpoints: params,
optimizer state, step, and the annealed t_min (so resume continues the AdjustTmin
curriculum exactly).
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, every_steps: int = 200):
        self.directory = os.path.abspath(directory)
        self.every_steps = every_steps
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, state: TrainState, force: bool = False,
                   step: int | None = None) -> bool:
        # callers that track the step host-side pass it in — int(state.step) is a
        # blocking device sync that would serialize the async dispatch pipeline
        if step is None:
            step = int(state.step)
        if not force and (self.every_steps <= 0 or step % self.every_steps != 0):
            return False
        payload = dict(
            step=state.step, params=state.params, opt_state=state.opt_state,
            t_min=state.t_min,
        )
        if state.ema_params is not None:  # use_ema runs keep EMA across resume
            payload["ema_params"] = state.ema_params
        self.mngr.save(step, args=ocp.args.StandardSave(payload))
        return True

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into an existing (template) state — optimizer topology must match."""
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = dict(
            step=state.step, params=state.params, opt_state=state.opt_state,
            t_min=state.t_min,
        )
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = self.mngr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=restored["step"], params=restored["params"],
            opt_state=restored["opt_state"], t_min=restored["t_min"],
            ema_params=restored.get("ema_params", state.ema_params),
        )

    def wait(self) -> None:
        self.mngr.wait_until_finished()
