"""cDDIM sampling / inversion as `lax.scan` loops over precomputed step tables.

Reference parity targets:
  * ldm's ``DDIMSampler.make_schedule`` (uniform discretization, η-sigmas) as used by
    /root/reference/diffmk/cddim.py:5 and sample_log at
    /root/reference/diffmk/diffusion_makeup.py:175-177.
  * ``MKDDIMSampler.denoising_step`` math (/root/reference/diffmk/cddim.py:62-78):
    pred_x0 = (x − √(1−ᾱ)·ε)/√ᾱ ; x_prev = √ᾱ_prev·x0 + √(1−ᾱ_prev−σ²)·ε + σ·noise.
  * ``MKDDIMSampler.reconstruct`` (/root/reference/diffmk/cddim.py:81-100): iterate the
    first ``t_start`` DDIM steps, reversed.
  * ``DDIMSampler.encode`` (DDIM inversion) used by the inversion precompute
    (/root/reference/diffmk/pre_dataset.py:89-90).

TPU-first design:
  * The per-step Python loop of the reference becomes one compiled ``lax.scan`` whose
    carried state is the latent — one trace, 50 fused steps, zero host round-trips.
  * Classifier-free guidance is the caller's concern: the ``denoiser(x, t) -> eps``
    callable passed in may internally run a 2×-batched cond/uncond forward (see
    ``models/controlled_ldm.make_cfg_denoiser``); this module stays model-agnostic.
  * Step tables are gathered with dynamic indices inside the scan so the whole loop
    compiles to a single XLA while-loop with static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule

__all__ = ["DDIMTables", "ddim_sample", "ddim_reconstruct", "ddim_encode"]

Denoiser = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_timesteps: int) -> np.ndarray:
    """Uniform DDIM discretization: arange(0, T, T//S) + 1 (ldm semantics).

    Clipped to T−1: for step counts that don't divide T, ldm's +1 lands on T and
    would index out of range — a latent bug there, guarded here."""
    c = num_ddpm_timesteps // num_ddim_steps
    ts = np.asarray(list(range(0, num_ddpm_timesteps, c))) + 1
    return np.minimum(ts, num_ddpm_timesteps - 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DDIMTables:
    """Per-DDIM-step ᾱ / ᾱ_prev / √(1-ᾱ) / σ tables (length = num ddim steps)."""

    timesteps: jnp.ndarray  # int32 [S] — DDPM timestep per DDIM index
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int = 50,
        eta: float = 0.0,
    ) -> "DDIMTables":
        ts = make_ddim_timesteps(num_steps, schedule.num_timesteps)
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        alphas = acp[ts]
        alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
        sigmas = eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
        )

    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), tuple(fields)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))


def _ddim_step(
    tables: DDIMTables,
    denoiser: Denoiser,
    x: jnp.ndarray,
    index: jnp.ndarray,
    noise: jnp.ndarray,
    temperature: float = 1.0,
):
    """One DDIM update at table position ``index`` (parity: cddim.py:62-78)."""
    b = x.shape[0]
    t = jnp.full((b,), tables.timesteps[index], dtype=jnp.int32)
    e_t = denoiser(x, t)

    nd = (1,) * (x.ndim - 1)
    a_t = tables.alphas[index].reshape((1,) + nd)
    a_prev = tables.alphas_prev[index].reshape((1,) + nd)
    sigma_t = tables.sigmas[index].reshape((1,) + nd)
    sqrt_one_minus_at = tables.sqrt_one_minus_alphas[index].reshape((1,) + nd)

    # step math in float32 regardless of latent dtype, then cast back
    xf = x.astype(jnp.float32)
    ef = e_t.astype(jnp.float32)
    pred_x0 = (xf - sqrt_one_minus_at * ef) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * ef
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise.astype(jnp.float32) * temperature
    return x_prev.astype(x.dtype), pred_x0.astype(x.dtype)


def ddim_sample(
    denoiser: Denoiser,
    x_T: jnp.ndarray,
    tables: DDIMTables,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Full DDIM sampling loop from x_T (all ``tables.num_steps`` steps, reversed)."""
    return ddim_reconstruct(denoiser, x_T, tables, t_start=tables.num_steps, rng=rng,
                            temperature=temperature)


def ddim_reconstruct(
    denoiser: Denoiser,
    x_latent: jnp.ndarray,
    tables: DDIMTables,
    t_start: int,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    return_pred_x0: bool = False,
):
    """Decode from a (possibly partially diffused/inverted) latent: iterate the first
    ``t_start`` DDIM steps in reverse (parity: cddim.py:81-100).

    ``return_pred_x0=True`` additionally returns the per-step x₀ predictions
    stacked as ``[t_start, B, ...]`` (scan ys) — the intermediates ldm's sampler
    logs for the progressive 'denoise_row' grids (log_images plot_denoise_rows,
    /root/reference/diffmk/makeup_controlnet.py:74-84)."""
    t_start = int(t_start)
    if not 0 <= t_start <= tables.num_steps:
        raise ValueError(
            f"t_start={t_start} out of range for a {tables.num_steps}-step DDIM table"
        )
    if t_start == 0:
        return (x_latent, jnp.zeros((0,) + x_latent.shape, x_latent.dtype)) \
            if return_pred_x0 else x_latent
    deterministic = rng is None

    def body(x, per_step):
        index, key = per_step
        if deterministic:
            noise = jnp.zeros_like(x)
        else:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_prev, pred_x0 = _ddim_step(tables, denoiser, x, index, noise, temperature)
        return x_prev, (pred_x0 if return_pred_x0 else None)

    indices = jnp.arange(t_start - 1, -1, -1, dtype=jnp.int32)
    keys = (
        jax.random.split(rng, t_start)
        if not deterministic
        else jnp.zeros((t_start, 2), dtype=jnp.uint32)
    )
    x_dec, preds = jax.lax.scan(body, x_latent, (indices, keys))
    return (x_dec, preds) if return_pred_x0 else x_dec


def ddim_encode(
    denoiser: Denoiser,
    x0: jnp.ndarray,
    tables: DDIMTables,
    t_enc: int,
) -> jnp.ndarray:
    """Deterministic DDIM inversion: run the first ``t_enc`` steps forward
    (parity: ldm DDIMSampler.encode as driven by pre_dataset.py:89-90)."""
    t_enc = int(t_enc)

    def body(x, index):
        b = x.shape[0]
        t = jnp.full((b,), tables.timesteps[index], dtype=jnp.int32)
        e_t = denoiser(x, t)
        nd = (1,) * (x.ndim - 1)
        # step from ᾱ_prev[i] up to ᾱ[i], eps evaluated at timesteps[i] (ldm encode)
        a_from = tables.alphas_prev[index].reshape((1,) + nd)
        a_next = tables.alphas[index].reshape((1,) + nd)
        pred_x0 = (x - jnp.sqrt(1.0 - a_from) * e_t) / jnp.sqrt(a_from)
        x_next = jnp.sqrt(a_next) * pred_x0 + jnp.sqrt(1.0 - a_next) * e_t
        return x_next, None

    indices = jnp.arange(0, t_enc, dtype=jnp.int32)
    x_enc, _ = jax.lax.scan(body, x0, indices)
    return x_enc
