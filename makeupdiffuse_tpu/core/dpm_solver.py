"""DPM-Solver++(2M): a second-order multistep ODE sampler.

Beyond-reference capability: the reference only ships 50-step DDIM
(/root/reference/diffmk/diffusion_makeup.py:201); DPM-Solver++(2M) (Lu et al. 2022)
reaches comparable sample quality in ~20 steps — ≈2.5× serving throughput at equal
CFG cost per step. Deterministic, data-prediction formulation:

  λ_i = log(α_i/σ_i),  α_i = √ᾱ,  σ_i = √(1-ᾱ)
  x0_i = (x − σ_i ε_i)/α_i
  h_i = λ_{i+1} − λ_i
  first step:  x ← (σ_{i+1}/σ_i)·x − α_{i+1}(e^{−h_i}−1)·x0_i
  later steps: D_i = (1 + 1/(2r))·x0_i − (1/(2r))·x0_{i−1},  r = h_{i−1}/h_i
               x ← (σ_{i+1}/σ_i)·x − α_{i+1}(e^{−h_i}−1)·D_i

Implemented as one lax.scan carrying (x, x0_prev); same `denoiser(x, t) → eps`
contract as core/ddim (CFG fuses identically).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule

Denoiser = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DPMTables:
    """Per-step α/σ/λ tables; index 0 = highest noise, last entry is t≈0."""

    timesteps: jnp.ndarray  # int32 [S] descending
    alpha: jnp.ndarray  # [S+1] (last = target t=0 level)
    sigma: jnp.ndarray
    lamb: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_steps: int = 20) -> "DPMTables":
        T = schedule.num_timesteps
        # descending timesteps from T-1 to ~0 (trailing spacing)
        ts = np.linspace(T - 1, 0, num_steps + 1).round().astype(np.int64)
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        a = np.sqrt(acp[ts])
        s = np.sqrt(1.0 - acp[ts])
        lam = np.log(a) - np.log(np.maximum(s, 1e-12))
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            timesteps=jnp.asarray(ts[:-1], jnp.int32),
            alpha=f32(a), sigma=f32(s), lamb=f32(lam),
        )

    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), tuple(fields)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))


def dpmpp_2m_sample(
    denoiser: Denoiser,
    x_T: jnp.ndarray,
    tables: DPMTables,
) -> jnp.ndarray:
    """Deterministic DPM-Solver++(2M) from x_T to x_0-level latent."""
    S = tables.num_steps
    nd = (1,) * (x_T.ndim - 1)
    rs = lambda v: v.reshape((1,) + nd)

    def body(carry, i):
        x, x0_prev = carry
        b = x.shape[0]
        t = jnp.full((b,), tables.timesteps[i], jnp.int32)
        eps = denoiser(x, t)
        a_i, s_i = rs(tables.alpha[i]), rs(tables.sigma[i])
        a_n, s_n = rs(tables.alpha[i + 1]), rs(tables.sigma[i + 1])
        x0 = (x.astype(jnp.float32) - s_i * eps.astype(jnp.float32)) / a_i
        h = tables.lamb[i + 1] - tables.lamb[i]
        h_prev = tables.lamb[i] - tables.lamb[jnp.maximum(i - 1, 0)]
        r = h_prev / jnp.maximum(h, 1e-12)
        coef = 1.0 / jnp.maximum(2.0 * r, 1e-12)
        d_multi = (1.0 + coef) * x0 - coef * x0_prev
        d = jnp.where(i == 0, x0, d_multi)
        x_next = (s_n / s_i) * x.astype(jnp.float32) - a_n * (jnp.exp(-h) - 1.0) * d
        return (x_next.astype(x.dtype), x0), None

    (x_out, _), _ = jax.lax.scan(
        body, (x_T, jnp.zeros_like(x_T, jnp.float32)), jnp.arange(S, dtype=jnp.int32)
    )
    return x_out
