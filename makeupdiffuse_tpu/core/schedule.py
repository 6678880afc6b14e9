"""DDPM noise-schedule math as pure, jit-friendly functions on precomputed tables.

Reference parity: the schedule registered by ldm's DDPM (consumed through
``cldm.cldm.ControlLDM``) with ``linear_start=0.00085, linear_end=0.0120,
timesteps=1000`` (/root/reference/diffmodels/base_diffusion_makeup.yaml:4-8) and the
q_sample / predict_start_from_noise / get_v usages in
/root/reference/diffmk/makeup_teacher.py:64-98 and
/root/reference/diffmk/makeup_diffuse.py:79-97,169.

TPU-first design notes:
  * All tables are small float32 jnp arrays computed once (float64 numpy for accuracy,
    matching the reference's float64 intermediate) and closed over by jitted functions.
  * ``t`` is a per-example int32 vector; table lookups are gathers that XLA fuses into
    the surrounding elementwise ops. Works for NHWC and NCHW via trailing-broadcast.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiffusionSchedule", "make_linear_betas", "extract"]


def make_linear_betas(timesteps: int, linear_start: float, linear_end: float) -> np.ndarray:
    """LDM's "linear" beta schedule: linspace in sqrt-space, then squared."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, timesteps, dtype=np.float64) ** 2
    )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape to broadcast against an ndim tensor."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM tables + pure transforms (q_sample, pred_x0, v-param)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    logvar: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        parameterization: str = "eps",
        v_posterior: float = 0.0,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_linear_betas(timesteps, linear_start, linear_end)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
        posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

        with np.errstate(divide="ignore"):  # index 0 is inf, then overwritten below
            if parameterization == "eps":
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
            elif parameterization == "x0":
                lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * (1 - alphas_cumprod))
            elif parameterization == "v":
                lvlb_weights = np.ones_like(betas)
            else:
                raise ValueError(f"unknown parameterization {parameterization!r}")
        lvlb_weights[0] = lvlb_weights[1]

        arr = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            betas=arr(betas),
            alphas_cumprod=arr(alphas_cumprod),
            alphas_cumprod_prev=arr(alphas_cumprod_prev),
            sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=arr(posterior_variance),
            posterior_log_variance_clipped=arr(posterior_log_variance_clipped),
            posterior_mean_coef1=arr(posterior_mean_coef1),
            posterior_mean_coef2=arr(posterior_mean_coef2),
            lvlb_weights=arr(lvlb_weights),
            logvar=jnp.zeros((timesteps,), dtype=dtype),
        )

    # ---- pure transforms ------------------------------------------------------

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Diffuse x_start to timestep t: sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε."""
        nd = x_start.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def get_v(self, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        nd = x.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * noise
            - extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x
        )

    def predict_start_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def predict_eps_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * v
            + extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_t
        )

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            extract(self.posterior_mean_coef1, t, nd) * x_start
            + extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        var = extract(self.posterior_variance, t, nd)
        log_var = extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    # ---- pytree protocol ------------------------------------------------------

    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), tuple(fields)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))
