"""Offline DDIM-inversion precompute + VAE round-trip check.

Capability parity: /root/reference/diffmk/pre_dataset.py —
  * OnlyRec (:8-46): VAE encode→decode sanity dump (ori/rec image pairs);
  * InvRec (:49-117): truncated schedule (t0=80), control-free DDIM inversion over
    inv_steps=40 (`ddim_sampler.encode`), regeneration (`decode`), saving per-image
    inverted (`inv/`) and regenerated (`gen/`) latents that MT_Dataset_V3/V4 consume
    (/root/reference/diffdata/datasets.py:111,132-133). We save .npz instead of .pth.

TPU-first: both passes are jitted, the inversion is a lax.scan (core/ddim.ddim_encode),
and images stream through in batches.
"""
from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..core.ddim import DDIMTables, ddim_encode, ddim_reconstruct
from ..core.schedule import DiffusionSchedule
from ..models.controlled_ldm import ControlledLDM


def vae_roundtrip(model: ControlledLDM, params, images: jnp.ndarray, rng: jax.Array
                  ) -> jnp.ndarray:
    """OnlyRec parity: encode (posterior sample ×0.18215) → decode."""
    mean, logvar = model.apply(params, images, method=model.encode_moments)
    z = model.cfg.scale_factor * (
        mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
    )
    return model.apply(params, z, method=model.decode_latent)


def make_inverter(
    model: ControlledLDM,
    base_cfg: ModelConfig,
    t0: int = 80,
    inv_steps: int = 40,
):
    """Returns jittable `invert(params, images, context, rng) -> (z_inv, z_gen)` over
    the truncated-t0 schedule, control-free (InvRec.apply_model drops the ControlNet,
    pre_dataset.py:109-117)."""
    sched = DiffusionSchedule.create(
        timesteps=t0, linear_start=base_cfg.linear_start, linear_end=base_cfg.linear_end
    )
    tables = DDIMTables.create(sched, num_steps=inv_steps)

    def invert(params, images, context, rng):
        mean, logvar = model.apply(params, images, method=model.encode_moments)
        z = model.cfg.scale_factor * (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        )

        def denoiser(x, t):
            return model.apply(params, x, t, context, None, method=model.apply_eps)

        z_inv = ddim_encode(denoiser, z, tables, t_enc=tables.num_steps)
        z_gen = ddim_reconstruct(denoiser, z_inv, tables, t_start=tables.num_steps)
        return z_inv, z_gen

    return invert, sched, tables


def precompute_inversions(
    model: ControlledLDM,
    params,
    base_cfg: ModelConfig,
    image_iter: Iterable,  # yields (name, [B,H,W,3] in [-1,1]) batches
    context_fn,
    out_root: str,
    t0: int = 80,
    inv_steps: int = 40,
    seed: int = 0,
) -> int:
    """Stream images → save inv_{t0}_{steps}/<name>.npz with z_inv and z_gen
    (directory naming parity: datasets.py:111 'inv_%d_%d')."""
    invert, _, _ = make_inverter(model, base_cfg, t0, inv_steps)
    invert = jax.jit(invert)
    out_dir = os.path.join(out_root, f"inv_{t0}_{inv_steps}")
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    count = 0
    for names, images in image_iter:
        rng, k = jax.random.split(rng)
        b = images.shape[0]
        z_inv, z_gen = invert(params, jnp.asarray(images), context_fn(b), k)
        for i, name in enumerate(names):
            np.savez(
                os.path.join(out_dir, f"{os.path.basename(name)}.npz"),
                inv=np.asarray(z_inv[i]), gen=np.asarray(z_gen[i]),
            )
            count += 1
    return count


def load_inversion(out_root: str, name: str, t0: int = 80, inv_steps: int = 40):
    d = np.load(os.path.join(out_root, f"inv_{t0}_{inv_steps}",
                             f"{os.path.basename(name)}.npz"))
    return d["inv"], d["gen"]
