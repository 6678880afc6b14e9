"""Public inference API: (source image, reference image) → transferred image.

Capability parity: the reference's product surface — ``runs/test.py`` →
``TestDoubleControlModel.test_step`` → ``log_results``
(/root/reference/diffmk/diffusion_makeup.py:385-464): per pair it emits
  reconstruction            VAE round-trip of the teacher target
  control_src / control_ref the two hints rescaled to [-1,1]
  ground_truth              teacher target x_p
  sample_ddmp               one-step preview (q_sample → eps → pred_x0 → decode)
  samples                   50-step DDIM sample
  samples_cfg_scale_9.00    50-step DDIM with classifier-free guidance 9.0

TPU-first: the whole artifact set compiles into one jitted program per
(batch, steps, scale) signature; the CFG loop runs the fused 2×-batch denoiser.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .core.ddim import DDIMTables, ddim_reconstruct, ddim_sample
from .core.schedule import DiffusionSchedule
from .models.controlled_ldm import ControlledLDM, make_denoiser


def transfer_artifacts(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    tables: DDIMTables,
    pgt_sr: jnp.ndarray,  # [B,H,W,3] teacher target in [-1,1]
    src_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    ref_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    context: jnp.ndarray,  # [B,77,ctx] conditional CLIP context
    uncond_context: jnp.ndarray,  # [B,77,ctx] empty-prompt context
    rng: jax.Array,
    t_min: int = 100,
    cfg_scale: float = 9.0,
    sample: bool = True,
    control_scales: Optional[jnp.ndarray] = None,
    only_mid_control: bool = False,
) -> Dict[str, jnp.ndarray]:
    """log_results parity. All outputs are [-1,1] images (clamped by the caller or
    here where the reference clamps)."""
    cfg = model.cfg
    b = pgt_sr.shape[0]
    k_z, k_t, k_noise, k_samp, k_cfg = jax.random.split(rng, 5)
    hint = jnp.concatenate([src_img, ref_img], axis=-1)

    out: Dict[str, jnp.ndarray] = {}

    # reconstruction: z = get_z(pgt) → decode (log_results :420-423)
    mean, logvar = model.apply(params, pgt_sr, method=model.encode_moments)
    z = cfg.scale_factor * (mean + jnp.exp(0.5 * logvar) * jax.random.normal(k_z, mean.shape))
    out["reconstruction"] = model.apply(params, z, method=model.decode_latent)
    out["control_src"] = src_img * 2.0 - 1.0
    out["control_ref"] = ref_img * 2.0 - 1.0
    out["ground_truth"] = pgt_sr

    # one-step preview "sample_ddmp" (:437-442)
    t = jax.random.randint(k_t, (b,), t_min, sched.num_timesteps)
    noise = jax.random.normal(k_noise, z.shape)
    x_noisy = sched.q_sample(z, t, noise)
    eps = model.apply(params, x_noisy, t, context, hint, control_scales,
                      only_mid_control, method=model.apply_eps)
    x_recon = sched.predict_start_from_noise(x_noisy, t, eps)
    out["sample_ddmp"] = model.apply(params, x_recon, method=model.decode_latent)

    latent_shape = z.shape
    if sample:
        den = make_denoiser(model, params, context, hint,
                            control_scales=control_scales,
                            only_mid_control=only_mid_control, schedule=sched)
        x_T = jax.random.normal(k_samp, latent_shape)
        z_samp = ddim_sample(den, x_T, tables)
        out["samples"] = model.apply(params, z_samp, method=model.decode_latent)

    if cfg_scale > 1.0:
        den_cfg = make_denoiser(
            model, params, context, hint,
            uncond_context=uncond_context, cfg_scale=cfg_scale,
            control_scales=control_scales, only_mid_control=only_mid_control,
            schedule=sched,
        )
        x_T = jax.random.normal(k_cfg, latent_shape)
        z_cfg = ddim_sample(den_cfg, x_T, tables)
        out[f"samples_cfg_scale_{cfg_scale:.2f}"] = model.apply(
            params, z_cfg, method=model.decode_latent
        )

    return {k: jnp.clip(v, -1.0, 1.0) for k, v in out.items()}


def progressive_artifacts(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    tables: DDIMTables,
    pgt_sr: jnp.ndarray,  # [B,H,W,3] teacher target in [-1,1]
    src_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    ref_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    context: jnp.ndarray,
    rng: jax.Array,
    log_every_t: int = 200,
    n_denoise_tiles: int = 6,
) -> Dict[str, jnp.ndarray]:
    """The gray-colorization variant's progressive grids (log_images
    plot_diffusion_rows/plot_denoise_rows, /root/reference/diffmk/
    makeup_controlnet.py:55-84):

      diffusion_row  q_sample(z, t) decoded at every ``log_every_t``-th DDPM t
                     (plus t = T−1) — forward-noising strip per image.
      denoise_row    pred_x0 decoded at ~``n_denoise_tiles`` evenly spaced DDIM
                     steps of an unguided sample — reverse-denoising strip.

    Returns ``{name: ([B·K, H, W, 3] tiles, K)}`` — tiles are row-major per
    image so a grid with K columns shows one image per row."""
    cfg = model.cfg
    b = pgt_sr.shape[0]
    k_z, k_noise, k_samp = jax.random.split(rng, 3)

    mean, logvar = model.apply(params, pgt_sr, method=model.encode_moments)
    z = cfg.scale_factor * (mean + jnp.exp(0.5 * logvar)
                            * jax.random.normal(k_z, mean.shape))

    # diffusion row: t = 0, log_every_t, 2·log_every_t, …, T−1 — the reference's
    # `t % log_every_t == 0 or t == T-1` (ddpm log_images), no duplicate final
    # tile when (T-1) % log_every_t == 0
    ts = [t for t in range(sched.num_timesteps)
          if t % log_every_t == 0 or t == sched.num_timesteps - 1]
    noise = jax.random.normal(k_noise, z.shape)
    z_noisy = jnp.stack([
        sched.q_sample(z, jnp.full((b,), t, jnp.int32), noise) for t in ts
    ])  # [K, B, h, w, 4]
    k1 = len(ts)
    flat = z_noisy.transpose(1, 0, 2, 3, 4).reshape((b * k1,) + z.shape[1:])
    diffusion_row = model.apply(params, flat, method=model.decode_latent)

    # denoise row: unguided DDIM chain, pred_x0 intermediates (:74-84)
    hint = jnp.concatenate([src_img, ref_img], axis=-1)
    den = make_denoiser(model, params, context, hint, schedule=sched)
    x_T = jax.random.normal(k_samp, z.shape)
    _, preds = ddim_reconstruct(den, x_T, tables, t_start=tables.num_steps,
                                return_pred_x0=True)  # [S, B, h, w, 4]
    stride = max(1, tables.num_steps // n_denoise_tiles)
    keep = list(range(0, tables.num_steps, stride))
    if keep[-1] != tables.num_steps - 1:
        keep.append(tables.num_steps - 1)
    k2 = len(keep)
    sel = preds[jnp.asarray(keep)].transpose(1, 0, 2, 3, 4)
    denoise_row = model.apply(
        params, sel.reshape((b * k2,) + z.shape[1:]), method=model.decode_latent)

    return {
        "diffusion_row": (jnp.clip(diffusion_row, -1.0, 1.0), k1),
        "denoise_row": (jnp.clip(denoise_row, -1.0, 1.0), k2),
    }


def interpolate_transfer(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    tables: DDIMTables,
    src_img: jnp.ndarray,  # [1,H,W,3] in [0,1]
    ref_a: jnp.ndarray,  # [1,H,W,3] makeup A
    ref_b: jnp.ndarray,  # [1,H,W,3] makeup B
    context: jnp.ndarray,  # [1,77,ctx]
    uncond_context: Optional[jnp.ndarray],
    rng: jax.Array,
    num_steps: int = 8,
    cfg_scale: float = 9.0,
) -> jnp.ndarray:
    """Makeup interpolation sweep (reference README fig 04 / BASELINE config 5):
    sample the transfer for a λ-sweep of reference-makeup hints
    hint_ref(λ) = (1−λ)·ref_a + λ·ref_b, batched into ONE sampler run with a
    shared x_T so only the makeup varies along the row."""
    lam = jnp.linspace(0.0, 1.0, num_steps).reshape(-1, 1, 1, 1)
    refs = (1.0 - lam) * ref_a + lam * ref_b  # [S,H,W,3]
    srcs = jnp.tile(src_img, (num_steps, 1, 1, 1))
    ctx = jnp.tile(context, (num_steps, 1, 1))
    uc = None if uncond_context is None else jnp.tile(uncond_context, (num_steps, 1, 1))
    cfg = model.cfg
    h = cfg.latent_size
    # shared starting noise across the sweep → only the hint varies
    x_T1 = jax.random.normal(rng, (1, h, h, cfg.latent_channels))
    x_T = jnp.tile(x_T1, (num_steps, 1, 1, 1))
    hint = jnp.concatenate([srcs, refs], axis=-1)
    den = make_denoiser(model, params, ctx, hint, uncond_context=uc, cfg_scale=cfg_scale)
    z = ddim_sample(den, x_T, tables)
    img = model.apply(params, z, method=model.decode_latent)
    return jnp.clip(img, -1.0, 1.0)


def transfer(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    tables: DDIMTables,
    src_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    ref_img: jnp.ndarray,  # [B,H,W,3] in [0,1]
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    rng: jax.Array,
    cfg_scale: float = 9.0,
) -> jnp.ndarray:
    """The minimal product call: CFG cDDIM sample from noise under dual-image
    control → [-1,1] transferred image. (The reference's headline output is
    `samples_cfg_scale_9.00`.)"""
    cfg = model.cfg
    b = src_img.shape[0]
    hint = jnp.concatenate([src_img, ref_img], axis=-1)
    den = make_denoiser(
        model, params, context, hint,
        uncond_context=uncond_context, cfg_scale=cfg_scale,
    )
    h = cfg.latent_size
    x_T = jax.random.normal(rng, (b, h, h, cfg.latent_channels))
    from .core.dpm_solver import DPMTables, dpmpp_2m_sample

    if isinstance(tables, DPMTables):  # fast path: DPM-Solver++(2M), ~20 steps
        z = dpmpp_2m_sample(den, x_T, tables)
    else:
        z = ddim_sample(den, x_T, tables)
    img = model.apply(params, z, method=model.decode_latent)
    return jnp.clip(img, -1.0, 1.0)
