"""The MakeupDiffuse composite training loss — pure functions over (model, params).

Capability parity: ``BaseMakeUpDiffuse.p_losses`` and helpers
(/root/reference/diffmk/makeup_diffuse.py:59-170) + region makeup loss
(``PGTBaseModel.p_loss_makeup``, :346-357):

  loss = l_simple·loss_base                                  (diffuse PGT, hint src‖ref)
       + w_idt_src·loss_idt_src                              (gt nonmakeup, hint src‖src)
       + w_idt_ref·loss_idt_ref                              (gt makeup,   hint ref‖ref)
       + w_cycle_content·loss_cycle_content                  (gt nonmakeup, hint fake_sr‖src)
       + w_cycle_makeup·loss_cycle_makeup                    (gt makeup,   hint ref‖fake_sr)
       + w_bkgrd·loss_background                             (masked L2, seg∈{0,11,12})
       + w_makeup·(λ_lip·L1_lip + λ_eye·L1_eye + λ_skin·L1_skin vs makeup_pgt)

Each diffuse term: z=get_z(gt); t~U[tmin,T); x_t=q_sample; parameterization-selected
target (noise / x_start / get_v, origin_x0.py:22-28 + makeup_diffuse.py:83-91) with
per-t logvar weighting (logvar≡0 ⇒ plain MSE, makeup_teacher.py:84-85); the base pass
also yields fake_sr = decode(x_recon) used by the cycle/background/makeup terms
(:119-148).

TPU-first restructuring (SURVEY.md §7 step 8 / "hard parts"):
  * The reference runs 5 sequential ControlNet+UNet forwards + 5 VAE encodes per
    optimizer step. Here stage A stacks (base ‖ idt_src ‖ idt_ref) into ONE 3B-batch
    forward, then decodes fake_sr, then stage B stacks (cycle_content ‖ cycle_makeup)
    into ONE 2B-batch forward — 2 forwards instead of 5, one VAE moment-encode for
    all three gt images with per-pass posterior resampling (matching the reference's
    independent get_z draws).
  * fake_sr is DETACHED by default, matching the reference: generate_image →
    decode_first_stage is @torch.no_grad in ldm (makeup_diffuse.py:172-177; the
    cycle-finetune family adds a grad-enabled decode_latent_code at makeups.py:260
    precisely because of that). Set ``cfg.grad_through_fake_sr=True`` to backprop
    through the decode into the base pass (an intentional extension, NOT reference
    behavior) — that path pays a remat'd, batch-chunked decode backward.

Range-faithfulness note: the reference compares fake_sr∈[0,1] against
makeup_pgt∈[-1,1] in the region loss (diffusion_makeup.py:77 vs makeup_diffuse.py:122)
— reproduced verbatim; set ``align_pgt_range=True`` to map the PGT to [0,1] instead.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .core.schedule import DiffusionSchedule
from .models.controlled_ldm import ControlledLDM
from .ops.masks import background_mask, expand_area


def _posterior_z(mean, logvar, rng, scale):
    return scale * (mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape))


def _weighted_mse(sched: DiffusionSchedule, out: jnp.ndarray, target: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MSE with logvar weighting (zeros ⇒ identity)."""
    per = jnp.mean((out - target) ** 2, axis=(1, 2, 3))
    logvar_t = sched.logvar[t]
    return per / jnp.exp(logvar_t) + logvar_t


def diffusion_target(sched: DiffusionSchedule, parameterization: str,
                     x_start: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
                     ) -> jnp.ndarray:
    """Training target by parameterization (ModifiedX0.p_losses,
    /root/reference/diffmk/origin_x0.py:22-28): eps → noise, x0 → x_start,
    v → get_v(x_start, noise, t)."""
    if parameterization == "eps":
        return noise
    if parameterization == "x0":
        return x_start
    if parameterization == "v":
        return sched.get_v(x_start, noise, t)
    raise ValueError(f"unknown parameterization {parameterization!r}")


def model_output_for_loss(sched: DiffusionSchedule, parameterization: str,
                          x_noisy: jnp.ndarray, t: jnp.ndarray, raw: jnp.ndarray
                          ) -> jnp.ndarray:
    """What is compared against the target. For 'x0' the reference converts the raw
    network output (trained as eps) to x_recon first (p_loss_diffuse_base,
    makeup_diffuse.py:83-85; ModifiedX0.apply_model, origin_x0.py:51-68); for 'eps'
    and 'v' the raw output is the prediction itself."""
    if parameterization == "x0":
        return sched.predict_start_from_noise(x_noisy, t, raw)
    return raw


def x_recon_from_output(sched: DiffusionSchedule, parameterization: str,
                        x_noisy: jnp.ndarray, t: jnp.ndarray, raw: jnp.ndarray
                        ) -> jnp.ndarray:
    """x_recon (the fake_sr latent) from the raw network output: eps/x0 →
    predict_start_from_noise (apply_model return_all, makeup_diffuse.py:169);
    v → predict_start_from_z_and_v (the v-correct form the torch code lacks)."""
    if parameterization == "v":
        return sched.predict_start_from_z_and_v(x_noisy, t, raw)
    return sched.predict_start_from_noise(x_noisy, t, raw)


def makeup_region_losses(
    fake_sr: jnp.ndarray,  # [B,H,W,3]
    makeup_pgt: jnp.ndarray,  # [B,H,W,3]
    mask_s_full: jnp.ndarray,  # [B,H,W,4] (lip, face, eye_l, eye_r)
    eye_margin: int,
    lambda_lip: float,
    lambda_eye: float,
    lambda_skin: float,
) -> jnp.ndarray:
    """p_loss_makeup parity (makeup_diffuse.py:346-357): masked L1 per region,
    EleGANt MakeupLoss semantics (mean over ALL elements of x·m − t·m)."""
    lip = mask_s_full[..., 0:1]
    face = mask_s_full[..., 1:2]
    eye = expand_area(
        jnp.clip(mask_s_full[..., 2] + mask_s_full[..., 3], 0, 1), eye_margin
    )[..., None] * face
    skin = face * (1.0 - eye)

    def l1(m):
        return jnp.mean(jnp.abs(fake_sr * m - makeup_pgt * m))

    return lambda_lip * l1(lip) + lambda_eye * l1(eye) + lambda_skin * l1(skin)


def simple_diffusion_loss(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    cfg: ModelConfig,
    target: jnp.ndarray,  # [B,H,W,3] in [-1,1] — gt image to diffuse
    hint: Optional[jnp.ndarray],  # [B,H,W,6] in [0,1] or None
    context: jnp.ndarray,
    rng: jax.Array,
    t_min: jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BaseModel.p_losses parity (makeup_teacher.py:64-98): one eps pass with
    logvar + lvlb weighting. This is the whole loss of the FFHQ reconstruction
    finetune (FinetuneModelFFHQ + FFHQ256: target = real image, hint = src‖zeros,
    makeup_ffhq_finetune.py:17-20, finetune_datasets.py:51-58) and of the
    Teacher_IDT curriculum models."""
    B = target.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    mean, logvar = model.apply(params, target, method=model.encode_moments)
    z = jax.lax.stop_gradient(
        cfg.scale_factor * (mean + jnp.exp(0.5 * logvar) * jax.random.normal(k1, mean.shape))
    )
    t = jax.random.randint(k2, (B,), t_min, sched.num_timesteps)
    noise = jax.random.normal(k3, z.shape)
    x_noisy = sched.q_sample(z, t, noise)
    raw = model.apply(params, x_noisy, t, context, hint, method=model.apply_eps)
    out = model_output_for_loss(sched, cfg.parameterization, x_noisy, t, raw)
    target = diffusion_target(sched, cfg.parameterization, z, noise, t)
    per = _weighted_mse(sched, out, target, t)
    loss_simple = per.mean()
    loss = cfg.l_simple_weight * loss_simple
    loss_vlb = (sched.lvlb_weights[t] * jnp.mean((out - target) ** 2, axis=(1, 2, 3))).mean()
    loss = loss + cfg.original_elbo_weight * loss_vlb
    return loss, {"loss_simple": loss_simple, "loss_vlb": loss_vlb, "loss": loss}


def curriculum_idt_loss(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    t_min: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Teacher_IDT curriculum (makeup_teacher.py:197-239): per step draw
    data_type ∈ {0: (src,ref)→teacher target, 1: (src,src)→source,
    2: (ref,ref)→reference}; t ~ U[t_min, T). Branchless on TPU: the three
    (gt, hint) candidates are built and one is selected by the draw —
    `lax.switch`-free, fully batched."""
    k_sel, k_loss = jax.random.split(rng)
    src, ref = batch["src_img"], batch["ref_img"]
    data_type = jax.random.randint(k_sel, (), 0, 3)
    gt = jnp.select(
        [data_type == 0, data_type == 1],
        [batch["pgt_sr"], batch["nonmakeup_img"]],
        batch["makeup_img"],
    )
    hint_pairs = [
        build_hint(src, ref, cfg.hint_mode),
        build_hint(src, src, cfg.hint_mode),
        build_hint(ref, ref, cfg.hint_mode),
    ]
    if hint_pairs[0] is None:
        hint = None
    else:
        hint = jnp.select([data_type == 0, data_type == 1],
                          hint_pairs[:2], hint_pairs[2])
    loss, ld = simple_diffusion_loss(
        model, params, sched, cfg, gt, hint, batch["context"], k_loss, t_min=t_min
    )
    ld = dict(ld)
    ld["data_type"] = data_type.astype(jnp.float32)
    return loss, ld


def build_hint(src: jnp.ndarray, ref: jnp.ndarray, hint_mode: str) -> Optional[jnp.ndarray]:
    """Ablation hint variants (SURVEY §2 row 10):
    'double' = src‖ref (BaseDoubleControlModel), 'single_ref' = ref only
    (BaseSingleControlModel, diffusion_makeup.py:116), 'single_src' = src only
    (SingleControlModel configurable side, :440-529), 'none' = ControlNet disabled
    (NoControlModel c_concat=None, :414-437)."""
    if hint_mode == "double":
        return jnp.concatenate([src, ref], axis=-1)
    if hint_mode == "single_ref":
        return ref
    if hint_mode == "single_src":
        return src
    if hint_mode == "none":
        return None
    raise ValueError(f"unknown hint_mode {hint_mode!r}")


def composite_loss(
    model: ControlledLDM,
    params,
    sched: DiffusionSchedule,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    t_min: jnp.ndarray,  # traced scalar — annealed without recompiling
    align_pgt_range: bool = False,
    decode_chunks: int = 3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The full composite loss.

    batch keys (all NHWC, ranges as the reference datasets emit them,
    datasets.py:640-664):
      src_img, ref_img            [B,H,W,3] in [0,1]
      nonmakeup_img, makeup_img   [B,H,W,3] in [-1,1]
      nonmakeup_seg               [B,H,W] int
      mask_s_full                 [B,H,W,4]
      pgt_sr                      [B,H,W,3] in [-1,1]  (teacher target)
      makeup_pgt                  [B,H,W,3] in [-1,1]  (PGT side channel)
      context                     [B,77,ctx]           (CLIP encoding of the prompt)
    """
    B = batch["src_img"].shape[0]
    T = sched.num_timesteps
    keys = jax.random.split(rng, 10)
    loss_dict: Dict[str, jnp.ndarray] = {}

    src, ref = batch["src_img"], batch["ref_img"]
    ctx = batch["context"]

    # ---- one VAE moment-encode for the three gt images --------------------------
    gts = jnp.concatenate([batch["pgt_sr"], batch["nonmakeup_img"], batch["makeup_img"]], 0)
    mean, logvar = model.apply(params, gts, method=model.encode_moments)
    mean = jax.lax.stop_gradient(mean)      # reference detaches z (get_z, :37-40)
    logvar = jax.lax.stop_gradient(logvar)
    m_pgt, m_non, m_mk = jnp.split(mean, 3)
    lv_pgt, lv_non, lv_mk = jnp.split(logvar, 3)
    sf = cfg.scale_factor

    # ---- stage A: (base ‖ idt_src ‖ idt_ref) in one forward ----------------------
    z_a = jnp.concatenate([
        _posterior_z(m_pgt, lv_pgt, keys[0], sf),
        _posterior_z(m_non, lv_non, keys[1], sf),
        _posterior_z(m_mk, lv_mk, keys[2], sf),
    ])
    t_base = jax.random.randint(keys[3], (B,), t_min, T)
    t_ids = jax.random.randint(keys[4], (2 * B,), 0, T)
    t_a = jnp.concatenate([t_base, t_ids])
    hints_a = [
        build_hint(src, ref, cfg.hint_mode),
        build_hint(src, src, cfg.hint_mode),
        build_hint(ref, ref, cfg.hint_mode),
    ]
    hint_a = None if hints_a[0] is None else jnp.concatenate(hints_a)
    noise_a = jax.random.normal(keys[5], z_a.shape)
    x_a = sched.q_sample(z_a, t_a, noise_a)
    raw_a = model.apply(params, x_a, t_a, jnp.tile(ctx, (3, 1, 1)), hint_a,
                        method=model.apply_eps)
    out_a = model_output_for_loss(sched, cfg.parameterization, x_a, t_a, raw_a)
    target_a = diffusion_target(sched, cfg.parameterization, z_a, noise_a, t_a)
    per_a = _weighted_mse(sched, out_a, target_a, t_a)
    loss_base = per_a[:B].mean()
    loss_idt_src = per_a[B:2 * B].mean()
    loss_idt_ref = per_a[2 * B:].mean()

    # fake_sr from the base slice (x_recon → decode → clamp → [0,1]). Reference
    # behavior (default): the decode is no-grad (generate_image →
    # decode_first_stage, makeup_diffuse.py:172-177) so fake_sr is DETACHED and the
    # decode compiles forward-only. With grad_through_fake_sr the decode is
    # rematerialized AND chunked over the batch — the 256² decoder's f32 backward
    # buffers at batch 6 are ~12G of HLO temps and OOM a 16G chip otherwise.
    fake_sr_z = x_recon_from_output(sched, cfg.parameterization, x_a[:B], t_a[:B],
                                    raw_a[:B])
    if cfg.grad_through_fake_sr:
        decode = jax.checkpoint(
            lambda p, z: model.apply(p, z, method=model.decode_latent)
        )
        # largest divisor of B not exceeding the requested chunk count (so batch
        # sizes that don't divide by 3 still get chunked, e.g. B=8 → 2 chunks)
        chunks = max(c for c in range(1, min(decode_chunks, B) + 1) if B % c == 0)
        if chunks > 1:
            zc = fake_sr_z.reshape((chunks, B // chunks) + fake_sr_z.shape[1:])
            fake_sr = jax.lax.map(lambda z: decode(params, z), zc)
            fake_sr = fake_sr.reshape((B,) + fake_sr.shape[2:])
        else:
            fake_sr = decode(params, fake_sr_z)
    else:
        # full detach (@torch.no_grad semantics): no backward through the decode at
        # all — not even into the frozen VAE leaves (whose grads, though unused by
        # the optimizer, would otherwise materialize the decoder backward buffers)
        fake_sr = jax.lax.stop_gradient(
            model.apply(params, jax.lax.stop_gradient(fake_sr_z),
                        method=model.decode_latent)
        )
    fake_sr = (jnp.clip(fake_sr, -1.0, 1.0) + 1.0) / 2.0

    # ---- stage B: (cycle_content ‖ cycle_makeup) in one forward ------------------
    z_b = jnp.concatenate([
        _posterior_z(m_non, lv_non, keys[6], sf),
        _posterior_z(m_mk, lv_mk, keys[7], sf),
    ])
    t_b = jax.random.randint(keys[8], (2 * B,), 0, T)
    hints_b = [
        build_hint(fake_sr, src, cfg.hint_mode),
        build_hint(ref, fake_sr, cfg.hint_mode),
    ]
    hint_b = None if hints_b[0] is None else jnp.concatenate(hints_b)
    noise_b = jax.random.normal(keys[9], z_b.shape)
    x_b = sched.q_sample(z_b, t_b, noise_b)
    raw_b = model.apply(params, x_b, t_b, jnp.tile(ctx, (2, 1, 1)), hint_b,
                        method=model.apply_eps)
    out_b = model_output_for_loss(sched, cfg.parameterization, x_b, t_b, raw_b)
    target_b = diffusion_target(sched, cfg.parameterization, z_b, noise_b, t_b)
    per_b = _weighted_mse(sched, out_b, target_b, t_b)
    loss_cycle_content = per_b[:B].mean()
    loss_cycle_makeup = per_b[B:].mean()

    # ---- pixel-space terms --------------------------------------------------------
    bk = background_mask(batch["nonmakeup_seg"])[..., None]
    loss_background = jnp.mean(
        jnp.mean((fake_sr - src) ** 2 * bk, axis=(1, 2, 3))
    )

    makeup_pgt = batch["makeup_pgt"]
    if align_pgt_range:
        makeup_pgt = (makeup_pgt + 1.0) / 2.0
    loss_makeup = makeup_region_losses(
        fake_sr, makeup_pgt, batch["mask_s_full"], eye_margin=12,
        lambda_lip=cfg.lambda_lip, lambda_eye=cfg.lambda_eye, lambda_skin=cfg.lambda_skin,
    )

    loss = (
        cfg.l_simple_weight * loss_base
        + cfg.w_idt_src * loss_idt_src
        + cfg.w_idt_ref * loss_idt_ref
        + cfg.w_cycle_content * loss_cycle_content
        + cfg.w_cycle_makeup * loss_cycle_makeup
        + cfg.w_bkgrd * loss_background
        + cfg.w_makeup * loss_makeup
    )
    loss_dict.update(
        loss_base=loss_base,
        loss_idt_src=loss_idt_src,
        loss_idt_ref=loss_idt_ref,
        loss_cycle_content=loss_cycle_content,
        loss_cycle_makeup=loss_cycle_makeup,
        loss_background=loss_background,
        loss_makeup=loss_makeup,
        loss=loss,
    )
    return loss, loss_dict
