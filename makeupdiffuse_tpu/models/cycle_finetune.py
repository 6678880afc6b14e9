"""Latent-inversion cycle-finetune model family — training THROUGH the sampler.

Capability parity: /root/reference/diffmk/makeups.py (BaseModel :11-285,
BasePseudoModel :289-343) and the older iterations in /root/reference/diffmk/mkups.py
(OnlyCycle / CycleMakeupModel / OnlyMakeupModel — the same machine with weights
zeroed, reproduced here by weight settings):
  * truncated DDPM schedule re-registered with timesteps=t0 (update_schedule :40-42)
  * inputs: DDIM-INVERTED latents (src_inv/ref_inv precomputed by
    tools/invert_latents.py, the pre_dataset.py equivalent) + single-image hints
  * per step up to 6 full ``reconstruct`` sampler runs with GRADIENTS FLOWING
    THROUGH the DDIM loop (fake_SR/RS, idt SS/RR, cycle rec via hint replacement
    :90-117)
  * losses: background on classes {0,10,13} (:130-141), idt/cycle L2 (:143-147,
    :157-158), histogram-matching region losses lip{7,9}/skin{1,6,13}/eyes{4,5}
    with rebound-box margin 10 (:160-245), optional pseudo-GT L2 (:289-343)

TPU-first:
  * the sampler loop is a lax.scan; gradients through it via ``jax.checkpoint`` on
    the denoiser (remat trades FLOPs for the memory the reference buys with
    iter_finetune-truncated schedules)
  * the four/six generations share weights and batch into TWO stacked reconstruct
    calls (SR‖RS‖SS‖RR then recSS‖recRR — rec depends on fake, like the 2-stage
    split in losses.py)
  * histogram losses use dense masks + weighted CDFs (ops/histogram.py) instead of
    the reference's host nonzero-gather round-trip
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..core.ddim import DDIMTables, ddim_reconstruct
from ..core.schedule import DiffusionSchedule
from ..ops.histogram import histogram_matching
from ..ops.masks import class_mask, rebound_box
from .controlled_ldm import ControlledLDM


@dataclasses.dataclass(frozen=True)
class CycleFinetuneConfig:
    """Knobs of makeups.BaseModel.__init__ (:12-38)."""

    t0: int = 100
    inv_steps: int = 40
    iter_finetune: int = 10
    weight_loss_cycle: float = 1.0
    weight_loss_makeup: float = 1.0
    weight_loss_idt: float = 1.0
    weight_loss_background: float = 1.0
    weight_loss_pseudo: float = 0.0
    lambda_his_lip: float = 1.0
    lambda_his_skin_1: float = 0.1
    lambda_his_skin_2: float = 0.1
    lambda_his_eye: float = 1.0
    remat_sampler: bool = True

    def truncated_schedule(self, base: ModelConfig) -> DiffusionSchedule:
        return DiffusionSchedule.create(
            timesteps=self.t0, linear_start=base.linear_start, linear_end=base.linear_end
        )

    def tables(self, sched: DiffusionSchedule) -> DDIMTables:
        return DDIMTables.create(sched, num_steps=self.iter_finetune)


def _region_masks(seg: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """BiSeNet-palette regions of makeups.py: lip {7,9}, skin {1,6,13},
    eyes {4},{5} rebound-boxed (margin 10) against face {1,6} (:179-206)."""
    lip = class_mask(seg, (7, 9))
    skin = class_mask(seg, (1, 6, 13))
    eye_l = class_mask(seg, (4,))
    eye_r = class_mask(seg, (5,))
    face = class_mask(seg, (1, 6))
    rb = lambda m: jax.vmap(lambda mm, ff: rebound_box(mm, ff, margin=10))(m, face)
    return dict(lip=lip, skin=skin, eye_l=rb(eye_l), eye_r=rb(eye_r))


def criterion_his(
    fake: jnp.ndarray,  # [B,H,W,3] in [0,1]
    target: jnp.ndarray,  # [B,H,W,3] in [0,1]
    mask_src: jnp.ndarray,  # [B,H,W]
    mask_tar: jnp.ndarray,
) -> jnp.ndarray:
    """L1 between the masked fake and its histogram-match to the target's region
    (criterionHis, makeups.py:232-245 — gradient flows only through the input)."""

    def one(f, t, ms, mt):
        f255 = f * 255.0 * ms[..., None]
        t255 = t * 255.0 * mt[..., None]
        matched = histogram_matching(f255, t255, ms, mt)  # stop-grad'ed inside
        return jnp.mean(jnp.abs(f255 - matched))

    return jnp.mean(jax.vmap(one)(fake, target, mask_src, mask_tar))


def make_generate(
    model: ControlledLDM,
    tables: DDIMTables,
    iter_finetune: int,
    remat: bool = True,
) -> Callable:
    """generate_image parity (:119-127): reconstruct inverted latent under a hint,
    decode, → [0,1]."""

    def generate(params, inv, hint, context):
        def denoiser(x, t):
            return model.apply(params, x, t, context, hint, method=model.apply_eps)

        den = jax.checkpoint(denoiser) if remat else denoiser
        z = ddim_reconstruct(den, inv, tables, t_start=iter_finetune)
        decode = lambda p, zz: model.apply(p, zz, method=model.decode_latent)
        if remat:  # decoder residuals are the other big HBM consumer
            decode = jax.checkpoint(decode)
        img = decode(params, z)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    return generate


def cycle_finetune_loss(
    model: ControlledLDM,
    params,
    cfg: CycleFinetuneConfig,
    tables: DDIMTables,
    batch: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """p_losses parity (makeups.py:90-117 / BasePseudoModel :306-343).

    batch keys: src_inv/ref_inv [B,h,w,4] (inverted latents ×0.18215 scale),
    src_img/ref_img [B,H,W,3] in [0,1], src_msk/ref_msk [B,H,W] int,
    context [B,77,ctx]; optional pgt_sr/pgt_rs [B,H,W,3] in [0,1]."""
    B = batch["src_img"].shape[0]
    ctx = batch["context"]
    gen = make_generate(model, tables, cfg.iter_finetune, cfg.remat_sampler)

    real_S = jax.lax.stop_gradient(batch["src_img"])
    real_R = jax.lax.stop_gradient(batch["ref_img"])

    # stage 1: SR ‖ RS ‖ SS ‖ RR in one stacked reconstruct (4B batch)
    inv4 = jnp.concatenate([batch["src_inv"], batch["ref_inv"],
                            batch["src_inv"], batch["ref_inv"]])
    hint4 = jnp.concatenate([real_R, real_S, real_S, real_R])
    ctx4 = jnp.tile(ctx, (4, 1, 1))
    out4 = gen(params, inv4, hint4, ctx4)
    fake_SR, fake_RS, fake_SS, fake_RR = jnp.split(out4, 4)

    loss_dict: Dict[str, jnp.ndarray] = {}

    # background: classes {0,10,13} (:130-141)
    def bk(seg):
        return class_mask(seg, (0, 10, 13))[..., None]

    loss_background = 0.5 * (
        jnp.mean(jnp.mean((fake_SR - real_S) ** 2 * bk(batch["src_msk"]), axis=(1, 2, 3)))
        + jnp.mean(jnp.mean((fake_RS - real_R) ** 2 * bk(batch["ref_msk"]), axis=(1, 2, 3)))
    )
    loss = cfg.weight_loss_background * loss_background
    loss_dict["loss_background"] = loss_background

    if cfg.weight_loss_makeup > 0:
        ms = _region_masks(batch["src_msk"])
        mr = _region_masks(batch["ref_msk"])
        lip = (criterion_his(fake_SR, real_R, ms["lip"], mr["lip"])
               + criterion_his(fake_RS, real_S, mr["lip"], ms["lip"])) * cfg.lambda_his_lip
        # the reference sums sr_skin TWICE and never adds rs_skin
        # (makeups.py:153: "(sr_skin_loss_his + sr_skin_loss_his)") — reproduced
        skin = criterion_his(fake_SR, real_R, ms["skin"], mr["skin"]) * cfg.lambda_his_skin_1 * 2
        eye = (criterion_his(fake_SR, real_R, ms["eye_l"], mr["eye_l"])
               + criterion_his(fake_RS, real_S, mr["eye_l"], ms["eye_l"])
               + criterion_his(fake_SR, real_R, ms["eye_r"], mr["eye_r"])
               + criterion_his(fake_RS, real_S, mr["eye_r"], ms["eye_r"])) * cfg.lambda_his_eye
        loss_makeup = (lip + skin + eye) * 0.5
        loss_dict["loss_makeup"] = loss_makeup
        loss = loss + cfg.weight_loss_makeup * loss_makeup

    if cfg.weight_loss_idt > 0:
        loss_idt = 0.5 * (
            jnp.mean(jnp.mean((fake_SS - real_S) ** 2, axis=(1, 2, 3)))
            + jnp.mean(jnp.mean((fake_RR - real_R) ** 2, axis=(1, 2, 3)))
        )
        loss_dict["loss_idt"] = loss_idt
        loss = loss + cfg.weight_loss_idt * loss_idt

    if cfg.weight_loss_cycle > 0:
        # stage 2: cycle reconstructions with swapped fakes as hints (:111-113)
        inv2 = jnp.concatenate([batch["src_inv"], batch["ref_inv"]])
        hint2 = jnp.concatenate([fake_RS, fake_SR])
        out2 = gen(params, inv2, hint2, jnp.tile(ctx, (2, 1, 1)))
        rec_SS, rec_RR = jnp.split(out2, 2)
        loss_cycle = 0.5 * (
            jnp.mean(jnp.mean((rec_SS - real_S) ** 2, axis=(1, 2, 3)))
            + jnp.mean(jnp.mean((rec_RR - real_R) ** 2, axis=(1, 2, 3)))
        )
        loss_dict["loss_cycle"] = loss_cycle
        loss = loss + cfg.weight_loss_cycle * loss_cycle

    if cfg.weight_loss_pseudo > 0 and "pgt_sr" in batch:
        loss_pseudo = 0.5 * (
            jnp.mean(jnp.mean((fake_SR - jax.lax.stop_gradient(batch["pgt_sr"])) ** 2,
                              axis=(1, 2, 3)))
            + jnp.mean(jnp.mean((fake_RS - jax.lax.stop_gradient(batch["pgt_rs"])) ** 2,
                                axis=(1, 2, 3)))
        )
        loss_dict["loss_pseudo"] = loss_pseudo
        loss = loss + cfg.weight_loss_pseudo * loss_pseudo

    loss_dict["loss"] = loss
    return loss, loss_dict
