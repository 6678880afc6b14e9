"""SD1.5 UNet with ControlNet residual injection points (flax.linen, NHWC).

Capability parity: ``cldm.cldm.ControlledUnetModel`` as configured by
/root/reference/diffmodels/base_diffusion_makeup.yaml:69-84 (model_channels 320,
channel_mult [1,2,4,4], 2 res blocks, attention at ds {1,2,4}, 8 heads, depth-1
spatial transformers, context_dim 768) and called by
/root/reference/diffmk/makeup_diffuse.py:161,167 with the 13-entry control list
(h += control.pop() after the middle block, then per-output-block on the skip).

TPU-first: NHWC/HWIO layouts, bf16 matmul/conv compute with f32 norms, optional
``nn.remat`` on res/transformer blocks (the reference's use_checkpoint), and
`lax`-free static control flow — the whole forward is one traced graph.
"""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import UNetConfig
from .layers import (
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    TimeEmbedding,
    Downsample,
    Upsample,
    zero_init,
)


class ControlledUNet(nn.Module):
    cfg: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, h, w, 4] latent
        timesteps: jnp.ndarray,  # [B] int32
        context: jnp.ndarray,  # [B, 77, context_dim]
        control: Optional[List[jnp.ndarray]] = None,  # len = num_control_levels, NHWC
        only_mid_control: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        RB = nn.remat(ResBlock) if cfg.use_checkpoint else ResBlock
        ST = nn.remat(SpatialTransformer) if cfg.use_checkpoint else SpatialTransformer

        x = x.astype(self.dtype)
        context = context.astype(self.dtype)
        emb = TimeEmbedding(cfg.model_channels, dtype=self.dtype, name="time_embed")(timesteps)

        hs = []
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        hs.append(h)

        ds = 1
        n_levels = len(cfg.channel_mult)
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = RB(ch, cfg.dropout, self.dtype, name=f"down_{level}_res_{i}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = ST(cfg.num_heads, cfg.transformer_depth, self.dtype,
                           name=f"down_{level}_attn_{i}")(h, context)
                hs.append(h)
            if level != n_levels - 1:
                h = Downsample(ch, self.dtype, name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = RB(ch, cfg.dropout, self.dtype, name="mid_res_0")(h, emb)
        h = ST(cfg.num_heads, cfg.transformer_depth, self.dtype, name="mid_attn")(h, context)
        h = RB(ch, cfg.dropout, self.dtype, name="mid_res_1")(h, emb)

        if control is not None:
            h = h + control[-1].astype(h.dtype)
            ctrl_idx = len(control) - 2

        for level in reversed(range(n_levels)):
            mult = cfg.channel_mult[level]
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if control is not None and not only_mid_control:
                    skip = skip + control[ctrl_idx].astype(skip.dtype)
                    ctrl_idx -= 1
                h = jnp.concatenate([h, skip], axis=-1)
                h = RB(ch, cfg.dropout, self.dtype, name=f"up_{level}_res_{i}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = ST(cfg.num_heads, cfg.transformer_depth, self.dtype,
                           name=f"up_{level}_attn_{i}")(h, context)
                if level > 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, self.dtype, name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = GroupNorm32(act="silu", name="out_norm")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=zero_init(), bias_init=zero_init(), name="conv_out")(h)
        return h.astype(jnp.float32)
