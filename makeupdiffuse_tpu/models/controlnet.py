"""Dual-image-hint ControlNet: SD-UNet encoder copy with zero convolutions.

Capability parity: ``cldm.cldm.ControlNet`` with ``hint_channels: 6`` — the Source
Face Encoder E_S + Reference Makeup Encoder E_R share this one trunk whose hint stem
takes the channel-concatenated (src ‖ ref) pair
(/root/reference/diffmodels/base_diffusion_makeup.yaml:52-67; call site
/root/reference/diffmk/makeup_diffuse.py:164). The 3→6-channel first-conv widening the
reference performs as checkpoint surgery (/root/reference/runs/train.py:60-62) is
reproduced in tools/convert_torch_ckpt.py.

Returns ``num_control_levels`` residuals: one zero-conv output per input block plus
the middle-block zero conv — consumed by models/unet.ControlledUNet.
"""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ControlNetConfig
from .layers import (
    QConv,
    ResBlock,
    SpatialTransformer,
    TimeEmbedding,
    Downsample,
    zero_init,
)

# the fixed hint-stem channel ladder of cldm's input_hint_block
_HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)
_HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2)


class HintStem(nn.Module):
    """8×-downsampling conv stack: 256² RGB‖RGB hint → latent-resolution features,
    final projection zero-initialized (control starts as a no-op)."""

    model_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hint: jnp.ndarray) -> jnp.ndarray:
        h = hint.astype(self.dtype)
        for i, (ch, s) in enumerate(zip(_HINT_CHANNELS, _HINT_STRIDES)):
            h = nn.Conv(ch, (3, 3), strides=(s, s), padding=1, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.silu(h)
        return nn.Conv(self.model_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=zero_init(), bias_init=zero_init(), name="conv_out")(h)


class ControlNet(nn.Module):
    cfg: ControlNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, h, w, 4] noisy latent
        hint: Optional[jnp.ndarray],  # [B, H, W, hint_channels] (src ‖ ref), [0, 1]
        timesteps: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B, 77, context_dim]
        hint_features: Optional[jnp.ndarray] = None,  # precomputed stem output
    ) -> List[jnp.ndarray]:
        cfg = self.cfg
        RB = nn.remat(ResBlock) if cfg.use_checkpoint else ResBlock
        ST = nn.remat(SpatialTransformer) if cfg.use_checkpoint else SpatialTransformer

        x = x.astype(self.dtype)
        context = context.astype(self.dtype)
        emb = TimeEmbedding(cfg.model_channels, dtype=self.dtype, name="time_embed")(timesteps)
        if hint_features is not None:
            # the stem's input is constant across a sampling chain — samplers
            # hoist it out of the 50-step scan (compute_hint_features)
            guided_hint = hint_features.astype(self.dtype)
        else:
            guided_hint = HintStem(cfg.model_channels, self.dtype, name="input_hint_block")(hint)

        def zero_conv(h, idx):
            # QConv: in-scan 1x1 GEMMs ride the int8 path under ops.quant.QUANT8
            # (conv_in / the hoisted hint stem stay bf16 — tiny contractions)
            return QConv(h.shape[-1], (1, 1), dtype=self.dtype,
                         kernel_init=zero_init(), bias_init=zero_init(),
                         name=f"zero_conv_{idx}")(h)

        outs: List[jnp.ndarray] = []
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        h = h + guided_hint
        outs.append(zero_conv(h, 0))

        ds = 1
        zi = 1
        n_levels = len(cfg.channel_mult)
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = RB(ch, cfg.dropout, self.dtype, name=f"down_{level}_res_{i}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = ST(cfg.num_heads, cfg.transformer_depth, self.dtype,
                           name=f"down_{level}_attn_{i}")(h, context)
                outs.append(zero_conv(h, zi))
                zi += 1
            if level != n_levels - 1:
                h = Downsample(ch, self.dtype, name=f"down_{level}_downsample")(h)
                outs.append(zero_conv(h, zi))
                zi += 1
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = RB(ch, cfg.dropout, self.dtype, name="mid_res_0")(h, emb)
        h = ST(cfg.num_heads, cfg.transformer_depth, self.dtype, name="mid_attn")(h, context)
        h = RB(ch, cfg.dropout, self.dtype, name="mid_res_1")(h, emb)
        outs.append(QConv(ch, (1, 1), dtype=self.dtype,
                          kernel_init=zero_init(), bias_init=zero_init(),
                          name="middle_block_out")(h))
        return outs
