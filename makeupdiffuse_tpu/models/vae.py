"""KL-VAE (AutoencoderKL): 256² RGB ↔ 32²·4ch latents.

Capability parity: ``ldm.models.autoencoder.AutoencoderKL`` with ddconfig ch=128,
ch_mult [1,2,4,4], 2 res blocks, no encoder attention, double_z
(/root/reference/diffmodels/base_diffusion_makeup.yaml:86-107). Used by the reference
as encode→sample×0.18215 (get_z, /root/reference/diffmk/makeup_diffuse.py:37-40) and
decode (generate_image, :172-177). The 0.18215 scale lives in the LDM wrapper, not here.

TPU-first: NHWC, bf16 convs with f32 GroupNorm(ε=1e-6), asymmetric-pad stride-2
downsampling matching the torch semantics so converted weights are bit-compatible.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig
from ..ops import pallas_attention
from .layers import GroupNorm32


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (ldm AttnBlock)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hn = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, 1, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, 1, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, 1, c)
        # shared dispatch: Pallas flash kernel when enabled (1024 tokens at the
        # 32² latent), XLA einsum otherwise — f32 softmax either way
        out = pallas_attention.attention(q, k, v).reshape(b, h, w, c).astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        res = cfg.resolution
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(ch, self.dtype, name=f"down_{level}_block_{i}")(h)
                if res in cfg.attn_resolutions:
                    h = VAEAttnBlock(self.dtype, name=f"down_{level}_attn_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # torch pads (0,1,0,1) then stride-2 valid conv
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=self.dtype, name=f"down_{level}_downsample")(h)
                res //= 2
        ch = cfg.ch * cfg.ch_mult[-1]
        h = VAEResnetBlock(ch, self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(ch, self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm_out")(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(ch, self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(ch, self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, self.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{level}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm_out")(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B,H,W,3] in [-1,1] → posterior (mean, logvar), each [B,h,w,4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z [B,h,w,4] (unscaled) → image [B,H,W,3]."""
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Full round-trip with posterior sampling (the reference's OnlyRec check,
        /root/reference/diffmk/pre_dataset.py:34-46)."""
        mean, logvar = self.encode_moments(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z)


def sample_posterior(mean: jnp.ndarray, logvar: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
