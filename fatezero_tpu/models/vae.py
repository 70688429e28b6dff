"""Flax AutoencoderKL (Stable-Diffusion VAE) for per-frame video encode/decode.

TPU-native replacement for diffusers' AutoencoderKL as used by the reference
(encode: p2p_ddim_spatial_temporal.py:88-96 with the 0.18215 latent scale;
decode in 16-frame chunks: stable_diffusion.py:297-319). Frames are folded
into the batch axis — the VAE is purely 2-D; chunking survives as an
HBM-control option in the pipeline layer, not here.

Architecture (SD-1.x):
  encoder: conv_in -> 4 down blocks (2 resnets each, stride-2 downsample on
  the first 3) -> mid (resnet, single-head attention, resnet) -> GN/SiLU ->
  conv_out (8ch moments); quant_conv 1x1.
  decoder: post_quant_conv 1x1 -> conv_in -> mid -> 4 up blocks (3 resnets,
  nearest-2x upsample on the first 3) -> GN/SiLU -> conv_out.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn

from fatezero_tpu.models.layers import FusedGroupNorm
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head full self-attention over spatial tokens (diffusers
    AttentionBlock in the SD VAE mid block)."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c, dtype=self.dtype, name="value")(x)
        scale = c**-0.5
        attn = jax.nn.softmax(
            jnp.einsum("bsc,btc->bst", q.astype(jnp.float32), k.astype(jnp.float32)) * scale,
            axis=-1,
        )
        out = jnp.einsum("bst,btc->bsc", attn, v.astype(jnp.float32)).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj_attn")(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, g, self.dtype, name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers downsampler: stride-2 conv with asymmetric (0,1) pad
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                    name=f"down_blocks_{i}_downsamplers_0_conv",
                )(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(ch, g, self.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(ch, g, self.dtype, name="mid_block_attentions_0")(x)
        x = VAEResnetBlock(ch, g, self.dtype, name="mid_block_resnets_1")(x)
        x = FusedGroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = VAEResnetBlock(rev[0], g, self.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(rev[0], g, self.dtype, name="mid_block_attentions_0")(x)
        x = VAEResnetBlock(rev[0], g, self.dtype, name="mid_block_resnets_1")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, g, self.dtype, name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(rev) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_blocks_{i}_upsamplers_0_conv",
                )(x)
        x = FusedGroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode(images) -> (mean, logvar); decode(latents) -> images.

    Images are [N, H, W, 3] in [-1, 1] (N folds batch*frames); latents are
    [N, H/8, W/8, 4], *unscaled* — the 0.18215 factor is applied by callers
    as in the reference (p2p_ddim_spatial_temporal.py:96).
    """

    cfg: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, images: jax.Array):
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, latents: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, images: jax.Array, rng=None):
        mean, logvar = self.encode(images)
        z = mean
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar
