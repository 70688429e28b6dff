"""Shared Flax layers: timestep embeddings and the GEGLU feed-forward.

TPU-native equivalents of diffusers' Timesteps/TimestepEmbedding/FeedForward
as consumed by the reference UNet (unet_3d_condition.py:93-96,
attention.py:232). All dense layers compute in `dtype` (bf16 by default on
TPU) with fp32 parameters.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, bit-matching diffusers' `Timesteps`."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal embedding (diffusers parity)."""

    time_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (diffusers `FeedForward` as used at
    attention.py:232 of the reference)."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x
