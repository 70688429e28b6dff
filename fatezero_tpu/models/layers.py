"""Shared Flax layers: timestep embeddings and the GEGLU feed-forward.

TPU-native equivalents of diffusers' Timesteps/TimestepEmbedding/FeedForward
as consumed by the reference UNet (unet_3d_condition.py:93-96,
attention.py:232). All dense layers compute in `dtype` (bf16 by default on
TPU) with fp32 parameters.
"""
from __future__ import annotations

import math
import os
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


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm drop-in (same 'scale'/'bias' params) with fp32 stats laid
    out for XLA fusion (ops/fused_norm.py::_ln_math). epsilon defaults to
    1e-5 — torch nn.LayerNorm's default, which the reference's transformer
    blocks use (flax's default is 1e-6).

    The Pallas LN kernel (ops/fused_norm.py::layer_norm) is kept behind
    FZ_PALLAS_LN=1: standalone it reads/writes at HBM speed, but inside the
    edit graph its custom-call boundary stops XLA from fusing the residual
    adds into neighboring ops — measured net +8 ms/step on the v5e edit scan
    — so the inlineable XLA formulation is the default."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fatezero_tpu.ops.fused_norm import _ln_math, layer_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if os.environ.get("FZ_PALLAS_LN"):
            return layer_norm(x, scale, bias, self.epsilon).astype(self.dtype)
        return _ln_math(x, scale, bias, self.epsilon).astype(self.dtype)


class FusedGroupNorm(nn.Module):
    """nn.GroupNorm drop-in (same 'scale'/'bias' params) with the TPU-fast
    stats formulation (ops/fused_norm.py). Input any [..., C]; stats are per
    sample over everything past the first `batch_dims` axes (batch_dims=1 is
    flax/torch GroupNorm; batch_dims=2 keeps per-(batch, frame) stats on 5-D
    video without folding frames into batch — the fold would merge a
    replicated row axis over a seq-sharded frame axis, which GSPMD cannot
    represent and answers with a full all-gather)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    batch_dims: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fatezero_tpu.ops.fused_norm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        folded = x.reshape(*x.shape[: self.batch_dims], -1, c)
        out = group_norm(folded, scale, bias, self.num_groups, self.epsilon)
        return out.reshape(x.shape).astype(self.dtype)
