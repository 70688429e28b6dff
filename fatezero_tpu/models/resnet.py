"""Pseudo-3D convolution / resnet stack (Flax, channels-last video tensors).

TPU-native re-design of the reference's PseudoConv3d / ResnetBlockPseudo3D /
Up-/DownsamplePseudo3D (reference: video_diffusion/models/resnet.py:12-394):
a spatial 2-D conv batched over frames followed by an identity-initialized
channel-mixing temporal conv, expressed as frame-shifted matmuls
(ops/video_ops.temporal_conv) instead of layout-transposed Conv1d.

All tensors are [B, F, H, W, C]. Parameters with "temporal" in their path are
the inflation-added weights (exempt from 2D-checkpoint strict loading, cf.
unet_3d_condition.py:494-499, and the tuning-trainable set).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from fatezero_tpu.models.layers import FusedGroupNorm
import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.ops.video_ops import (
    temporal_avgpool,
    temporal_conv,
    temporal_linear_upsample_2x,
    upsample_nearest_2x,
)


def dirac_temporal_init(key, shape, dtype=jnp.float32):
    """Identity init for [k, C, C] temporal kernels (torch nn.init.dirac_):
    center tap = I, other taps = 0 — the inflated conv starts as the 2-D conv."""
    k, cin, cout = shape
    w = np.zeros(shape, np.float32)
    eye = np.eye(min(cin, cout), dtype=np.float32)
    w[k // 2, : eye.shape[0], : eye.shape[1]] = eye
    return jnp.asarray(w, dtype)


class PseudoConv3d(nn.Module):
    """Spatial Conv2d per frame + temporal conv over frames (identity init).

    kernel_size==1 convs (shortcuts) carry no temporal part, matching
    resnet.py:29-51 of the reference. ``lora_rank`` switches the temporal part
    to the rank-r LoRA pair with zero-init up projection (lora.py:22-54).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    temporal_downsample: bool = False
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        pad = self.kernel_size // 2
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            name="spatial",
        )(x.reshape(b * f, h, w, c))
        y = y.reshape(b, f, y.shape[1], y.shape[2], self.features)

        if self.kernel_size <= 1:
            return y
        t_stride = 2 if self.temporal_downsample else 1
        if self.lora_rank is not None:
            # reference clamps oversized ranks to C//2 (lora.py:26-28)
            rank = self.lora_rank if self.lora_rank <= self.features else self.features // 2
            down = self.param(
                "lora_temporal_down",
                lambda k, s: jax.random.normal(k, s, jnp.float32) / rank,
                (3, self.features, rank),
            )
            up = self.param(
                "lora_temporal_up", nn.initializers.zeros, (3, rank, self.features)
            )
            delta = temporal_conv(y, down.astype(self.dtype), None, stride=t_stride)
            delta = temporal_conv(delta, up.astype(self.dtype), None, stride=1)
            skip = temporal_avgpool(y) if t_stride == 2 else y
            return skip + delta
        wt = self.param(
            "conv_temporal_kernel",
            dirac_temporal_init,
            (3, self.features, self.features),
        )
        bt = self.param("conv_temporal_bias", nn.initializers.zeros, (self.features,))
        return temporal_conv(y, wt.astype(self.dtype), bt.astype(self.dtype), stride=t_stride)


class UpsamplePseudo3D(nn.Module):
    """Nearest 2x spatial upsample (+ linear 2x temporal when restoring a
    temporal downsample) followed by a pseudo-3D conv (resnet.py:83-175)."""

    features: int
    temporal_upsample: bool = False
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample_nearest_2x(x)
        if self.temporal_upsample:
            x = temporal_linear_upsample_2x(x)
        return PseudoConv3d(
            self.features, 3, lora_rank=self.lora_rank, dtype=self.dtype, name="conv"
        )(x)


class DownsamplePseudo3D(nn.Module):
    """Stride-2 pseudo-3D conv (optionally stride-2 temporal); resnet.py:178-236."""

    features: int
    temporal_downsample: bool = False
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return PseudoConv3d(
            self.features,
            3,
            stride=2,
            temporal_downsample=self.temporal_downsample,
            lora_rank=self.lora_rank,
            dtype=self.dtype,
            name="conv",
        )(x)


class ResnetBlockPseudo3D(nn.Module):
    """GN/SiLU/conv x2 with timestep-embedding add and skip (resnet.py:239-394).

    SD-1.x uses time_embedding_norm='default' (add after conv1) and no
    in-block up/downsampling; both are reflected here.
    """

    out_channels: int
    temb_channels: int = 1280
    groups: int = 32
    eps: float = 1e-5
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = PseudoConv3d(self.out_channels, 3, lora_rank=self.lora_rank, dtype=self.dtype, name="conv1")(h)

        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, None, :]

        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = PseudoConv3d(self.out_channels, 3, lora_rank=self.lora_rank, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            x = PseudoConv3d(self.out_channels, 1, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h
