"""Pseudo-3D conditional UNet (Flax) — the flagship model.

TPU-native rebuild of the reference UNetPseudo3DConditionModel
(video_diffusion/models/unet_3d_condition.py:37-501 and unet_3d_blocks.py):
a 2-D Stable-Diffusion UNet inflated with identity-initialized temporal convs
and zero-initialized temporal attention, with SparseCausalAttention replacing
spatial self-attention. Differences from the reference are architectural, not
semantic:

  * channels-last [B, F, H, W, C] video tensors end to end;
  * the attention controller is a trace-time context threaded through
    ``__call__`` (returns captured maps functionally) instead of monkey-patched
    module forwards;
  * static config (frozen dataclass) selects graph structure — sparse-causal
    index lists, least_sc_channel gating, temporal downsampling — so XLA sees
    only static shapes/control flow.

The diffusers checkpoint key layout maps 1:1 onto the module tree (see
fatezero_tpu/convert/torch_to_flax.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fatezero_tpu.models.attention import SpatioTemporalTransformerModel
from fatezero_tpu.models.layers import (
    FusedGroupNorm,
    TimestepEmbedding,
    get_timestep_embedding,
)
from fatezero_tpu.models.resnet import (
    DownsamplePseudo3D,
    PseudoConv3d,
    ResnetBlockPseudo3D,
    UpsamplePseudo3D,
)
from fatezero_tpu.ptp.context import MAX_CONTROLLED_TOKENS, AttnContext


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    """Static architecture config (reference unet_3d_condition.py:41-86 +
    model_config keys lora / SparseCausalAttention_index / least_sc_channel /
    temporal_downsample_time, SURVEY.md §2.4)."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockPseudo3D",
        "CrossAttnDownBlockPseudo3D",
        "CrossAttnDownBlockPseudo3D",
        "DownBlockPseudo3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockPseudo3D",
        "CrossAttnUpBlockPseudo3D",
        "CrossAttnUpBlockPseudo3D",
        "CrossAttnUpBlockPseudo3D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8  # diffusers legacy: number of heads
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # FateZero model_config
    sparse_causal_indices: Tuple[Union[int, str], ...] = (-1, "first")
    least_sc_channel: int = 0
    temporal_downsample_time: int = 0
    lora: Optional[int] = None
    temporal_attention: bool = True
    # tuning-time rematerialization of the down/mid/up blocks (the reference's
    # per-block gradient checkpointing, unet_3d_blocks.py:308-326, enabled by
    # train_tune_a_video.py:162-164). Ignored when an attention controller is
    # attached: the controller captures maps by trace-time side effect, and
    # remat re-traces the block body, which would double-record them.
    gradient_checkpointing: bool = False

    @classmethod
    def from_reference(cls, config: dict) -> "UNet3DConfig":
        """Build from a diffusers unet config.json dict + FateZero model_config
        overrides (the reference's from_2d_model, unet_3d_condition.py:448-476)."""
        known = {f.name for f in dataclasses.fields(cls)}
        mapped = {}
        for key, value in config.items():
            if key == "SparseCausalAttention_index":
                mapped["sparse_causal_indices"] = tuple(value)
            elif key == "temporal_downsample" and value:
                mapped["temporal_downsample_time"] = 3
            elif key in ("down_block_types", "up_block_types"):
                mapped[key] = tuple(v.replace("2D", "Pseudo3D") for v in value)
            elif key in known:
                mapped[key] = tuple(value) if isinstance(value, list) else value
        return cls(**mapped)

    def block_sparse_indices(self, dim: int):
        if self.least_sc_channel and dim < self.least_sc_channel:
            return ()
        return self.sparse_causal_indices


def _transformer(cfg: UNet3DConfig, channels: int, name: str, dtype):
    heads = cfg.attention_head_dim
    return SpatioTemporalTransformerModel(
        heads=heads,
        dim_head=channels // heads,
        cross_attention_dim=cfg.cross_attention_dim,
        norm_num_groups=cfg.norm_num_groups,
        sparse_indices=cfg.block_sparse_indices(channels),
        temporal_attention=cfg.temporal_attention,
        dtype=dtype,
        name=name,
    )


class CrossAttnDownBlock(nn.Module):
    """layers x [resnet -> transformer] + optional spatial(/temporal) downsample
    (reference unet_3d_blocks.py:218-339)."""

    cfg: UNet3DConfig
    out_channels: int
    add_downsample: bool = True
    temporal_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, attn_ctx=None):
        res = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlockPseudo3D(
                self.out_channels,
                eps=self.cfg.norm_eps,
                groups=self.cfg.norm_num_groups,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            tr = _transformer(self.cfg, self.out_channels, f"attentions_{i}", self.dtype)
            x = tr(x, context, attn_ctx=attn_ctx, place="down")
            res.append(x)
        if self.add_downsample:
            x = DownsamplePseudo3D(
                self.out_channels,
                temporal_downsample=self.temporal_downsample,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name="downsamplers_0",
            )(x)
            res.append(x)
        return x, res


class DownBlock(nn.Module):
    """layers x resnet + optional downsample (unet_3d_blocks.py:342-427)."""

    cfg: UNet3DConfig
    out_channels: int
    add_downsample: bool = True
    temporal_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        res = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlockPseudo3D(
                self.out_channels,
                eps=self.cfg.norm_eps,
                groups=self.cfg.norm_num_groups,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            res.append(x)
        if self.add_downsample:
            x = DownsamplePseudo3D(
                self.out_channels,
                temporal_downsample=self.temporal_downsample,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name="downsamplers_0",
            )(x)
            res.append(x)
        return x, res


class MidBlock(nn.Module):
    """resnet -> transformer -> resnet (unet_3d_blocks.py:129-215)."""

    cfg: UNet3DConfig
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, attn_ctx=None):
        x = ResnetBlockPseudo3D(
            self.channels,
            eps=self.cfg.norm_eps,
            groups=self.cfg.norm_num_groups,
            lora_rank=self.cfg.lora,
            dtype=self.dtype,
            name="resnets_0",
        )(x, temb)
        tr = _transformer(self.cfg, self.channels, "attentions_0", self.dtype)
        x = tr(x, context, attn_ctx=attn_ctx, place="mid")
        x = ResnetBlockPseudo3D(
            self.channels,
            eps=self.cfg.norm_eps,
            groups=self.cfg.norm_num_groups,
            lora_rank=self.cfg.lora,
            dtype=self.dtype,
            name="resnets_1",
        )(x, temb)
        return x


class CrossAttnUpBlock(nn.Module):
    """(layers+1) x [skip-concat resnet -> transformer] + optional upsample
    (unet_3d_blocks.py:430-551)."""

    cfg: UNet3DConfig
    out_channels: int
    add_upsample: bool = True
    temporal_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, attn_ctx=None):
        # skips: tuple of residuals, consumed last-first (the caller slices the
        # global res_stack) — a value argument rather than a mutated list so the
        # block body is a pure function nn.remat can wrap.
        for i in range(self.cfg.layers_per_block + 1):
            skip = skips[len(skips) - 1 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlockPseudo3D(
                self.out_channels,
                eps=self.cfg.norm_eps,
                groups=self.cfg.norm_num_groups,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            tr = _transformer(self.cfg, self.out_channels, f"attentions_{i}", self.dtype)
            x = tr(x, context, attn_ctx=attn_ctx, place="up")
        if self.add_upsample:
            x = UpsamplePseudo3D(
                self.out_channels,
                temporal_upsample=self.temporal_upsample,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name="upsamplers_0",
            )(x)
        return x


class UpBlock(nn.Module):
    """(layers+1) x skip-concat resnet + optional upsample (unet_3d_blocks.py:554-631)."""

    cfg: UNet3DConfig
    out_channels: int
    add_upsample: bool = True
    temporal_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.cfg.layers_per_block + 1):
            skip = skips[len(skips) - 1 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlockPseudo3D(
                self.out_channels,
                eps=self.cfg.norm_eps,
                groups=self.cfg.norm_num_groups,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
        if self.add_upsample:
            x = UpsamplePseudo3D(
                self.out_channels,
                temporal_upsample=self.temporal_upsample,
                lora_rank=self.cfg.lora,
                dtype=self.dtype,
                name="upsamplers_0",
            )(x)
        return x


class UNetPseudo3DConditionModel(nn.Module):
    """Forward: conv_in -> 4 down blocks -> mid -> 4 up blocks -> GN/SiLU/conv_out
    (reference unet_3d_condition.py:307-446).

    __call__(sample [B,F,H,W,C], timesteps [B] or scalar, encoder_hidden_states
    [B,77,768], attn_ctx) -> eps prediction [B,F,H,W,C]. Captured attention
    maps are read off ``attn_ctx.captured`` by the caller (trace-time dict).
    """

    cfg: UNet3DConfig = UNet3DConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        attn_ctx: Optional[AttnContext] = None,
        drop_replay_rows: int = 0,
    ) -> Optional[jax.Array]:
        """drop_replay_rows (static): the first N batch rows exist only to
        feed the controller's *stored/edited* attention maps (the inversion
        replay — pipelines/fatezero_pipeline.py edit_fast). Up blocks whose
        attention runs above MAX_CONTROLLED_TOKENS query tokens are never
        stored or edited (reference attention_store.py:83,
        attention_register.py:112-116), and up-block resolution only grows —
        so once the first such block is reached those rows are dead weight
        and are sliced off. If every row is a replay row (capture-only
        forward) the remaining blocks are skipped entirely and ``None`` is
        returned; the caller reads ``attn_ctx.captured``. At resolutions
        where even the final up block is controlled, nothing is dropped."""
        cfg = self.cfg
        b = sample.shape[0]
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb)

        context = encoder_hidden_states.astype(self.dtype)
        x = sample.astype(self.dtype)
        x = PseudoConv3d(
            cfg.block_out_channels[0], 3, lora_rank=cfg.lora, dtype=self.dtype, name="conv_in"
        )(x)

        # Per-block rematerialization (reference unet_3d_blocks.py:308-326):
        # activations inside each block are recomputed during the backward
        # pass instead of stored. Only applied when no controller is attached
        # — the controller records maps as a trace-time side effect and remat
        # re-traces the body.
        remat = cfg.gradient_checkpointing and attn_ctx is None
        lift = (lambda cls: nn.remat(cls)) if remat else (lambda cls: cls)
        CADown, Down = lift(CrossAttnDownBlock), lift(DownBlock)
        Mid = lift(MidBlock)
        CAUp, Up = lift(CrossAttnUpBlock), lift(UpBlock)

        num_blocks = len(cfg.down_block_types)
        res_stack = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == num_blocks - 1
            t_down = (i >= num_blocks - cfg.temporal_downsample_time) and not is_final
            out_ch = cfg.block_out_channels[i]
            if block_type.startswith("CrossAttn"):
                x, res = CADown(
                    cfg,
                    out_ch,
                    add_downsample=not is_final,
                    temporal_downsample=t_down,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb, context, attn_ctx)
            else:
                x, res = Down(
                    cfg,
                    out_ch,
                    add_downsample=not is_final,
                    temporal_downsample=t_down,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb)
            res_stack.extend(res)

        x = Mid(cfg, cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(
            x, temb, context, attn_ctx
        )

        drop = drop_replay_rows if attn_ctx is not None else 0
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            if drop and x.shape[2] * x.shape[3] > MAX_CONTROLLED_TOKENS:
                # no controlled attention site from here on (see docstring)
                if drop >= b:
                    return None  # capture-only forward: maps are all captured
                x = x[drop:]
                temb = temb[drop:]
                context = context[drop:]
                res_stack = [r[drop:] for r in res_stack]
                drop = 0
            is_final = i == num_blocks - 1
            t_up = i < (cfg.temporal_downsample_time - 1)
            out_ch = rev_channels[i]
            n_skips = cfg.layers_per_block + 1
            skips = tuple(res_stack[-n_skips:])
            del res_stack[-n_skips:]
            if block_type.startswith("CrossAttn"):
                x = CAUp(
                    cfg,
                    out_ch,
                    add_upsample=not is_final,
                    temporal_upsample=t_up,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, skips, temb, context, attn_ctx)
            else:
                x = Up(
                    cfg,
                    out_ch,
                    add_upsample=not is_final,
                    temporal_upsample=t_up,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, skips, temb)

        x = FusedGroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=self.dtype,
            name="conv_norm_out",
        )(x)
        x = nn.silu(x)
        x = PseudoConv3d(cfg.out_channels, 3, lora_rank=cfg.lora, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)
