"""Flax CLIP: text encoder (SD conditioning) and dual-tower model (evaluation).

TPU-native replacements for the reference's transformers `CLIPTextModel`
(test_fatezero.py:89-92, stable_diffusion.py:230-234) and the vendored OpenAI
CLIP ViT-B/32 used by the Frame-Accuracy / Temporal-Consistency metrics
(CLIP/frame_acc_tem_con.py:8, CLIP/clip/model.py). One transformer
implementation serves both towers; configs select the SD text encoder
(ViT-L/14 text side: width 768, 12 layers, quick_gelu) or the ViT-B/32
evaluation pair.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    # final projection used by the dual-tower (metric) model; None for SD text
    projection_dim: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512


# SD-1.4's conditioning encoder and the paper-metric ViT-B/32 pair.
SD_TEXT_CONFIG = CLIPTextConfig()
VIT_B32_TEXT_CONFIG = CLIPTextConfig(
    hidden_size=512, intermediate_size=2048, num_heads=8, projection_dim=512
)
VIT_B32_VISION_CONFIG = CLIPVisionConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool):
        b, s, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhsd,bhtd->bhst",
            heads(q).astype(jnp.float32),
            heads(k).astype(jnp.float32),
        ) * (hd**-0.5)
        if causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(mask, logits, -1e10)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", probs, heads(v).astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.num_heads, self.dtype, name="self_attn")(h, causal)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Causal text transformer. Returns last_hidden_state [B, 77, C]; the
    pooled (argmax-EOT) embedding when `pool` is requested."""

    cfg: CLIPTextConfig = SD_TEXT_CONFIG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, pool: bool = False):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos[None, :s].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.layer_norm_eps, self.dtype,
                name=f"layers_{i}",
            )(x, causal=True)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        if not pool:
            return x
        # EOT token = highest id in the sequence (CLIP convention)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        return x, pooled


class CLIPVisionModel(nn.Module):
    """ViT image tower; returns the projected image embedding [B, proj]."""

    cfg: CLIPVisionConfig = VIT_B32_VISION_CONFIG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array):
        cfg = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels)  # [B, g, g, C]
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate([jnp.tile(cls[None, None].astype(self.dtype), (b, 1, 1)), x], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (num_pos, cfg.hidden_size)
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.layer_norm_eps, self.dtype,
                name=f"layers_{i}",
            )(x, causal=False)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(
            x[:, 0]
        )
        return nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(pooled)


class CLIPModel(nn.Module):
    """Dual tower + logit scale — the evaluation model (Frame-Acc / Tem-Con)."""

    text_cfg: CLIPTextConfig = VIT_B32_TEXT_CONFIG
    vision_cfg: CLIPVisionConfig = VIT_B32_VISION_CONFIG
    dtype: Any = jnp.float32

    def setup(self):
        self.text_model = CLIPTextModel(self.text_cfg, self.dtype)
        self.vision_model = CLIPVisionModel(self.vision_cfg, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, np.log(1 / 0.07), jnp.float32), ()
        )

    def encode_text(self, input_ids):
        _, pooled = self.text_model(input_ids, pool=True)
        return pooled

    def encode_image(self, pixels):
        return self.vision_model(pixels)

    def __call__(self, pixels, input_ids):
        img = self.encode_image(pixels)
        txt = self.encode_text(input_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T
