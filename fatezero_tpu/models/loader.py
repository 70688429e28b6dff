"""Checkpoint loader: HF `from_pretrained` layout -> Flax model bundle.

Replaces the reference's model-building block (test_fatezero.py:82-117):
tokenizer/, text_encoder/, vae/, unet/, scheduler/ subfolders of a diffusers
checkpoint, with the 2D->3D UNet inflation of unet_3d_condition.py:448-501
done at conversion time (temporal params keep their identity init).

No hub access ever happens: if `pretrained_model_path` is not a directory it
must be a `random:` spec (`random:tiny` | `random:sd`), which builds the
architecture with deterministic random weights — the supported mode in
weightless environments (CI, this image).
"""
from __future__ import annotations

import dataclasses
import json
import os
from types import SimpleNamespace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from fatezero_tpu.models.tokenizer import CLIPTokenizer, StubTokenizer
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.models.vae import AutoencoderKL, VAEConfig
from fatezero_tpu.ops import schedule as S

TINY_UNET = dict(
    block_out_channels=(32, 64, 128, 128),
    attention_head_dim=4,
    cross_attention_dim=32,
    norm_num_groups=8,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
TINY_TEXT = CLIPTextConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2, vocab_size=1000
)


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _schedule_from_config(cfg: dict) -> S.DiffusionSchedule:
    return S.make_schedule(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        set_alpha_to_one=cfg.get("set_alpha_to_one", False),
        prediction_type=cfg.get("prediction_type", "epsilon"),
        clip_sample=cfg.get("clip_sample", False),
    )


def load_models(
    pretrained_model_path: str,
    model_config: Optional[dict] = None,
    dtype: Any = jnp.float32,
    seed: int = 0,
) -> SimpleNamespace:
    """Build (unet, vae, text_encoder, tokenizer, schedule) + params.

    Directory -> converted diffusers checkpoint; `random:tiny` / `random:sd`
    (or any missing path, with a warning) -> deterministic random weights.
    """
    model_config = dict(model_config or {})
    if os.path.isdir(pretrained_model_path):
        return _load_pretrained(pretrained_model_path, model_config, dtype)
    tag = pretrained_model_path.split(":", 1)[-1] if ":" in pretrained_model_path else "sd"
    if not pretrained_model_path.startswith("random"):
        import warnings

        warnings.warn(
            f"pretrained_model_path {pretrained_model_path!r} does not exist; "
            f"building randomly initialized '{tag}' architecture"
        )
    return _load_random(tag, model_config, dtype, seed)


def _unet_cfg_overrides(model_config: dict) -> dict:
    """FateZero model_config YAML keys -> UNet3DConfig fields (SURVEY.md §2.4)."""
    out = {}
    if model_config.get("SparseCausalAttention_index") is not None:
        out["sparse_causal_indices"] = tuple(model_config["SparseCausalAttention_index"])
    if model_config.get("least_sc_channel"):
        out["least_sc_channel"] = int(model_config["least_sc_channel"])
    if model_config.get("temporal_downsample_time"):
        out["temporal_downsample_time"] = int(model_config["temporal_downsample_time"])
    if model_config.get("lora"):
        out["lora"] = int(model_config["lora"])
    if model_config.get("gradient_checkpointing"):
        out["gradient_checkpointing"] = True
    return out


def _load_random(tag: str, model_config: dict, dtype, seed: int) -> SimpleNamespace:
    if tag == "tiny":
        unet_cfg = UNet3DConfig(**{**TINY_UNET, **_unet_cfg_overrides(model_config)})
        vae_cfg, text_cfg = TINY_VAE, TINY_TEXT
        tokenizer = StubTokenizer(vocab_size=text_cfg.vocab_size)
        # latent must survive the 3 stride-2 downsamples: >= 8x8 at init
        f, hw = 2, 64
    else:
        unet_cfg = UNet3DConfig(**_unet_cfg_overrides(model_config))
        vae_cfg, text_cfg = VAEConfig(), CLIPTextConfig()
        tokenizer = StubTokenizer(vocab_size=text_cfg.vocab_size)
        f, hw = 2, 64
    unet = UNetPseudo3DConditionModel(cfg=unet_cfg, dtype=dtype)
    vae = AutoencoderKL(cfg=vae_cfg, dtype=dtype)
    text_encoder = CLIPTextModel(cfg=text_cfg, dtype=dtype)

    text_dim = unet_cfg.cross_attention_dim
    unet_params = _fast_init(
        unet,
        jnp.zeros((1, f, hw // 8, hw // 8, 4)),
        jnp.int32(0),
        jnp.zeros((1, 77, text_dim)),
        seed=seed,
    )
    vae_params = _fast_init(vae, jnp.zeros((1, hw, hw, 3)), seed=seed)
    text_params = _fast_init(text_encoder, jnp.zeros((1, 77), jnp.int32), seed=seed)
    return SimpleNamespace(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text_encoder,
        text_params=text_params,
        tokenizer=tokenizer,
        schedule=S.make_schedule(),
        pretrained=False,
    )


def _fast_init(model, *args, seed: int = 0):
    """Deterministic shape-derived params without per-leaf init compiles, but
    honoring the identity semantics of inflation: leaves whose path mentions
    'temporal' or 'lora_up' are zeroed (zero temporal attention / LoRA up =
    identity residual); temporal conv kernels get the dirac kernel."""
    from fatezero_tpu.models.resnet import dirac_temporal_init

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed), *args)
    rng = np.random.RandomState(seed)
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]

    def fill(path, s):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "temporal" in name and name.endswith("kernel") and len(s.shape) == 3:
            return np.asarray(dirac_temporal_init(None, s.shape, s.dtype))
        if ("attn_temporal" in name and "to_out" in name) or (
            "lora" in name and name.endswith("up")
        ):
            # temporal attention out-proj and LoRA up-projection
            # ('lora_temporal_up') are zero => inflated model == 2-D model
            return np.zeros(s.shape, s.dtype)
        parts = name.split("/")
        if name.endswith("bias"):
            return np.zeros(s.shape, s.dtype)
        # norm gains start at one; match the norm MODULE (immediate parent
        # segment) + exact 'scale' leaf, not substrings of the leaf name —
        # a future param like 'renorm_scale' must not silently become ones
        if parts[-1] == "scale" and len(parts) >= 2 and "norm" in parts[-2].lower():
            return np.ones(s.shape, s.dtype)
        return (rng.standard_normal(s.shape) * 0.02).astype(s.dtype)

    leaves = [fill(p, s) for p, s in flat]
    treedef = jax.tree_util.tree_structure(shapes)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _load_flax_native(path: str, model_config: dict, dtype) -> SimpleNamespace:
    """Load a checkpoint saved by common/checkpoint.py (tuned-model resume)."""
    from fatezero_tpu.common.checkpoint import (
        load_component_config,
        load_component_params,
    )

    def cfg_from(saved: dict, cls, **extra):
        fields = {f.name for f in dataclasses.fields(cls)}
        clean = {}
        for k, v in saved.items():
            if k not in fields:
                continue
            clean[k] = tuple(v) if isinstance(v, list) else v
        clean.update(extra)
        return cls(**clean)

    unet_saved = load_component_config(os.path.join(path, "unet")) or {}
    # saved sparse indices may be ['-1', 'first'] after json default=str
    if "sparse_causal_indices" in unet_saved:
        unet_saved["sparse_causal_indices"] = [
            int(x) if isinstance(x, str) and x.lstrip("-").isdigit() else x
            for x in unet_saved["sparse_causal_indices"]
        ]
    if unet_saved.get("lora") in ("None", None):
        unet_saved["lora"] = None
    else:
        unet_saved["lora"] = int(unet_saved["lora"])
    unet_cfg = cfg_from(
        {**unet_saved, **_unet_cfg_overrides(model_config)}, UNet3DConfig
    )
    unet = UNetPseudo3DConditionModel(cfg=unet_cfg, dtype=dtype)
    # trees are saved verbatim (including the flax "params" root)
    unet_params = load_component_params(os.path.join(path, "unet"))

    def opt_component(sub, cls, model_cls):
        d = os.path.join(path, sub)
        if not os.path.exists(os.path.join(d, "flax_model.safetensors")):
            return None, None
        cfg = cfg_from(load_component_config(d) or {}, cls)
        return model_cls(cfg=cfg, dtype=dtype), load_component_params(d)

    vae, vae_params = opt_component("vae", VAEConfig, AutoencoderKL)
    text_encoder, text_params = opt_component("text_encoder", CLIPTextConfig, CLIPTextModel)
    tok_dir = os.path.join(path, "tokenizer")
    if os.path.exists(os.path.join(tok_dir, "vocab.json")):
        tokenizer = CLIPTokenizer.from_pretrained(path)
    else:
        vocab = text_encoder.cfg.vocab_size if text_encoder else 49408
        tokenizer = StubTokenizer(vocab_size=vocab)
    sched_path = os.path.join(path, "scheduler", "scheduler_config.json")
    schedule = (
        _schedule_from_config(_read_json(sched_path))
        if os.path.exists(sched_path)
        else S.make_schedule()
    )
    return SimpleNamespace(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text_encoder,
        text_params=text_params,
        tokenizer=tokenizer,
        schedule=schedule,
        pretrained=True,
    )


def _load_pretrained(path: str, model_config: dict, dtype) -> SimpleNamespace:
    from fatezero_tpu.common.checkpoint import is_flax_checkpoint

    if is_flax_checkpoint(path):
        return _load_flax_native(path, model_config, dtype)
    from fatezero_tpu.convert.torch_to_flax import (
        convert_clip_text_state,
        convert_unet_state,
        convert_vae_state,
        load_torch_state,
        merge_into_params,
    )

    tokenizer = CLIPTokenizer.from_pretrained(path)

    unet_json = _read_json(os.path.join(path, "unet", "config.json"))
    unet_cfg = UNet3DConfig.from_reference({**unet_json, **model_config})
    unet = UNetPseudo3DConditionModel(cfg=unet_cfg, dtype=dtype)
    # real values for the inflation-added params, converted weights elsewhere
    unet_base = _fast_init(
        unet,
        jnp.zeros((1, 2, unet_cfg.sample_size, unet_cfg.sample_size, 4)),
        jnp.int32(0),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
    )
    unet_params = merge_into_params(
        unet_base, convert_unet_state(load_torch_state(os.path.join(path, "unet")))
    )

    vae_json = _read_json(os.path.join(path, "vae", "config.json"))
    vae_cfg = VAEConfig(
        block_out_channels=tuple(vae_json.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vae_json.get("layers_per_block", 2),
        latent_channels=vae_json.get("latent_channels", 4),
        norm_num_groups=vae_json.get("norm_num_groups", 32),
        scaling_factor=vae_json.get("scaling_factor", 0.18215),
    )
    vae = AutoencoderKL(cfg=vae_cfg, dtype=dtype)
    vae_base = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8 * vae_cfg.latent_channels, 8 * vae_cfg.latent_channels, 3))
    )
    vae_params = merge_into_params(
        vae_base, convert_vae_state(load_torch_state(os.path.join(path, "vae")))
    )

    text_json = _read_json(os.path.join(path, "text_encoder", "config.json"))
    text_cfg = CLIPTextConfig(
        vocab_size=text_json.get("vocab_size", 49408),
        hidden_size=text_json.get("hidden_size", 768),
        intermediate_size=text_json.get("intermediate_size", 3072),
        num_layers=text_json.get("num_hidden_layers", 12),
        num_heads=text_json.get("num_attention_heads", 12),
        max_position_embeddings=text_json.get("max_position_embeddings", 77),
    )
    text_encoder = CLIPTextModel(cfg=text_cfg, dtype=dtype)
    text_base = text_encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    text_params = merge_into_params(
        text_base,
        convert_clip_text_state(load_torch_state(os.path.join(path, "text_encoder"))),
    )

    sched_path = os.path.join(path, "scheduler", "scheduler_config.json")
    schedule = (
        _schedule_from_config(_read_json(sched_path))
        if os.path.exists(sched_path)
        else S.make_schedule()
    )
    return SimpleNamespace(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text_encoder,
        text_params=text_params,
        tokenizer=tokenizer,
        schedule=schedule,
        pretrained=True,
    )
