"""Torch/diffusers checkpoint -> Flax params converters (with 2D->3D inflation).

Replaces the reference's from_2d_model / load_2d_state_dict
(unet_3d_condition.py:448-501): 2-D Stable-Diffusion weights are mapped onto
the pseudo-3-D Flax tree; parameters whose path contains "temporal" keep
their identity/zero initialization (the strict-load exemption of
unet_3d_condition.py:494-499). Also handles the FateZero released *3-D tuned*
checkpoints (conv_temporal / attn_temporal keys present) and the VAE / CLIP
text towers.

Conventions:
  torch Linear [out, in]        -> kernel [in, out]
  torch Conv2d [out, in, kh, kw]-> kernel [kh, kw, in, out]
  torch Conv1d [out, in, k]     -> temporal kernel [k, in, out]
  torch *.weight of norms       -> scale

No torch import is needed unless loading a .bin (torch.load) — .safetensors
loads via safetensors.numpy.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict

import numpy as np


# --------------------------------------------------------------------- load
def load_torch_state(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a diffusers-layout weight file (*.safetensors preferred, *.bin)."""
    st = glob.glob(os.path.join(model_dir, "*.safetensors"))
    if st:
        from safetensors.numpy import load_file

        return dict(load_file(st[0]))
    bins = glob.glob(os.path.join(model_dir, "*.bin"))
    if not bins:
        raise FileNotFoundError(f"no weight file under {model_dir}")
    import torch

    sd = torch.load(bins[0], map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


# ------------------------------------------------------------------ helpers
def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _linear(flax_tree, prefix, torch_state, torch_prefix, bias=True):
    _set(flax_tree, f"{prefix}/kernel", torch_state[f"{torch_prefix}.weight"].T)
    if bias and f"{torch_prefix}.bias" in torch_state:
        _set(flax_tree, f"{prefix}/bias", torch_state[f"{torch_prefix}.bias"])


def _conv(flax_tree, prefix, torch_state, torch_prefix):
    w = torch_state[f"{torch_prefix}.weight"]
    _set(flax_tree, f"{prefix}/kernel", w.transpose(2, 3, 1, 0))
    if f"{torch_prefix}.bias" in torch_state:
        _set(flax_tree, f"{prefix}/bias", torch_state[f"{torch_prefix}.bias"])


def _norm(flax_tree, prefix, torch_state, torch_prefix):
    _set(flax_tree, f"{prefix}/scale", torch_state[f"{torch_prefix}.weight"])
    _set(flax_tree, f"{prefix}/bias", torch_state[f"{torch_prefix}.bias"])


# -------------------------------------------------------------------- unet
_UNET_RULES = [
    # (regex on the torch key prefix, handler tag, flax path template)
    (re.compile(r"^(conv_in|conv_out)$"), "pconv", r"\1"),
    (re.compile(r"^conv_norm_out$"), "norm", r"conv_norm_out"),
    (re.compile(r"^time_embedding\.(linear_\d)$"), "linear", r"time_embedding/\1"),
    (
        re.compile(r"^(down_blocks|up_blocks)\.(\d+)\.(resnets)\.(\d+)\.(conv1|conv2|conv_shortcut)$"),
        "pconv",
        r"\1_\2/resnets_\4/\5",
    ),
    (
        re.compile(r"^(down_blocks|up_blocks)\.(\d+)\.(resnets)\.(\d+)\.(norm1|norm2)$"),
        "norm",
        r"\1_\2/resnets_\4/\5",
    ),
    (
        re.compile(r"^(down_blocks|up_blocks)\.(\d+)\.resnets\.(\d+)\.time_emb_proj$"),
        "linear",
        r"\1_\2/resnets_\3/time_emb_proj",
    ),
    (
        re.compile(r"^(down_blocks)\.(\d+)\.downsamplers\.0\.conv$"),
        "pconv",
        r"down_blocks_\2/downsamplers_0/conv",
    ),
    (
        re.compile(r"^(up_blocks)\.(\d+)\.upsamplers\.0\.conv$"),
        "pconv",
        r"up_blocks_\2/upsamplers_0/conv",
    ),
    (
        re.compile(r"^mid_block\.resnets\.(\d+)\.(conv1|conv2|conv_shortcut)$"),
        "pconv",
        r"mid_block/resnets_\1/\2",
    ),
    (
        re.compile(r"^mid_block\.resnets\.(\d+)\.(norm1|norm2)$"),
        "norm",
        r"mid_block/resnets_\1/\2",
    ),
    (
        re.compile(r"^mid_block\.resnets\.(\d+)\.time_emb_proj$"),
        "linear",
        r"mid_block/resnets_\1/time_emb_proj",
    ),
]

_ATTN_SITE = re.compile(
    r"^(?P<block>down_blocks\.\d+|up_blocks\.\d+|mid_block)\.attentions\.(?P<ai>\d+)\.(?P<rest>.+)$"
)


def _flax_block(name: str) -> str:
    return name.replace(".", "_") if name != "mid_block" else "mid_block"


def convert_unet_state(torch_state: Dict[str, np.ndarray]) -> Dict:
    """diffusers UNet2DConditionModel (or FateZero 3-D) state_dict -> flax tree.

    Returns a nested dict to be merged over the flax-initialized params
    (temporal params absent from the checkpoint keep their identity init).
    """
    tree: Dict = {}
    consumed = set()

    def take(torch_prefix, kind, flax_prefix):
        if kind == "linear":
            _linear(tree, flax_prefix, torch_state, torch_prefix)
        elif kind == "norm":
            _norm(tree, flax_prefix, torch_state, torch_prefix)
        elif kind == "conv":
            _conv(tree, flax_prefix, torch_state, torch_prefix)
        elif kind == "pconv":  # PseudoConv3d: spatial 2-D conv part
            _conv(tree, f"{flax_prefix}/spatial", torch_state, torch_prefix)
        consumed.add(f"{torch_prefix}.weight")
        consumed.add(f"{torch_prefix}.bias")

    prefixes = sorted({k.rsplit(".", 1)[0] for k in torch_state})
    for p in prefixes:
        # temporal inflation keys of FateZero 3-D checkpoints
        if p.endswith(".conv_temporal"):
            base = _torch_to_flax_module(p[: -len(".conv_temporal")])
            w = torch_state[f"{p}.weight"]  # [C, C, k]
            _set(tree, f"{base}/conv_temporal_kernel", w.transpose(2, 1, 0))
            if f"{p}.bias" in torch_state:
                _set(tree, f"{base}/conv_temporal_bias", torch_state[f"{p}.bias"])
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        if ".conv_temporal.down" in p or ".conv_temporal.up" in p:
            mod = "lora_temporal_down" if p.endswith("down") else "lora_temporal_up"
            base = _torch_to_flax_module(p.rsplit(".conv_temporal", 1)[0])
            w = torch_state[f"{p}.weight"]  # [out, in, k]
            _set(tree, f"{base}/{mod}", w.transpose(2, 1, 0))
            consumed.add(f"{p}.weight")
            continue

        m = _ATTN_SITE.match(p)
        if m:
            _convert_transformer_module(tree, torch_state, m, consumed)
            continue
        for rx, kind, template in _UNET_RULES:
            mm = rx.match(p)
            if mm:
                take(p, kind, mm.expand(template))
                break

    leftovers = {
        k for k in torch_state if k not in consumed and not k.endswith("num_batches_tracked")
    }
    if leftovers:
        raise KeyError(f"unconverted UNet keys (first 10): {sorted(leftovers)[:10]}")
    return tree


def _torch_to_flax_module(p: str) -> str:
    """down_blocks.0.resnets.1.conv1 -> down_blocks_0/resnets_1/conv1 etc."""
    parts = p.split(".")
    out = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{parts[i]}_{parts[i + 1]}")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return "/".join(out)


def _convert_transformer_module(tree, torch_state, m, consumed):
    block = _flax_block(m.group("block"))
    ai = m.group("ai")
    rest = m.group("rest")
    base = f"{block}/attentions_{ai}"
    key = f"{m.group('block')}.attentions.{ai}.{rest}"

    def done(prefix):
        consumed.add(f"{prefix}.weight")
        consumed.add(f"{prefix}.bias")

    if rest == "norm":
        _norm(tree, f"{base}/norm", torch_state, key)
        done(key)
    elif rest in ("proj_in", "proj_out"):
        w = torch_state[f"{key}.weight"]
        if w.ndim == 4:  # 1x1 conv -> dense
            w = w[:, :, 0, 0]
        _set(tree, f"{base}/{rest}/kernel", w.T)
        if f"{key}.bias" in torch_state:
            _set(tree, f"{base}/{rest}/bias", torch_state[f"{key}.bias"])
        done(key)
    else:
        tb = re.match(r"transformer_blocks\.(\d+)\.(.+)$", rest)
        if not tb:
            return
        ti, inner = tb.group(1), tb.group(2)
        tbase = f"{base}/transformer_blocks_{ti}"
        inner_map = {
            "attn1": "attn1",
            "attn2": "attn2",
            "attn_temporal": "attn_temporal",
        }
        am = re.match(r"(attn1|attn2|attn_temporal)\.(to_q|to_k|to_v)$", inner)
        ao = re.match(r"(attn1|attn2|attn_temporal)\.to_out\.0$", inner)
        if am:
            _linear(tree, f"{tbase}/{inner_map[am.group(1)]}/{am.group(2)}", torch_state, key)
            done(key)
        elif ao:
            _linear(tree, f"{tbase}/{inner_map[ao.group(1)]}/to_out", torch_state, key)
            done(key)
        elif inner in ("norm1", "norm2", "norm3", "norm_temporal"):
            _norm(tree, f"{tbase}/{inner}", torch_state, key)
            done(key)
        elif inner == "ff.net.0.proj":
            _linear(tree, f"{tbase}/ff/net_0/proj", torch_state, key)
            done(key)
        elif inner == "ff.net.2":
            _linear(tree, f"{tbase}/ff/net_2", torch_state, key)
            done(key)


# --------------------------------------------------------------------- vae
def convert_vae_state(torch_state: Dict[str, np.ndarray]) -> Dict:
    """diffusers AutoencoderKL state_dict -> flax tree (models/vae.py naming)."""
    tree: Dict = {}
    consumed = set()
    prefixes = sorted({k.rsplit(".", 1)[0] for k in torch_state})
    for p in prefixes:
        parts = p.split(".")
        tower = parts[0]
        if tower in ("quant_conv", "post_quant_conv"):
            _conv(tree, p, torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        if tower not in ("encoder", "decoder"):
            continue
        rest = parts[1:]
        joined = ".".join(rest)
        # resnets
        m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.resnets\.(\d+)\.(\w+)$", joined)
        if m:
            mod = f"{tower}/{m.group(1)}_{m.group(2)}_resnets_{m.group(3)}/{m.group(4)}"
            if m.group(4).startswith("norm"):
                _norm(tree, mod, torch_state, p)
            else:
                _conv(tree, mod, torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        m = re.match(r"(down_blocks)\.(\d+)\.downsamplers\.0\.conv$", joined)
        if m:
            _conv(tree, f"{tower}/down_blocks_{m.group(2)}_downsamplers_0_conv", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        m = re.match(r"(up_blocks)\.(\d+)\.upsamplers\.0\.conv$", joined)
        if m:
            _conv(tree, f"{tower}/up_blocks_{m.group(2)}_upsamplers_0_conv", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        m = re.match(r"mid_block\.resnets\.(\d+)\.(\w+)$", joined)
        if m:
            mod = f"{tower}/mid_block_resnets_{m.group(1)}/{m.group(2)}"
            if m.group(2).startswith("norm"):
                _norm(tree, mod, torch_state, p)
            else:
                _conv(tree, mod, torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        m = re.match(r"mid_block\.attentions\.0\.(\w+)$", joined)
        if m:
            mod = f"{tower}/mid_block_attentions_0/{m.group(1)}"
            if m.group(1) == "group_norm":
                _norm(tree, mod, torch_state, p)
            else:
                _linear(tree, mod, torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        if joined in ("conv_in", "conv_out"):
            _conv(tree, f"{tower}/{joined}", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        if joined == "conv_norm_out":
            _norm(tree, f"{tower}/conv_norm_out", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
    leftovers = {k for k in torch_state if k not in consumed}
    if leftovers:
        raise KeyError(f"unconverted VAE keys (first 10): {sorted(leftovers)[:10]}")
    return tree


# ---------------------------------------------------------------- clip text
def convert_clip_text_state(torch_state: Dict[str, np.ndarray]) -> Dict:
    """HF CLIPTextModel state_dict -> flax tree (models/clip.py naming)."""
    tree: Dict = {}
    consumed = set()
    pfx = "text_model."
    prefixes = sorted({k.rsplit(".", 1)[0] for k in torch_state if k.startswith(pfx)})
    for p in prefixes:
        rest = p[len(pfx):]
        if rest == "embeddings.token_embedding":
            _set(tree, "token_embedding/embedding", torch_state[f"{p}.weight"])
            consumed.add(f"{p}.weight")
            continue
        if rest == "embeddings.position_embedding":
            _set(tree, "position_embedding", torch_state[f"{p}.weight"])
            consumed.add(f"{p}.weight")
            continue
        if rest == "final_layer_norm":
            _norm(tree, "final_layer_norm", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
        m = re.match(
            r"encoder\.layers\.(\d+)\.(self_attn\.(?:q_proj|k_proj|v_proj|out_proj)|layer_norm1|layer_norm2|mlp\.fc1|mlp\.fc2)$",
            rest,
        )
        if m:
            li = m.group(1)
            mod = m.group(2)
            if mod.startswith("layer_norm"):
                _norm(tree, f"layers_{li}/{mod}", torch_state, p)
            elif mod.startswith("self_attn"):
                _linear(tree, f"layers_{li}/self_attn/{mod.split('.')[1]}", torch_state, p)
            else:
                _linear(tree, f"layers_{li}/{mod.split('.')[1]}", torch_state, p)
            consumed.update({f"{p}.weight", f"{p}.bias"})
            continue
    leftovers = {
        k
        for k in torch_state
        if k not in consumed and "position_ids" not in k and k.startswith(pfx)
    }
    if leftovers:
        raise KeyError(f"unconverted CLIP-text keys (first 10): {sorted(leftovers)[:10]}")
    return tree


def convert_clip_vision_state(
    torch_state: Dict[str, np.ndarray], prefix: str = "vision_model."
) -> Dict:
    """HF CLIPVisionModel state_dict -> flax tree (models/clip.py naming)."""
    tree: Dict = {}
    consumed = set()
    for k in torch_state:
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if rest == "embeddings.class_embedding":
            _set(tree, "class_embedding", torch_state[k])
        elif rest == "embeddings.patch_embedding.weight":
            # conv [C, 3, P, P] -> [P, P, 3, C]
            _set(tree, "patch_embedding/kernel", torch_state[k].transpose(2, 3, 1, 0))
        elif rest == "embeddings.position_embedding.weight":
            _set(tree, "position_embedding", torch_state[k])
        elif rest.startswith(("pre_layrnorm", "pre_layernorm")):  # HF typo'd key
            name = "scale" if rest.endswith("weight") else "bias"
            _set(tree, f"pre_layernorm/{name}", torch_state[k])
        elif rest.startswith("post_layernorm"):
            name = "scale" if rest.endswith("weight") else "bias"
            _set(tree, f"post_layernorm/{name}", torch_state[k])
        else:
            m = re.match(
                r"encoder\.layers\.(\d+)\.(self_attn\.(?:q_proj|k_proj|v_proj|out_proj)|layer_norm1|layer_norm2|mlp\.fc1|mlp\.fc2)\.(weight|bias)$",
                rest,
            )
            if not m:
                if "position_ids" in rest:
                    consumed.add(k)
                    continue
                raise KeyError(f"unconverted CLIP-vision key: {k}")
            li, mod, kind = m.groups()
            if mod.startswith("layer_norm"):
                _set(
                    tree,
                    f"layers_{li}/{mod}/{'scale' if kind == 'weight' else 'bias'}",
                    torch_state[k],
                )
            else:
                sub = mod.split(".")[1]
                base = (
                    f"layers_{li}/self_attn/{sub}"
                    if mod.startswith("self_attn")
                    else f"layers_{li}/{sub}"
                )
                _set(
                    tree,
                    f"{base}/{'kernel' if kind == 'weight' else 'bias'}",
                    torch_state[k].T if kind == "weight" else torch_state[k],
                )
        consumed.add(k)
    return tree


def convert_clip_full_state(torch_state: Dict[str, np.ndarray]) -> Dict:
    """HF CLIPModel (dual-tower) state_dict -> flax tree for models.clip.CLIPModel."""
    tree = {
        "text_model": convert_clip_text_state(torch_state),
        "vision_model": convert_clip_vision_state(torch_state),
        "logit_scale": np.asarray(torch_state["logit_scale"]),
    }
    _set(tree, "vision_model/visual_projection/kernel", torch_state["visual_projection.weight"].T)
    _set(tree, "text_model/text_projection/kernel", torch_state["text_projection.weight"].T)
    return tree


# ------------------------------------------------------------------- merge
def merge_into_params(init_params: Dict, converted: Dict, strict: bool = True) -> Dict:
    """Overlay converted leaves onto flax-initialized params.

    Mirrors load_2d_state_dict (unet_3d_condition.py:485-501): every converted
    leaf must exist with the same shape; params NOT covered must contain
    "temporal" or "lora" in their path (the inflation-added set), else strict
    mode raises.
    """
    import jax

    flat_init = _flatten(init_params.get("params", init_params))
    flat_conv = _flatten(converted)
    for k, v in flat_conv.items():
        if k not in flat_init:
            raise KeyError(f"converted key {k} not in model params")
        if tuple(flat_init[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {k}: ckpt {v.shape} vs model {flat_init[k].shape}"
            )
    if strict:
        for k in flat_init:
            if k not in flat_conv and "temporal" not in k and "lora" not in k:
                raise KeyError(f"model param {k} missing from checkpoint")
    merged = dict(flat_init)
    merged.update({k: np.asarray(v, dtype=np.asarray(flat_init[k]).dtype) for k, v in flat_conv.items()})
    tree = _unflatten(merged)
    if "params" in init_params:
        return {"params": tree}
    return tree


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        _set(tree, k, v)
    return tree
