"""Pipeline checkpointing: save_pretrained-style layout, flax-native weights.

Mirrors the reference's HF layout (test_fatezero.py:82-117, SURVEY.md §5
checkpoint/resume): component subfolders with a config.json and one weight
file each. Weights are safetensors of flattened flax params ('/'-joined
paths) — loadable with zero torch involvement; the torch->flax converters in
convert/torch_to_flax.py cover reference checkpoints.

    logdir/checkpoint_{step}/
        unet/{config.json, flax_model.safetensors}
        vae/{config.json, flax_model.safetensors}
        text_encoder/{config.json, flax_model.safetensors}
        tokenizer/{vocab.json, merges.txt}          (copied when available)
        scheduler/scheduler_config.json
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


def save_component(dirpath: str, config: Any, params: Dict) -> None:
    from safetensors.numpy import save_file

    os.makedirs(dirpath, exist_ok=True)
    if config is not None:
        cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
        with open(os.path.join(dirpath, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)
    host = jax.tree.map(lambda x: np.asarray(x), params)
    save_file(_flatten(host), os.path.join(dirpath, "flax_model.safetensors"))


def load_component_params(dirpath: str) -> Dict:
    from safetensors.numpy import load_file

    return _unflatten(dict(load_file(os.path.join(dirpath, "flax_model.safetensors"))))


def load_component_config(dirpath: str) -> Optional[dict]:
    p = os.path.join(dirpath, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_pipeline_checkpoint(
    path: str,
    unet_cfg,
    unet_params,
    vae_cfg=None,
    vae_params=None,
    text_cfg=None,
    text_params=None,
    tokenizer_dir: Optional[str] = None,
    schedule_cfg: Optional[dict] = None,
) -> str:
    """Save a full pipeline (reference save_pretrained,
    train_tune_a_video.py:390-400). Components with None params are skipped
    (frozen VAE/text need not be re-saved every checkpoint)."""
    os.makedirs(path, exist_ok=True)
    save_component(os.path.join(path, "unet"), unet_cfg, unet_params)
    if vae_params is not None:
        save_component(os.path.join(path, "vae"), vae_cfg, vae_params)
    if text_params is not None:
        save_component(os.path.join(path, "text_encoder"), text_cfg, text_params)
    if tokenizer_dir is not None and os.path.isdir(tokenizer_dir):
        dst = os.path.join(path, "tokenizer")
        os.makedirs(dst, exist_ok=True)
        for name in ("vocab.json", "merges.txt"):
            src = os.path.join(tokenizer_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(dst, name))
    sched = os.path.join(path, "scheduler")
    os.makedirs(sched, exist_ok=True)
    with open(os.path.join(sched, "scheduler_config.json"), "w") as f:
        json.dump(schedule_cfg or {}, f, indent=2)
    return path


def is_flax_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, "unet", "flax_model.safetensors"))
