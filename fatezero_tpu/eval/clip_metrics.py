"""CLIP Frame-Accuracy and Temporal-Consistency, on-device (Flax ViT-B/32).

TPU-native port of the reference metric script (CLIP/frame_acc_tem_con.py):

  * Frame-Acc: per edited frame, softmax over CLIP logits of
    [source_prompt, target_prompt]; success when P(target) >= P(source)
    (frame_acc_tem_con.py:19-32).
  * Tem-Con: mean cosine similarity of L2-normalized CLIP image embeddings of
    adjacent frames (frame_acc_tem_con.py:45-54).

The dataset sweep mirrors folder_success over a bench YAML of
{video, source, target} triplets (frame_acc_tem_con.py:56-89,
CLIP/bench_clean_prompt.yaml).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_frames(video: np.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[f, h, w, 3] float in [0,1] (or uint8) -> CLIP-normalized [f, S, S, 3].

    Bicubic-equivalent resize via jax.image (the reference uses torchvision's
    Resize+CenterCrop bicubic; exact filter parity is not metric-relevant)."""
    v = np.asarray(video)
    if v.dtype == np.uint8:
        v = v.astype(np.float32) / 255.0
    f, h, w, _ = v.shape
    short = min(h, w)
    scale = image_size / short
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(jnp.asarray(v), (f, nh, nw, 3), method="bicubic")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, top : top + image_size, left : left + image_size]
    return (x - CLIP_MEAN) / CLIP_STD


class CLIPEvaluator:
    """Holds the dual-tower model + params and the jitted metric kernels."""

    def __init__(self, model, params, tokenizer, random_weights: bool = False):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        # True when no pretrained CLIP was loaded: metrics are mechanically
        # valid but semantically meaningless, and every report says so
        self.random_weights = random_weights
        # params as jit arguments, never closure constants (HLO-inlined
        # weights blow up remote-compile requests)
        self._embed = jax.jit(
            lambda params, px: self.model.apply(params, px, method="encode_image")
        )
        self._text = jax.jit(
            lambda params, ids: self.model.apply(params, ids, method="encode_text")
        )

    def image_features(self, video: np.ndarray) -> jnp.ndarray:
        """L2-normalized CLIP embeddings [f, d] of a [f,h,w,3] video in [0,1]."""
        emb = self._embed(self.params, preprocess_frames(video))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def text_features(self, prompts: Sequence[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(list(prompts)).input_ids)
        emb = self._text(self.params, ids)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    # ------------------------------------------------------------- metrics
    def frame_accuracy(
        self, video: np.ndarray, source_prompt: str, target_prompt: str
    ) -> float:
        """Fraction of frames classified closer to target than source
        (frame_acc_tem_con.py:19-32)."""
        img = self.image_features(video)  # [f, d]
        txt = self.text_features([source_prompt, target_prompt])  # [2, d]
        logits = 100.0 * img @ txt.T  # the reference's logit scale
        probs = jax.nn.softmax(logits, axis=-1)
        return float(jnp.mean((probs[:, 1] >= probs[:, 0]).astype(jnp.float32)))

    def temporal_consistency(self, video: np.ndarray) -> float:
        """Mean cosine similarity of adjacent-frame embeddings
        (frame_acc_tem_con.py:45-54)."""
        img = self.image_features(video)
        sims = jnp.sum(img[:-1] * img[1:], axis=-1)
        return float(jnp.mean(sims))

    def folder_success(
        self, folder: str, source_prompt: str, target_prompt: str
    ) -> Tuple[float, float]:
        """(frame_acc, tem_con) over a result frame folder
        (frame_acc_tem_con.py:35-54)."""
        from fatezero_tpu.common.image_util import load_image_folder

        frames = np.stack(load_image_folder(folder)).astype(np.float32) / 255.0
        return (
            self.frame_accuracy(frames, source_prompt, target_prompt),
            self.temporal_consistency(frames),
        )

    def evaluate_benchmark(
        self, bench: List[Dict], results_root: str
    ) -> Dict[str, float]:
        """Sweep a bench list of {folder, source_prompt, target_prompt}
        (the bench_clean_prompt.yaml triplets); returns dataset means."""
        accs, cons = [], []
        per_item = {}
        missing = []
        for item in bench:
            folder = os.path.join(results_root, item["folder"])
            if not os.path.isdir(folder):
                missing.append(item["folder"])
                continue
            acc, con = self.folder_success(
                folder, item["source_prompt"], item["target_prompt"]
            )
            per_item[item["folder"]] = {"frame_acc": acc, "tem_con": con}
            accs.append(acc)
            cons.append(con)
        if missing:
            import warnings

            warnings.warn(
                f"evaluate_benchmark: {len(missing)}/{len(bench)} bench folders "
                f"missing under {results_root!r} and skipped: {missing}",
                stacklevel=2,
            )
        return {
            "frame_acc": float(np.mean(accs)) if accs else float("nan"),
            "tem_con": float(np.mean(cons)) if cons else float("nan"),
            "n": len(accs),
            "missing": missing,
            "random_weights": self.random_weights,
            "per_item": per_item,
        }


def load_evaluator(
    checkpoint_path: Optional[str] = None, seed: int = 0
) -> CLIPEvaluator:
    """Build a ViT-B/32 evaluator; random weights when no checkpoint exists
    (mechanics-only mode for weightless environments)."""
    from fatezero_tpu.models.clip import CLIPModel
    from fatezero_tpu.models.tokenizer import CLIPTokenizer, StubTokenizer

    from fatezero_tpu.models.loader import _fast_init

    model = CLIPModel()
    params = _fast_init(
        model,
        jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 77), jnp.int32),
        seed=seed,
    )
    tokenizer = StubTokenizer(vocab_size=49408)
    random_weights = True
    if checkpoint_path and os.path.isdir(checkpoint_path):
        from fatezero_tpu.convert.torch_to_flax import (
            convert_clip_full_state,
            load_torch_state,
            merge_into_params,
        )

        params = merge_into_params(
            params, convert_clip_full_state(load_torch_state(checkpoint_path))
        )
        if os.path.exists(os.path.join(checkpoint_path, "vocab.json")):
            tokenizer = CLIPTokenizer.from_pretrained(checkpoint_path, subfolder="")
        random_weights = False
    else:
        import warnings

        warnings.warn(
            "load_evaluator: no CLIP checkpoint"
            + (f" at {checkpoint_path!r}" if checkpoint_path else " given")
            + " — evaluator runs with RANDOM weights; Frame-Acc/Tem-Con values "
            "are mechanics-only and semantically meaningless",
            stacklevel=2,
        )
    return CLIPEvaluator(model, params, tokenizer, random_weights=random_weights)
