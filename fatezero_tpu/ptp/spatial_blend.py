"""Spatial blending: cross-attention-derived masks for self-attn swap & latent blend.

Pure-function port of the reference SpatialBlender
(video_diffusion/prompt_attention/spatial_blend.py:19-176). The torch version
is a stateful callable invoked from inside attention hooks; here mask
computation is a pure jax function of the stored 16x16 cross-attention maps,
invoked per step by the pipeline:

  * self-attention blend ('source' prompt): mask from the *inversion* maps of
    the matching step, resized per controlled self-attn resolution and handed
    to EditContext.self_masks;
  * latent blend ('both'): masks from the concatenation of inversion maps and
    the running sum of the edit pass's own cross maps, applied to latents
    after the scheduler step inside the blend window (attention_util.py:47-78).

Stored-map layout here is [p, f, heads, s, 77] with s = 256 (16x16); the five
relevant maps are down_cross[2:4] + up_cross[:3] (spatial_blend.py:78).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.ptp.seq_aligner import get_word_inds

MAX_WORDS = 77


def word_alpha_layers(prompts: Sequence[str], words, tokenizer) -> np.ndarray:
    """[n_prompts, 77] indicator of the blend words (spatial_blend.py:145-152)."""
    alpha = np.zeros((len(prompts), MAX_WORDS), np.float32)
    for i, (prompt, words_) in enumerate(zip(prompts, words)):
        if isinstance(words_, str):
            words_ = [words_]
        for word in words_:
            inds = get_word_inds(prompt, word, tokenizer)
            alpha[i, inds] = 1.0
    return alpha


def _aggregate(maps: Sequence[jax.Array], alpha: jax.Array) -> jax.Array:
    """maps: list of [p, f, heads, 256, 77] -> word-weighted head-mean [p, f, 16, 16]."""
    items = []
    for m in maps:
        p, f, h, s, w = m.shape
        r = int(np.sqrt(s))
        items.append(m.reshape(p, f, h, r, r, w))
    stacked = jnp.concatenate(items, axis=2).astype(jnp.float32)  # [p, f, H*, r, r, 77]
    al = alpha[:, None, None, None, None, :]
    return (stacked * al).sum(-1).mean(2)  # [p, f, r, r]


def _maxpool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 max pool with padding 1 over the last two axes."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
    )


def _resize_nearest(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Nearest resize on [p, f, h, w] (torch F.interpolate default mode)."""
    h, w = hw
    src_h, src_w = x.shape[-2:]
    rows = (np.arange(h) * src_h // h).astype(np.int64)
    cols = (np.arange(w) * src_w // w).astype(np.int64)
    return x[..., rows, :][..., :, cols]


def blend_mask(
    maps: Sequence[jax.Array],
    alpha: jax.Array,
    target_hw: Tuple[int, int],
    th: float,
    use_pool: bool = True,
) -> jax.Array:
    """Binary mask [p, f, h, w]: 1 = keep target/generated, 0 = use source
    (spatial_blend.py:24-56)."""
    m = _aggregate(maps, alpha)
    if use_pool:
        m = _maxpool3(m)
    m = _resize_nearest(m, target_hw)
    denom = m.max(axis=(-2, -1), keepdims=True)
    m = m / jnp.maximum(denom, 1e-12)
    return (m > th).astype(jnp.float32)


@dataclasses.dataclass
class SpatialBlender:
    """Config + host-side state (step counter, saved masks) for one blender.

    prompt_choose='source' -> self-attention mask from the source row only;
    'both' -> union of source/target masks for latent blending
    (spatial_blend.py:101-105,40-42).
    """

    alpha_layers: np.ndarray  # [n_prompts, 77]
    start_blend: int
    end_blend: int
    th: Tuple[float, float] = (0.3, 0.3)
    prompt_choose: str = "source"
    save_path: Optional[str] = None
    # indicator of words whose (un-pooled, th[1]-thresholded) mask is
    # subtracted from the main mask (spatial_blend.py:108-113,152-163)
    substruct_layers: Optional[np.ndarray] = None

    counter: int = 0
    mask_list: List[np.ndarray] = dataclasses.field(default_factory=list)

    @classmethod
    def create(
        cls,
        prompts,
        words,
        tokenizer,
        num_steps: int,
        start_blend: float = 0.2,
        end_blend: float = 0.8,
        th=(0.3, 0.3),
        prompt_choose: str = "source",
        save_path: Optional[str] = None,
        substruct_words=None,
    ) -> "SpatialBlender":
        assert prompt_choose in ("source", "both")
        return cls(
            alpha_layers=word_alpha_layers(prompts, words, tokenizer),
            start_blend=int(start_blend * num_steps),
            end_blend=int(end_blend * num_steps),
            th=tuple(th) if not isinstance(th, (int, float)) else (th, th),
            prompt_choose=prompt_choose,
            save_path=save_path,
            substruct_layers=None
            if substruct_words is None
            else word_alpha_layers(prompts, substruct_words, tokenizer),
        )

    def mask_for(self, maps: Sequence[jax.Array], target_hw) -> jax.Array:
        """[p_effective, f, h, w] mask; p=1 for 'source', union row included for 'both'."""
        alpha = jnp.asarray(
            self.alpha_layers[:1] if self.prompt_choose == "source" else self.alpha_layers
        )
        mask = blend_mask(maps, alpha, target_hw, self.th[0], use_pool=True)
        if self.prompt_choose == "both":
            mask = jnp.maximum(mask[:1], mask)  # source-union (spatial_blend.py:40-42)
        if self.substruct_layers is not None:
            # carve the substruct words' own region out of the mask:
            # mask *= ~get_mask(maps, substruct_layers, use_pool=False)
            # at th[1] (spatial_blend.py:108-113)
            sub_alpha = jnp.asarray(
                self.substruct_layers[:1]
                if self.prompt_choose == "source"
                else self.substruct_layers
            )
            sub = blend_mask(maps, sub_alpha, target_hw, self.th[1], use_pool=False)
            if self.prompt_choose == "both":
                sub = jnp.maximum(sub[:1], sub)
            mask = mask * (1.0 - sub)
        return mask

    def record(self, mask: np.ndarray, save_tag: str = "") -> None:
        self.mask_list.append(np.asarray(mask))
        if self.save_path is not None:
            import os

            from PIL import Image

            os.makedirs(self.save_path, exist_ok=True)
            m = np.asarray(mask)
            m = m[-1] if m.ndim == 4 else m  # [f, h, w]
            for fi, frame in enumerate(m):
                img = Image.fromarray((np.asarray(frame) * 255).astype(np.uint8))
                img.save(
                    os.path.join(
                        self.save_path, f"mask_{save_tag}_{self.counter:03d}_{fi:02d}.png"
                    )
                )

    def latent_blend_active(self, step: int) -> bool:
        """Blend window gate (spatial_blend.py:120-122; counter is 1-based
        because the reference increments before the check)."""
        return self.start_blend < (step + 1) < self.end_blend


def apply_latent_blend(
    x_t: jax.Array, inverted: jax.Array, mask: jax.Array
) -> jax.Array:
    """x_t, inverted: [1, f, h, w, c]; mask: [p, f, h, w] (row -1 = union).
    Returns blended x_t: outside the mask the inverted latent wins
    (spatial_blend.py:117-122, attention_util.py:61-76)."""
    m = mask[-1][None, ..., None]
    return inverted + m * (x_t - inverted)
