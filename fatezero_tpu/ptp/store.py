"""Host-side attention store: streaming capture of per-step attention maps.

The functional analog of the reference AttentionStore
(video_diffusion/prompt_attention/attention_store.py:63-137). Captured maps
leave the device every step (the pipeline overlaps the copy with the next
step's compute), so HBM holds at most one step's maps — the TPU equivalent of
the reference's CPU offload of 32^2 maps (attention_store.py:87) and its
100 GB-RAM "basic" mode, with an optional disk spill matching `disk_store`
(attention_store.py:103-108).

Contents per step: {key: [np arrays [1, f, heads, s, kv]]} for the six
down/mid/up x cross/self keys, plus the latent trajectory.
"""
from __future__ import annotations

import os
import pickle
import tempfile
from typing import Dict, List, Optional

import jax
import numpy as np

from fatezero_tpu.ptp.context import STORE_KEYS


class AttentionStore:
    def __init__(self, disk_store: bool = False, store_dir: Optional[str] = None):
        self.disk_store = disk_store
        if disk_store:
            self.store_dir = store_dir or tempfile.mkdtemp(prefix="attention_cache_")
            os.makedirs(self.store_dir, exist_ok=True)
        else:
            self.store_dir = None
        self.reset()

    def reset(self) -> None:
        self.attention_store_all_step: List = []  # per-step dicts (or paths)
        self.attention_store: Dict[str, List[np.ndarray]] = {}  # running sums
        self.latents_store: List[np.ndarray] = []
        self.num_steps = 0

    # -- capture -----------------------------------------------------------
    def append_step(self, captured: Dict[str, List], latent) -> None:
        """Record one diffusion step's maps + latent (device or host arrays)."""
        step = {
            k: [np.asarray(m) for m in captured.get(k, [])] for k in STORE_KEYS
        }
        if not self.attention_store:
            self.attention_store = {k: [m.astype(np.float32) for m in v] for k, v in step.items()}
        else:
            for k, v in step.items():
                for i, m in enumerate(v):
                    self.attention_store[k][i] += m.astype(np.float32)
        if self.disk_store:
            path = os.path.join(self.store_dir, f"{self.num_steps:03d}.pkl")
            with open(path, "wb") as f:
                pickle.dump(step, f)
            self.attention_store_all_step.append(path)
        else:
            self.attention_store_all_step.append(step)
        self.latents_store.append(np.asarray(latent))
        self.num_steps += 1

    # -- consumption -------------------------------------------------------
    def step_maps(self, step_in_store: int) -> Dict[str, List[np.ndarray]]:
        entry = self.attention_store_all_step[step_in_store]
        if isinstance(entry, str):
            with open(entry, "rb") as f:
                entry = pickle.load(f)
        return entry

    def get_average_attention(self) -> Dict[str, List[np.ndarray]]:
        """Per-layer mean over steps (attention_store.py:111-114)."""
        return {
            k: [m / max(self.num_steps, 1) for m in v]
            for k, v in self.attention_store.items()
        }
