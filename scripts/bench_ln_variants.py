"""Microbench the LayerNorm formulations at the edit-scan shapes on TPU.

Round-4 profile: XLA's channel-last LN stats fusions cost ~21 ms of a
180 ms edit step (bench_artifacts/r4_profile_stored.txt). Compares, at each
video shape the transformer sees:

  xla   — _ln_math (mean/meansq reduce over lanes)
  pallas— ops/fused_norm.layer_norm (one-pass kernel, the shipped default)

Standalone timings over-credit the kernel (custom-call boundaries block
fusion in the real graph — round-2 lesson); treat this as op-level evidence
and confirm with a full bench run.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fatezero_tpu.ops.fused_norm import _ln_math, layer_norm

SHAPES = [
    (2, 8, 4096, 320),
    (2, 8, 1024, 640),
    (2, 8, 256, 1280),
    (2, 8, 64, 1280),
]
REPS = 30


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e3


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"backend: {jax.default_backend()}")
    for shape in SHAPES:
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32).astype(jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        gb = x.size * 2 * 2 / 1e9  # read + write bf16
        row = {}
        for name, fn in (
            ("xla", _ln_math),
            ("pallas", layer_norm),
        ):
            ms = timed(jax.jit(lambda x, s, b, f=fn: f(x, s, b, 1e-5)), x, s, b)
            row[name] = ms
        print(
            f"{str(shape):<22s} "
            + "  ".join(f"{k}={v:7.3f} ms ({gb/(v/1e3):5.0f} GB/s)" for k, v in row.items())
        )


if __name__ == "__main__":
    main()
