"""Diagnose the stored->replay HBM fallback at 16 frames (bench.py's path).

Reproduces the capture OOM, then reports device memory stats after each
cleanup stage (gc, jax.clear_caches) and finally runs the replay inversion.
Run on the TPU:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python
scripts/probe_oom_fallback.py
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("BENCH_FRAMES", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 50))
RES = int(os.environ.get("BENCH_RES", 512))


def mem(tag: str) -> None:
    import jax

    try:
        s = jax.devices()[0].memory_stats()
        used = s.get("bytes_in_use", -1) / 1e9
        peak = s.get("peak_bytes_in_use", -1) / 1e9
        print(f"[mem] {tag}: in_use={used:.2f} GB peak={peak:.2f} GB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mem] {tag}: memory_stats unavailable ({type(e).__name__})", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from fatezero_tpu.common.errors import is_device_oom
    from fatezero_tpu.models.clip import CLIPTextModel
    from fatezero_tpu.models.tokenizer import StubTokenizer
    from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
    from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
    from __graft_entry__ import _fast_params

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cfg = UNet3DConfig(sparse_causal_indices=("mid",), least_sc_channel=640, lora=160)
    unet = UNetPseudo3DConditionModel(cfg=cfg, dtype=dtype)
    lat = RES // 8
    sample = jnp.zeros((1, FRAMES, lat, lat, 4), jnp.float32)
    text = jnp.zeros((1, 77, 768), jnp.float32)
    unet_params = _fast_params(unet, sample, jnp.int32(0), text)
    text_model = CLIPTextModel(dtype=dtype)
    tokenizer = StubTokenizer()
    ids = jnp.asarray(tokenizer(["x"]).input_ids)
    text_params = _fast_params(text_model, ids)
    pipe = FateZeroPipeline(unet, unet_params, None, None, text_model, text_params, tokenizer)
    emb = pipe.encode_prompt("a silver jeep driving down a curvy road")
    latents = jnp.asarray(np.random.RandomState(0).randn(1, FRAMES, lat, lat, 4), jnp.float32)
    mem("after setup")

    est = pipe.capture_payload_bytes(latents, STEPS)
    print(f"predicted capture payload: {est/1e9:.2f} GB", flush=True)

    t0 = time.time()
    traj = stored = None
    try:
        traj, stored = pipe.invert_fast(latents, emb, STEPS, capture=True)
        jax.block_until_ready(traj)
        print(f"capture SUCCEEDED in {time.time()-t0:.1f}s — no fallback needed at f={FRAMES}")
        mem("after capture success")
        return
    except Exception as e:  # noqa: BLE001
        if not is_device_oom(e):
            raise
        print(
            f"capture OOM after {time.time()-t0:.1f}s "
            f"(traj bound: {traj is not None})",
            flush=True,
        )
        oomed = True
    assert oomed
    mem("after caught OOM")
    # the poisoned outputs pin HBM while referenced — drop them first
    traj = stored = None
    gc.collect()
    mem("after dropping poisoned refs + gc")

    t0 = time.time()
    traj = pipe.invert_fast(latents, emb, STEPS)
    jax.block_until_ready(traj)
    print(f"replay inversion OK in {time.time()-t0:.1f}s shape={traj.shape}")
    mem("after replay inversion")


if __name__ == "__main__":
    main()
