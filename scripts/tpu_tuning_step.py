"""Real-TPU tuning validation: one DDPMTrainer.step at the full workload shape.

Run on the chip (no JAX_PLATFORMS override):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python scripts/tpu_tuning_step.py

Verifies the VERDICT r1 top gap: jax.grad through the Pallas flash-attention
kernel (custom VJP) on hardware, at 512^2 x 8 frames — i.e. every spatial
attention >= 256 query tokens routes through the kernel forward AND backward —
with gradient checkpointing (nn.remat) active, inside chip HBM.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fatezero_tpu.models.loader import load_models
from fatezero_tpu.trainer.ddpm_trainer import DDPMTrainer

FRAMES = int(os.environ.get("TUNE_FRAMES", 8))
RES = int(os.environ.get("TUNE_RES", 512))


def main():
    assert jax.default_backend() == "tpu", "this validation must run on the chip"
    bundle = load_models(
        "random:sd",
        {"lora": 160, "gradient_checkpointing": True},
        dtype=jnp.bfloat16,
        seed=0,
    )
    trainer = DDPMTrainer(
        bundle.unet,
        bundle.vae,
        bundle.vae_params,
        bundle.text_encoder,
        bundle.text_params,
        schedule=bundle.schedule,
        learning_rate=1e-5,
        train_temporal_conv=True,
    )
    state = trainer.init_state(bundle.unet_params)
    images = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, RES, RES, 3)) * 2 - 1
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), jnp.bfloat16)

    t0 = time.perf_counter()
    state, loss = trainer.step(state, images, emb, jax.random.PRNGKey(3))
    loss.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    steps = 3
    for _ in range(steps):
        state, loss = trainer.step(state, images, emb, jax.random.PRNGKey(4))
    loss.block_until_ready()
    per_step = (time.perf_counter() - t0) / steps
    assert jnp.isfinite(loss), f"non-finite loss {loss}"

    # fused path (trainer.run_steps): N updates per dispatch — the per-step
    # wall above is dominated by per-dispatch overhead over the remote link
    # (device compute is ~0.5 s/step); the fused scan amortizes it away
    n_fused = int(os.environ.get("TUNE_FUSED_STEPS", 10))
    state, fl = trainer.run_steps(state, images, emb, jax.random.PRNGKey(5), n_fused)
    jax.block_until_ready(fl)  # warm/compile
    t0 = time.perf_counter()
    state, fl = trainer.run_steps(state, images, emb, jax.random.PRNGKey(6), n_fused)
    jax.block_until_ready(fl)
    per_step_fused = (time.perf_counter() - t0) / n_fused
    assert bool(jnp.all(jnp.isfinite(fl)))
    mem = jax.local_devices()[0].memory_stats() or {}  # None through the axon tunnel
    peak = mem.get("peak_bytes_in_use", 0) / 2**30
    print(
        f"TPU TUNING STEP OK: {FRAMES}f x {RES}^2, loss={float(loss):.5f}, "
        f"step={per_step:.2f}s (first call incl. compile {compile_s:.1f}s), "
        f"fused x{n_fused}: {per_step_fused:.2f}s/step, "
        f"peak HBM {peak:.2f} GiB"
    )


if __name__ == "__main__":
    main()
