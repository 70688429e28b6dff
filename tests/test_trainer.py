"""Trainer semantics: only (attn_temporal, to_q[, conv_temporal]) update.

Regression for the optax.masked pitfall: `masked` leaves non-masked updates
unchanged (raw grads leak into frozen params); the trainer must use
multi_transform + set_to_zero so frozen params are bit-identical after
training (reference freeze: train_tune_a_video.py:153-159).
"""
import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.models.loader import load_models
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.trainer.ddpm_trainer import DDPMTrainer, trainable_mask


def test_freeze_mask_and_stability():
    b = load_models("random:tiny", {}, seed=0)
    pipe = FateZeroPipeline(
        b.unet, b.unet_params, b.vae, b.vae_params,
        b.text_encoder, b.text_params, b.tokenizer,
    )
    images = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3)) * 2 - 1
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    trainer = DDPMTrainer(
        b.unet, b.vae, pipe.vae_params, b.text_encoder, pipe.text_params,
        learning_rate=1e-3, train_temporal_conv=True,
    )
    state = trainer.init_state(pipe.unet_params)
    before = jax.tree.map(np.asarray, state["params"])
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = trainer.step(state, images, emb, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses

    mask = trainable_mask(before, train_temporal_conv=True)
    changed = frozen_moved = 0
    for path in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree.leaves(state["params"]),
        jax.tree.leaves(mask),
    ):
        (kp, old), new, m = path
        delta = float(np.abs(np.asarray(new) - old).max())
        if m:
            changed += delta > 0
        elif delta != 0.0:
            frozen_moved += 1
    assert frozen_moved == 0, f"{frozen_moved} frozen params moved"
    assert changed > 0, "no trainable params updated"
    # adamw moves trainable params by <= ~lr per step: updates are bounded
    max_delta = max(
        float(np.abs(np.asarray(new) - old).max())
        for (kp, old), new in zip(
            jax.tree_util.tree_flatten_with_path(before)[0],
            jax.tree.leaves(state["params"]),
        )
    )
    assert max_delta < 0.05, max_delta


def test_run_steps_fused_scan_matches_step_semantics():
    """run_steps = N updates in one lax.scan dispatch: frozen params stay
    bit-frozen, per-step losses are finite, on-device random crop crops to
    the configured size, and the whole call is deterministic in rng."""
    b = load_models("random:tiny", {}, seed=0)
    pipe = FateZeroPipeline(
        b.unet, b.unet_params, b.vae, b.vae_params,
        b.text_encoder, b.text_params, b.tokenizer,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(0), (4, 80, 96, 3)) * 2 - 1
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    trainer = DDPMTrainer(
        b.unet, b.vae, pipe.vae_params, b.text_encoder, pipe.text_params,
        learning_rate=1e-3, train_temporal_conv=True,
    )
    state = trainer.init_state(pipe.unet_params)
    before = jax.tree.map(np.asarray, state["params"])

    new_state, losses = trainer.run_steps(
        state, frames, emb, jax.random.PRNGKey(7), 3, crop=(64, 64)
    )
    assert losses.shape == (3,) and bool(jnp.all(jnp.isfinite(losses)))
    assert int(new_state["step"]) == 3

    mask = trainable_mask(before, train_temporal_conv=True)
    for (kp, old), new, m in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree.leaves(new_state["params"]),
        jax.tree.leaves(mask),
    ):
        if not m:
            np.testing.assert_array_equal(np.asarray(new), old)

    # deterministic: same rng => same losses
    _, losses2 = trainer.run_steps(
        state, frames, emb, jax.random.PRNGKey(7), 3, crop=(64, 64)
    )
    np.testing.assert_array_equal(np.asarray(losses), np.asarray(losses2))

    # without crop (frames already at target size) it also runs
    _, l3 = trainer.run_steps(
        state, frames[:, :64, :64], emb, jax.random.PRNGKey(8), 2
    )
    assert l3.shape == (2,) and bool(jnp.all(jnp.isfinite(l3)))
