"""int8-state AdamW (trainer/adam8bit.py) vs fp32 optax.adamw.

The reference's `use_8bit_adam` wires bitsandbytes AdamW8bit
(train_tune_a_video.py:172-182): AdamW whose moments are stored 8-bit.
These tests pin (a) the quantizer's round-trip bound, (b) the optimizer
trajectory against fp32 AdamW on a toy problem, (c) the 4x optimizer-memory
reduction, (d) trainer integration with the freeze mask.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fatezero_tpu.trainer.adam8bit import (
    _dequantize,
    _quantize,
    adamw8bit,
    state_bytes,
)


def test_quantize_roundtrip_bound():
    """mu-law code: ~2.2% relative error near the block absmax, an absolute
    floor of ~1.7e-4*absmax for tiny entries — near-constant RELATIVE
    precision over ~3 decades (the property bitsandbytes' dynamic code map
    provides; a linear int8 code would have a 0.4%-of-absmax floor that
    destroys small-coordinate moments)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1000,)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (1000,))
    )
    q = _quantize(x, block=256)
    back = _dequantize(q, x.shape, block=256)
    absmax = jnp.max(jnp.abs(jnp.pad(x, (0, 24)).reshape(-1, 256)), axis=1)
    bound = 0.023 * jnp.abs(x) + jnp.repeat(absmax, 256)[: x.size] * 2e-4
    assert bool(jnp.all(jnp.abs(x - back) <= bound))


def test_matches_fp32_adamw_trajectory():
    """Minimizing a quadratic: the int8-state walk must track fp32 AdamW
    closely per step and reach the same optimum region."""
    target = jax.random.normal(jax.random.PRNGKey(2), (512,))
    params0 = {"w": jnp.zeros((512,))}

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2)

    def run(tx, steps=60):
        params = params0
        state = tx.init(params)
        step = jax.jit(
            lambda p, s: (lambda g: tx.update(g, s, p))(jax.grad(loss_fn)(p))
        )
        traj = []
        for _ in range(steps):
            updates, state = step(params, state)
            params = optax.apply_updates(params, updates)
            traj.append(params["w"])
        return params, jnp.stack(traj)

    p8, t8 = run(adamw8bit(1e-2, weight_decay=1e-2))
    pf, tf = run(optax.adamw(1e-2, weight_decay=1e-2))
    # step 1 is exact (zero-initialized moments quantize losslessly); later
    # per-step position deviation stays at quantization precision (fractions
    # of one lr-sized update), accumulating to a slow drift — the bitsandbytes
    # behavior profile, not bit parity (measured: ~3e-3/step, 0.057 at step 60)
    np.testing.assert_allclose(np.asarray(t8[0]), np.asarray(tf[0]), atol=1e-6)
    per_step_dev = jnp.max(jnp.abs(t8 - tf), axis=1)
    assert float(per_step_dev[4]) < 2e-2 * 5
    assert float(per_step_dev[-1]) < 0.1
    # convergence parity: same optimum region, loss within 2% of fp32 AdamW
    l8, lf, l0 = float(loss_fn(p8)), float(loss_fn(pf)), float(loss_fn(params0))
    assert l8 <= l0 * 0.6
    assert abs(l8 - lf) <= 0.02 * lf, (l8, lf)


def test_optimizer_memory_is_quarter_of_fp32():
    params = {"a": jnp.zeros((4096, 64)), "b": jnp.zeros((333,))}
    n = sum(p.size for p in jax.tree.leaves(params))
    s8 = adamw8bit(1e-3).init(params)
    sf = optax.adamw(1e-3).init(params)
    b8, bf = state_bytes(s8), state_bytes(sf)
    # 2 int8 moments + per-block fp32 scales ~= 2.04 bytes/param vs 8
    assert b8 < 0.3 * bf, (b8, bf)
    assert b8 < 2.2 * n, (b8, n)


def test_trainer_use_8bit_adam_integration():
    from fatezero_tpu.models.loader import load_models
    from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
    from fatezero_tpu.trainer.ddpm_trainer import DDPMTrainer, trainable_mask

    b = load_models("random:tiny", {}, seed=0)
    pipe = FateZeroPipeline(
        b.unet, b.unet_params, b.vae, b.vae_params,
        b.text_encoder, b.text_params, b.tokenizer,
    )
    images = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3)) * 2 - 1
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    trainer = DDPMTrainer(
        b.unet, b.vae, pipe.vae_params, b.text_encoder, pipe.text_params,
        learning_rate=1e-3, train_temporal_conv=True, use_8bit_adam=True,
    )
    state = trainer.init_state(pipe.unet_params)
    before = jax.tree.map(np.asarray, state["params"])
    state, loss = trainer.step(state, images, emb, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    mask = trainable_mask(before, train_temporal_conv=True)
    moved = [
        float(np.abs(np.asarray(new) - old).max())
        for (_, old), new in zip(
            jax.tree_util.tree_flatten_with_path(before)[0],
            jax.tree.leaves(state["params"]),
        )
    ]
    flat_mask = jax.tree.leaves(mask)
    assert any(d > 0 for d, m in zip(moved, flat_mask) if m)
    assert all(d == 0 for d, m in zip(moved, flat_mask) if not m)
