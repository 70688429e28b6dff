"""Replay-row truncation (unet3d.py drop_replay_rows) must not change results.

Batch rows that only feed the controller (the inversion replay) are sliced off
once the remaining up blocks all run above MAX_CONTROLLED_TOKENS query tokens
— those sites are never stored or edited (reference attention_store.py:83,
attention_register.py:112-116). Uses a 40x40 latent so the top level (1600
tokens) is uncontrolled while 20^2/10^2/5^2 levels stay controlled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.ptp.context import EditParams, InlineEditContext, StoreContext
from fatezero_tpu.ptp.controller import make_controller
from fatezero_tpu.ptp.store import AttentionStore

TINY = UNet3DConfig(
    block_out_channels=(8, 8, 16, 16),
    attention_head_dim=4,
    cross_attention_dim=16,
    norm_num_groups=4,
)
F, HW = 2, 40
STEPS = 3


@pytest.fixture(scope="module")
def unet_and_params(param_init):
    unet = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jnp.zeros((1, F, HW, HW, 4))
    text = jnp.zeros((1, 77, 16))
    params = param_init(unet, sample, jnp.int32(1), text)
    return unet, params


def test_capture_only_forward_matches_full(unet_and_params):
    unet, params = unet_and_params
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, F, HW, HW, 4))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 16))

    full = StoreContext(store_dtype=jnp.float32)
    out_full = unet.apply(params, lat, jnp.int32(3), text, attn_ctx=full)
    assert out_full is not None

    trunc = StoreContext(store_dtype=jnp.float32)
    out_trunc = unet.apply(
        params, lat, jnp.int32(3), text, attn_ctx=trunc, drop_replay_rows=1
    )
    assert out_trunc is None  # top level + conv_out skipped entirely

    assert {k: len(v) for k, v in full.captured.items()} == {
        k: len(v) for k, v in trunc.captured.items()
    }
    for key in full.captured:
        for a, b in zip(full.captured[key], trunc.captured[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_inline_row_drop_matches_full(unet_and_params):
    unet, params = unet_and_params
    lat3 = jax.random.normal(jax.random.PRNGKey(2), (3, F, HW, HW, 4))
    text3 = jax.random.normal(jax.random.PRNGKey(3), (3, 77, 16))
    ep = EditParams(
        cross_edit_kind="refine",
        refine_mapper=jnp.zeros((1, 77), jnp.int32),
        refine_alphas=jnp.ones((1, 77), jnp.float32) * 0.5,
        equalizer=None,
        self_replace_active=True,
        save_self_attention=False,
    )
    aw = jnp.ones((1, 1, 1, 77), jnp.float32) * 0.7

    eps_full = unet.apply(
        params, lat3, jnp.int32(3), text3,
        attn_ctx=InlineEditContext(ep, aw, store_dtype=jnp.float32),
    )
    eps_drop = unet.apply(
        params, lat3, jnp.int32(3), text3,
        attn_ctx=InlineEditContext(ep, aw, store_dtype=jnp.float32),
        drop_replay_rows=1,
    )
    assert eps_full.shape[0] == 3 and eps_drop.shape[0] == 2
    np.testing.assert_allclose(
        np.asarray(eps_full[1:]), np.asarray(eps_drop), atol=1e-5, rtol=1e-5
    )


def test_low_res_drop_is_noop(unet_and_params):
    """At 16x16 latents even the final level is controlled: nothing dropped."""
    unet, params = unet_and_params
    lat3 = jax.random.normal(jax.random.PRNGKey(4), (3, F, 16, 16, 4))
    text3 = jax.random.normal(jax.random.PRNGKey(5), (3, 77, 16))
    ep = EditParams(cross_edit_kind="refine",
                    refine_mapper=jnp.zeros((1, 77), jnp.int32),
                    refine_alphas=jnp.ones((1, 77), jnp.float32),
                    save_self_attention=False)
    aw = jnp.ones((1, 1, 1, 77), jnp.float32)
    eps = unet.apply(
        params, lat3, jnp.int32(3), text3,
        attn_ctx=InlineEditContext(ep, aw, store_dtype=jnp.float32),
        drop_replay_rows=1,
    )
    assert eps.shape[0] == 3


def test_edit_fast_truncated_matches_streaming(unet_and_params):
    """End-to-end: the fused edit (with truncation active at 40x40) still
    equals the streaming path (which never truncates)."""
    unet, params = unet_and_params
    pipe = FateZeroPipeline(
        unet, params, None, None, None, None, StubTokenizer(),
        store_dtype=jnp.float32,
    )
    latents = jax.random.normal(jax.random.PRNGKey(7), (1, F, HW, HW, 4))
    emb_src = jax.random.normal(jax.random.PRNGKey(8), (2, 77, 16))
    emb_tgt = jax.random.normal(jax.random.PRNGKey(9), (2, 77, 16))

    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.6,
    )

    store = AttentionStore()
    traj = pipe.invert(latents, emb_src, STEPS, store=store)
    out_stream = pipe.sample(
        jnp.asarray(traj[-1]),
        emb_tgt,
        num_inference_steps=STEPS,
        controller=controller(),
        inv_store=store,
        inverted_latents=traj,
    )

    traj_fast = pipe.invert_fast(latents, emb_src, STEPS)
    out_fast, _ = pipe.edit_fast(
        traj_fast, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    np.testing.assert_allclose(
        np.asarray(out_stream), np.asarray(out_fast), atol=5e-4, rtol=5e-4
    )
