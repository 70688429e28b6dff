"""Fused-scan fast path vs streaming path: they must produce the same output.

The fused path (invert_fast/edit_fast) rematerializes inversion attention by
replaying UNet forwards from the latent trajectory inside one lax.scan; the
streaming path stores maps on the host per step. Same latents, timesteps and
params => identical maps, so the two edits must agree to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.ptp.controller import make_controller
from fatezero_tpu.ptp.store import AttentionStore

TINY = UNet3DConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_head_dim=4,
    cross_attention_dim=16,
    norm_num_groups=8,
)
STEPS = 4
F, HW = 2, 16


@pytest.fixture(scope="module")
def pipe(param_init):
    unet = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jnp.zeros((1, F, HW, HW, 4))
    text = jnp.zeros((1, 77, 16))
    params = param_init(unet, sample, jnp.int32(1), text)
    return FateZeroPipeline(
        unet, params, None, None, None, None, StubTokenizer(), store_dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def latents():
    return jax.random.normal(jax.random.PRNGKey(7), (1, F, HW, HW, 4))


@pytest.fixture(scope="module")
def embs():
    emb_src = jax.random.normal(jax.random.PRNGKey(8), (2, 77, 16))
    emb_tgt = jax.random.normal(jax.random.PRNGKey(9), (2, 77, 16))
    return emb_src, emb_tgt


def test_invert_fast_matches_streaming(pipe, latents, embs):
    emb_src, _ = embs
    traj_stream = pipe.invert(latents, emb_src, STEPS, store=None)
    traj_fast = np.asarray(pipe.invert_fast(latents, emb_src, STEPS))
    assert traj_fast.shape[0] == STEPS + 1
    for a, b in zip(traj_stream, traj_fast):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize(
    "with_blends",
    [False, True, "latent_only"],  # False/latent_only -> single-forward inline path
)
def test_edit_fast_matches_streaming(pipe, latents, embs, with_blends):
    emb_src, emb_tgt = embs
    tok = pipe.tokenizer
    source = "a silver jeep driving"
    target = "a posche car driving"

    def controller():
        return make_controller(
            tok,
            [source, target],
            num_steps=STEPS,
            is_replace_controller=True,
            cross_replace_steps=0.8,
            self_replace_steps=0.5,  # exercises the window boundary mid-run
            eq_params={"words": ["posche"], "values": [2.0]},
            blend_words=[["jeep"], ["posche"]] if with_blends else None,
            blend_latents=bool(with_blends),
            blend_self_attention=with_blends is True,
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
    out_fast, aux = pipe.edit_fast(
        traj_fast, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    np.testing.assert_allclose(
        np.asarray(out_stream), np.asarray(out_fast), atol=5e-4, rtol=5e-4
    )
    if with_blends:
        assert aux["latent_mask"].shape[0] == STEPS
    if with_blends is True:
        assert aux["attn_mask"].shape[0] == STEPS


@pytest.mark.parametrize("with_blends", [False, True, "latent_only"])
def test_edit_fast_stored_matches_replay(pipe, latents, embs, with_blends):
    """invert_fast(capture=True) payloads consumed by edit_fast(stored=...)
    must reproduce the replay-based edit exactly: the inversion forward IS
    the replay forward (same latent, timestep, params)."""
    emb_src, emb_tgt = embs
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.5,
        eq_params={"words": ["posche"], "values": [2.0]},
        blend_words=[["jeep"], ["posche"]] if with_blends else None,
        blend_latents=bool(with_blends),
        blend_self_attention=with_blends is True,
    )
    traj = pipe.invert_fast(latents, emb_src, STEPS)
    out_replay, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    traj_c, stored = pipe.invert_fast(latents, emb_src, STEPS, capture=True)
    np.testing.assert_allclose(
        np.asarray(traj), np.asarray(traj_c), atol=2e-5, rtol=2e-5
    )
    out_stored, _ = pipe.edit_fast(
        traj_c, emb_src, emb_tgt, controller(), num_inference_steps=STEPS,
        stored=stored,
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_stored), atol=5e-4, rtol=5e-4
    )


def test_edit_fast_stored_no_inversion_attention(pipe, latents, embs):
    """use_inversion_attention=False replays forward-order trajectory latents
    at edit-order timesteps — which is exactly unet(traj[j], ts_up[j]), the
    inversion forward: stored payloads must line up for this setting too."""
    emb_src, emb_tgt = embs
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.5,
        use_inversion_attention=False,
    )
    traj, stored = pipe.invert_fast(latents, emb_src, STEPS, capture=True)
    out_replay, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    out_stored, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS,
        stored=stored,
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_stored), atol=5e-4, rtol=5e-4
    )


def test_edit_fast_stored_with_strength(pipe, latents, embs):
    """stored mode + strength<1: payload indices follow the shifted grid."""
    emb_src, emb_tgt = embs
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        self_replace_steps=0.5,
    )
    traj, stored = pipe.invert_fast(latents, emb_src, STEPS, capture=True)
    out_replay, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS,
        strength=0.75,
    )
    out_stored, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS,
        strength=0.75, stored=stored,
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_stored), atol=5e-4, rtol=5e-4
    )


@pytest.mark.parametrize("with_blends", [False, True])
def test_edit_fast_viz_cross_attention(pipe, latents, embs, with_blends):
    """viz=True must not perturb the edit output, and the returned cross_avg
    is a probability average: mid-res live cond cross maps averaged over
    layers/heads/steps (each query row sums to 1)."""
    emb_src, emb_tgt = embs
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.5,
        blend_words=[["jeep"], ["posche"]] if with_blends else None,
        blend_latents=with_blends,
        blend_self_attention=with_blends,
    )
    traj = pipe.invert_fast(latents, emb_src, STEPS)
    out_plain, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    out_viz, aux = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS, viz=True
    )
    # viz=True materializes the viz-size cross sites that viz=False runs
    # value-space; the two forms contract in different orders, so equality
    # holds only to fp32 rounding (measured max ~5e-5 on O(10) outputs)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_viz), atol=2e-4, rtol=2e-3
    )
    avg = np.asarray(aux["cross_avg"], np.float32)
    assert avg.shape == (1, F, (HW // 4) ** 2, 77)
    np.testing.assert_allclose(avg.sum(-1), 1.0, atol=1e-3)


def test_edit_strength_fast_matches_streaming(pipe, latents, embs):
    """strength < 1 (img2img slicing): both paths run only the last
    int(steps*strength) timesteps starting from the matching trajectory
    entry, with noise-level-aligned store/replay indices."""
    emb_src, emb_tgt = embs
    strength = 0.75  # int(4 * 0.75) = 3 of 4 steps
    n_used = int(STEPS * strength)
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.5,
    )

    store = AttentionStore()
    traj = pipe.invert(latents, emb_src, STEPS, store=store)
    out_stream = pipe.sample(
        jnp.asarray(traj[n_used]),
        emb_tgt,
        num_inference_steps=STEPS,
        controller=controller(),
        inv_store=store,
        inverted_latents=traj,
        strength=strength,
    )

    traj_fast = pipe.invert_fast(latents, emb_src, STEPS)
    out_fast, _ = pipe.edit_fast(
        traj_fast, emb_src, emb_tgt, controller(),
        num_inference_steps=STEPS, strength=strength,
    )
    np.testing.assert_allclose(
        np.asarray(out_stream), np.asarray(out_fast), atol=5e-4, rtol=5e-4
    )
    # full-strength result differs (more steps executed)
    out_full, _ = pipe.edit_fast(
        traj_fast, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    assert float(jnp.max(jnp.abs(out_full - out_fast))) > 1e-3


@pytest.mark.parametrize("use_inversion_attention", [True, False])
def test_edit_fast_hybrid_partial_capture(pipe, latents, embs, use_inversion_attention):
    """A budget-trimmed payload (invert_fast capture_rows + edit_fast
    stored_row0) must reproduce the full-replay edit exactly: the served
    prefix runs the stored body, in-window unserved steps replay, and the
    identity-gated tail (past the controller's edit window) runs the stored
    body against a clamped row whose values the zero gates multiply away."""
    emb_src, emb_tgt = embs
    controller = lambda: make_controller(
        pipe.tokenizer,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.5,
        self_replace_steps=0.5,
        eq_params={"words": ["posche"], "values": [2.0]},
        use_inversion_attention=use_inversion_attention,
    )
    w = controller().edit_window(STEPS)
    assert 0 < w < STEPS  # identity tail exists at this schedule
    traj_full = pipe.invert_fast(latents, emb_src, STEPS)
    out_replay, _ = pipe.edit_fast(
        traj_full, emb_src, emb_tgt, controller(), num_inference_steps=STEPS
    )
    k = 1  # < w: exercises all three segment kinds in one edit
    row0 = (STEPS - k) if use_inversion_attention else 0
    traj, stored = pipe.invert_fast(
        latents, emb_src, STEPS, capture=True, capture_rows=(row0, k)
    )
    np.testing.assert_allclose(
        np.asarray(traj_full), np.asarray(traj), atol=2e-5, rtol=2e-5
    )
    assert all(a.shape[0] == k for a in jax.tree.leaves(stored))
    out_h, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller(), num_inference_steps=STEPS,
        stored=stored, stored_row0=row0,
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_h), atol=5e-4, rtol=5e-4
    )


def test_plan_capture_budget(pipe, latents):
    """plan_capture: full capture when the budget holds every step's payload;
    otherwise trimmed to min(window, budget-steps) rows placed so they serve
    the leading edit steps; None when not even one row fits."""
    per = pipe.capture_payload_bytes(latents, 1)
    plan = lambda **kw: pipe.plan_capture(latents, STEPS, **kw)
    assert plan(window=2, budget_bytes=per * STEPS) == (0, STEPS)
    assert plan(window=2, budget_bytes=per * 3) == (STEPS - 2, 2)
    assert plan(window=2, budget_bytes=per * 1) == (STEPS - 1, 1)
    assert plan(window=2, budget_bytes=per, use_inversion_attention=False) == (0, 1)
    assert plan(window=2, budget_bytes=per - 1) is None


def test_capture_payload_bytes_predicts_actual(pipe, latents, embs):
    """The proactive HBM gate's eval_shape estimate must equal the real
    captured payload's PHYSICAL (tile-padded) size byte-for-byte, and scale
    linearly in steps (bench.py / cli/edit.py decide capture-vs-replay from
    it). Round 4 gated on logical bytes: a [.., s, 77] bf16 probs store
    really occupies 128/77 = 1.66x its logical bytes, and a 16-frame capture
    OOMed at compile with the logical gate green."""
    from fatezero_tpu.pipelines.fatezero_pipeline import _physical_bytes

    emb_src, _ = embs
    predicted = pipe.capture_payload_bytes(latents, STEPS)
    _, stored = pipe.invert_fast(latents, emb_src, STEPS, capture=True)
    leaves = jax.tree.leaves(stored)
    logical = sum(a.size * a.dtype.itemsize for a in leaves)
    physical = sum(_physical_bytes(a) for a in leaves)
    assert predicted == physical
    assert physical > logical  # the 77-lane probs pad is real
    assert pipe.capture_payload_bytes(latents, 2 * STEPS) == 2 * predicted
