import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.ptp.context import EditContext, EditParams, StoreContext

TINY = UNet3DConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_head_dim=4,
    cross_attention_dim=16,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def unet_and_params(param_init):
    model = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jnp.zeros((1, 2, 16, 16, 4))
    text = jnp.zeros((1, 7, 16))
    params = param_init(model, sample, jnp.int32(1), text)
    return model, params


def test_forward_shape_and_capture(unet_and_params):
    model, params = unet_and_params
    b, f, h, w = 1, 2, 16, 16
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, 16))
    ctx = StoreContext(store_dtype=jnp.float32)
    out = model.apply(params, sample, jnp.int32(10), text, attn_ctx=ctx)
    assert out.shape == (b, f, h, w, 4)
    # SD block structure: 3 cross-attn down blocks x 2 layers, 1 mid, 3 up x 3
    assert len(ctx.captured["down_cross"]) == 6
    assert len(ctx.captured["down_self"]) == 6
    assert len(ctx.captured["mid_cross"]) == 1
    assert len(ctx.captured["up_cross"]) == 9
    assert len(ctx.captured["up_self"]) == 9
    # shapes: [1, f, heads, s, kv]; self maps have kv = 2*s (prev + first frame)
    m = ctx.captured["down_self"][0]
    assert m.shape == (1, f, 4, h * w, 2 * h * w)
    c = ctx.captured["down_cross"][0]
    assert c.shape == (1, f, 4, h * w, 7)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(np.asarray(c.sum(-1)), 1.0, atol=1e-3)


def test_temporal_identity_at_init(unet_and_params):
    """Inflation invariant: at init the temporal modules are identities, so a
    frame-constant video maps to a frame-constant output equal to the
    single-frame result (reference inflation semantics,
    unet_3d_condition.py:485-501)."""
    model, params = unet_and_params
    frame = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 16, 16, 4))
    video = jnp.tile(frame, (1, 4, 1, 1, 1))
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 16))
    out = model.apply(params, video, jnp.int32(100), text)
    # all frames identical
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out[:, 2]), atol=1e-4, rtol=1e-4
    )
    out1 = model.apply(params, frame, jnp.int32(100), text)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out1[:, 0]), atol=1e-4, rtol=1e-4
    )


def test_edit_identity_injection(unet_and_params):
    """Injecting the store-pass maps back with an identity replace mapper and
    full self-replace must reproduce the store pass output exactly — the
    self-consistency property of the controller plumbing."""
    model, params = unet_and_params
    b, f = 1, 2
    sample = jax.random.normal(jax.random.PRNGKey(5), (b, f, 16, 16, 4))
    text = jax.random.normal(jax.random.PRNGKey(6), (b, 7, 16))
    store = StoreContext(store_dtype=jnp.float32)
    ref_out = model.apply(params, sample, jnp.int32(10), text, attn_ctx=store)

    eye = jnp.eye(7)[None]  # identity token mapper
    ep = EditParams(cross_edit_kind="replace", mapper=eye, self_replace_active=True)
    ectx = EditContext(
        injected=store.captured,
        params=ep,
        alpha_words=jnp.ones((1, 1, 1, 7)),
        store_dtype=jnp.float32,
    )
    # no CFG here (b=1): the cond half is the whole batch
    out = model.apply(params, sample, jnp.int32(10), text, attn_ctx=ectx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-4, rtol=1e-4)


def test_transformer_per_frame_norm(param_init):
    """The transformer block's GroupNorm uses per-frame statistics: the
    reference folds frames into batch BEFORE its norm (attention.py:103 then
    :112), so on frame-VARYING input the transformer applied to the video
    must equal the transformer applied per frame (sparse-causal disabled,
    temporal attention identity at init). The UNet's resnet GroupNorms, by
    contrast, legitimately pool across frames (torch GN over (b,c,f,h,w)) —
    this invariant holds only for the transformer."""
    from fatezero_tpu.models.attention import SpatioTemporalTransformerModel

    model = SpatioTemporalTransformerModel(
        heads=2, dim_head=8, cross_attention_dim=16, norm_num_groups=4,
        use_sparse_causal=False,
    )
    video = jax.random.normal(jax.random.PRNGKey(21), (1, 3, 8, 8, 16))
    text = jax.random.normal(jax.random.PRNGKey(22), (1, 7, 16))
    params = param_init(model, video, text, tag="xfmr")
    out = model.apply(params, video, text)
    for k in range(3):
        single = model.apply(params, video[:, k : k + 1], text)
        np.testing.assert_allclose(
            np.asarray(out[:, k]), np.asarray(single[:, 0]), atol=1e-4, rtol=1e-4
        )


def test_temporal_lora_identity_at_init(param_init):
    """lora config: zero-init up projection => temporal LoRA contributes
    nothing at init; frame-constant input stays frame-constant (reference
    lora.py:22-54 inflation semantics)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, lora=4)
    model = UNetPseudo3DConditionModel(cfg=cfg)
    frame = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 16, 16, 4))
    video = jnp.tile(frame, (1, 3, 1, 1, 1))
    text = jax.random.normal(jax.random.PRNGKey(12), (1, 7, 16))
    params = param_init(model, video, jnp.int32(1), text)
    # lora params exist
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat]
    assert any("lora_temporal_down" in n for n in names)
    out = model.apply(params, video, jnp.int32(100), text)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out[:, 2]), atol=1e-4, rtol=1e-4
    )


def test_least_sc_channel_disables_gather(unet_and_params):
    # least_sc_channel only changes the static KV gather — params are
    # structurally identical, so reuse the TINY fixture's.
    _, params = unet_and_params
    import dataclasses

    cfg = dataclasses.replace(TINY, least_sc_channel=64)
    model = UNetPseudo3DConditionModel(cfg=cfg)
    sample = jnp.zeros((1, 2, 16, 16, 4))
    text = jnp.zeros((1, 7, 16))
    ctx = StoreContext(store_dtype=jnp.float32)
    model.apply(params, sample, jnp.int32(1), text, attn_ctx=ctx)
    s = 16 * 16
    # dim-32 blocks (down 0) fall below the threshold: plain per-frame self-attn
    assert ctx.captured["down_self"][0].shape[-1] == s
    # dim-64 blocks (down 1, at half resolution 8x8) keep the sparse-causal
    # 2-frame KV
    assert ctx.captured["down_self"][2].shape[-1] == 2 * (8 * 8)


def test_gradient_checkpointing_remat(unet_and_params):
    """gradient_checkpointing=True wraps blocks in nn.remat: the grad jaxpr
    contains remat equations, params are structurally identical, and the
    forward/grad numerics match the non-remat model."""
    import dataclasses

    _, params = unet_and_params
    cfg = dataclasses.replace(TINY, gradient_checkpointing=True)
    model_ckpt = UNetPseudo3DConditionModel(cfg=cfg)
    model_plain = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 16, 4))
    text = jax.random.normal(jax.random.PRNGKey(6), (1, 7, 16))

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, sample, jnp.int32(10), text) ** 2)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss(model_ckpt)))(params))
    assert "remat" in jaxpr or "checkpoint" in jaxpr
    assert "remat" not in str(jax.make_jaxpr(jax.grad(loss(model_plain)))(params))

    g_ckpt = jax.grad(loss(model_ckpt))(params)
    g_plain = jax.grad(loss(model_plain))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ckpt,
        g_plain,
    )
