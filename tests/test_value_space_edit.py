"""value_space_attention == materialized process() + @V, tight tolerance.

The inline edit ops are linear along the kv axis, so they commute with the
value product (derivation in ptp/context.py). This pins the algebra directly
at one attention site with random tensors — refine and replace, with and
without equalizer, self swap at gate 0 / 0.5 / 1 — against the reference
materialized semantics (softmax -> process() -> @V).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.ptp.context import EditParams, InlineEditContext

B, F, H, S, KV, D = 3, 2, 2, 16, 77, 8  # 5-D sites [b, f, h, s, d]


def _site(key, kv, cross=False):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (B, F, H, S, D))
    # cross K/V are frame-broadcast [B, 1, H, KV, D] (models/attention.py)
    fk = 1 if cross else F
    k = jax.random.normal(ks[1], (B, fk, H, kv, D))
    v = jax.random.normal(ks[2], (B, fk, H, kv, D))
    return q, k, v


def _materialized(ctx, q, k, v, scale, is_cross):
    kb = jnp.broadcast_to(k, (B, F) + k.shape[2:])
    vb = jnp.broadcast_to(v, (B, F) + v.shape[2:])
    logits = jnp.einsum("bfhsd,bfhtd->bfhst", q, kb) * scale
    p5 = jax.nn.softmax(logits, axis=-1)
    p5 = ctx.process(p5, "down", is_cross)
    return jnp.einsum("bfhst,bfhtd->bfhsd", p5, vb)


def _params(kind, eq, self_gate=None, active=False):
    rng = np.random.RandomState(0)
    return EditParams(
        cross_edit_kind=kind,
        mapper=jnp.asarray(rng.rand(1, KV, KV), jnp.float32),
        refine_mapper=jnp.asarray(rng.randint(0, KV, (1, KV))),
        refine_alphas=jnp.asarray(rng.rand(1, KV), jnp.float32),
        equalizer=jnp.asarray(1 + rng.rand(1, KV), jnp.float32) if eq else None,
        self_replace_active=active,
        self_gate=None if self_gate is None else jnp.float32(self_gate),
        save_self_attention=False,
    )


@pytest.mark.parametrize("kind", ["refine", "replace"])
@pytest.mark.parametrize("eq", [False, True])
def test_cross_edit_value_space_matches_materialized(kind, eq):
    aw = jnp.asarray(np.random.RandomState(1).rand(1, 1, KV), jnp.float32)
    ctx = InlineEditContext(_params(kind, eq), aw)
    q, k, v = _site(3, KV, cross=True)
    scale = D**-0.5
    ref = _materialized(ctx, q, k, v, scale, is_cross=True)
    out = ctx.value_space_attention(q, k, v, scale, "down", True, (B, F))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("gate", [0.0, 0.5, 1.0])
def test_self_swap_value_space_matches_materialized(gate):
    aw = jnp.ones((1, 1, KV), jnp.float32)
    ctx = InlineEditContext(_params("refine", False, self_gate=gate), aw)
    q, k, v = _site(5, S)  # self: kv tokens = S
    scale = D**-0.5
    ref = _materialized(ctx, q, k, v, scale, is_cross=False)
    out = ctx.value_space_attention(q, k, v, scale, "down", False, (B, F))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_self_no_swap_is_plain_attention():
    aw = jnp.ones((1, 1, KV), jnp.float32)
    ctx = InlineEditContext(_params("refine", False, self_gate=None, active=False), aw)
    q, k, v = _site(7, S)
    scale = D**-0.5
    ref = _materialized(ctx, q, k, v, scale, is_cross=False)  # process is no-op edit
    out = ctx.value_space_attention(q, k, v, scale, "down", False, (B, F))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_fallbacks_return_none():
    aw = jnp.ones((1, 1, KV), jnp.float32)
    scale = D**-0.5
    # capture_for_blend => cross maps must materialize
    ctx = InlineEditContext(_params("refine", False), aw, capture_for_blend=True)
    q, k, v = _site(9, KV, cross=True)
    assert ctx.value_space_attention(q, k, v, scale, "down", True, (B, F)) is None
    # spatial self-mask => two-pass path
    p = _params("refine", False, self_gate=1.0)
    p.self_masks = {S: jnp.ones((F, 1, S, 1))}
    ctx = InlineEditContext(p, aw)
    q, k, v = _site(11, S)
    assert ctx.value_space_attention(q, k, v, scale, "down", False, (B, F)) is None
