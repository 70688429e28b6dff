"""Fused LayerNorm/GroupNorm vs flax.linen reference numerics + grads.

The Pallas LN kernel runs in interpret mode on CPU (pallas_call patched like
test_flash_attention.py); the GN reformulation is plain XLA. Param layouts of
the drop-in modules must match nn.LayerNorm/nn.GroupNorm so the torch->flax
converters keep working unchanged.
"""
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.models.layers import FusedGroupNorm, FusedLayerNorm
from fatezero_tpu.ops import fused_norm as FN


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = FN.pl.pallas_call
    monkeypatch.setattr(FN.pl, "pallas_call", functools.partial(orig, interpret=True))
    # force the pallas path even on the CPU backend
    monkeypatch.setattr(FN.jax, "default_backend", lambda: "tpu")


@pytest.mark.parametrize("r,c", [(256, 320), (300, 1280), (8, 64)])
def test_layer_norm_matches_flax(r, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, r, c), jnp.float32) * 3 + 1
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.2 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    out = FN.layer_norm(x, scale, bias, 1e-5)
    mod = nn.LayerNorm(epsilon=1e-5)
    ref = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_layer_norm_grad_matches_math():
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 320))
    scale = jnp.ones((320,)) * 1.3
    bias = jnp.zeros((320,)) + 0.2

    def loss(fn):
        return lambda x, s, b: jnp.sum(jnp.sin(fn(x, s, b, 1e-5)))

    g1 = jax.grad(loss(FN.layer_norm), argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss(FN._ln_math), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("b,s,c,g", [(2, 1024, 64, 8), (3, 100, 320, 32)])
def test_group_norm_matches_flax(b, s, c, g):
    x = jax.random.normal(jax.random.PRNGKey(4), (b, s, c), jnp.float32) * 2 - 0.5
    scale = jax.random.normal(jax.random.PRNGKey(5), (c,)) * 0.2 + 1
    bias = jax.random.normal(jax.random.PRNGKey(6), (c,)) * 0.1
    out = FN.group_norm(x, scale, bias, g, 1e-5)
    mod = nn.GroupNorm(num_groups=g, epsilon=1e-5)
    ref = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_module_param_layouts_match_linen():
    """scale/bias names+shapes identical to nn.LayerNorm/nn.GroupNorm, so the
    diffusers converters need no changes."""
    x = jnp.zeros((2, 16, 64))
    for ours, theirs in [
        (FusedLayerNorm(), nn.LayerNorm()),
        (FusedGroupNorm(num_groups=8), nn.GroupNorm(num_groups=8)),
    ]:
        p_ours = ours.init(jax.random.PRNGKey(0), x)
        p_theirs = theirs.init(jax.random.PRNGKey(0), x)
        ours_tree = jax.tree.map(lambda a: (a.shape, a.dtype), p_ours)
        theirs_tree = jax.tree.map(lambda a: (a.shape, a.dtype), p_theirs)
        assert ours_tree == theirs_tree


def test_group_norm_video_fold_matches_reference_semantics():
    """On [B,F,H,W,C] the module folds (F,H,W): per-sample stats across
    frames, exactly torch GroupNorm on the reference's 5-D 'b c f h w'
    (resnet.py:338)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 8, 8, 32))
    mod = FusedGroupNorm(num_groups=4, epsilon=1e-5)
    p = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(p, x)
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(p, x.reshape(2, -1, 32)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
