"""Pallas flash-attention kernel vs the XLA reference, in interpret mode.

The kernel streams KV blocks with an online softmax; interpret=True runs the
same kernel logic on CPU so correctness (including KV-tail masking and
head-dim padding) is pinned without TPU hardware. test_install.py exercises
the compiled kernel on the real chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.ops import flash_attention as FA


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("FZ_FLASH_INTERPRET", "1")


@pytest.mark.parametrize(
    "sq,skv,d",
    [
        (256, 256, 64),   # aligned everything
        (300, 520, 40),   # ragged q, ragged kv tail mask, SD head dim 40
        (128, 1000, 80),  # kv >> q, padded head dim
    ],
)
def test_matches_xla(sq, skv, d):
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (2, sq, d), jnp.float32)
    k = jax.random.normal(kk, (2, skv, d), jnp.float32)
    v = jax.random.normal(kv_, (2, skv, d), jnp.float32)
    scale = d**-0.5
    ref = FA.xla_attention(q, k, v, scale)
    out = FA.flash_attention(q, k, v, scale, block_q=128, block_kv=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "sq,skv,d",
    [
        (256, 256, 64),   # aligned everything
        (300, 520, 40),   # ragged q rows, ragged kv tail, SD head dim 40
        (128, 640, 80),   # kv >> q, padded head dim
    ],
)
def test_grad_matches_xla(sq, skv, d):
    """custom_vjp backward kernels vs jax.grad through the XLA reference."""
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (2, sq, d), jnp.float32)
    k = jax.random.normal(kk, (2, skv, d), jnp.float32)
    v = jax.random.normal(kv_, (2, skv, d), jnp.float32)
    scale = d**-0.5

    def loss_flash(q, k, v):
        out = FA.flash_attention(q, k, v, scale, block_q=128, block_kv=256)
        return jnp.sum(jnp.sin(out))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(FA.xla_attention(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=2e-4, rtol=2e-4, err_msg=f"d{name}"
        )


def test_bf16_io():
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 64), jnp.bfloat16)
    out = FA.flash_attention(q, q, q, 0.125)
    assert out.dtype == jnp.bfloat16
    ref = FA.xla_attention(q, q, q, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


@pytest.mark.parametrize("sq,skv,d", [(256, 256, 40), (300, 520, 80)])
def test_wide_value_dim(sq, skv, d):
    """dv = 2*d: the value-space edit concatenates two value tensors through
    one softmax pass (ptp/context.py::value_space_attention)."""
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, sq, d), jnp.float32)
    k = jax.random.normal(kk, (2, skv, d), jnp.float32)
    v = jax.random.normal(kv_, (2, skv, 2 * d), jnp.float32)
    scale = d**-0.5
    s = jnp.einsum("bsd,btd->bst", q, k) * scale
    ref = jnp.einsum("bst,btd->bsd", jax.nn.softmax(s, axis=-1), v)
    out = FA.flash_attention(q, k, v, scale, block_q=128, block_kv=256)
    assert out.shape == (2, sq, 2 * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
