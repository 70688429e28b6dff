"""Pallas TPU flash-attention kernel for the large, never-edited attention maps.

The reference routes attention maps with more than 32*32=1024 query tokens
through xformers' CUDA memory-efficient attention and leaves them uncontrolled
(reference: attention_register.py:112-116,198-204). On TPU those maps
(64x64 = 4096 tokens at 512^2 resolution, with sparse-causal KV of 8192
tokens) would cost gigabytes of HBM per layer if materialized by XLA, so this
module implements the streaming (flash) algorithm as a Pallas kernel:
online softmax over KV blocks, fp32 accumulators in VMEM, no score
materialization in HBM.

Head-dims in SD-1.4 are 40/80/160; inputs are zero-padded to a multiple of
128 lanes outside the kernel (zero K lanes add zero logits; padded V lanes are
sliced away). Padded KV *rows* are masked to -inf inside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, kv_pad, block_kv):
    """One (batch*head, q-block) program: stream KV blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]
    bq, d = q.shape
    num_kv = kv_pad // block_kv
    needs_mask = kv_len < kv_pad

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)  # [bk, d]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if needs_mask:  # static: only the config with a ragged tail pays for it
            col = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    # measured on the v5e at SD shapes ([192, 4096, 40]): (256, 512) hits a
    # 10x scheduling pathology (204 ms/call); every config with bigger
    # blocks runs ~21 ms. (512, 2048) is within 6% of the best while keeping
    # the f32 score block at 4 MB VMEM.
    block_q: int = 512,
    block_kv: int = 2048,
) -> jax.Array:
    """Streaming attention: softmax(q k^T * scale) v without materializing scores.

    Args:
      q: [B, Sq, d]  (B folds batch*frames*heads)
      k, v: [B, Skv, d]
      scale: logit scale (1/sqrt(head_dim), from the *unpadded* head dim)
    Returns [B, Sq, d].
    """
    B, sq, d = q.shape
    skv = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    d_pad = _round_up(d, 128)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)
    q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    k = jnp.pad(k, ((0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    v = jnp.pad(v, ((0, 0), (0, skv_pad - skv), (0, d_pad - d)))

    grid = (B, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=skv, kv_pad=skv_pad, block_kv=block_kv
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * sq_pad * skv_pad * d_pad,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * sq_pad * skv_pad,
        ),
    )(q, k, v)
    return out[:, :sq, :d]


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Reference XLA path (CPU tests / tiny shapes): fp32 softmax, same API."""
    s = jnp.einsum("bsd,btd->bst", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bst,btd->bsd", p, v.astype(jnp.float32)).astype(q.dtype)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Backend dispatch: Pallas flash kernel on TPU, XLA einsum elsewhere."""
    if jax.default_backend() == "tpu" and q.shape[1] >= 256:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
