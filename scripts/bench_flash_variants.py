"""Microbenchmark flash-attention kernel variants at the dominant edit shapes.

The edit step's hot site is 64^2 self-attention: [B=192, Sq=4096, Skv=4096,
d=40] (B folds 3 batch rows x 8 frames x 8 heads). Round-2 profile: 10.9 ms
/call = 47 TF/s useful vs ~150 TF/s machine-rate on the padded shape. This
script times:

  * the shipped kernel (fp32 operand casts inside the kernel),
  * a bf16-matmul variant (bf16 QK^T and bf16 P@V, fp32 softmax/accum) — the
    precision class the reference's xformers path uses on these never-stored
    sites,
  * block-shape sweeps for both.

Wall-clock timing over the axon relay requires fresh inputs per call (the
relay dedupes identical dispatches) — we cycle through a pool of inputs.

Usage: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python scripts/bench_flash_variants.py

RESULT (v5e, 2026-08-17): max|bf16_variant - shipped| = 0.0 exactly, at every
shape — Mosaic already lowers `astype(f32)`-then-dot on bf16 inputs to native
bf16 MXU passes with f32 accumulation, so the shipped kernel ALREADY runs at
bf16 machine rate (76% MXU per the round-2 traced profile) and there is no
precision-rate headroom here. The remaining 3.2x useful-vs-machine gap at
head-dim 40 is the 128-lane contraction quantization, which is inherent:
any block-diagonal head-packing of K/V (or Q) adds exactly as many MXU
passes in rows/columns as it saves in lanes (see PARITY.md, head-packing
note). Wall-clock numbers from this script over the axon relay are
dispatch-latency noise; only traced kernel durations are meaningful.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from fatezero_tpu.ops.flash_attention import (
    LANES,
    NEG_INF,
    _mask_block,
    _mask_lanes,
    _round_up,
    flash_attention,
)


def _fwd_kernel_bf16(q_ref, k_ref, v_ref, o_ref, *, scale, d, dv, kv_len, block_kv):
    """Forward with bf16 matmul operands (fp32 accumulate via MXU), fp32
    online softmax. Garbage lanes masked in bf16 before the dot."""
    q = _mask_lanes(q_ref[0].astype(jnp.float32) * scale, d).astype(jnp.bfloat16)
    bq = q.shape[0]
    num_kv = k_ref.shape[1] // block_kv
    needs_mask = kv_len < num_kv * block_kv
    kv_rows = kv_len if needs_mask else None

    def body(i, carry):
        acc, m, l = carry
        row0 = i * block_kv
        k = _mask_block(
            k_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), d, kv_rows, row0
        ).astype(jnp.bfloat16)
        v = _mask_block(
            v_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), dv, kv_rows, row0
        ).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if needs_mask:
            col = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, v_ref.shape[-1]), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_bf16(q, k, v, scale, block_q, block_kv):
    B, sq, d = q.shape
    skv = k.shape[1]
    dv = v.shape[-1]
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    d_pad = _round_up(d, LANES)
    dv_pad = _round_up(dv, LANES)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_bf16, scale=scale, d=d, dv=dv, kv_len=skv, block_kv=block_kv
        ),
        grid=(B, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, dv_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dv_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * sq_pad * skv_pad * (d_pad + dv_pad),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * sq_pad * skv_pad,
        ),
    )(q, k, v)


def time_fn(fn, args_pool, iters=8):
    # warmup / compile on pool[0]
    jax.block_until_ready(fn(*args_pool[0]))
    t0 = time.time()
    outs = []
    for i in range(iters):
        outs.append(fn(*args_pool[(i + 1) % len(args_pool)]))
    jax.block_until_ready(outs)
    return (time.time() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    shapes = [
        ("self64", 192, 4096, 4096, 40),
        ("self32-vs", 192, 1024, 1024, 40),  # value-space controlled site
        ("cross64", 192, 4096, 77, 40),
    ]
    for name, B, sq, skv, d in shapes:
        pool = []
        for i in range(3):
            q = jnp.asarray(rng.randn(B, sq, d), jnp.bfloat16)
            k = jnp.asarray(rng.randn(B, skv, d), jnp.bfloat16)
            v = jnp.asarray(rng.randn(B, skv, d), jnp.bfloat16)
            pool.append((q, k, v))
        scale = 1.0 / np.sqrt(d)
        flops_pad = 2 * B * sq * skv * (_round_up(d, 128) * 2)
        flops_useful = 2 * B * sq * skv * (d * 2)

        variants = {
            "fp32-op(shipped)": lambda q, k, v: flash_attention(q, k, v, scale),
        }
        for bq, bkv in [(1024, 4096), (2048, 4096), (512, 4096), (1024, 2048)]:
            if bq <= sq:
                variants[f"bf16 bq={bq} bkv={bkv}"] = (
                    lambda q, k, v, bq=bq, bkv=bkv: flash_bf16(q, k, v, scale, bq, bkv)
                )
        # numeric check bf16 vs shipped
        o_ref = flash_attention(*pool[0], scale)
        o_b = flash_bf16(*pool[0], scale, 1024, 4096)
        err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_b.astype(jnp.float32))))
        print(f"[{name}] max|bf16 - shipped| = {err:.3e}")
        for label, fn in variants.items():
            try:
                dt = time_fn(fn, pool)
                print(
                    f"[{name}] {label:24s} {dt*1e3:8.2f} ms  "
                    f"useful {flops_useful/dt/1e12:6.1f} TF/s  "
                    f"padded {flops_pad/dt/1e12:6.1f} TF/s"
                )
            except Exception as e:
                print(f"[{name}] {label:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
