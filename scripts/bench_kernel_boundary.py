"""Kernel-boundary probe for the relayout bucket (round-5, VERDICT r4 #3).

Round 4 established that the ~22 ms/step copy bucket is layout
reconciliation XLA inserts at the Pallas custom-call boundary: producers
naturally emit [B, F, S, H*D] (heads minor), while the shipped kernel folds
(B*F*H) into rows and therefore demands [B, F, H, S, D] row-major — a real
S<->H transpose. XLA-level producer rewrites were measured neutral
(bench_artifacts/r4_layout_probes.json): the reconciliation just moves.

This probe attacks the boundary ITSELF: variant "hmid" re-declares the
kernel over 4-D [R, S, H, D] operands with the head axis block-indexed in
the MIDDLE (BlockSpec (1, bq, 1, d)), so the kernel's required layout is
exactly the projection output reshaped (free view) — no transpose exists on
either side. The open question is DMA efficiency: each (1, bq, 1, d) block
is bq strided segments of d*2 bytes (stride H*D*2), vs the contiguous reads
the 3-D fold enjoys after paying the transpose.

Run on a TPU host:
    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/bench_kernel_boundary.py

Prints one JSON line per variant over the dominant never-controlled self
site of the SD-1.4 64^2 level (q [2,8,4096,320] vs sparse-causal KV 8192),
measured through the full site (LN -> qkv proj -> attention -> out proj)
so boundary copies are included.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fatezero_tpu.ops import flash_attention as FA

B, F, S, C = 2, 8, 4096, 320
H, D = 8, 40
KV = 2 * S  # sparse-causal gather of 2 frames
DTYPE = jnp.bfloat16
BQ, BKV = 1024, 4096


def _fwd_call_hmid(q, k, v, scale, block_q, block_kv):
    """Forward flash call over [R, S, H, D] operands, head axis mid-indexed.

    Identical kernel body to FA._fwd_kernel; only the BlockSpecs change —
    each program still sees [block_q, d] / [block_kv, d] tiles."""
    R, sq, h, d = q.shape
    skv = k.shape[1]
    block_q = min(block_q, FA._round_up(sq, 128))
    block_kv = min(block_kv, FA._round_up(skv, 128))
    d_pad = FA._round_up(d, FA.LANES)
    sq_pad = FA._round_up(sq, block_q)
    skv_pad = FA._round_up(skv, block_kv)

    grid = (R, h, sq_pad // block_q)

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, d, kv_len, block_kv):
        # FA._fwd_kernel's online softmax verbatim, reading the mid-axis
        # head block (refs are [1, rows, 1, d_pad])
        q = FA._mask_lanes(q_ref[0, :, 0].astype(jnp.float32), d) * scale
        bq = q.shape[0]
        num_kv = k_ref.shape[1] // block_kv
        needs_mask = kv_len < num_kv * block_kv
        kv_rows = kv_len if needs_mask else None

        def body(i, carry):
            acc, m, l = carry
            row0 = i * block_kv
            kb = FA._mask_block(
                k_ref[0, pl.ds(row0, block_kv), 0, :].astype(jnp.float32),
                d, kv_rows, row0,
            )
            vb = FA._mask_block(
                v_ref[0, pl.ds(row0, block_kv), 0, :].astype(jnp.float32),
                d, kv_rows, row0,
            )
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if needs_mask:
                col = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, FA.NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return acc_new, m_new, l_new

        acc = jnp.zeros((bq, v_ref.shape[-1]), jnp.float32)
        m = jnp.full((bq, 1), FA.NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m, l))
        o_ref[0, :, 0] = (acc / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, d=d, kv_len=skv, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1, d_pad), lambda r, hh, i: (r, i, hh, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, 1, d_pad), lambda r, hh, i: (r, 0, hh, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, 1, d_pad), lambda r, hh, i: (r, 0, hh, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 1, d_pad), lambda r, hh, i: (r, i, hh, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, sq, h, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * h * sq_pad * skv_pad * 2 * d_pad,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=R * h * sq_pad * skv_pad,
        ),
    )(q, k, v)
    return out[..., :d]


def site_ship(x, kv_x, wq, wk, wv, wo, g, b2):
    """The shipped path: LN -> proj -> split-heads transpose -> 3-D fold kernel."""
    h = _ln(x, g, b2)
    hk = _ln(kv_x, g, b2)
    q = (h @ wq).reshape(B, F, S, H, D)
    k = (hk @ wk).reshape(B, F, KV, H, D)
    v = (hk @ wv).reshape(B, F, KV, H, D)
    qh = jnp.swapaxes(q, -2, -3)  # [B,F,H,S,D]
    kh = jnp.swapaxes(k, -2, -3)
    vh = jnp.swapaxes(v, -2, -3)
    out = FA.fused_attention(qh, kh, vh, D**-0.5)
    out = jnp.swapaxes(out, -2, -3).reshape(B, F, S, H * D)
    return x + out @ wo


def site_hmid(x, kv_x, wq, wk, wv, wo, g, b2):
    """Boundary-free path: heads stay mid-axis; the kernel indexes them."""
    h = _ln(x, g, b2)
    hk = _ln(kv_x, g, b2)
    q = (h @ wq).reshape(B * F, S, H, D)
    k = (hk @ wk).reshape(B * F, KV, H, D)
    v = (hk @ wv).reshape(B * F, KV, H, D)
    out = _fwd_call_hmid(q, k, v, D**-0.5, BQ, BKV)
    out = out.reshape(B, F, S, H * D)
    return x + out @ wo


def _ln(x, g, b2):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5) * g + b2).astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, F, S, C), DTYPE)
    kv_x = jax.random.normal(ks[1], (B, F, KV, C), DTYPE)
    wq, wk, wv, wo = (
        jax.random.normal(k2, (C, C), DTYPE) * 0.02 for k2 in ks[2:6]
    )
    g = jnp.ones((C,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)

    results = {}
    outs = {}
    for name, fn in (("ship", site_ship), ("hmid", site_hmid)):
        f = jax.jit(fn)
        o = f(x, kv_x, wq, wk, wv, wo, g, b2)
        o.block_until_ready()
        outs[name] = o.astype(jnp.float32)
        n, t0 = 20, time.time()
        for _ in range(n):
            o = f(x, kv_x, wq, wk, wv, wo, g, b2)
        o.block_until_ready()
        results[name] = (time.time() - t0) / n * 1e3  # ms
    err = float(jnp.max(jnp.abs(outs["ship"] - outs["hmid"])))
    print(
        json.dumps(
            {
                "site": f"[{B},{F},{S},{C}] H{H} D{D} KV{KV} {DTYPE.__name__}",
                "ship_ms": round(results["ship"], 3),
                "hmid_ms": round(results["hmid"], 3),
                "speedup": round(results["ship"] / results["hmid"], 3),
                "max_abs_diff": err,
            }
        )
    )


if __name__ == "__main__":
    main()
