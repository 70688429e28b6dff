"""Kernel-boundary probe for the relayout bucket (round-5, VERDICT r4 #3).

Round 4 established that the ~22 ms/step copy bucket is layout
reconciliation XLA inserts at the Pallas custom-call boundary: producers
naturally emit [B, F, S, H*D] (heads minor), while the shipped kernel folds
(B*F*H) into rows and therefore demands [B, F, H, S, D] row-major — a real
S<->H transpose. XLA-level producer rewrites were measured neutral
(bench_artifacts/r4_layout_probes.json): the reconciliation just moves.

This probe attacks the boundary ITSELF: variant "merged" re-declares the
kernel over 3-D [R, S, H*D] operands — the projection output VERBATIM (no
reshape, no transpose on either side) — and iterates heads INSIDE the
kernel as static 40-lane slices of the 320-lane block. (A 4-D heads-mid
BlockSpec (1, bq, 1, d) is not lowerable: Mosaic requires block[-2] to be
8-divisible or equal to the array dim, and the head axis is 8 with block 1
— so in-kernel lane slicing is the only way to consume producer layout.)
DMA is byte-exact (each Q/KV element fetched once per q-tile, all heads
served from one block); the open question is the VMEM relayout cost of
40-lane sub-slices vs the HBM transpose the 3-D fold pays.

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


def _fwd_call_merged(q, k, v, scale, block_q, block_kv, heads):
    """Forward flash call over [R, S, H*D] operands — producer layout verbatim.

    Same online softmax as FA._fwd_kernel, but the head axis never exists in
    HBM: each program loads one lane-dense [block_q, H*D] Q tile plus the
    full [skv, H*D] KV block and statically unrolls heads as 40-lane
    sub-slices in VMEM. No S<->H transpose exists anywhere in the graph."""
    R, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    block_q = min(block_q, FA._round_up(sq, 128))
    block_kv = min(block_kv, FA._round_up(skv, 128))
    sq_pad = FA._round_up(sq, block_q)
    skv_pad = FA._round_up(skv, block_kv)

    grid = (R, sq_pad // block_q)

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_kv):
        num_kv = k_ref.shape[1] // block_kv
        needs_mask = kv_len < num_kv * block_kv
        for h in range(heads):  # static unroll: 40-lane slices of the block
            qh = q_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32) * scale
            bq = qh.shape[0]

            def body(i, carry, h=h):
                acc, m, l = carry
                row0 = i * block_kv
                kb = k_ref[0, pl.ds(row0, block_kv), h * d:(h + 1) * d].astype(jnp.float32)
                vb = v_ref[0, pl.ds(row0, block_kv), h * d:(h + 1) * d].astype(jnp.float32)
                if needs_mask:  # zero the padded tail rows (garbage in HBM pad)
                    row = row0 + jax.lax.broadcasted_iota(jnp.int32, kb.shape, 0)
                    kb = jnp.where(row < kv_len, kb, 0.0)
                    vb = jnp.where(row < kv_len, vb, 0.0)
                s = jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
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

            acc = jnp.zeros((bq, d), jnp.float32)
            m = jnp.full((bq, 1), FA.NEG_INF, jnp.float32)
            l = jnp.zeros((bq, 1), jnp.float32)
            acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m, l))
            o_ref[0, :, h * d:(h + 1) * d] = (acc / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, kv_len=skv, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda r, i: (r, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, hd), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, hd), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda r, i: (r, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, sq, hd), q.dtype),
        interpret=FA._interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * heads * sq_pad * skv_pad * 2 * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=R * heads * sq_pad * skv_pad,
        ),
    )(q, k, v)
    return out


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


def site_merged(x, kv_x, wq, wk, wv, wo, g, b2):
    """Boundary-free path: the kernel consumes projection output verbatim."""
    h = _ln(x, g, b2)
    hk = _ln(kv_x, g, b2)
    q = (h @ wq).reshape(B * F, S, H * D)
    k = (hk @ wk).reshape(B * F, KV, H * D)
    v = (hk @ wv).reshape(B * F, KV, H * D)
    out = _fwd_call_merged(q, k, v, D**-0.5, BQ, BKV, H)
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
    for name, fn in (("ship", site_ship), ("merged", site_merged)):
        f = jax.jit(fn)
        o = f(x, kv_x, wq, wk, wv, wo, g, b2)
        o.block_until_ready()
        outs[name] = o.astype(jnp.float32)
        # timing: chain each iteration through the previous output (a real
        # data dependency the device cannot elide) and synchronize with a
        # host transfer of a scalar — block_until_ready over the axon relay
        # returned before device completion and produced physically
        # impossible numbers (48 us for a ~1.4 TFLOP site, r5_boundary.json
        # first cut), so wall-per-iter is measured against float(sum(o)).
        n = 10
        xi = x
        float(jnp.sum(f(xi, kv_x, wq, wk, wv, wo, g, b2)))  # settle queue
        t0 = time.time()
        for _ in range(n):
            xi = f(xi, kv_x, wq, wk, wv, wo, g, b2).astype(DTYPE)
        float(jnp.sum(xi))  # host transfer: true synchronization point
        results[name] = (time.time() - t0) / n * 1e3  # ms
    err = float(jnp.max(jnp.abs(outs["ship"] - outs["merged"])))
    print(
        json.dumps(
            {
                "site": f"[{B},{F},{S},{C}] H{H} D{D} KV{KV} {DTYPE.__name__}",
                "ship_ms": round(results["ship"], 3),
                "merged_ms": round(results["merged"], 3),
                "speedup": round(results["ship"] / results["merged"], 3),
                "max_abs_diff": err,
            }
        )
    )


if __name__ == "__main__":
    main()
