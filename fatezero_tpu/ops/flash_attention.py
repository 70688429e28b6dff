"""Pallas TPU flash-attention (forward + custom-VJP backward) for the large,
never-edited attention maps.

The reference routes attention maps with more than 32*32=1024 query tokens
through xformers' CUDA memory-efficient attention and leaves them uncontrolled
(reference: attention_register.py:112-116,198-204); during tuning the same
kernels carry gradients (train_tune_a_video.py:333-346). On TPU those maps
(64x64 = 4096 tokens at 512^2 resolution, with sparse-causal KV of 8192
tokens) would cost gigabytes of HBM per layer if materialized by XLA, so this
module implements the streaming (flash) algorithm as Pallas kernels:

  * forward: online softmax over KV blocks, fp32 accumulators in VMEM, no
    score materialization in HBM;
  * backward (jax.custom_vjp): the standard two-kernel flash backward —
    a dQ kernel (grid over query blocks, streaming KV) and a dK/dV kernel
    (grid over KV blocks, streaming Q) that recompute probabilities from the
    saved log-sum-exp instead of materializing them.

SD-1.4 head dims are 40/80/160 — not multiples of the 128-lane width. Rather
than zero-padding Q/K/V in HBM (a 3.2x copy at head dim 40), the kernels read
the *unpadded* arrays with 128-lane block shapes: TPU HBM arrays are already
physically tiled/padded to 128 lanes, out-of-bounds block reads return that
(garbage) padding, and out-of-bounds writes are dropped. Garbage lanes/rows
are masked in VMEM (a VPU `where`, free next to the matmuls).

The log-sum-exp residual is stored broadcast across 128 lanes
([B, Sq, 128] fp32) so the backward kernels never need a lane<->sublane
relayout — the same layout jax's own TPU flash kernel uses. It is produced
only under differentiation (custom_vjp fwd); plain inference calls the
forward kernel without the extra output.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _flash_forced() -> bool:
    """Test knob: take the Pallas dispatch path off-TPU (jaxpr-structure tests
    trace it without lowering; numeric tests pair it with FZ_FLASH_INTERPRET)."""
    return os.environ.get("FZ_FLASH_FORCE", "") == "1"


def _interpret() -> bool:
    """Test knob: run the Pallas kernels in interpret mode (pure-JAX emulation,
    works on the CPU backend) so the shard_map+kernel composition can be
    executed and numerically pinned on the 8-device virtual mesh."""
    return os.environ.get("FZ_FLASH_INTERPRET", "") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_lanes(x: jax.Array, d: int) -> jax.Array:
    """Zero lanes >= d (static no-op when the block is exactly d wide)."""
    if x.shape[-1] == d:
        return x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < d, x, 0.0)


def _mask_block(x: jax.Array, d: int, n_rows: int, row0) -> jax.Array:
    """Zero garbage lanes >= d AND garbage rows >= n_rows (global offset row0).

    Out-of-bounds block reads return whatever sits in the array's physical
    tile padding (NaN in interpret mode) — a zero row/lane mask keeps it out
    of the accumulators (0 * NaN would poison them otherwise).
    """
    cond = None
    if x.shape[-1] != d:
        cond = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) < d
    if n_rows is not None:  # static: caller omits it when rows divide evenly
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
        rcond = row < n_rows
        cond = rcond if cond is None else jnp.logical_and(cond, rcond)
    if cond is None:
        return x
    return jnp.where(cond, x, 0.0)


# --------------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, d, dv, kv_len, block_kv):
    """One (batch*head, q-block) program: stream KV blocks with online softmax.

    dv is the value head dim — it may differ from d (the prompt-to-prompt
    value-space edit rides a double-wide V through one softmax pass,
    ptp/context.py::value_space_attention)."""
    q = _mask_lanes(q_ref[0].astype(jnp.float32), d) * scale  # [bq, dp]
    bq = q.shape[0]
    num_kv = k_ref.shape[1] // block_kv
    needs_mask = kv_len < num_kv * block_kv

    kv_rows = kv_len if needs_mask else None

    def body(i, carry):
        acc, m, l = carry
        row0 = i * block_kv
        k = _mask_block(k_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), d, kv_rows, row0)
        v = _mask_block(v_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), dv, kv_rows, row0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if needs_mask:  # static: only a ragged KV tail pays for it
            col = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, v_ref.shape[-1]), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, LANES))


def _fwd_call(q, k, v, scale, block_q, block_kv, with_lse):
    B, sq, d = q.shape
    skv = k.shape[1]
    dv = v.shape[-1]  # may exceed d (value-space edit: double-wide V)
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    d_pad = _round_up(d, LANES)
    dv_pad = _round_up(dv, LANES)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    grid = (B, sq_pad // block_q)
    out_shape = [jax.ShapeDtypeStruct((B, sq, dv), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, dv_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    ]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((B, sq, LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block_q, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
        )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, d=d, dv=dv, kv_len=skv, block_kv=block_kv
    )
    if not with_lse:
        kernel = functools.partial(lambda f, *refs: f(*refs, None), kernel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, dv_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * sq_pad * skv_pad * (d_pad + dv_pad),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * sq_pad * skv_pad,
        ),
    )(q, k, v)
    return out if with_lse else (out[0], None)


# -------------------------------------------------------------------- backward


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, *, scale, d, kv_len, block_kv):
    """dQ = scale * [P o (dO V^T - delta)] K, streaming KV blocks."""
    q = _mask_lanes(q_ref[0].astype(jnp.float32), d)
    do = _mask_lanes(do_ref[0].astype(jnp.float32), d)
    o = _mask_lanes(o_ref[0].astype(jnp.float32), d)
    lse = lse_ref[0][:, :1]  # [bq, 1]
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # [bq, 1]
    num_kv = k_ref.shape[1] // block_kv
    needs_mask = kv_len < num_kv * block_kv

    kv_rows = kv_len if needs_mask else None

    def body(i, acc):
        row0 = i * block_kv
        k = _mask_block(k_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), d, kv_rows, row0)
        v = _mask_block(v_ref[0, pl.ds(row0, block_kv), :].astype(jnp.float32), d, kv_rows, row0)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if needs_mask:
            col = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, num_kv, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, o_ref, do_ref, lse_ref, dk_ref, dv_ref, *, scale, d, q_len, block_q
):
    """dV = P^T dO ; dK = scale * [P o (dO V^T - delta)]^T Q, streaming Q blocks."""
    k = _mask_lanes(k_ref[0].astype(jnp.float32), d)  # [bk, dp]
    v = _mask_lanes(v_ref[0].astype(jnp.float32), d)
    num_q = q_ref.shape[1] // block_q
    needs_mask = q_len < num_q * block_q

    q_rows = q_len if needs_mask else None

    def body(j, carry):
        dk, dv = carry
        row0 = j * block_q
        q = _mask_block(q_ref[0, pl.ds(row0, block_q), :].astype(jnp.float32), d, q_rows, row0)
        o = _mask_block(o_ref[0, pl.ds(row0, block_q), :].astype(jnp.float32), d, q_rows, row0)
        do = _mask_block(do_ref[0, pl.ds(row0, block_q), :].astype(jnp.float32), d, q_rows, row0)
        lse = lse_ref[0, pl.ds(j * block_q, block_q), :1]  # [bq, 1]
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # [bq, 1]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        if needs_mask:  # zero padded/garbage query rows: they touch every dk/dv row
            row = j * block_q + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            p = jnp.where(row < q_len, p, 0.0)
            ds = jnp.where(row < q_len, ds, 0.0)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, dp]
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    zero = jnp.zeros(k.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, o, lse, do, scale, block_q, block_kv):
    B, sq, d = q.shape
    if v.shape[-1] != d:
        raise NotImplementedError(
            "flash_attention backward requires matching q/v head dims; the "
            "wide-V forward (value-space edit) is an inference-only path"
        )
    skv = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    d_pad = _round_up(d, LANES)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    qspec = pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    lsespec = pl.BlockSpec((1, block_q, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, d=d, kv_len=skv, block_kv=block_kv),
        grid=(B, sq_pad // block_q),
        in_specs=[qspec, kvspec, kvspec, qspec, qspec, lsespec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, sq, d), q.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * sq_pad * skv_pad * d_pad,
            bytes_accessed=3 * (q.size + k.size) * q.dtype.itemsize,
            transcendentals=B * sq_pad * skv_pad,
        ),
    )(q, k, v, o, do, lse)

    # kv-block grid: a smaller block keeps the fp32 accumulator pair in VMEM
    block_kv_bwd = min(512, block_kv)
    skv_pad2 = _round_up(skv, block_kv_bwd)
    # streaming block over Q must divide sq_pad (which is a block_q multiple)
    block_q_stream = 2048 if sq_pad % 2048 == 0 else block_q
    kblkspec = pl.BlockSpec(
        (1, block_kv_bwd, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    qfullspec = pl.BlockSpec((1, sq_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    lsefullspec = pl.BlockSpec((1, sq_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, d=d, q_len=sq, block_q=block_q_stream),
        grid=(B, skv_pad2 // block_kv_bwd),
        in_specs=[kblkspec, kblkspec, qfullspec, qfullspec, qfullspec, lsefullspec],
        out_specs=[kblkspec, kblkspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, skv, d), k.dtype),
            jax.ShapeDtypeStruct((B, skv, d), v.dtype),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * sq_pad * skv_pad2 * d_pad,
            bytes_accessed=3 * (q.size + k.size) * q.dtype.itemsize,
            transcendentals=B * sq_pad * skv_pad2,
        ),
    )(k, v, q, o, do, lse)
    return dq, dk, dv


# ------------------------------------------------------------------ public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash(scale, block_q, block_kv, q, k, v):
    o, _ = _fwd_call(q, k, v, scale, block_q, block_kv, with_lse=False)
    return o


def _flash_fwd(scale, block_q, block_kv, q, k, v):
    o, lse = _fwd_call(q, k, v, scale, block_q, block_kv, with_lse=True)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, block_q, block_kv, res, g):
    q, k, v, o, lse = res
    return _bwd_call(q, k, v, o, lse, g, scale, block_q, block_kv)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int | None = None,
    block_kv: int | None = None,
) -> jax.Array:
    """Streaming attention: softmax(q k^T * scale) v without materializing scores.

    Differentiable (custom VJP with Pallas backward kernels).

    Default blocks are shape-aware, from a traced-duration sweep on the v5e
    at the SD video shapes: tiny-KV cross-attention ([192, 4096, 77->128]) is
    grid-overhead-bound — one big query block runs 1.7x faster than 512-row
    blocks — while large-KV self-attention ([192, 4096, 4096] at d 40) is
    ~6%% faster streaming the full KV in a single pass (bkv=4096, 16 MB
    fp32 score block in VMEM) than with 2048-row KV blocks. (256, 512)
    blocks hit a 10x scheduling pathology — avoid tiny blocks.

    Args:
      q: [B, Sq, d]  (B folds batch*frames*heads)
      k, v: [B, Skv, d]
      scale: logit scale (1/sqrt(head_dim), from the *unpadded* head dim)
    Returns [B, Sq, d].
    """
    if block_q is None:
        block_q = 4096 if k.shape[1] <= 256 else 1024
    if block_kv is None:
        block_kv = 4096
    return _flash(scale, block_q, block_kv, q, k, v)


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Reference XLA path (CPU tests / tiny shapes): fp32 softmax.

    Accepts arbitrary (broadcastable) leading batch dims — e.g. 5-D
    [b, f, h, s, d] video attention with a frame-broadcast cross context
    [b, 1, h, kv, d]. No leading-dim reshape happens, so a seq-sharded frame
    axis stays sharded through the whole site (GSPMD cannot represent a
    sharding on a (rows f)-merged axis when rows > 1)."""
    s = (
        jnp.einsum("...sd,...td->...st", q.astype(jnp.float32), k.astype(jnp.float32))
        * scale
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...st,...td->...sd", p, v.astype(jnp.float32)).astype(q.dtype)


def _fold_flash(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Fold leading dims to kernel rows and run the flash kernel."""
    lead = q.shape[:-2]
    if k.shape[:-2] != lead:
        k = jnp.broadcast_to(k, lead + k.shape[-2:])
        v = jnp.broadcast_to(v, lead + v.shape[-2:])
    q3 = q.reshape(-1, *q.shape[-2:])
    out = flash_attention(
        q3, k.reshape(-1, *k.shape[-2:]), v.reshape(-1, *v.shape[-2:]), scale
    )
    return out.reshape(*lead, *out.shape[-2:])


def _sharded_flash(mesh, q: jax.Array, k: jax.Array, v: jax.Array, scale: float):
    """Run the flash kernel per shard under the ambient seq mesh (shard_map).

    Attention rows are frame- and head-independent, and every mesh-traced
    call site provides frame-LOCAL KV (sparse-causal KV arrives through the
    halo exchange of ops/video_ops.gather_sparse_kv; cross-attention context
    is a frame-broadcast [.., 1, h, kv, d]), so the kernel shards with ZERO
    collectives: frames (axis -4) over 'seq', heads (axis -3) over 'tensor'
    (megatron head sharding), an optional batch axis (-5) over 'data'. A
    size-1 frame axis on k/v stays replicated. Returns None (caller falls
    back to the XLA einsum) when a dim does not divide its mesh axis.

    This is the ICI-sharded form of the xformers path the kernel replaces
    (reference attention_register.py:112-116) — the single-chip kernel and
    the mesh are composed instead of exclusive.
    """
    from jax.sharding import PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_seq = sizes.get("seq", 1)
    n_tensor = sizes.get("tensor", 1)
    n_data = sizes.get("data", 1)

    def spec_for(x):
        if x.ndim < 4:
            return None
        spec = [None] * x.ndim
        if n_seq > 1 and x.shape[-4] != 1:
            if x.shape[-4] % n_seq:
                return None
            spec[-4] = "seq"
        if n_tensor > 1:
            if x.shape[-3] % n_tensor:
                return None
            spec[-3] = "tensor"
        if x.ndim >= 5 and n_data > 1 and x.shape[-5] % n_data == 0:
            spec[-5] = "data"
        return P(*spec)

    specs = [spec_for(x) for x in (q, k, v)]
    if any(s is None for s in specs) or k.shape[:-2] != v.shape[:-2]:
        return None

    def local(q, k, v):
        return _fold_flash(q, k, v, scale)

    # check_vma=False: pallas_call does not declare varying-mesh-axes metadata
    # for its outputs; the specs above are the full contract (no collectives
    # inside the body, outputs vary exactly like q).
    return jax.shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=specs[0], check_vma=False
    )(q, k, v)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Backend dispatch: Pallas flash kernel on TPU, XLA einsum elsewhere.

    q: [..., S, D]; k/v: [..., KV, D] with leading dims broadcastable against
    q's. Single-chip, leading dims fold to kernel rows; under an ambient seq
    mesh (FateZeroPipeline.shard) the kernel runs per shard inside a
    shard_map over the frame/head axes (`_sharded_flash`) so the flagship
    Pallas path survives ICI sharding instead of falling back to a
    score-materializing einsum.
    """
    if (jax.default_backend() == "tpu" or _flash_forced()) and q.shape[-2] >= 256:
        mesh = _ambient_seq_mesh()
        if mesh is None:
            return _fold_flash(q, k, v, scale)
        out = _sharded_flash(mesh, q, k, v, scale)
        if out is not None:
            return out
    return xla_attention(q, k, v, scale)


def _ambient_seq_mesh():
    from fatezero_tpu.parallel.sharding import current_seq_mesh

    return current_seq_mesh()
