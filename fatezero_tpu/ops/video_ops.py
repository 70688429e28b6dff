"""TPU-idiomatic primitives for pseudo-3D video networks.

Everything operates on channels-last video tensors [B, F, H, W, C] (TPU/XLA's
preferred layout). The reference's temporal Conv1d over ``(b h w) c f``
(resnet.py:57-80) is re-expressed as a sum of k frame-shifted matmuls — no
layout transposes, contraction lands on the MXU, and XLA fuses the adds.
Frame-gather patterns for SparseCausalAttention are static index lists
resolved at trace time (models/attention.py:371-398 in the reference).
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def temporal_conv(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None, stride: int = 1
) -> jax.Array:
    """Channel-mixing conv over the frame axis as shifted matmuls.

    x: [B, F, H, W, C_in]; w: [k, C_in, C_out] ('same' zero padding, as the
    reference's nn.Conv1d(padding=k//2)); b: [C_out] or None.
    Returns [B, F_out, H, W, C_out] with F_out = floor((F + 2*(k//2) - k)/stride) + 1.
    """
    k = w.shape[0]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    f_out = (x.shape[1] + 2 * pad - k) // stride + 1
    out = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(xp, j, j + stride * (f_out - 1) + 1, stride, axis=1)
        y = jnp.einsum("bfhwc,cd->bfhwd", xs, w[j].astype(xs.dtype))
        out = y if out is None else out + y
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def temporal_avgpool(x: jax.Array, kernel: int = 3, stride: int = 2) -> jax.Array:
    """AvgPool1d over frames, count_include_pad=True (torch default; lora.py:45)."""
    pad = kernel // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    f_out = (x.shape[1] + 2 * pad - kernel) // stride + 1
    out = None
    for j in range(kernel):
        xs = jax.lax.slice_in_dim(xp, j, j + stride * (f_out - 1) + 1, stride, axis=1)
        out = xs if out is None else out + xs
    return out / float(kernel)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample on [B, F, H, W, C]."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def temporal_linear_upsample_2x(x: jax.Array) -> jax.Array:
    """Linear 2x upsample along frames (torch F.interpolate mode='linear',
    align_corners=False; reference resnet.py:150-159)."""
    f = x.shape[1]
    pos = (np.arange(2 * f) + 0.5) / 2.0 - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, f - 1)
    hi = np.clip(lo + 1, 0, f - 1)
    wgt = np.clip(pos - lo, 0.0, 1.0).astype(np.float32)
    wgt = jnp.asarray(wgt)[None, :, None, None, None].astype(x.dtype)
    return x[:, lo] * (1.0 - wgt) + x[:, hi] * wgt


def avgpool_2x(x: jax.Array) -> jax.Array:
    """2x2 spatial average pool, stride 2, on [B, F, H, W, C]."""
    b, f, h, w, c = x.shape
    x = x.reshape(b, f, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(3, 5))


def sparse_frame_indices(
    num_frames: int, index_spec: Sequence[Union[int, str]]
) -> List[np.ndarray]:
    """Static per-frame KV source indices for SparseCausalAttention.

    Semantics identical to the reference (models/attention.py:371-398):
    ints are relative offsets clipped to [0, F-1]; 'first'/'last'/'mid' are
    anchors. Returns one int array of shape [F] per entry.
    """
    out = []
    for index in index_spec:
        if isinstance(index, str):
            if index == "first":
                fi = np.zeros(num_frames, np.int64)
            elif index == "last":
                fi = np.full(num_frames, num_frames - 1, np.int64)
            elif index in ("mid", "middle"):
                fi = np.full(num_frames, (num_frames - 1) // 2, np.int64)
            else:
                raise ValueError(f"unknown frame anchor {index!r}")
        else:
            fi = np.clip(np.arange(num_frames) + int(index), 0, num_frames - 1)
        out.append(fi)
    return out


def gather_sparse_kv(kv: jax.Array, index_spec, num_frames: int) -> jax.Array:
    """Gather per-frame KV context along the token axis.

    kv: [B, F, S, C] -> [B, F, len(index_spec)*S, C] by concatenating the
    tokens of each selected source frame (static gather = slices for XLA).

    When a sequence-parallel mesh is active (FateZeroPipeline.shard sets it
    via parallel.sharding.seq_mesh_scope) and the spec is halo-expressible,
    the gather runs as an explicit shard_map halo exchange over the 'seq'
    axis: one collective-permute of the |offset| boundary frames per int
    offset and one single-frame masked-psum broadcast per anchor. GSPMD
    lowers the plain index-gather form to an all-gather of the FULL KV
    across 'seq' (F frames moved instead of 1-2) — see
    tests/test_sharded_comm.py for the pinned HLO evidence.
    """
    from fatezero_tpu.parallel.sharding import current_seq_mesh

    mesh = current_seq_mesh()
    if mesh is not None and _halo_supported(mesh, kv, index_spec, num_frames):
        return _gather_sparse_kv_halo(kv, index_spec, num_frames, mesh)
    idx_list = sparse_frame_indices(num_frames, index_spec)
    return jnp.concatenate([kv[:, idx] for idx in idx_list], axis=2)


_ANCHORS = ("first", "last", "mid", "middle")


def _halo_supported(mesh, kv: jax.Array, index_spec, num_frames: int) -> bool:
    n_seq = dict(zip(mesh.axis_names, mesh.devices.shape)).get("seq", 1)
    n_tensor = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tensor", 1)
    if n_seq <= 1 or kv.ndim != 4 or kv.shape[1] != num_frames:
        return False
    if num_frames % n_seq != 0 or kv.shape[-1] % n_tensor != 0:
        return False
    f_loc = num_frames // n_seq
    for index in index_spec:
        if isinstance(index, str):
            if index not in _ANCHORS:
                return False
        elif abs(int(index)) > f_loc:
            return False  # multi-hop halo; fall back to the dense gather
    return True


def _gather_sparse_kv_halo(
    kv: jax.Array, index_spec, num_frames: int, mesh
) -> jax.Array:
    """shard_map halo exchange: kv [B, F, S, C] frames sharded over 'seq'.

    Per-shard comm: |offset| boundary frames via collective-permute per int
    offset; one frame via masked psum (broadcast) per first/last/mid anchor.
    The batch row axis is replicated (CFG rows, not data-sharded in the
    inference paths) and the channel axis keeps its megatron 'tensor'
    sharding, so the exchange rides the seq axis only.
    """
    from jax.sharding import PartitionSpec as P

    n_seq = dict(zip(mesh.axis_names, mesh.devices.shape))["seq"]

    def local(kv_loc: jax.Array) -> jax.Array:
        p = jax.lax.axis_index("seq")
        f_loc = kv_loc.shape[1]
        parts = []
        for index in index_spec:
            if isinstance(index, str):
                g = {"first": 0, "last": num_frames - 1}.get(
                    index, (num_frames - 1) // 2
                )
                owner, a_loc = divmod(g, f_loc)
                contrib = jnp.where(
                    p == owner,
                    kv_loc[:, a_loc : a_loc + 1],
                    jnp.zeros_like(kv_loc[:, :1]),
                )
                frame = jax.lax.psum(contrib, "seq")
                parts.append(jnp.broadcast_to(frame, kv_loc.shape))
                continue
            o = int(index)
            if o == 0:
                parts.append(kv_loc)
            elif o < 0:
                m = -o
                recv = jax.lax.ppermute(
                    kv_loc[:, f_loc - m :], "seq",
                    [(i, i + 1) for i in range(n_seq - 1)],
                )
                # shard 0 clamps to its own frame 0 (clip semantics)
                head = jnp.where(
                    p == 0, jnp.repeat(kv_loc[:, :1], m, axis=1), recv
                )
                body = kv_loc[:, : f_loc - m]
                parts.append(
                    jnp.concatenate([head, body], axis=1) if f_loc > m else head
                )
            else:
                recv = jax.lax.ppermute(
                    kv_loc[:, :o], "seq", [(i + 1, i) for i in range(n_seq - 1)]
                )
                tail = jnp.where(
                    p == n_seq - 1, jnp.repeat(kv_loc[:, -1:], o, axis=1), recv
                )
                body = kv_loc[:, o:]
                parts.append(
                    jnp.concatenate([body, tail], axis=1) if f_loc > o else tail
                )
        return jnp.concatenate(parts, axis=2)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, "seq", None, "tensor"),
        out_specs=P(None, "seq", None, "tensor"),
    )(kv)


def referenced_frames(num_frames: int, index_spec) -> List[int]:
    """Sorted unique source frames any query frame gathers from (static).

    The storage key of the sparse-causal K dedup: with ['mid'] every frame
    reads ONE source frame; with (-1, 'first') all frames are referenced but
    each exactly once — so storing the referenced per-frame K (pre-gather)
    is 8x / 2x smaller than the post-gather [F, k*S] tensor.
    """
    idx_list = sparse_frame_indices(num_frames, index_spec)
    return sorted({int(i) for arr in idx_list for i in arr})


def regather_headsplit_kv(
    kv_sel: jax.Array, index_spec, num_frames: int, heads: int
) -> jax.Array:
    """Rebuild the post-gather head-split KV from its referenced-frame subset.

    kv_sel: [b, n_ref, heads, S, d] — the head-split per-frame KV of the
    frames `referenced_frames` returns, in that order. Returns
    [b, F, heads, k*S, d], identical to head-splitting gather_sparse_kv's
    output.
    """
    refs = referenced_frames(num_frames, index_spec)
    pos = {fi: p for p, fi in enumerate(refs)}
    idx_list = sparse_frame_indices(num_frames, index_spec)
    per_frame = []
    for fi in range(num_frames):
        parts = [kv_sel[:, pos[int(arr[fi])]] for arr in idx_list]  # [b, h, s, d]
        per_frame.append(jnp.concatenate(parts, axis=-2))  # [b, h, k*s, d]
    return jnp.stack(per_frame, axis=1)  # [b, F, h, k*s, d]
