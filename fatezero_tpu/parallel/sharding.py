"""Mesh + sharding rules: data / frames (sequence) / tensor parallelism.

The reference has no device parallelism beyond HF-Accelerate DP scaffolding
(SURVEY.md §2.3); here parallelism is first-class and idiomatic: a
`jax.sharding.Mesh` with axes

  data   — batch of videos (DP) and the CFG pair,
  seq    — the frame axis (sequence parallelism; SparseCausalAttention's KV
           gather of {prev, first} frames becomes an XLA collective-permute /
           small all-gather over ICI),
  tensor — attention heads / MLP hidden (megatron-style TP on the dense
           kernels).

Rules are GSPMD annotations: inputs get `video_spec`, parameters get
`unet_param_specs`, and XLA's SPMD partitioner inserts the collectives. No
NCCL-style explicit communication anywhere.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "seq", "tensor")

# Ambient sequence-parallel mesh, set by FateZeroPipeline while tracing its
# jitted programs. ops/video_ops.gather_sparse_kv consults it at trace time:
# when a seq mesh is active the sparse-causal KV gather runs as an explicit
# shard_map halo exchange (one collective-permute of the boundary frames per
# int offset + one single-frame broadcast per anchor) instead of relying on
# GSPMD, which lowers the equivalent index-gather to an all-gather of the
# FULL per-site KV across the 'seq' axis (measured: f32[1,8,1024,320] per
# site vs one bf16 frame; see tests/test_sharded_comm.py).
_SEQ_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "fatezero_seq_mesh", default=None
)


@contextlib.contextmanager
def seq_mesh_scope(mesh: Optional[Mesh]):
    token = _SEQ_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _SEQ_MESH.reset(token)


def current_seq_mesh() -> Optional[Mesh]:
    return _SEQ_MESH.get()


def make_mesh(
    devices: Optional[Sequence] = None, shape: Optional[Sequence[int]] = None
) -> Mesh:
    """Mesh over the given devices; default splits them seq-major.

    shape: (data, seq, tensor); by default (1, n // min(n, 2), min(n, 2)).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        tensor = 2 if n % 2 == 0 and n >= 2 else 1
        shape = (1, n // tensor, tensor)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed(force: bool = False) -> bool:
    """`jax.distributed.initialize()` when multi-process env vars are set.

    The TPU-native replacement for the reference's `accelerate launch`
    process bootstrap (reference test_fatezero.py:69-72): each host runs the
    same entry point; JAX reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (or the TPU-pod metadata) itself. No-op (returns False)
    in a plain single-process run unless `force`.
    """
    global _DISTRIBUTED_INITIALIZED
    import os

    want = force or any(
        k in os.environ for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    if not _DISTRIBUTED_INITIALIZED:
        # jax.distributed.initialize only auto-reads the coordinator address
        # from the environment; on a generic (non-SLURM/GKE) launch
        # num_processes/process_id must be passed explicitly or bring-up
        # fails. Exercised by tests/test_multiprocess.py on a real
        # 2-process CPU cluster.
        kwargs = {}
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        _DISTRIBUTED_INITIALIZED = True
    return True


def mesh_from_config(cfg) -> Mesh:
    """Build a mesh from a `sharding:` config block or a `--mesh` flag value.

    Accepted forms:
      * dict: `{mesh: [data, seq, tensor] | "auto", distributed: bool}`
      * str:  `"1,4,2"` (shape) or `"auto"` (default split over all devices)
    """
    if isinstance(cfg, str):
        cfg = {"mesh": cfg}
    cfg = dict(cfg or {})
    maybe_initialize_distributed(force=bool(cfg.get("distributed")))
    shape = cfg.get("mesh", "auto")
    if isinstance(shape, str):
        if shape.strip().lower() == "auto":
            shape = None
        else:
            shape = [int(x) for x in shape.replace("x", ",").split(",")]
    if shape is not None:
        shape = tuple(int(x) for x in shape)
        assert len(shape) == 3, f"mesh shape must be (data, seq, tensor), got {shape}"
    return make_mesh(shape=shape)


def video_spec() -> P:
    """[B, F, H, W, C] video/latent tensors: batch over data, frames over seq."""
    return P("data", "seq")


def text_spec() -> P:
    """[B, 77, C] embeddings: batch over data."""
    return P("data")


def unet_param_specs(params):
    """Megatron-style TP specs per parameter path.

    qkv / FF-in kernels shard their output dim over 'tensor'; to_out / FF-out
    kernels shard their input dim; everything else (convs, norms, embeddings)
    replicates. GSPMD propagates the matching activation shardings.
    """

    def spec_for(path) -> P:
        joined = "/".join(str(getattr(k, "key", k)) for k in path)
        leaf = joined.rsplit("/", 1)[-1]
        if leaf != "kernel":
            return P()
        if any(p in joined for p in ("to_q", "to_k", "to_v", "query", "key", "value")):
            return P(None, "tensor")
        if "net_0/proj" in joined:
            return P(None, "tensor")
        if any(p in joined for p in ("to_out", "out_proj", "proj_attn")):
            return P("tensor", None)
        if "net_2" in joined:
            return P("tensor", None)
        return P()

    return jax.tree_util.tree_map_with_path(lambda path, _: spec_for(path), params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to unet_param_specs."""
    specs = unet_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
