"""Multi-chip communication proof for the seq-sharded sparse-causal gather.

VERDICT r3 #4: the design claim that frame-axis sequence parallelism turns
SparseCausalAttention's KV gather into a neighbor exchange was only ever
pinned by numerics — GSPMD could all-gather the full KV and the values would
still match. These tests pin the COMMUNICATION:

  * the halo gather (ops/video_ops._gather_sparse_kv_halo, active under
    parallel.sharding.seq_mesh_scope) is numerically identical to the dense
    index gather for every supported index spec;
  * the compiled HLO of a seq-sharded UNet forward contains a
    collective-permute of ONE boundary frame per int offset and no all-gather
    of the full per-site KV;
  * the total collective traffic of the halo form is a small fraction of the
    GSPMD index-gather form (comm bytes recorded in PARITY.md).

Reference access pattern: video_diffusion/models/attention.py:340-422.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fatezero_tpu.ops.video_ops import gather_sparse_kv
from fatezero_tpu.parallel.sharding import seq_mesh_scope

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}


def _mesh(shape):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, ("data", "seq", "tensor"))


def _collectives(hlo: str):
    """[(op, total_bytes, line)] for every collective in the HLO text."""
    out = []
    for line in hlo.splitlines():
        m = re.search(
            r"= [^=]*?([\w-]*(?:all-gather|all-reduce|collective-permute"
            r"|all-to-all|collective-broadcast)[\w-]*)\(", line
        )
        if not m or "-done" in m.group(1):
            continue
        nbytes = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", line.split(" = ")[1]):
            if dt in _DTYPE_BYTES:
                size = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
                nbytes += size * _DTYPE_BYTES[dt]
        out.append((m.group(1), nbytes // 2, line.strip()))  # /2: operand+result
    return out


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (1, 4, 2), (1, 2, 2)])
@pytest.mark.parametrize(
    "spec", [(-1, "first"), ("mid",), (-1, 1, "first", "last"), (-2, 2)]
)
def test_halo_gather_matches_dense(mesh_shape, spec):
    mesh = _mesh(mesh_shape)
    B, F, S, C = 2, 8, 16, 8
    kv = jax.random.normal(jax.random.PRNGKey(0), (B, F, S, C))
    ref = gather_sparse_kv(kv, spec, F)  # dense (no ambient mesh)
    kv_sh = jax.device_put(kv, NamedSharding(mesh, P(None, "seq", None, "tensor")))
    with seq_mesh_scope(mesh):
        out = jax.jit(lambda x: gather_sparse_kv(x, spec, F))(kv_sh)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_halo_gather_fallback_unsupported():
    """Offsets wider than one shard fall back to the dense gather (correct,
    just more comm) instead of erroring."""
    mesh = _mesh((1, 8, 1))  # f_loc = 1 -> offset -2 is multi-hop
    F = 8
    kv = jax.random.normal(jax.random.PRNGKey(1), (1, F, 8, 4))
    ref = gather_sparse_kv(kv, (-2,), F)
    kv_sh = jax.device_put(kv, NamedSharding(mesh, P(None, "seq")))
    with seq_mesh_scope(mesh):
        out = jax.jit(lambda x: gather_sparse_kv(x, (-2,), F))(kv_sh)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def _compiled_unet_hlo(mesh, use_halo: bool):
    """Compile the tiny UNet forward seq-sharded; return the SPMD HLO text."""
    from tests.conftest import cached_init
    from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel

    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 128, 128),
        attention_head_dim=4,
        cross_attention_dim=16,
        norm_num_groups=8,
        sparse_causal_indices=(-1, "first"),
        # temporal attention needs ALL frames per pixel (a genuine frame-axis
        # all-to-all, SURVEY §2.3); off so the HLO isolates the SCA gather
        temporal_attention=False,
    )
    unet = UNetPseudo3DConditionModel(cfg=cfg)
    B, F, HW = 1, 8, 16  # the inversion/capture forward (cond row only)
    sample = jnp.zeros((B, F, HW, HW, 4))
    text = jnp.zeros((B, 77, 16))
    params = cached_init(unet, sample, jnp.int32(1), text, tag="comm")
    vid = NamedSharding(mesh, P(None, "seq"))
    rep = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda p, x, t, c: unet.apply(p, x, t, c),
        in_shardings=(rep, vid, rep, rep),
        out_shardings=vid,
    )
    scope = seq_mesh_scope(mesh) if use_halo else seq_mesh_scope(None)
    with scope:
        return fn.lower(params, sample, jnp.int32(1), text).compile().as_text()


@pytest.mark.slow
def test_unet_halo_bound_at_full_sd_width():
    """VERDICT r4 #6: re-assert the one-frame collective bound at the REAL
    SD-1.4 channel widths (320, 640, 1280, 1280) — layout decisions can change
    with width, and the original proof ran on a 32-channel test UNet. Latent
    spatial size is kept small (16x16): the bound under test is per-frame
    channel width, not token count."""
    from __graft_entry__ import _fast_params
    from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel

    mesh = _mesh((1, 8, 1))
    cfg = UNet3DConfig(temporal_attention=False)  # full SD-1.4 widths
    unet = UNetPseudo3DConditionModel(cfg=cfg)
    B, F, HW = 1, 8, 16
    sample = jnp.zeros((B, F, HW, HW, 4))
    text = jnp.zeros((B, 77, 768))
    params = _fast_params(unet, sample, jnp.int32(1), text)
    vid = NamedSharding(mesh, P(None, "seq"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda p, x, t, c: unet.apply(p, x, t, c),
        in_shardings=(rep, vid, rep, rep),
        out_shardings=vid,
    )
    with seq_mesh_scope(mesh):
        hlo = fn.lower(params, sample, jnp.int32(1), text).compile().as_text()

    cols = _collectives(hlo)
    assert any(op.startswith("collective-permute") for op, _, _ in cols)
    ags = [l for op, _, l in cols if op.startswith("all-gather")]
    assert not ags, f"full-width halo form all-gathers: {ags[:3]}"
    # bound: every collective moves at most the 2 boundary frames of the
    # widest temporal-conv halo, f32[1, 2, 16, 16, 640] = 655,360 bytes
    # (attention-site KV frames are f32[1, 1, 256, 320] = 327,680)
    bound = 2 * HW * HW * 640 * 4
    oversized = [(op, b, l) for op, b, l in cols if b > bound]
    assert not oversized, f"collective wider than the frame bound: {oversized[:3]}"


@pytest.mark.slow
def test_unet_sca_exchange_is_neighbor_collective():
    """The seq-sharded UNet forward must move the SCA KV with
    collective-permutes of ONE boundary frame + single-frame broadcasts —
    never an all-gather of the full KV — and its total collective traffic
    must be a fraction of what the GSPMD index-gather lowers to."""
    mesh = _mesh((1, 8, 1))
    halo = _collectives(_compiled_unet_hlo(mesh, use_halo=True))
    dense = _collectives(_compiled_unet_hlo(mesh, use_halo=False))

    halo_total = sum(b for _, b, _ in halo)
    dense_total = sum(b for _, b, _ in dense)

    # the dense form all-gathers full per-site KV tensors (the bug this
    # pins); the halo form must not contain ANY all-gather
    assert any(op.startswith("all-gather") for op, _, _ in dense), (
        "expected the GSPMD index-gather baseline to all-gather; "
        "if this starts failing, GSPMD learned the halo trick — re-measure"
    )
    halo_ag = [l for op, _, l in halo if op.startswith("all-gather")]
    assert not halo_ag, f"halo form still all-gathers: {halo_ag[:3]}"
    assert any(op.startswith("collective-permute") for op, _, _ in halo), (
        "expected a collective-permute boundary-frame exchange"
    )

    # every halo collective is at most ONE frame of the largest KV site:
    # f32[B, 1 frame, 256 tokens, 32ch] (plus layout slack)
    one_frame = 1 * 1 * 16 * 16 * 32 * 4
    oversized = [(op, b) for op, b, _ in halo if b > 2 * one_frame]
    assert not oversized, f"halo collective larger than one frame: {oversized}"

    # comm-volume headline (recorded in PARITY.md). Strictly less in total;
    # at the attention sites themselves the dense form moves the full KV
    # (F frames) where the halo form moves 2 frames. The totals are closer
    # than that ratio because both variants share the temporal-conv halo
    # permutes, which dominate the residual traffic.
    assert halo_total < dense_total, (halo_total, dense_total)
    attn_dense = sum(b for op, b, l in dense if "attn" in l and op.startswith("all-gather"))
    attn_halo = sum(b for op, b, l in halo if "attn" in l or "shard_map" in l)
    assert attn_halo * 2 <= attn_dense, (attn_halo, attn_dense)
    print(
        f"per-forward collective bytes: halo={halo_total} dense={dense_total} "
        f"attn-sites halo={attn_halo} dense={attn_dense}"
    )
