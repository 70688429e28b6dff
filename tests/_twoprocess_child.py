"""Child process for tests/test_multiprocess.py: 2-process CPU bring-up.

Each process reaches jax.distributed.initialize through mesh_from_config's
env-var path (the accelerate-launch replacement, reference
test_fatezero.py:69-72), builds a (1, 4, 1) mesh over 2 processes x 2 local
CPU devices, and runs one seq-sharded sparse-causal gather + reduction —
ppermute/psum crossing the process boundary.
"""
import os
import sys

# must precede any jax import/backend init
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    from fatezero_tpu.ops.video_ops import gather_sparse_kv
    from fatezero_tpu.parallel.sharding import mesh_from_config, seq_mesh_scope

    # mesh_from_config -> maybe_initialize_distributed (env-var path)
    mesh = mesh_from_config({"mesh": "1,4,1"})
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    B, F, S, C = 1, 4, 8, 4
    sh = NamedSharding(mesh, P(None, "seq"))
    full = np.arange(B * F * S * C, dtype=np.float32).reshape(B, F, S, C)
    kv = jax.make_array_from_callback(full.shape, sh, lambda idx: full[idx])

    with seq_mesh_scope(mesh):
        out = jax.jit(
            lambda x: gather_sparse_kv(x, (-1, "first"), F).sum(),
            out_shardings=NamedSharding(mesh, P()),
        )(kv)
    expected = float(
        np.concatenate(
            [full[:, [0, 0, 1, 2]], full[:, [0, 0, 0, 0]]], axis=2
        ).sum()
    )
    got = float(out)
    assert abs(got - expected) < 1e-3, (got, expected)
    print(f"RESULT process={jax.process_index()} sum={got}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
