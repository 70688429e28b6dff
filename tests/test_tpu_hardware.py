"""Hardware-marked tests: run ONLY on a real TPU chip.

The main suite forces the CPU backend (conftest.py), where the Pallas kernels
run in XLA-fallback or interpret mode — so kernel + training viability on the
actual chip needs its own gate. Run with:

    FZ_TPU_TESTS=1 JAX_COMPILATION_CACHE_DIR=.jax_cache \
        python -m pytest tests/test_tpu_hardware.py -q -p no:cacheprovider

(conftest still pins the CPU platform for the rest of the suite; this module
re-points at TPU via a subprocess so backend init flags don't collide.)
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("FZ_TPU_TESTS"), reason="set FZ_TPU_TESTS=1 on a TPU host"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(code: str, timeout: int = 1800) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin pick the chip
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    return out.stdout


def test_flash_attention_grad_on_chip():
    """jax.grad through fused_attention at >=256-token shapes on the TPU —
    the exact failure mode of round 1 (VERDICT.md What's-missing #1)."""
    out = _run_on_tpu(
        """
import jax, jax.numpy as jnp
from fatezero_tpu.ops.flash_attention import fused_attention, xla_attention
assert jax.default_backend() == "tpu"
q = jax.random.normal(jax.random.PRNGKey(0), (4, 1024, 40), jnp.float32)
scale = 40 ** -0.5
loss = lambda att: (lambda q: jnp.sum(jnp.sin(att(q, q, q, scale))))
gf = jax.jit(jax.grad(loss(fused_attention)))(q)
gx = jax.jit(jax.grad(loss(xla_attention)))(q)
# relative tolerance: on-chip fp32 matmuls run as bf16 multi-pass on the MXU
# (default precision), so the two implementations differ by blocking order
rel = float(jnp.max(jnp.abs(gf - gx)) / jnp.max(jnp.abs(gx)))
assert rel < 2e-2, rel
print("GRAD_OK", rel)
"""
    )
    assert "GRAD_OK" in out


def test_sharded_flash_on_chip():
    """The flash kernel runs INSIDE shard_map under a mesh on the real chip at
    the full SD 64^2 self-attention shape (VERDICT r4 #1): the compiled HLO
    contains the Mosaic custom-call and no materialized [.., 4096, 8192]
    score tensor. One chip = a (1,1,1) mesh; the multi-device sharding
    structure is pinned on the virtual CPU mesh (test_sharded_pipeline)."""
    out = _run_on_tpu(
        """
import jax, jax.numpy as jnp
from fatezero_tpu.parallel.sharding import make_mesh, seq_mesh_scope
from fatezero_tpu.ops.flash_attention import fused_attention, xla_attention
assert jax.default_backend() == "tpu"
mesh = make_mesh(jax.devices()[:1], (1, 1, 1))
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (2, 8, 8, 4096, 40), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 8192, 40), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(key, 2), (2, 8, 8, 8192, 40), jnp.bfloat16)
with seq_mesh_scope(mesh):
    fn = jax.jit(lambda q, k, v: fused_attention(q, k, v, 40 ** -0.5))
    hlo = fn.lower(q, k, v).compile().as_text()
    o = fn(q, k, v)
    o.block_until_ready()
assert "tpu_custom_call" in hlo, "no Mosaic kernel in the mesh-traced HLO"
assert "4096,8192" not in hlo, "score tensor materialized under the mesh"
ref = xla_attention(q[:, :2], k[:, :2], v[:, :2], 40 ** -0.5)
err = float(jnp.max(jnp.abs(o[:, :2].astype(jnp.float32) - ref.astype(jnp.float32))))
assert err < 2e-2, err
print("SHARDED_FLASH_OK", err)
"""
    )
    assert "SHARDED_FLASH_OK" in out


def test_tuning_step_on_chip():
    """One real DDPMTrainer.step at the full 512^2 x 8-frame tuning workload
    (remat + LoRA-160 + flash backward) completes within chip HBM."""
    out = _run_on_tpu(
        f"import runpy; runpy.run_path({os.path.join(REPO, 'scripts', 'tpu_tuning_step.py')!r}, run_name='__main__')",
        timeout=2400,
    )
    assert "TPU TUNING STEP OK" in out
