#!/usr/bin/env python
"""Environment smoke test (reference test_install.py parity, TPU edition):
prints jax devices, runs one op on the accelerator, checks imports."""
import importlib

import jax
import jax.numpy as jnp


def main():
    print("jax", jax.__version__, "backend:", jax.default_backend())
    print("devices:", jax.devices())
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    y = (x @ x).block_until_ready()
    print("matmul ok:", y.shape, y.dtype)
    for mod in ("flax", "optax", "einops", "safetensors", "PIL", "cv2"):
        try:
            m = importlib.import_module(mod)
            print(f"{mod}: {getattr(m, '__version__', 'ok')}")
        except Exception as e:  # noqa: BLE001
            print(f"{mod}: MISSING ({e})")
    import fatezero_tpu  # noqa: F401

    from fatezero_tpu.ops.flash_attention import fused_attention

    q = jnp.ones((2, 128, 64))
    out = fused_attention(q, q, q, 0.125)
    print("fused attention ok:", out.shape, "pallas" if jax.default_backend() == "tpu" else "xla")

    # flash backward probe (custom VJP / Pallas dQ+dKV kernels on TPU):
    # grad parity against the explicit softmax formulation catches kernel
    # regressions without the opt-in FZ_TPU_TESTS suite
    key = jax.random.PRNGKey(0)
    qq, kk, vv = (
        jax.random.normal(jax.random.fold_in(key, i), (4, 256, 64), jnp.float32)
        for i in range(3)
    )

    def loss_fused(q, k, v):
        return fused_attention(q, k, v, 0.125).sum()

    def loss_ref(q, k, v):
        p = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * 0.125, axis=-1)
        return (p @ v).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(qq, kk, vv)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qq, kk, vv)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_fused, g_ref))
    assert err < 5e-2, f"flash backward deviates from reference grad: {err}"
    print(f"fused attention grad ok: max|dq,dk,dv diff|={err:.2e}")


if __name__ == "__main__":
    main()
