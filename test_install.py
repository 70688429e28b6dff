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


if __name__ == "__main__":
    main()
