"""Test harness: 8-device virtual CPU mesh (TPU-pod stand-in) + compile caches.

This sandbox has a single CPU core, so XLA compiles dominate test time.
Two mitigations, both safe for correctness:
  * JAX persistent compilation cache under .jax_cache/ (reruns are fast);
  * a disk params cache (tests/_param_cache) so flax `init` — hundreds of
    small per-param compiles — runs once per model config across runs.

Env mutation must precede jax backend init, hence the import-time code.
"""
import hashlib
import os
import pickle

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize registers the TPU plugin and overrides JAX_PLATFORMS
# from the environment, so the env var alone is not enough — force the CPU
# platform through jax.config before the backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

_PARAM_CACHE = os.path.join(os.path.dirname(__file__), "_param_cache")


def cached_init(model, *args, key=0, tag=""):
    """model.init with a disk cache keyed by (module repr, arg shapes, tag)."""
    os.makedirs(_PARAM_CACHE, exist_ok=True)
    spec = repr(model) + repr(jax.tree.map(lambda a: (a.shape, str(a.dtype)), args)) + str(key) + tag
    digest = hashlib.sha1(spec.encode()).hexdigest()[:16]
    path = os.path.join(_PARAM_CACHE, f"{digest}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    params = model.init(jax.random.PRNGKey(key), *args)
    params = jax.tree.map(lambda x: __import__("numpy").asarray(x), params)
    with open(path, "wb") as f:
        pickle.dump(params, f)
    return params


@pytest.fixture(scope="session")
def param_init():
    return cached_init
