#!/bin/bash
# One-shot round-5 measurement sequence (run when the TPU is reachable).
# Serializes everything (1-core sandbox, remote-compile relay).
# Results land in bench_artifacts/ and are committed with PARITY.md updates.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p bench_artifacts

echo "=== headline bench (stored path; includes viz-on product-default row) ==="
timeout 4200 python bench.py 2>bench_artifacts/r5_bench_err.log | tee bench_artifacts/r5_bench.json

echo "=== 16-frame bench: hybrid trimmed capture must beat the r4 34.13s replay row ==="
BENCH_FRAMES=16 BENCH_VIZ=0 timeout 5400 python bench.py 2>bench_artifacts/r5_f16_err.log | tee bench_artifacts/r5_f16.json

echo "=== kernel-boundary probe: heads-mid 4-D kernel vs shipped fold (VERDICT r4 #3) ==="
timeout 3000 python scripts/bench_kernel_boundary.py 2>bench_artifacts/r5_boundary_err.log | tee bench_artifacts/r5_boundary.json

echo "=== on-chip hardware suite (sharded flash, tuning step, grad parity) ==="
FZ_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hardware.py -q -p no:cacheprovider 2>&1 | tail -4

echo "=== install smoke incl. Pallas grad probe on chip ==="
timeout 1800 python test_install.py 2>&1 | tail -6
echo "ALL MEASUREMENTS DONE"
