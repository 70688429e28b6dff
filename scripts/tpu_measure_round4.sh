#!/bin/bash
# One-shot round-4 measurement sequence (run when the TPU is reachable).
# Serializes everything (1-core sandbox, remote-compile relay).
# Results land in bench_artifacts/ and are committed with PARITY.md updates.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p bench_artifacts

echo "=== headline bench (stored path; includes viz-on product-default row) ==="
timeout 4200 python bench.py 2>bench_artifacts/r4_bench_err.log | tee bench_artifacts/r4_bench.json

echo "=== replay-variant bench (for the PARITY comparison row) ==="
BENCH_REPLAY=1 BENCH_VIZ=0 timeout 4200 python bench.py 2>bench_artifacts/r4_replay_err.log | tee bench_artifacts/r4_replay.json

echo "=== streaming-store bench, 10 steps (VERDICT r2/r3 stream row) ==="
BENCH_MODE=stream BENCH_STEPS=10 timeout 4200 python bench.py 2>bench_artifacts/r4_stream_err.log | tee bench_artifacts/r4_stream.json

echo "=== HBM-fallback stress: 16 frames must trip stored->replay fallback ==="
BENCH_FRAMES=16 BENCH_VIZ=0 timeout 5400 python bench.py 2>bench_artifacts/r4_f16_err.log | tee bench_artifacts/r4_f16.json

echo "=== per-op profile: stored edit scan ==="
PROFILE_MODE=stored PROFILE_STEPS=3 PROFILE_DIR=/tmp/fz_prof_edit \
  timeout 3000 python scripts/profile_edit_step.py 2>bench_artifacts/r4_prof_edit_err.log | tee bench_artifacts/r4_prof_edit.txt

echo "=== per-op profile: capture inversion scan ==="
PROFILE_MODE=invert_capture PROFILE_STEPS=3 PROFILE_DIR=/tmp/fz_prof_inv \
  timeout 3000 python scripts/profile_edit_step.py 2>bench_artifacts/r4_prof_inv_err.log | tee bench_artifacts/r4_prof_inv.txt

echo "=== install smoke incl. Pallas grad probe on chip ==="
timeout 1800 python test_install.py 2>&1 | tail -6
echo "ALL MEASUREMENTS DONE"
