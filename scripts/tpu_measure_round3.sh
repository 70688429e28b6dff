#!/bin/bash
# One-shot round-3 measurement sequence (run when the TPU is reachable).
# Serializes everything (1-core sandbox, remote-compile relay).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== headline bench (stored path) ==="
timeout 4200 python bench.py 2>/tmp/m_bench_err.log | tee /tmp/m_bench.json

echo "=== replay-variant bench (for the PARITY comparison row) ==="
BENCH_REPLAY=1 timeout 4200 python bench.py 2>/tmp/m_replay_err.log | tee /tmp/m_replay.json

echo "=== streaming-store bench, 10 steps (VERDICT item 9) ==="
BENCH_MODE=stream BENCH_STEPS=10 timeout 4200 python bench.py 2>/tmp/m_stream_err.log | tee /tmp/m_stream.json

echo "=== per-op profile: stored edit scan ==="
PROFILE_MODE=stored PROFILE_STEPS=3 PROFILE_DIR=/tmp/fz_prof_edit \
  timeout 3000 python scripts/profile_edit_step.py 2>/tmp/m_prof_edit_err.log | tee /tmp/m_prof_edit.txt

echo "=== per-op profile: capture inversion scan ==="
PROFILE_MODE=invert_capture PROFILE_STEPS=3 PROFILE_DIR=/tmp/fz_prof_inv \
  timeout 3000 python scripts/profile_edit_step.py 2>/tmp/m_prof_inv_err.log | tee /tmp/m_prof_inv.txt

echo "=== install smoke incl. Pallas grad probe on chip ==="
timeout 1800 python test_install.py 2>&1 | tail -6
echo "ALL MEASUREMENTS DONE"
