#!/bin/bash
# Round-5 TPU measurement queue, part C (second-outage resume).
# Run ONE instance only: bash tools/tpu_session_r05c.sh
# Order = value/risk: headline first (derisk the round-end capture), then
# the f64 Vd=8 W_ct A/B (VERDICT item 4's Done-criterion), the two missing
# low-bias rows, and last the full-scale crossbar k-extrap A/B (longest).
set -u
cd "$(dirname "$0")/.."

if [ -f /tmp/r05c.lock ]; then
  echo "part-C already running (rm /tmp/r05c.lock to override)" >&2
  exit 1
fi
echo $$ > /tmp/r05c.lock
trap 'rm -f /tmp/r05c.lock' EXIT

probe() {
  timeout 120 python -c "import jax, jax.numpy as j; float(j.sum(j.arange(8.0)))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

echo "== 1. headline =="
timeout 3600 python bench.py | tee BENCH_headline_r05.json

echo "== 2. f64 full-physics at Vd=8 (W_ct integral speedups A/B) =="
timeout 3600 python tools/probe_full_physics_5nm.py --vd 8 \
  2>/tmp/r05c_fp_vd8.log | tee /tmp/r05c_fp_vd8_f64.json

echo "== 3a. low-bias: missing Vd=1 f32 gather 1e-4 row =="
timeout 1800 python tools/probe_lowbias_iv.py --vds 1 --planes f32 \
  --ops gather --scales 1e-4 2>>/tmp/r05c_lowbias.log >/dev/null
echo "== 3b. low-bias: missing Vd=2 pert gather 1e-4 row =="
timeout 1800 python tools/probe_lowbias_iv.py --vds 2 --planes pert \
  --ops gather --scales 1e-4 2>>/tmp/r05c_lowbias.log >/dev/null

echo "== 4. crossbar k-extrap A/B at the FULL 40nm scale (n_yz=215) =="
timeout 5400 python tools/bench_crossbar.py 215 6 --batched=64 \
  --mass-eps=0.1 --clock-f32 --pair-f32 --k-extrap=1.0 \
  2>/tmp/r05c_crossbar_kextrap.log | tee BENCH_crossbar_kextrap_r05.json

echo "== 5. crossbar B=128 + k-extrap (batch-count halving A/B) =="
timeout 5400 python tools/bench_crossbar.py 215 6 --batched=128 \
  --mass-eps=0.1 --clock-f32 --pair-f32 --k-extrap=1.0 \
  2>/tmp/r05c_crossbar_b128.log | tee BENCH_crossbar_b128_r05.json

echo "== queue C done =="
