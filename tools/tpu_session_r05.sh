#!/bin/bash
# Round-5 TPU measurement queue. Run: bash tools/tpu_session_r05.sh
# Each step is independently resumable; artifacts land in repo root /
# BENCH_*_r05.json, stderr logs under /tmp/r05_*.log.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax; print(len(jax.devices()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

echo "== 1. batched-loop validation at the 5nm production deck =="
timeout 5400 python tools/validate_batched.py --deck 5nm --steps 200 \
  2>/tmp/r05_validate5nm.log

echo "== 2. low-bias I-V operator-invariance table =="
timeout 5400 python tools/probe_lowbias_iv.py \
  2>/tmp/r05_lowbias.log | tee /tmp/r05_lowbias.json

echo "== 3. f64 full-physics at Vd=8 (W_ct integral speedups A/B) =="
timeout 3600 python tools/probe_full_physics_5nm.py --vd 8 \
  2>/tmp/r05_fp_vd8.log | tee /tmp/r05_fp_vd8_f64.json
timeout 3600 python tools/probe_full_physics_5nm.py --vd 8 --wkb-f32 \
  2>>/tmp/r05_fp_vd8.log | tee /tmp/r05_fp_vd8_f32.json

echo "== 4. crossbar: k-extrap A/B at the r05 configuration =="
timeout 5400 python tools/bench_crossbar.py 104 6 --batched=64 \
  --mass-eps=0.1 --clock-f32 --pair-f32 --k-extrap=1.0 \
  2>/tmp/r05_crossbar_kextrap.log | tee BENCH_crossbar_kextrap_r05.json

echo "== 5. headline =="
timeout 3600 python bench.py | tee BENCH_headline_r05.json

echo "== done — update PERF_NOTES with the numbers =="
