#!/bin/bash
# Round-5 TPU measurement queue, part B (post-outage resume).
# Run: bash tools/tpu_session_r05b.sh
# Each step is independently resumable; low-bias rows stream to stderr logs
# so a worker crash loses at most one row.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax; print(len(jax.devices()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

echo "== 1. f64 full-physics at Vd=8 (W_ct integral speedups A/B) =="
timeout 3600 python tools/probe_full_physics_5nm.py --vd 8 \
  2>/tmp/r05_fp_vd8.log | tee /tmp/r05_fp_vd8_f64.json
timeout 3600 python tools/probe_full_physics_5nm.py --vd 8 --wkb-f32 \
  2>>/tmp/r05_fp_vd8.log | tee /tmp/r05_fp_vd8_f32.json

echo "== 2a. low-bias: Vd=2 f32 rows (f64 rows already captured) =="
timeout 3600 python tools/probe_lowbias_iv.py --vds 2 --planes f32 \
  2>>/tmp/r05_lowbias_resume.log >/dev/null
echo "== 2b. low-bias: Vd=2 missing pert gather row =="
timeout 1200 python tools/probe_lowbias_iv.py --vds 2 --planes pert \
  --ops gather --scales 1e-4 \
  2>>/tmp/r05_lowbias_resume.log >/dev/null
echo "== 2c. low-bias: Vd=3 full =="
timeout 5400 python tools/probe_lowbias_iv.py --vds 3 \
  2>>/tmp/r05_lowbias_resume.log >/dev/null
echo "== 2d. low-bias: Vd=5 default-rtol sanity =="
timeout 1800 python tools/probe_lowbias_iv.py --vds 5 --planes f64,f32 \
  --scales 1 2>>/tmp/r05_lowbias_resume.log >/dev/null

echo "== 3. crossbar: k-extrap A/B at the r05 configuration =="
timeout 5400 python tools/bench_crossbar.py 104 6 --batched=64 \
  --mass-eps=0.1 --clock-f32 --pair-f32 --k-extrap=1.0 \
  2>/tmp/r05_crossbar_kextrap.log | tee BENCH_crossbar_kextrap_r05.json

echo "== 4. headline =="
timeout 3600 python bench.py | tee BENCH_headline_r05.json

echo "== queue B done =="
