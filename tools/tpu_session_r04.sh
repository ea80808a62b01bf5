#!/bin/bash
# Round-4 TPU measurement queue (PERF_NOTES "Round 4: TPU work queue").
# Run when the axon tunnel is back: bash tools/tpu_session_r04.sh
# Each step is independently resumable; artifacts land in repo root /
# BENCH_*_r04.json and stderr logs under /tmp/r04_*.log.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax; print(len(jax.devices()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

echo "== 1. headline 5nm bench =="
timeout 3600 python bench.py | tee BENCH_headline_r04.json

echo "== 2. crossbar full-scale batched + pair-f32 =="
timeout 5400 python tools/bench_crossbar.py 215 4 --batched=64 --mass-eps=0.03 --pair-f32 \
  2>/tmp/r04_crossbar_pairf32.log | tee BENCH_crossbar_pairf32_r04.json

echo "== 3a. DIA A/B: stacked =="
timeout 5400 python tools/bench_crossbar.py 215 4 --batched=64 --mass-eps=0.03 --pair-f32 --dia-stacked \
  2>/tmp/r04_crossbar_stacked.log | tee BENCH_crossbar_stacked_r04.json

echo "== 3b. DIA A/B: pallas =="
timeout 5400 python tools/bench_crossbar.py 215 4 --batched=64 --mass-eps=0.03 --pair-f32 --dia-pallas \
  2>/tmp/r04_crossbar_pallas.log | tee BENCH_crossbar_pallas_r04.json

echo "== 4. T-scale full physics (f64 then wkb-f32 A/B) =="
timeout 5400 python tools/bench_T_scale.py --steps 3 \
  2>/tmp/r04_T.log | tee BENCH_T_r04.json
timeout 5400 python tools/bench_T_scale.py --steps 3 --wkb-f32 \
  2>/tmp/r04_T_f32.log | tee BENCH_T_wkbf32_r04.json

echo "== 5. full-physics 5nm attribution (f64 vs wkb-f32 A/B) =="
timeout 3600 python tools/probe_full_physics_5nm.py \
  2>/tmp/r04_fp5nm.log | tee /tmp/r04_fp5nm_f64.json
timeout 3600 python tools/probe_full_physics_5nm.py --wkb-f32 \
  2>>/tmp/r04_fp5nm.log | tee /tmp/r04_fp5nm_f32.json

echo "== done — update PERF_NOTES with the numbers =="
