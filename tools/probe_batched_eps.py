"""Scan + validate the batched event loop's mass_eps staleness bound at
crossbar scale (VERDICT r4 item 6: the production recommendation of 0.03
was extrapolated from a 384-site toy — check it at >=0.5M sites).

For each eps, runs N supersteps from the SAME initial state and records the
per-step event counts, the kmc-time trajectory, and the vacancy-population
trajectory (count + mean filament depth). eps values are exchangeable iff
these statistics agree within their own stochastic spread (different eps =
different threefry acceptance pattern, so trajectories differ sample-wise
by construction; the law is what must match — the toy-scale KS law test is
tests/test_batched_distribution.py).

mass_eps is a traced argument, so the scan reuses ONE compiled executable.

    python tools/probe_batched_eps.py [n_yz] [eps ...] [--steps N]
                                      [--clock-f32] [--out FILE]
Reference law being approximated: kmc_events.cu:448-516.
"""

import json
import os
import sys
import time


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_yz = int(pos[0]) if len(pos) > 0 else 104
    eps_list = [float(a) for a in pos[1:]] or [1e-3, 3e-2, 1e-1, 3e-1]
    steps = 10
    out_file = None
    clock_f32 = "--clock-f32" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps = int(a.split("=")[1])
        if a.startswith("--out="):
            out_file = a.split("=", 1)[1]

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import numpy as np

    from akmc_tpu.lattice import ELEM
    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.state import make_device_state

    p, lat = build_grid_crossbar(
        n_yz=n_yz, contact_slices=10, oxide_slices=22, ti_slices=8,
        defect_fraction=0.1, vacancy_concentration=0.05, seed=0,
        cache_dir=os.path.join(here, ".cache"),
    )
    model = VCMModel(p, lat, rate_normalize=True, pair_f32=True)
    state0 = make_device_state(lat, p.background_temp)
    Vd = 15.0
    xs = np.asarray(lat.x)

    t0 = time.perf_counter()
    cs = model.warmup(state0, Vd, batched=64, batched_clock_f32=clock_f32)
    print(f"[warmup] {time.perf_counter()-t0:.1f}s {cs}", file=sys.stderr)

    table = {}
    for eps in eps_list:
        key = jax.random.PRNGKey(7)
        state = state0
        rows = []
        for i in range(steps):
            t0 = time.perf_counter()
            state, stats, key = model.superstep_native_batched(
                state, Vd, key, batch=64, mass_eps=eps, clock_f32=clock_f32
            )
            dt = time.perf_counter() - t0
            el = np.asarray(state.element)
            vac = el == int(ELEM.VACANCY)
            rows.append({
                "step": i, "s": round(dt, 3),
                "events": stats["n_events"],
                "batches": stats["n_batches"],
                "kmc_time": float(state.kmc_time),
                "n_vac": int(vac.sum()),
                "vac_mean_x": round(float(xs[vac].mean()), 3),
                "cg": stats["cg_iterations"],
            })
            print(f"eps={eps:g} {rows[-1]}", file=sys.stderr)
        ev = np.array([r["events"] for r in rows], float)
        table[str(eps)] = {
            "rows": rows,
            "events_per_step_mean": round(float(ev.mean()), 1),
            "events_per_step_std": round(float(ev.std()), 1),
            "total_kmc_time": rows[-1]["kmc_time"],
            "final_n_vac": rows[-1]["n_vac"],
            "final_vac_mean_x": rows[-1]["vac_mean_x"],
            "median_s": round(float(np.median([r["s"] for r in rows])), 3),
        }

    result = {
        "metric": "batched_eps_crossbar_scan",
        "n_slots": int(lat.N),
        "clock_f32": clock_f32,
        "steps": steps,
        "batch": 64,
        "table": {k: {kk: vv for kk, vv in v.items() if kk != "rows"}
                  for k, v in table.items()},
        "detail": table,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "detail"}))
    if out_file:
        with open(out_file, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
