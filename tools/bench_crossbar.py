"""Crossbar-scale superstep benchmark: the reference's flagship 40 nm
workload class (structures/40nm_crossbar/parameters.txt: potential-only,
V=15, perturb_structure=1 — the structure files are stripped from the
snapshot, so the grid-native generator supplies the lattice).

Runs a multi-superstep potential-only bias sweep at the requested scale on
the attached device and reports s/superstep.

    python tools/bench_crossbar.py [n_yz] [n_steps]

n_yz=64 -> N = 409,600 slots (incl. null placeholders; ~215k physical
sites); n_yz=112 -> N = 1,254,400 slots (~660k physical sites). The K
solve uses the gather-free DIA operator (solvers/dia.py) — the ELL/banded
formulations do not compile/fit at this scale.
"""

import json
import os
import sys
import time


def main():
    n_yz = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    inc_sel = "--inc-select" in sys.argv

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)

    import numpy as np

    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state

    # 40nm-deck proportions: 10 contact slices each side, oxide + Ti stack
    t0 = time.perf_counter()
    p, lat = build_grid_crossbar(
        n_yz=n_yz, contact_slices=10, oxide_slices=22, ti_slices=8,
        defect_fraction=0.1, vacancy_concentration=0.05, seed=0,
        cache_dir=os.path.join(here, ".cache"),
    )
    t_build = time.perf_counter() - t0
    print(f"[build] N={lat.N} slots in {t_build:.1f}s", file=sys.stderr)

    model = VCMModel(
        p, lat, rate_normalize=True, event_select_incremental=inc_sel,
        pair_f32="--pair-f32" in sys.argv,
        dia_stacked="--dia-stacked" in sys.argv,
        dia_pallas="--dia-pallas" in sys.argv,
    )
    # rate_normalize: this runtime's emulated f64 carries only the f32
    # exponent range; at Vd=15 absolute rates overflow it (PERF_NOTES)
    assert model.dia is not None, "crossbar must use the DIA operator"
    print(
        f"[dia] {len(model.dia_meta.offsets)} offset diagonals, "
        f"qmax={model.qmax} vmax={model.vmax}",
        file=sys.stderr,
    )
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = 15.0   # 40 nm deck bias
    batched = 0
    eps_list = [1e-3]
    clock_f32 = "--clock-f32" in sys.argv
    k_extrap = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--batched"):
            batched = int(a.split("=")[1]) if "=" in a else 64
        if a.startswith("--k-extrap"):
            k_extrap = float(a.split("=")[1]) if "=" in a else 1.0
        if a.startswith("--mass-eps"):
            # comma list sweeps several eps in ONE build+warmup (mass_eps is
            # a TRACED argument — same executable for every value)
            eps_list = [float(x) for x in a.split("=")[1].split(",")]
    mass_eps = eps_list[0]

    # AOT warmup: compile the fused step AND the event-loop re-entry
    # executable up front (the re-entry compile historically landed as a
    # surprise inside crossbar step 0 — BENCH_crossbar_full40nm_r02), so
    # the first superstep pays only the cold zero-guess CG. Persistent
    # cache makes later runs at this scale skip compiles entirely.
    t0 = time.perf_counter()
    compile_s = model.warmup(state, Vd, batched=batched,
                             batched_clock_f32=clock_f32)
    t_warm = time.perf_counter() - t0
    print(f"[warmup] {t_warm:.1f}s compiles: "
          + ", ".join(f"{k}={v:.0f}s" for k, v in compile_s.items()),
          file=sys.stderr)

    t0 = time.perf_counter()
    state, stats = model.superstep(state, Vd, stream)
    t_first = time.perf_counter() - t0
    print(
        f"[first superstep] {t_first:.1f}s (cold CG: "
        f"{stats['cg_iterations']} iters), events={stats['n_events']}",
        file=sys.stderr,
    )

    import jax as _jax

    key = _jax.random.PRNGKey(7)
    times = []
    steps = []
    eps_medians = {}
    pb_prev2 = None
    for mass_eps in eps_list:
        eps_times = []
        for i in range(n_steps):
            t0 = time.perf_counter()
            if batched:
                pb_before = state.potential_boundary
                state, stats, key = model.superstep_native_batched(
                    state, Vd, key, batch=batched, mass_eps=mass_eps,
                    clock_f32=clock_f32, pb_prev2=pb_prev2,
                    k_extrap=k_extrap,
                )
                pb_prev2 = pb_before
            else:
                state, stats = model.superstep(state, Vd, stream)
            dt = time.perf_counter() - t0
            eps_times.append(dt)
            assert stats["n_events"] >= 1, "rates died"
            steps.append({"step": i, "mass_eps": mass_eps,
                          "s": round(dt, 3),
                          "events": stats["n_events"],
                          "cg": stats["cg_iterations"],
                          **({"batches": stats["n_batches"],
                              "cut_conflict": stats["n_cut_conflict"],
                              "cut_mass": stats["n_cut_mass"]}
                             if batched else {})})
            print(f"[step {i} eps={mass_eps}] {steps[-1]}", file=sys.stderr)
        eps_medians[str(mass_eps)] = float(np.median(eps_times))
        times = eps_times   # headline value = LAST eps in the list

    print(
        json.dumps(
            {
                "metric": "crossbar_superstep_wall_clock",
                "n_slots": int(lat.N),
                "n_sites": int((np.asarray(lat.element0) != 9).sum()),
                "value": float(np.median(times)),
                "unit": "s",
                "event_loop": (
                    f"batched B={batched} mass_eps={mass_eps}"
                    if batched else "serial"
                ),
                "clock_f32": clock_f32,
                "k_extrap": k_extrap,
                **({"eps_medians": eps_medians} if len(eps_list) > 1 else {}),
                "pair_plane": "f32" if model.pair_f32 else "f64",
                "dia_matvec": (
                    "pallas" if getattr(model, "dia_plan", None) is not None
                    else ("stacked" if model.dia_stacked else "loop")
                ),
                "warmup_compile_s": round(t_warm, 1),
                "first_superstep_s": round(t_first, 1),
                "build_s": round(t_build, 1),
                "steps": steps,
            }
        )
    )


if __name__ == "__main__":
    main()
