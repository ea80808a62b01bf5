"""Per-module timing of the crossbar superstep at scale.

The full-40nm r03 superstep is ~10.5 s with the event loop down to ~1 s
(BENCH_crossbar_full40nm_r03): the FIELDS pass dominates. This probe
attributes it with the phase-split executables (superstep_timed:
charge / boundary-K CG / pairwise+rates) plus the serial event loop.
Forced-pull brackets (pull_sync) per phase — block_until_ready returns
early on remote buffers.

    python tools/probe_crossbar_timing.py [n_yz] [n_steps]
"""

import os
import sys
import time


def main():
    n_yz = int(sys.argv[1]) if len(sys.argv) > 1 else 215
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".cache", "jaxcache")
    )

    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state

    t0 = time.perf_counter()
    p, lat = build_grid_crossbar(
        n_yz=n_yz, contact_slices=10, oxide_slices=22, ti_slices=8,
        defect_fraction=0.1, vacancy_concentration=0.05, seed=0,
        cache_dir=os.path.join(here, ".cache"),
    )
    print(f"[build] {time.perf_counter()-t0:.1f}s N={lat.N}", file=sys.stderr)
    t0 = time.perf_counter()
    model = VCMModel(
        p, lat, rate_normalize=True, pair_f32="--pair-f32" in sys.argv
    )
    print(f"[model] {time.perf_counter()-t0:.1f}s "
          f"qmax={model.qmax} cand_cap={model.pair_cand_cap} "
          f"pair_f32={model.pair_f32}",
          file=sys.stderr)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = 15.0

    # one plain warm-up superstep (compile + cold CG off the probe)
    t0 = time.perf_counter()
    state, stats = model.superstep(state, Vd, stream)
    print(f"[warm] {time.perf_counter()-t0:.1f}s events={stats['n_events']}",
          file=sys.stderr)

    for i in range(n_steps):
        t0 = time.perf_counter()
        state, stats = model.superstep_timed(state, Vd, stream)
        dt = time.perf_counter() - t0
        print(
            f"[step {i}] total={dt:.2f}s "
            + " ".join(
                f"{k}={v:.3f}" for k, v in stats.items() if k.startswith("t_")
            )
            + f" events={stats['n_events']} cg={stats['cg_iterations']}"
        )


if __name__ == "__main__":
    main()
