"""Scan the batched event loop's mass_eps staleness bound at crossbar scale.

The 1.08M-slot bench measured ~1.1 events/batch at mass_eps=1e-3 — the
batch amortization the multi-event loop exists for never materialized.
Hypothesis: one event kills the rate mass of ~2+2*NN rows; at ~1e5+
active rows that alone is ~1e-3 of the total, so the killed-mass cut
fires after every single event and the loop degenerates to serial with a
heavier body. mass_eps is a traced argument, so the scan reuses ONE
compiled executable.

    python tools/probe_batched_eps.py [n_yz] [eps ...]
"""

import os
import sys
import time


def main():
    n_yz = int(sys.argv[1]) if len(sys.argv) > 1 else 104
    eps_list = [float(a) for a in sys.argv[2:]] or [1e-3, 1e-2, 3e-2, 1e-1]

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.state import make_device_state

    p, lat = build_grid_crossbar(
        n_yz=n_yz, contact_slices=10, oxide_slices=22, ti_slices=8,
        defect_fraction=0.1, vacancy_concentration=0.05, seed=0,
        cache_dir=os.path.join(here, ".cache"),
    )
    model = VCMModel(p, lat, rate_normalize=True)
    state0 = make_device_state(lat, p.background_temp)
    Vd = 15.0

    t0 = time.perf_counter()
    cs = model.warmup(state0, Vd, batched=64)
    print(f"[warmup] {time.perf_counter()-t0:.1f}s {cs}", file=sys.stderr)

    for eps in eps_list:
        key = jax.random.PRNGKey(7)
        state = state0
        # 2 supersteps per eps from the same initial state: step 0 pays the
        # cold zero-guess CG; step 1 is the comparable warm step
        for i in range(2):
            t0 = time.perf_counter()
            state, stats, key = model.superstep_native_batched(
                state, Vd, key, batch=64, mass_eps=eps
            )
            dt = time.perf_counter() - t0
            ev, nb = stats["n_events"], stats["n_batches"]
            print(
                f"eps={eps:g} step={i} s={dt:.2f} events={ev} batches={nb} "
                f"ev/batch={ev / max(nb, 1):.2f} "
                f"cut_conflict={stats['n_cut_conflict']} "
                f"cut_mass={stats['n_cut_mass']} cg={stats['cg_iterations']}"
            )


if __name__ == "__main__":
    main()
