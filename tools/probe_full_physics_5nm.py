"""Attribute the full-physics superstep cost at 5 nm (VERDICT r3 item 6:
1.9-3.8 s warm, ~200x the potential-only superstep, unattributed).

Per-module forced-pull brackets (jax.profiler hangs through the tunnel):
fields pass alone, power-system build alone (the W_ct energy integral is
the suspect), power CG solve alone, then the fused full superstep for the
total. A/B with --wkb-f32 to measure the f32 WKB-plane lever.

    python tools/probe_full_physics_5nm.py [--wkb-f32] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
REF_5NM = "/root/reference/structures/5nm_device"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wkb-f32", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--vd", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(HERE, ".cache", "jaxcache")
    )
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.runtime.profiling import pull_sync
    from akmc_tpu.solvers.current import (
        _ct_loop_bound,
        build_power_system,
        solve_power,
    )
    from akmc_tpu.state import make_device_state, make_substoichiometric

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    p.solve_current = True
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(HERE, ".cache"))
    model = VCMModel(p, lat, wkb_f32=args.wkb_f32)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = args.vd
    state = model.update_cb_edge(state, Vd)
    ct = model.current_tables

    high_G = p.high_G * 100000
    loop_G = p.high_G * 10000000

    def bracket(fn, *a, reps=args.reps, vary=None):
        """vary(i) -> args for rep i. REQUIRED for correct timing: the
        runtime result-caches identical (executable, args) calls, so
        identical reps measure nothing (CLAUDE.md). Defaults to the
        given args (only valid when the caller varies state itself)."""
        out = fn(*a)       # compile + cold
        pull_sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for i in range(1, reps + 1):
            ai = vary(i) if vary is not None else a
            t0 = time.perf_counter()
            out = fn(*ai)
            pull_sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return out, float(np.median(ts))

    res = {"wkb_plane": "f32" if args.wkb_f32 else "f64", "Vd": Vd,
           "n_atom": model.n_atom, "vmax": model.vmax,
           "nc": int(ct.contact_idx.shape[0])}

    # 1. fields pass alone (vary the warm-start potential per rep)
    fields = jax.jit(model._fields)
    _, res["fields_s"] = bracket(
        fields, model.tables, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg, Vd,
        vary=lambda i: (
            model.tables, model.kop, state.element, state.charge,
            state.potential_boundary * (1.0 + 1e-12 * i), state.T_bg, Vd,
        ),
    )

    # 2. power-system build, split: W_ct integral loop bound + full build
    def _build(element, charge, cb):
        return build_power_system(
            ct, element[ct.atom_ind], charge[ct.atom_ind], cb[ct.atom_ind],
            jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), p.nn_dist,
            high_G, p.low_G, loop_G, p.q * 0.01, p.m_e, p.V0,
            vmax=model.vmax, ne_max=model.ne_max, wkb_f32=args.wkb_f32,
        )

    ps, res["power_build_s"] = bracket(
        jax.jit(_build), state.element, state.charge, state.cb_edge,
        vary=lambda i: (
            state.element, state.charge, state.cb_edge * (1.0 + 1e-12 * i)
        ),
    )

    # 2b. the W_ct integral alone (same shapes as inside the build)
    def _wct_only(element, charge, cb):
        full = _build(element, charge, cb)
        return full.W_ct

    _, res["power_build_wct_probe_s"] = bracket(
        jax.jit(_wct_only), state.element, state.charge, state.cb_edge,
        vary=lambda i: (
            state.element, state.charge, state.cb_edge * (1.0 + 1e-12 * i)
        ),
    )

    # 3. power CG solve alone (warm-started like production)
    m0 = jnp.zeros(model.n_atom + 2, jnp.float64)
    solve = jax.jit(
        lambda ps_, m_: solve_power(
            ct, ps_, Vd, high_G, loop_G, 2 * 3.8612e-5 * 1e-5, 1.0, m_,
            state.element[ct.atom_ind],
        )
    )
    (I, _, m, iters), res["power_solve_cold_s"] = bracket(
        solve, ps, m0, reps=1,
        vary=lambda i: (ps, m0.at[0].set(1e-30 * i)),   # cold start, uncached
    )
    res["power_solve_cold_iters"] = int(iters)
    (_, _, m2, it2), res["power_solve_warm_s"] = bracket(
        solve, ps, m, vary=lambda i: (ps, m * (1.0 + 1e-12 * i))
    )
    res["power_solve_warm_iters"] = int(it2)
    res["I_macro_A"] = float(I)

    # 4. fused full superstep total
    m_warm = None
    state2, stats, m_warm = model.superstep_full(state, Vd, stream, m_prev=m_warm)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state2, stats, m_warm = model.superstep_full(
            state2, Vd, stream, m_prev=m_warm
        )
        ts.append(time.perf_counter() - t0)
    res["superstep_full_warm_s"] = float(np.median(ts))
    res["superstep_events"] = stats["n_events"]

    # 5. fields pass on the EVOLVED state (warm K start — bracket 1's
    # state.potential_boundary is all-zeros, so it times a ~350-iteration
    # cold solve, not the production fields cost)
    _, res["fields_warm_s"] = bracket(
        fields, model.tables, model.kop, state2.element, state2.charge,
        state2.potential_boundary, state2.T_bg, Vd,
        vary=lambda i: (
            model.tables, model.kop, state2.element, state2.charge,
            state2.potential_boundary * (1.0 + 1e-12 * i), state2.T_bg, Vd,
        ),
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
