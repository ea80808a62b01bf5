"""Per-phase wall-clock attribution for the 5 nm superstep on the attached
device: times the fields executable (charge + K CG + pairwise + rate build),
the event-loop executable, and the fused superstep, each warm, with inputs
varied per call (the runtime result-caches identical (executable, args)
pairs — PERF_NOTES).

    python tools/probe_5nm.py [reps]
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import numpy as np

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    REF = "/root/reference/structures/5nm_device"
    p = KMCParameters.from_file(os.path.join(REF, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(here, ".cache"))
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = p.V_switch[0]

    # steady state: run a few supersteps first (also compiles _step_jit)
    t0 = time.perf_counter()
    for i in range(3):
        state, stats = model.superstep(state, Vd, stream)
        print(f"[warm {i}] events={stats['n_events']} cg={stats['cg_iterations']}",
              file=sys.stderr)
    print(f"[warmup] {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def timed(label, fn, n=reps):
        from akmc_tpu.runtime.profiling import pull_sync

        ts = []
        out = None
        for i in range(n):
            t0 = time.perf_counter()
            out = pull_sync(fn(i))
            ts.append(time.perf_counter() - t0)
        print(f"{label:28s} median {float(np.median(ts))*1e3:8.2f} ms  "
              f"min {min(ts)*1e3:8.2f} ms", file=sys.stderr)
        return out

    t = model.tables
    # fields only (vary Vd in the last ulp to defeat the result cache)
    timed("fields (chg+CG+pair+rates)", lambda i: model._fields_jit(
        t, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg, Vd + i * 1e-12))

    fr = model._run_fields(state, Vd)
    rb = [jax.numpy.asarray(stream.peek(8192)) for _ in range(reps)]
    timed("event loop", lambda i: model._events_jit(
        t, state.element, fr.charge, fr.P, fr.etype, rb[i],
        jax.numpy.asarray(0.0, jax.numpy.float64)))

    timed("fused superstep", lambda i: model._step_jit(
        t, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg, Vd + i * 1e-12,
        rb[i]))

    # CG cost isolated: boundary solve alone
    from akmc_tpu.ops.charge import update_charge_compact
    charge_jit = jax.jit(lambda el, ch: update_charge_compact(
        el, ch, t.neigh_idx, t.any_metal_nbr, model.vmax))
    ch = jax.block_until_ready(charge_jit(state.element, state.charge))
    timed("charge update", lambda i: charge_jit(state.element, state.charge))

    # pass tables/operator as ARGUMENTS: closed-over big arrays get baked
    # into the serialized compile request (HTTP 413 through the tunnel) and
    # run ~600x slower per call (PERF_NOTES)
    bnd_jit = jax.jit(lambda tt, kop, el, ch, pb, vd: model._solve_boundary(
        kop, tt, el, ch, pb, vd))
    jax.block_until_ready(bnd_jit(
        t, model.kop, state.element, ch, state.potential_boundary, Vd))
    pot, cg = timed("K boundary solve", lambda i: bnd_jit(
        t, model.kop, state.element, ch, state.potential_boundary, Vd + i * 1e-12))
    print(f"  (cg_iterations warm = {int(cg.iterations)})", file=sys.stderr)

    from akmc_tpu.ops.pairwise import pairwise_potential
    pair_jit = jax.jit(lambda pos, ch: pairwise_potential(
        pos, ch, p.cutoff_radius, p.sigma, p.k, qmax=model.qmax))
    jax.block_until_ready(pair_jit(t.pos, ch))
    timed("pairwise potential", lambda i: pair_jit(t.pos + i * 1e-18, ch))

    from akmc_tpu.ops.events import build_event_table
    rates_jit = jax.jit(lambda tt, el, ch, pot, tbg: build_event_table(
        el, ch, pot, tbg, tt.act_neigh, tt.act_self2, tt.act_layer,
        tt.E_gen, tt.E_rec, tt.E_Vdiff, tt.E_Odiff,
        p.freq, p.sigma, p.k, rows=tt.act_idx))
    ps = fr.potential_sum
    jax.block_until_ready(rates_jit(t, state.element, ch, ps, state.T_bg))
    timed("rate-table build", lambda i: rates_jit(
        t, state.element, ch, ps + i * 1e-18, state.T_bg))


if __name__ == "__main__":
    main()
