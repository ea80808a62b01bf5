"""Differential per-phase attribution for the 5 nm superstep via ABLATED
k-batched executables: each variant runs k supersteps per dispatch (scan),
so the ~60-90 ms tunneled dispatch overhead amortizes to ~1.4 ms and the
phase cost is the DIFFERENCE of two batched medians — robust against the
session-to-session overhead drift that makes separate-dispatch probes
unusable (probe_5nm.py round-3 run: the same phases read 0-20 ms depending
on the minute).

Variants (fields-path scan, Vd perturbed per step by 1e-13 V to defeat
XLA loop-invariant hoisting of an otherwise event-free constant body):
  A  charge + K + pairwise + rates    (full fields path)
  B  A minus pairwise (pot_pair = 0)
  C  A minus K solve  (pot_b = pb_prev)
  D  A minus rate build (P = 0)
  A-B = pairwise, A-C = K solve, A-D = rate build,
  bench(full fused) - A = event loop + diag pack.

    python tools/probe_ablate_5nm.py [k] [reps]
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.ops.pairwise import pairwise_potential_table
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    REF = "/root/reference/structures/5nm_device"
    p = KMCParameters.from_file(os.path.join(REF, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF, "reordered_device_5.xyz"))
    e = make_substoichiometric(
        e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed)
    )
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(here, ".cache"))
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))

    # settle into steady state (and pay the cold CG) on the parity path
    state, _ = model.superstep_multi(state, p.V_switch[0], stream, k=8)

    from akmc_tpu.ops.charge import update_charge_compact
    from akmc_tpu.ops.events import build_event_table

    def fields_variant(skip):
        # ALL big arrays enter as jit ARGUMENTS (t, kop) — closed-over
        # arrays bake in as constants (6.3 GB captured + ~600x slower per
        # call through the tunnel, CLAUDE.md)
        def run(t, kop, element, charge, pb):
            def step(carry, i):
                element, charge, pb = carry
                Vd = p.V_switch[0] + i.astype(jnp.float64) * 1e-13
                charge = update_charge_compact(
                    element, charge, t.neigh_idx, t.any_metal_nbr, model.vmax
                )
                if skip == "K":
                    pot_b, cg_it = pb, jnp.asarray(0, jnp.int32)
                else:
                    pot_b, cg = model._solve_boundary(
                        kop, t, element, charge, pb, Vd
                    )
                    cg_it = cg.iterations
                if skip == "pair":
                    pot_pair = jnp.zeros_like(pot_b)
                else:
                    pot_pair, _ = pairwise_potential_table(
                        t.pair_gT, t.abs2act, charge, model.qmax
                    )
                pot_sum = pot_pair + pot_b
                if skip == "rates":
                    s = jnp.sum(pot_sum) * 1e-300
                else:
                    P, etype = build_event_table(
                        element, charge, pot_sum,
                        jnp.asarray(300.0, jnp.float64),
                        t.act_neigh, t.act_self2, t.act_layer,
                        t.E_gen, t.E_rec, t.E_Vdiff, t.E_Odiff,
                        p.freq, p.sigma, p.k, rows=t.act_idx,
                    )
                    s = jnp.sum(P) * 1e-300
                return (element, charge + (s != 0.0).astype(charge.dtype) * 0,
                        pot_b), cg_it

            (element, charge, pb), its = jax.lax.scan(
                step, (element, charge, pb), jnp.arange(k)
            )
            return charge, pb, its

        # the scan body's reduce-window lowering exceeds the default 16M
        # scoped-vmem budget on this TPU compiler (same fix as
        # VCMModel.superstep_multi)
        opts = (
            {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
            if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            else {}
        )
        return jax.jit(run, **opts)

    variants = {name: fields_variant(name) for name in
                ("none", "pair", "K", "rates")}

    def timeit(fn, label):
        times = []
        for r in range(reps + 1):
            el = state.element
            ch = state.charge
            pb = state.potential_boundary + r * 1e-15   # defeat result cache
            t0 = time.perf_counter()
            ch2, pb2, its = fn(model.tables, model.kop, el, ch, pb)
            _ = float(jnp.sum(ch2)) + float(jnp.sum(pb2))   # forced pull
            dt = (time.perf_counter() - t0) / k
            if r:                                            # drop warm-up
                times.append(dt)
        med = float(np.median(times))
        print(f"{label:34s} median {med*1e3:8.2f} ms/step "
              f"min {min(times)*1e3:8.2f}", flush=True)
        return med

    t0 = time.time()
    res = {}
    for name in ("none", "pair", "K", "rates"):
        res[name] = timeit(variants[name], f"fields minus {name}")
    print(f"[total {time.time()-t0:.0f}s]")
    print(f"pairwise  (A-B): {(res['none']-res['pair'])*1e3:7.2f} ms")
    print(f"K solve   (A-C): {(res['none']-res['K'])*1e3:7.2f} ms")
    print(f"rate build(A-D): {(res['none']-res['rates'])*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
