"""Event-side ablation of the 5 nm carried-residual superstep (round 3).

tools/probe_kcarry_ablate.py pins the fields path at ~9.5 ms/step (K solve
~8.4 of it); bench.py reads 18.7 ms — so ~8 ms/step sits in the event side:
_loop_arrays, run_event_loop (setup + 1-3 iterations at steady state),
_pack_diag, the rand-window slice and the overflow flags.  This ladder
slices it with k-batched scans mirroring _step_multi exactly:

  E0  full step (fields + loop_arrays + event loop + diag pack)  ~ bench
  E1  E0 minus _pack_diag
  E2  E0 with a 1-draw rand window: the while cond is False on entry, so
      the loop body runs ZERO iterations — setup/unpack cost only
  E3  no event loop at all (fields + loop_arrays + diag)

  E0-E1 = diag pack; E0-E2 ~ executed iterations (1-3 events/step);
  E2-E3 = loop setup (R0 row-sum, code pack/unpack, cond);
  E3 - 9.5 (fields ladder V0) = _loop_arrays.

    python tools/probe_events_5nm.py [k] [reps]
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    chunk = 2048
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.ops.events import run_event_loop, EventLoopResult
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    REF = "/root/reference/structures/5nm_device"
    p = KMCParameters.from_file(os.path.join(REF, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF, "reordered_device_5.xyz"))
    e = make_substoichiometric(
        e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed)
    )
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(here, ".cache"))
    model = VCMModel(p, lat, k_carry_residual=True)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = p.V_switch[0]

    state, _ = model.superstep_multi(state, Vd, stream, k=8)

    def variant(mode):
        def run(t, kop, element, charge, pb, T_bg, rand_buf):
            def step_once(element, charge, pb, cursor, kc_mode):
                fr = model._fields(t, kop, element, charge, pb, T_bg, Vd,
                                   k_carry=kc_mode)
                P, etype, neigh, zrows = model._loop_arrays(t, fr.P, fr.etype)
                if mode == "noloop":
                    res = EventLoopResult(
                        element=element, charge=fr.charge, P=P,
                        event_time=jnp.asarray(1e9, P.dtype),
                        n_events=jnp.asarray(0, jnp.int32),
                        draws_used=jnp.asarray(0, jnp.int32),
                        done=jnp.asarray(True),
                    )
                else:
                    win = (1,) if mode == "noloop0" else (chunk,)
                    window = jax.lax.dynamic_slice(rand_buf, (cursor,), win)
                    res = run_event_loop(
                        element, fr.charge, P, etype, neigh, window,
                        p.freq, act_idx=t.act_idx, abs2act=t.abs2act,
                        ln_S=fr.ln_S, zero_rows=zrows,
                    )
                return fr, res

            fr, res = step_once(element, charge, pb,
                                jnp.asarray(0, jnp.int32), "init")
            if mode == "nodiag":
                diag0 = jnp.zeros(3)
            else:
                diag0 = model._pack_diag(fr, res)

            def body(carry, _):
                element, charge, pb, cursor, kc = carry
                fr, res = step_once(element, charge, pb, cursor, kc)
                carry = (res.element, res.charge, fr.potential_boundary,
                         cursor + res.draws_used, fr.k_carry)
                if mode == "nodiag":
                    d = jnp.stack([
                        res.n_events.astype(jnp.float64),
                        res.event_time,
                        fr.cg_iterations.astype(jnp.float64),
                    ])
                else:
                    d = model._pack_diag(fr, res)
                return carry, d

            init = (res.element, res.charge, fr.potential_boundary,
                    res.draws_used, fr.k_carry)
            out, diag = jax.lax.scan(body, init, None, length=k - 1)
            return out[0], out[2], diag

        opts = (
            {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
            if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            else {}
        )
        return jax.jit(run, **opts)

    rng = np.random.default_rng(3)

    def timeit(fn, label):
        times = []
        ev = 0
        for r in range(reps + 1):
            buf = jnp.asarray(rng.random(k * chunk))
            t0 = time.perf_counter()
            el2, pb2, diag = fn(model.tables, model.kop, state.element,
                                state.charge, state.potential_boundary,
                                state.T_bg, buf)
            _ = float(jnp.sum(pb2)) + int(jnp.sum(el2))
            dt = (time.perf_counter() - t0) / k
            if r:
                times.append(dt)
            ev = float(jnp.sum(diag[:, 0]))
        med = float(np.median(times))
        print(f"{label:22s} median {med*1e3:8.2f} ms/step "
              f"min {min(times)*1e3:8.2f}  events/batch={ev:.0f}",
              flush=True)
        return med

    t0 = time.time()
    res = {}
    for name in ("full", "nodiag", "noloop0", "noloop"):
        res[name] = timeit(variant(name), f"step [{name}]")
    print(f"[total {time.time()-t0:.0f}s]")
    print(f"diag pack        (E0-E1): {(res['full']-res['nodiag'])*1e3:7.2f} ms")
    print(f"loop iterations  (E0-E2): {(res['full']-res['noloop0'])*1e3:7.2f} ms")
    print(f"loop setup       (E2-E3): {(res['noloop0']-res['noloop'])*1e3:7.2f} ms")
    print(f"fields+loop_arrays (E3) : {res['noloop']*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
