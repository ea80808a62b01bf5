"""Physics-level validation artifact for the batched event loop (VERDICT r3
item 4): serial vs batched trajectory overlays + a waiting-time KS table
across mass_eps in {1e-3, 3e-2, 3e-1}.

Produces artifacts/batched_validation.json and artifacts/batched_validation.png.

Usage:
    python tools/validate_batched.py [--cpu] [--steps 40] [--reps 512]
    python tools/validate_batched.py --deck 5nm --steps 200   # 5 nm overlay (TPU)

The suite version of the KS test (asserted thresholds) lives in
tests/test_batched_distribution.py; this tool records the full table
including the loose 3e-1 point and the trajectory overlays.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--deck", choices=["toy", "5nm"], default="toy")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--reps", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.cpu or args.deck == "toy":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(HERE, ".cache", "jaxcache")
    )
    import jax.numpy as jnp
    import numpy as np
    from scipy.stats import ks_2samp

    from akmc_tpu.lattice import ELEM
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.ops.events import run_event_loop_batched, run_event_loop_native
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    if args.deck == "5nm":
        from akmc_tpu.config import KMCParameters
        from akmc_tpu.lattice import build_lattice, read_xyz

        ref = "/root/reference/structures/5nm_device"
        p = KMCParameters.from_file(os.path.join(ref, "parameters.txt"))
        e, x, y, z = read_xyz(os.path.join(ref, "reordered_device_5.xyz"))
        e = make_substoichiometric(
            e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed)
        )
        lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(HERE, ".cache"))
        Vd = float(p.V_switch[0])
    else:
        from util_toy import toy_device

        p, lat = toy_device()
        e2 = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
        lat.element0[:] = e2
        Vd = 2.0

    # ---- 1. trajectory overlays: serial vs batched, matched deck ----------
    # ONE model shared by every trajectory (a fresh VCMModel per trajectory
    # device_puts a second copy of the static tables while the first is
    # still referenced by the previous closure — measured OOM on the 16 GB
    # chip at the 5 nm deck); state is rebuilt per trajectory.
    shared_model = VCMModel(p, lat)

    def run_traj(mode, mass_eps=1e-3, steps=args.steps, seed=42):
        model = shared_model
        state = make_device_state(lat, p.background_temp)
        key = jax.random.PRNGKey(seed)
        vac, times, events = [], [], []
        for _ in range(steps):
            if mode == "serial":
                state, stats, key = model.superstep_native(state, Vd, key)
            else:
                state, stats, key = model.superstep_native_batched(
                    state, Vd, key, batch=args.batch, mass_eps=mass_eps
                )
            el = np.asarray(state.element)
            vac.append(int((el == int(ELEM.VACANCY)).sum()))
            times.append(float(state.kmc_time))
            events.append(int(stats["n_events"]))
        return {"vacancies": vac, "kmc_time": times, "events": events}

    t0 = time.perf_counter()
    traj = {
        "serial": run_traj("serial"),
        "batched_1e-3": run_traj("batched", 1e-3),
        "batched_3e-2": run_traj("batched", 3e-2),
        "batched_3e-1": run_traj("batched", 3e-1),
    }
    traj_s = time.perf_counter() - t0
    print(f"trajectories done in {traj_s:.1f} s", file=sys.stderr)

    # persist the trajectory half IMMEDIATELY (the KS section compiles a
    # large vmapped program — a compile failure there must not lose the
    # 15+ min of trajectory data)
    os.makedirs(os.path.join(HERE, "artifacts"), exist_ok=True)
    jpath = os.path.join(HERE, "artifacts", f"batched_validation_{args.deck}.json")
    partial = {
        "deck": args.deck, "Vd": Vd, "steps": args.steps,
        "batch": args.batch, "ks": "pending",
        "final_vacancies": {k: v["vacancies"][-1] for k, v in traj.items()},
        "final_kmc_time": {k: v["kmc_time"][-1] for k, v in traj.items()},
        "total_events": {k: sum(v["events"]) for k, v in traj.items()},
        "traj": traj,
    }
    with open(jpath, "w") as f:
        json.dump(partial, f, indent=1)
    print(f"wrote {jpath} (trajectories; KS pending)", file=sys.stderr)

    # ---- 2. waiting-time KS table on a frozen fields state ----------------
    model = shared_model
    state = make_device_state(lat, p.background_temp)
    t = model.tables
    fr = jax.jit(model._fields)(
        t, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg, Vd,
    )
    P, etype, neigh, _ = model._loop_arrays(t, fr.P, fr.etype)
    freq = model.params.freq

    def sample(kind, mass_eps, seed):
        if kind == "serial":
            def one(key):
                r = run_event_loop_native(
                    state.element, fr.charge, P, etype, neigh, key, freq,
                    act_idx=t.act_idx, abs2act=t.abs2act, ln_S=fr.ln_S,
                )
                return r.event_time, r.n_events
        else:
            def one(key):
                r = run_event_loop_batched(
                    state.element, fr.charge, P, etype, neigh, key, freq,
                    batch=args.batch, act_idx=t.act_idx, abs2act=t.abs2act,
                    ln_S=fr.ln_S, mass_eps=mass_eps,
                )
                return r.event_time, r.n_events

        # chunked vmap: one vmap(reps) program over the full 5 nm event
        # loop exceeds the remote compiler's budget (tpu_compile_helper
        # exit 1 at reps=512, N=37,650) — 32-wide chunks compile and the
        # executable is reused across chunks
        chunk = min(32, args.reps)
        fn = jax.jit(jax.vmap(one))
        keys = jax.random.split(jax.random.PRNGKey(seed), args.reps)
        ts, cs = [], []
        for i in range(0, args.reps, chunk):
            t_i, c_i = fn(keys[i:i + chunk])
            ts.append(np.asarray(t_i))
            cs.append(np.asarray(c_i))
        return np.concatenate(ts), np.concatenate(cs)

    t_ser, c_ser = sample("serial", 0.0, 101)
    ks_table = {}
    for eps in (1e-3, 3e-2, 3e-1):
        t_b, c_b = sample("batched", eps, int(eps * 1e6) + 7)
        ks_table[f"{eps:g}"] = {
            "ks_D_waiting_time": float(ks_2samp(t_ser, t_b).statistic),
            "ks_p_waiting_time": float(ks_2samp(t_ser, t_b).pvalue),
            "ks_D_event_count": float(ks_2samp(c_ser, c_b).statistic),
            "mean_events_serial": float(c_ser.mean()),
            "mean_events_batched": float(c_b.mean()),
        }
        print(f"eps={eps:g}: {ks_table[f'{eps:g}']}", file=sys.stderr)

    out = {
        "deck": args.deck,
        "Vd": Vd,
        "steps": args.steps,
        "reps": args.reps,
        "batch": args.batch,
        "ks": ks_table,
        "final_vacancies": {k: v["vacancies"][-1] for k, v in traj.items()},
        "final_kmc_time": {k: v["kmc_time"][-1] for k, v in traj.items()},
        "total_events": {k: sum(v["events"]) for k, v in traj.items()},
        "traj": traj,
    }
    os.makedirs(os.path.join(HERE, "artifacts"), exist_ok=True)
    jpath = os.path.join(HERE, "artifacts", f"batched_validation_{args.deck}.json")
    with open(jpath, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {jpath}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for k, v in traj.items():
            axes[0].plot(v["kmc_time"], v["vacancies"], label=k)
            axes[1].plot(np.cumsum(v["events"]), v["kmc_time"], label=k)
        axes[0].set_xlabel("kmc time [s]")
        axes[0].set_ylabel("vacancy count")
        axes[0].set_xscale("log")
        axes[0].legend()
        axes[1].set_xlabel("cumulative events")
        axes[1].set_ylabel("kmc time [s]")
        axes[1].set_yscale("log")
        fig.suptitle(f"serial vs batched trajectories ({args.deck}, Vd={Vd})")
        fig.tight_layout()
        ppath = os.path.join(HERE, "artifacts", f"batched_validation_{args.deck}.png")
        fig.savefig(ppath, dpi=120)
        print(f"wrote {ppath}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
