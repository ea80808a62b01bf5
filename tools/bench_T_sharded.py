"""SHARDED f64 full-physics T system at the reference's distributed scale
— VERDICT r4 item 1 (the declared answer to the fused-f64 single-chip OOM).

The reference's flagship distributed artifact solves a 102,722-node
transmission system with a 14,854-site tunnel subblock MULTI-RANK on LUMI
(update_power_gpu_sparse_dist, current_solver_gpu.cu:1430-1855;
dist_iterative_test/main_test.cpp:46-52). The r04 single-chip measurement
showed the FUSED f64 program at that scale exceeds one chip's budget
(47.4 GB of (V,V) W-block footprint vs 15.75 GB HBM — BENCH_T_r04); the
TPU-native answer is the same as the reference's: shard the row axis.

This tool demonstrates it: the full power build + CG solve — and the fused
full-physics superstep — in f64 at 101,568 atoms / 14,854 tunnel vacancies
(vmax 22,528) with ``_shard_power_system`` row-sharding the W blocks over
an 8-device mesh (virtual CPU devices here — multi-chip TPU hardware is
not attached; the sharding/collective program is identical). Records the
per-device W-block bytes proving the fused-f64 footprint divides by the
mesh.

Usage:
    python tools/bench_T_sharded.py [--devices 8] [--n-yz 46] [--oxide 26]
                                    [--vd 2.0] [--smoke] [--skip-fused]

Writes one JSON line to stdout (artifact-recordable), diagnostics to stderr.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n-yz", type=int, default=46)
    ap.add_argument("--oxide", type=int, default=26)
    ap.add_argument("--ti", type=int, default=2)
    ap.add_argument("--contacts", type=int, default=10)
    ap.add_argument("--vac-conc", type=float, default=0.54)
    ap.add_argument("--vd", type=float, default=2.0)
    ap.add_argument("--skip-fused", action="store_true",
                    help="stop after the sharded power build+solve")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (plumbing check)")
    args = ap.parse_args()

    # virtual multi-device CPU platform BEFORE backend init (the machine's
    # sitecustomize force-selects the tunneled TPU; same dance as conftest)
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={args.devices}"
    if "--xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
    os.environ["XLA_FLAGS"] = flags.strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.lattice import ELEM
    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.parallel.mesh import make_mesh, replicate_state, shard_model
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.solvers.current import build_power_system, solve_power
    from akmc_tpu.state import make_device_state

    if args.smoke:
        args.n_yz, args.oxide, args.contacts = 8, 8, 3

    assert len(jax.devices()) >= args.devices, jax.devices()

    t0 = time.perf_counter()
    p, lat = build_grid_crossbar(
        n_yz=args.n_yz, contact_slices=args.contacts,
        oxide_slices=args.oxide, ti_slices=args.ti,
        defect_fraction=0.10, vacancy_concentration=args.vac_conc, seed=0,
        cache_dir=os.path.join(HERE, ".cache"),
    )
    p.solve_current = True
    p.solve_heating_global = True
    p.t_ox = args.oxide * 2.131255e-10
    p.A = (args.n_yz * 2.131255e-10) ** 2
    p.c_p = 1.92
    p.dissipation_constant = 1e-13
    t_build = time.perf_counter() - t0

    el = np.asarray(lat.element0)
    n_atoms = int(
        (~np.isin(el, [int(ELEM.DEFECT), int(ELEM.OXYGEN_DEFECT),
                       int(ELEM.NULL_ELEMENT)])).sum()
    )
    n_vac = int((el == int(ELEM.VACANCY)).sum())
    print(f"[build] {lat.N} slots, {n_atoms} atoms, {n_vac} vacancies "
          f"in {t_build:.1f}s", file=sys.stderr)

    model = VCMModel(
        p, lat, rate_normalize=True, act_pad=256 * args.devices,
        pair_table_budget=0, pair_tiling_min_n=1,
    )
    ct = model.current_tables
    nc = int((np.asarray(ct.contact_idx) >= 0).sum())   # live contacts (window padded to 256-multiple)
    mesh = make_mesh(args.devices)
    shard_model(model, mesh)
    state = make_device_state(lat, p.background_temp)
    state = replicate_state(state, mesh)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = args.vd
    state = model.update_cb_edge(state, Vd)

    high_G = p.high_G * 100000
    loop_G = p.high_G * 10000000

    # ---- sharded f64 power BUILD (W blocks row-sharded over the mesh via
    # _shard_power_system's with_sharding_constraint) ----
    def _build(element, charge, cb):
        ps = build_power_system(
            ct, element[ct.atom_ind], charge[ct.atom_ind], cb[ct.atom_ind],
            jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), p.nn_dist,
            high_G, p.low_G, loop_G, p.q * 0.01, p.m_e, p.V0,
            vmax=model.vmax, ne_max=model.ne_max, wkb_f32=False,
        )
        return model._shard_power_system(ps)

    build_jit = jax.jit(_build)
    t0 = time.perf_counter()
    ps = build_jit(state.element, state.charge, state.cb_edge)
    jax.block_until_ready(ps.diag)   # CPU buffers: block works here
    t_build_ps = time.perf_counter() - t0

    # per-device W-block byte accounting: the proof the fused-f64 footprint
    # divides by the mesh (single-chip total vs max per-device bytes)
    blocks = {}
    for name in ("W_tt", "W_ct", "W_cc", "G_nbr"):
        arr = getattr(ps, name)
        per_dev = {}
        for s in arr.addressable_shards:
            per_dev[s.device.id] = per_dev.get(s.device.id, 0) + s.data.nbytes
        blocks[name] = {
            "shape": list(arr.shape),
            "dtype": str(arr.dtype),
            "total_gb": round(arr.nbytes / 1e9, 3),
            "max_per_device_gb": round(max(per_dev.values()) / 1e9, 3),
            "sharding": str(arr.sharding.spec),
        }
        print(f"[shard] {name} {blocks[name]}", file=sys.stderr)
    total_gb = sum(b["total_gb"] for b in blocks.values())
    per_dev_gb = sum(b["max_per_device_gb"] for b in blocks.values())

    # ---- sharded f64 power SOLVE (split-sparse CG: banded neighbor part +
    # row-sharded dense tunnel blocks; dots psum over the mesh) ----
    solve_jit = jax.jit(
        lambda ps_, m0: solve_power(
            ct, ps_, Vd, high_G, loop_G, 2 * 3.8612e-5 * 1e-5, 1.0, m0,
            state.element[ct.atom_ind],
        )
    )
    m0 = jnp.zeros(model.n_atom + 2, jnp.float64)
    t0 = time.perf_counter()
    I_macro, atom_power, m, iters = solve_jit(ps, m0)
    jax.block_until_ready(m)
    t_solve = time.perf_counter() - t0
    I_macro = float(I_macro)
    print(f"[solve] {t_solve:.1f}s iters={int(iters)} I={I_macro:.3e} A",
          file=sys.stderr)

    result = {
        "metric": "T_system_sharded_f64",
        "devices": args.devices,
        "platform": jax.devices()[0].platform,
        "n_atoms": n_atoms,
        "n_tunnel_vac": n_vac,
        "n_contact_window": nc,
        "vmax": model.vmax,
        "Vd": Vd,
        "wkb_plane": "f64",
        "power_build_s": round(t_build_ps, 1),
        "power_solve_s": round(t_solve, 1),
        "power_cg_iters": int(iters),
        "I_macro_A": I_macro,
        "w_blocks": blocks,
        "w_total_gb": round(total_gb, 2),
        "w_max_per_device_gb": round(per_dev_gb, 2),
        "reference_instance":
            "102722 nodes / 14854 subblock (main_test.cpp:46-52), "
            "solved multi-rank by update_power_gpu_sparse_dist "
            "(current_solver_gpu.cu:1430-1855)",
    }

    # ---- fused full-physics superstep, SHARDED, f64 (the program that
    # OOMed one chip in r04) ----
    if not args.skip_fused:
        ps = m = atom_power = None
        try:
            t0 = time.perf_counter()
            state, stats, m_warm = model.superstep_full(state, Vd, stream)
            dt0 = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, stats, m_warm = model.superstep_full(
                state, Vd, stream, m_prev=m_warm
            )
            dt1 = time.perf_counter() - t0
            result.update({
                "fused_superstep_first_s": round(dt0, 1),
                "fused_superstep_warm_s": round(dt1, 1),
                "fused_events": int(stats["n_events"]),
                "fused_I_macro_A": float(stats["I_macro"]),
                "fused_K_cg_iters": int(stats["cg_iterations"]),
                "fused_power_cg_iters": int(stats["power_cg_iterations"]),
            })
            print(f"[fused] first={dt0:.1f}s warm={dt1:.1f}s "
                  f"I={stats['I_macro']:.3e}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — keep the artifact
            result["fused_superstep_error"] = (
                f"{type(exc).__name__}: {str(exc)[:300]}"
            )
            print(f"[fused FAILED] {result['fused_superstep_error']}",
                  file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
