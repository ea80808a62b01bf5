"""Low-bias I_macro operator-invariance study — VERDICT r4 weak #3.

At Vd=1-3 on the 5 nm device |I_macro| is sub-nA: an extraction-rail
cancellation of large virtual potentials. r04 observed +-30-47% spread and
a SIGN FLIP at Vd=2 across {gather vs banded neighbor part} x {f64 vs f32
WKB}. Two candidate causes:

  (a) solver resolution — I error ~ kappa * rtol * amplification; fix =
      tighten the power-CG tolerance at low bias (solve_power rtol_scale);
  (b) intrinsic input sensitivity — a ~1e-7 relative W-coefficient
      perturbation (the f32 plane's error class) already moves I by more
      than itself at sub-nA.

This probe separates them: a 4-way operator table {band, gather} x
{f64, f32 WKB} at Vd in {1, 2, 3, 5}, each at rtol_scale in
{1, 1e-2, 1e-4}, plus an explicit input-sensitivity row (f64 coefficients
perturbed by 1e-7 relative). Same-coefficient columns converging to ~1%
agreement under tighter rtol proves (a) is fixable; the perturbation row
bounds (b).

Usage: python tools/probe_lowbias_iv.py [--cpu] [--vds 1,2,3,5]
Reference tolerance semantics being matched:
current_solver_gpu.cu:1455-1456 (1e-30*N_atom absolute residual).
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vds", default="1,2,3,5")
    ap.add_argument("--scales", default="1,1e-2,1e-4")
    ap.add_argument("--planes", default="f64,f32,pert",
                    help="subset of {f64,f32,pert} — resume granularity "
                         "after tunnel outages")
    ap.add_argument("--ops", default="band,gather")
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
    from akmc_tpu.lattice import ELEM, build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.solvers.current import build_power_system, solve_power
    from akmc_tpu.state import make_device_state, make_substoichiometric

    ref = "/root/reference/structures/5nm_device"
    p = KMCParameters.from_file(os.path.join(ref, "parameters.txt"))
    p.solve_current = True
    # the 5 nm deck is a RESTART deck (atom_xyz_file = NA): the structure
    # comes from restart_xyz_file, same as the golden gate
    e, x, y, z = read_xyz(os.path.join(ref, p.restart_xyz_file))
    e = make_substoichiometric(e, p.initial_vacancy_concentration,
                               ReferenceRNG(p.rnd_seed))
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(HERE, ".cache"))
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    ct = model.current_tables
    high_G = p.high_G * 100000
    loop_G = p.high_G * 10000000
    G0 = 2 * 3.8612e-5 * 1e-5
    lattice = jnp.asarray(np.asarray(p.lattice))
    atom_elem = state.element[ct.atom_ind]
    atom_charge = state.charge[ct.atom_ind]
    cvac_full = (atom_elem == int(ELEM.VACANCY)) & (atom_charge == 0)

    def build_ps(cb, f32, perturb=0.0):
        ps = build_power_system(
            ct, atom_elem, atom_charge, cb[ct.atom_ind],
            lattice, bool(p.pbc), p.nn_dist, high_G, p.low_G, loop_G,
            p.q * 0.01, p.m_e, p.V0, vmax=model.vmax, ne_max=model.ne_max,
            wkb_f32=f32,
        )
        if perturb:
            # deterministic ~1e-7 relative wobble on every W coefficient
            def wob(a, salt):
                ph = jnp.sin(
                    jnp.arange(a.size, dtype=jnp.float64).reshape(a.shape)
                    * 0.7391 + salt
                )
                return a * (1.0 + perturb * ph)
            # diag must stay consistent with the blocks: rebuild its tunnel
            # part from the perturbed sums
            vi = ps.vac_idx.clip(0)
            vv = ps.vac_idx >= 0
            W_tt, W_ct, W_cc = wob(ps.W_tt, 1.0), wob(ps.W_ct, 2.0), wob(ps.W_cc, 3.0)
            diag = jnp.sum(ps.G_nbr, axis=1)
            diag = diag + high_G * ct.inj_tie + high_G * ct.ext_tie
            diag = diag.at[vi].add(jnp.where(
                vv,
                jnp.sum(W_tt, axis=1, dtype=jnp.float64)
                + jnp.sum(W_ct, axis=0, dtype=jnp.float64), 0.0))
            diag = diag.at[ct.contact_idx].add(
                jnp.sum(W_cc, axis=1, dtype=jnp.float64)
                + jnp.sum(W_ct, axis=1, dtype=jnp.float64))
            ps = ps._replace(W_tt=W_tt, W_ct=W_ct, W_cc=W_cc, diag=diag)
        return ps

    build_jit = jax.jit(build_ps, static_argnums=(1,))
    pband = model.power_band
    bmeta = model._power_band_meta

    def solve(ps, Vd, band, scale):
        return solve_power(
            ct, ps, Vd, high_G, loop_G, G0, 1.0,
            jnp.zeros(model.n_atom + 2, jnp.float64), atom_elem,
            band=pband if band else None,
            band_meta=bmeta if band else None,
            cvac=cvac_full if band else None,
            nn_dist=p.nn_dist, lattice=lattice, pbc=bool(p.pbc),
            rtol_scale=scale,
        )

    solve_jit = jax.jit(solve, static_argnums=(2,))

    vds = [float(v) for v in args.vds.split(",")]
    scales = [float(s) for s in args.scales.split(",")]
    planes = set(args.planes.split(","))
    ops = set(args.ops.split(","))
    rows = []
    for Vd in vds:
        st = model.update_cb_edge(state, Vd)
        cb = st.cb_edge
        for f32 in (False, True):
            for pert in ([0.0, 1e-7] if not f32 else [0.0]):
                plane = "f32" if f32 else ("pert" if pert else "f64")
                if plane not in planes:
                    continue
                t0 = time.perf_counter()
                ps = build_jit(cb, f32) if not pert else jax.jit(
                    lambda cb_: build_ps(cb_, False, 1e-7))(cb)
                _ = float(jnp.sum(ps.diag))
                tb = time.perf_counter() - t0
                for band in (True, False):
                    if ("band" if band else "gather") not in ops:
                        continue
                    for sc in scales:
                        t0 = time.perf_counter()
                        I, _pw, m, iters = solve_jit(ps, Vd, band, sc)
                        I = float(I)
                        ts = time.perf_counter() - t0
                        row = {
                            "Vd": Vd,
                            "wkb": "f32" if f32 else "f64",
                            "perturb": pert,
                            "op": "band" if band else "gather",
                            "rtol_scale": sc,
                            "I_A": I,
                            "iters": int(iters),
                            "solve_s": round(ts, 2),
                            "build_s": round(tb, 2),
                        }
                        rows.append(row)
                        print(json.dumps(row), file=sys.stderr)
                ps = None
    print(json.dumps({"metric": "lowbias_iv_consistency", "rows": rows}))


if __name__ == "__main__":
    main()
