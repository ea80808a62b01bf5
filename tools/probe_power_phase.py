"""Per-phase attribution of the power-CG iteration at the 5 nm T system.

Round-4 measurement: the warm full-physics superstep cost is
power_cg_iterations x ~18.5 ms/iter (probe_full_physics_5nm + stats trace:
event-perturbed steps run 85-112 iters -> 1.7-2.2 s; quiet steps 4-10 ->
0.23-0.36 s). This probe times, chained-in-one-jit (forced-pull brackets,
per-dispatch ~90 ms >> device work), the pieces of solve_power's operator
at the REAL 5 nm system (n_atom=25,683, vmax=768, nc=3,312):

  gather — the (N_atom, 52) f64 neighbor gather + multiply-reduce
           (suspect: ~10.7 MB of gathered f64 at the measured ~0.5 GB/s
           gather rate is ~21 ms, i.e. the whole iteration)
  dense  — the four dense W matvecs (W_tt, W_ct x2, W_cc as f64_matvec)
  scat   — the two scatter-adds back to atom rows
  A      — the full operator from solve_power
  vec    — CG vector algebra alone (f64_vdot dots; Ap stubbed)
  body   — one full jacobi_cg body iteration

Usage: python tools/probe_power_phase.py [--reps 5] [--K 20] [--wkb-f32]
Reference analogue: the distributed sparse T matvec it replaces,
dist_spmv_split_sparse.cpp:5-78 / current_solver_gpu.cu:1430-1855.
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--wkb-f32", action="store_true")
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
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.solvers.cg import f64_matvec, f64_vdot
    from akmc_tpu.solvers.current import _X_atoms_matvec, build_power_system
    from akmc_tpu.state import make_device_state, make_substoichiometric

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    p.solve_current = True
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))
    e = make_substoichiometric(
        e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed)
    )
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(HERE, ".cache"))
    model = VCMModel(p, lat, wkb_f32=args.wkb_f32)
    state = make_device_state(lat, p.background_temp)
    state = model.update_cb_edge(state, 5.0)
    ct = model.current_tables

    high_G = p.high_G * 100000
    loop_G = p.high_G * 10000000
    ps = jax.jit(
        lambda el, ch, cb: build_power_system(
            ct, el[ct.atom_ind], ch[ct.atom_ind], cb[ct.atom_ind],
            jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), p.nn_dist,
            high_G, p.low_G, loop_G, p.q * 0.01, p.m_e, p.V0,
            vmax=model.vmax, ne_max=model.ne_max, wkb_f32=args.wkb_f32,
        )
    )(state.element, state.charge, state.cb_edge)

    n_atom = int(ct.atom_ind.shape[0])
    n_unk = n_atom + 1                  # [ext, inj, atoms[:-1]]
    K = args.K
    nbr = ct.atom_neigh_idx
    vi = ps.vac_idx.clip(0)
    vv = ps.vac_idx >= 0
    inv_diag = 1.0 / jnp.concatenate(
        [jnp.stack([ps.diag0, ps.diag1]), ps.diag[:-1]]
    )
    Vd = 5.0
    b = jnp.zeros(n_unk).at[0].set(-loop_G * Vd).at[1].set(loop_G * Vd)

    def A(v):                            # (n_unk,) -> (n_unk,)
        va = jnp.concatenate([v[2:], jnp.zeros(1, v.dtype)])
        y_at = ps.diag * va + _X_atoms_matvec(ct, ps, va)
        y_at = y_at - high_G * ct.inj_tie * v[1] - high_G * ct.ext_tie * v[0]
        y0 = ps.diag0 * v[0] - loop_G * v[1] - high_G * jnp.sum(
            jnp.where(ct.ext_tie, va, 0.0)
        )
        y1 = ps.diag1 * v[1] - loop_G * v[0] - high_G * jnp.sum(
            jnp.where(ct.inj_tie, va, 0.0)
        )
        return jnp.concatenate([jnp.stack([y0, y1]), y_at[:-1]])

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(n_unk))

    def bench(f, name, per=K):
        ts = []
        for i in range(args.reps):
            xi = x0 * (1.0 + 1e-9 * i)
            t0 = time.perf_counter()
            out = f(xi)
            _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name}: {med/per*1e3:7.2f} ms/iter  (chain of {per}: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + " ms)",
            file=sys.stderr,
        )
        return med / per * 1e3

    def chain(op):
        def f(x0_):
            def body(i, xc):
                yv = op(xc)
                return yv * (1.0 / (jnp.max(jnp.abs(yv)) + 1.0)) + xc * 1e-3
            return jax.lax.fori_loop(0, K, body, x0_)
        return jax.jit(f)

    def _va(v):
        return jnp.concatenate([v[2:], jnp.zeros(1, v.dtype)])

    # 1. neighbor gather + multiply-reduce alone
    def gather_op(v):
        va = _va(v)
        y = -jnp.sum(ps.G_nbr * va[nbr.clip(0)], axis=1)
        return jnp.concatenate([v[:2], y[:-1]])

    # 2. dense W matvecs alone (no scatter back)
    def dense_op(v):
        va = _va(v)
        v_v = jnp.where(vv, va[vi], 0.0)
        v_c = va[ct.contact_idx]
        y_v = -f64_matvec(ps.W_tt, v_v) - f64_matvec(ps.W_ct, v_c, axis=0)
        y_c = -f64_matvec(ps.W_cc, v_c) - f64_matvec(ps.W_ct, v_v)
        pad = jnp.zeros(n_unk - 2 - y_v.shape[0] - y_c.shape[0], v.dtype)
        return jnp.concatenate([v[:2], y_v, y_c, pad])

    # 3. the two scatter-adds alone
    y_v0 = jnp.asarray(rng.randn(int(vi.shape[0])))
    y_c0 = jnp.asarray(rng.randn(int(ct.contact_idx.shape[0])))

    def scat_op(v):
        va = _va(v)
        y = va.at[vi].add(jnp.where(vv, y_v0 * va[0], 0.0))
        y = y.at[ct.contact_idx].add(y_c0 * va[1])
        return jnp.concatenate([v[:2], y[:-1]])

    r = {"n_atom": n_atom, "vmax": int(ps.vac_idx.shape[0]),
         "nc": int(ct.contact_idx.shape[0]), "K": K,
         "wkb_plane": "f32" if args.wkb_f32 else "f64"}
    r["ms_gather"] = bench(chain(gather_op), "gather")
    r["ms_dense"] = bench(chain(dense_op), "dense ")
    r["ms_scat"] = bench(chain(scat_op), "scat  ")
    r["ms_A"] = bench(chain(A), "A     ")

    # CG body (jacobi_cg's, cg.py) parameterized by the Ap producer
    def cg_body(apfn, c):
        xx, rr, z, pp, rz, k = c
        Ap = apfn(pp)
        a = rz / f64_vdot(pp, Ap)
        xx = xx + a * pp
        rr = rr - a * Ap
        z_new = rr * inv_diag
        rz_new = f64_vdot(rr, z_new)
        beta = rz_new / rz
        pp = z_new + beta * pp
        return (xx, rr, z_new, pp, rz_new, k + 1)

    def make_cg_chain(apfn):
        def f(x0_):
            r0 = b - apfn(x0_)
            z0 = r0 * inv_diag
            c = (x0_, r0, z0, z0, f64_vdot(r0, z0), jnp.asarray(1, jnp.int32))
            def body(i, c):
                return cg_body(apfn, c)
            return jax.lax.fori_loop(0, K, body, c)[0]
        return jax.jit(f)

    r["ms_vec"] = bench(make_cg_chain(lambda pv: pv * inv_diag), "vec   ")
    r["ms_body"] = bench(make_cg_chain(A), "body  ")

    print(json.dumps(r))


if __name__ == "__main__":
    main()
