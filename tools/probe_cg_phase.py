"""Fresh per-phase attribution of the DIA K-CG iteration at crossbar scale.

Round-3 regression put the boundary-K CG at ~0.13 s/ITERATION at the
4.62M-slot crossbar, but the round-4 chained matvec probe measured the
XLA offset-loop matvec at ~2.7 ms (n=2.41M, D=18) — near its byte bound.
So ~95% of the per-iteration cost is NOT the matvec and has never been
attributed. This probe times, chained-in-one-jit (forced-pull brackets,
PERF_NOTES: per-dispatch ~90 ms >> device work), at the REAL deck geometry
(grid_stack + substoichiometry -> grid_dia_k, the exact operator the bench
solves):

  mv     — dia_combined_matvec alone (the round-4 probe, at TRUE scale/D)
  A      — the full operator closure from solve_potential_boundary_dia
           (masks + diag + conductive-vacancy correction)
  vec    — the CG body's vector algebra alone (dots/axpys/z-mul; Ap stubbed
           with one multiply)
  body   — one full jacobi_cg body iteration, fori_loop-chained
  while  — the same body inside lax.while_loop with the real rz/b.b cond
           (rtol pinned unreachably low so it runs exactly K iterations)

mv+vec should ~= body; body vs while isolates while_loop overhead; the
residual (0.13 s - while) would be interaction with the surrounding
superstep executable.

Usage: python tools/probe_cg_phase.py [n_yz] [K] [reps]
Reference analogue of the solve being attributed:
background_potential_gpu_sparse, potential_solver_gpu.cu:846-1128.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jaxcache")
import jax.numpy as jnp
import numpy as np

from akmc_tpu.lattice import ELEM, metal_mask
from akmc_tpu.models.crossbar import grid_stack
from akmc_tpu.solvers.dia import dia_combined_matvec
from akmc_tpu.state import make_substoichiometric
from akmc_tpu.rng import ReferenceRNG


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_yz = int(args[0]) if len(args) > 0 else 215
    K = int(args[1]) if len(args) > 1 else 20
    reps = int(args[2]) if len(args) > 2 else 5
    use_vdot = "--vdot" in sys.argv    # A/B: f64_vdot (mul+reduce) dots

    t0 = time.perf_counter()
    e, x, y, z, lattice, patch = grid_stack(
        n_yz=n_yz, a=2.131255, contact_slices=10, oxide_slices=22,
        ti_slices=8, defect_fraction=0.1, seed=0,
    )
    e = make_substoichiometric(e, 0.05, ReferenceRNG(1))
    n = e.shape[0]
    is_metal = metal_mask(e, patch["metals"])
    null_mask = e == int(ELEM.NULL_ELEMENT)
    nx_total = 50
    high_G, low_G = 1.0, 1e-8   # KMCParameters defaults (config.py high_G/low_G)
    from akmc_tpu.models.crossbar import grid_dia_k
    dia, meta = grid_dia_k(
        n_yz, nx_total, 2.131255, 3.5, is_metal,
        patch["num_atoms_first_layer"], high_G, low_G,
        np.zeros((n, 3)), null_mask=null_mask,
    )
    D = len(meta.offsets)
    print(f"[build] {time.perf_counter()-t0:.1f}s n={n} D={D}", file=sys.stderr)

    element = jnp.asarray(e)
    charge = jnp.zeros(n)   # all vacancies conductive — worst-case correction
    L = R = patch["num_atoms_first_layer"]
    n_int = n - L - R
    dG = high_G - low_G

    # === replicate solve_potential_boundary_dia's operator pieces (r05:
    # the shared-buffer default — fold_cvac_codes + precomputed selects) ===
    from akmc_tpu.solvers.dia import (
        dia_adj_matvec, dia_combined_matvec_shared, fold_cvac_codes,
    )
    cvac = (element == int(ELEM.VACANCY)) & (charge == 0)
    cvac_f = jnp.where(cvac, 1.0, 0.0)
    vdeg = dia_adj_matvec(dia, meta, cvac_f)
    diag = dia.deg_static + dG * jnp.where(cvac, vdeg, 0.0)
    idxs = jnp.arange(n)
    is_int = (idxs >= L) & (idxs < n - R) & dia.active_row
    Vd = 15.0
    rhs = (dia.lsum * (-Vd / 2.0) + dia.rsum * (Vd / 2.0)) * is_int
    inv_diag = jnp.where(is_int, 1.0 / jnp.where(is_int, diag, 1.0), 1.0)
    norm2_rhs = jnp.dot(rhs, rhs)
    diag_i = jnp.where(is_int, diag, 1.0)
    dgc = jnp.where(cvac, dG, 0.0)
    dcodes = fold_cvac_codes(dia, meta, cvac & is_int)

    def A_dc(dc, xx):
        mv, corr = dia_combined_matvec_shared(dc, dia, meta, xx)
        yy = diag_i * xx - mv - dgc * corr
        return jnp.where(is_int, yy, xx)

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(n))

    def bench(f, name, per=K, extra=()):
        ts = []
        for i in range(reps):
            xi = x0 * (1.0 + 1e-9 * i)
            t0 = time.perf_counter()
            out = f(*extra, xi)
            _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med/per*1e3:7.2f} ms/iter  (chain of {per}: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + " ms)", file=sys.stderr)
        return med / per

    # 1. matvec alone — two-buffer (r04 form) and shared-buffer (r05)
    def mv_chain(x0_):
        def body(i, xc):
            yv, vv = dia_combined_matvec(dia, meta, xc, xc)
            return yv * (1.0 / (jnp.max(jnp.abs(yv)) + 1.0)) + xc * 1e-3
        return jax.lax.fori_loop(0, K, body, x0_)

    def mv_shared_chain(dc, x0_):
        def body(i, xc):
            yv, vv = dia_combined_matvec_shared(dc, dia, meta, xc)
            return yv * (1.0 / (jnp.max(jnp.abs(yv)) + 1.0)) + xc * 1e-3
        return jax.lax.fori_loop(0, K, body, x0_)

    # 2. full operator A
    def A_chain(dc, x0_):
        def body(i, xc):
            yv = A_dc(dc, xc)
            return yv * (1.0 / (jnp.max(jnp.abs(yv)) + 1.0)) + xc * 1e-3
        return jax.lax.fori_loop(0, K, body, x0_)

    from akmc_tpu.solvers.cg import f64_vdot
    dot = f64_vdot if use_vdot else jnp.dot
    print(f"[dot] {'f64_vdot (mul+reduce)' if use_vdot else 'jnp.dot'}",
          file=sys.stderr)

    # CG body (jacobi_cg's, cg.py:84-96) parameterized by the Ap producer
    def cg_body(apfn, c):
        xx, r, z, p, rz, k = c
        Ap = apfn(p)
        pAp = dot(p, Ap)
        a = rz / pAp
        xx = xx + a * p
        r = r - a * Ap
        z_new = r * inv_diag
        rz_new = dot(r, z_new)
        beta = rz_new / rz
        p = z_new + beta * p
        return (xx, r, z_new, p, rz_new, k + 1)

    def cg_init(dc, x0_):
        r0 = rhs - A_dc(dc, x0_)
        z0 = r0 * inv_diag
        return (x0_, r0, z0, z0, dot(r0, z0), jnp.asarray(1, jnp.int32))

    def cg_init_diag(x0_):
        r0 = rhs - x0_ * diag
        z0 = r0 * inv_diag
        return (x0_, r0, z0, z0, dot(r0, z0), jnp.asarray(1, jnp.int32))

    # 3. vector algebra only (Ap stubbed: one elementwise multiply)
    def vec_chain(x0_):
        c = cg_init_diag(x0_)
        def body(i, c):
            return cg_body(lambda p: p * diag, c)
        c = jax.lax.fori_loop(0, K, body, c)
        return c[0]

    # 4. full body, fori
    def body_chain(dc, x0_):
        c = cg_init(dc, x0_)
        def body(i, c):
            return cg_body(lambda p: A_dc(dc, p), c)
        c = jax.lax.fori_loop(0, K, body, c)
        return c[0]

    # 5. full body, while_loop with the REAL cond (rtol unreachably small)
    rtol2 = jnp.asarray(1e-300)
    def while_chain(dc, x0_):
        c = cg_init(dc, x0_)
        def cond(c):
            return (c[4] / norm2_rhs > rtol2) & (c[5] <= K)
        c = jax.lax.while_loop(
            cond, lambda c: cg_body(lambda p: A_dc(dc, p), c), c
        )
        return c[0]

    r_mv = bench(jax.jit(mv_chain), "mv    ")
    r_mvs = bench(jax.jit(mv_shared_chain), "mv_sh ", extra=(dcodes,))
    r_A = bench(jax.jit(A_chain), "A     ", extra=(dcodes,))
    r_vec = bench(jax.jit(vec_chain), "vec   ")
    r_body = bench(jax.jit(body_chain), "body  ", extra=(dcodes,))
    r_while = bench(jax.jit(while_chain), "while ", extra=(dcodes,))

    import json
    print(json.dumps({
        "n": int(n), "D": D, "K": K,
        "ms_mv": r_mv * 1e3, "ms_mv_shared": r_mvs * 1e3,
        "ms_A": r_A * 1e3, "ms_vec": r_vec * 1e3,
        "ms_body": r_body * 1e3, "ms_while": r_while * 1e3,
    }))


if __name__ == "__main__":
    main()
