"""Ablation ladder for the CARRIED-residual warm K solve (round 3).

bench.py (k_carry_residual=True) measured 18.7 ms/superstep; the fresh-path
ablation said K = 11.06 ms of the 12.16 ms fields cost, and the carried
solve only bought ~2.4 ms despite running ZERO CG body iterations
(cg_iterations = 1 = zero body passes).  So the residual K cost is the
per-step ASSEMBLY + REBASE machinery, not matvecs.  This probe slices it:

  V0  full carried fields path        (charge + carried-K + pair + rates)
  V1  V0, but reuse the carried (vidx, vv, Wv) planes — skips the
      cvac_correction (VMAX, VMAX) plane build          [exact here: the
      probe body executes no events, so cvac never changes]
  V2  V1, and r0 = carry.r directly — skips the d_diag/dS rebase terms
      (two S_corr scatters + compacted matvecs)          [exact here too]
  V3  no K solve at all (pot_b = pb)

  V0-V1 = cvac plane build;  V1-V2 = rebase terms;  V2-V3 = rest of the
  solve (diag scatter, perm/inv_perm gathers, entry dots, conv check);
  bench - V0 = event loop + loop_arrays + diag pack.

All variants scan k steps per dispatch (amortized ~90 ms dispatch cost);
the carried pytree chains through the scan exactly like _step_multi, with
the fresh init step unrolled outside.  Hoisting is defeated by the fake
charge dependence (as in probe_ablate_5nm.py).

    python tools/probe_kcarry_ablate.py [k] [reps]
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
    from akmc_tpu.ops.charge import update_charge_compact
    from akmc_tpu.ops.events import build_event_table
    from akmc_tpu.ops.pairwise import pairwise_potential_table
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.solvers.banded import _assemble_banded, KCarry
    from akmc_tpu.solvers.cg import jacobi_cg
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
    print(f"vmax={model.vmax} N={len(e)}", flush=True)

    state, _ = model.superstep_multi(state, Vd, stream, k=8)

    bk, meta = model.kop, model.band_meta
    lattice = jnp.asarray(np.asarray(p.lattice))
    n_int = len(e) - 2 * p.num_atoms_first_layer
    rtol = 1e-14 * n_int

    from akmc_tpu.solvers.banded import band_matvec
    from akmc_tpu.solvers.cg import f64_matvec

    dG = p.high_G - p.low_G
    n_sites = len(e)

    from akmc_tpu.solvers.banded import cvac_correction
    from akmc_tpu.lattice import ELEM

    def carried_solve(element, charge, pb, kc, skip_cvac, skip_rebase,
                      carry_stale=False, reuse_vidx=False):
        """Mirror of solve_potential_boundary_banded_carry with ablation
        switches.  skip_cvac: take diag/vidx/vv/Wv wholesale from the carry
        (the probe body executes no events, so this is EXACT) — the
        (VMAX, VMAX) cvac_correction build then never appears in the graph.
        skip_rebase: r0 = carry.r (exact here too).  carry_stale: build
        everything fresh but return the OLD carry (isolates the scan
        carry-write cost of the new planes).  reuse_vidx: skip only the
        jnp.nonzero compaction (vidx/vv from carry), rebuild plane/diag."""
        if skip_cvac:
            vidx, vv, Wv, diag_p = kc.vidx, kc.vv, kc.Wv, kc.diag
        elif reuse_vidx in ("alt", "mxu"):
            cvac_abs = (element == int(ELEM.VACANCY)) & (charge == 0)
            if reuse_vidx == "alt":
                # nonzero on the UNPERMUTED mask (elementwise producer, the
                # update_charge_compact context measured sub-ms), then map
                # through the static inv_perm and re-sort ascending
                idx_abs = jnp.nonzero(cvac_abs, size=model.vmax,
                                      fill_value=-1)[0].astype(jnp.int32)
                valid = idx_abs >= 0
                pos = jnp.where(
                    valid,
                    jnp.asarray(bk.inv_perm, jnp.int32)[idx_abs.clip(0)],
                    n_sites,
                )
                pos = jnp.sort(pos)
                vv = pos < n_sites
                vidx = jnp.where(vv, pos, -1).astype(jnp.int32)
            else:
                # MXU blocked prefix-count compaction of the PERMUTED mask
                cv = cvac_abs[bk.perm]
                B = 512
                nb = -(-n_sites // B)
                m = jnp.zeros((nb * B,), jnp.float32).at[:n_sites].set(
                    cv.astype(jnp.float32)
                ).reshape(nb, B)
                tri = jnp.triu(jnp.ones((B, B), jnp.float32))
                inner = m @ tri                     # (nb, B) exact counts
                tot = inner[:, -1]
                offs = jnp.cumsum(tot) - tot
                posf = (offs[:, None] + inner - m).reshape(-1)[:n_sites]
                posi = posf.astype(jnp.int32)
                vidx = jnp.full((model.vmax,), -1, jnp.int32).at[
                    jnp.where(cv, posi, model.vmax)
                ].set(jnp.arange(n_sites, dtype=jnp.int32), mode="drop")
                vv = vidx >= 0
            pp = bk.pos_p[vidx.clip(0)]
            d = pp[:, None, :] - pp[None, :, :]
            dy = d[..., 1] / lattice[1]
            dy = (dy - jnp.round(dy)) * lattice[1]
            dz = d[..., 2] / lattice[2]
            dz = (dz - jnp.round(dz)) * lattice[2]
            d2 = d[..., 0] ** 2 + dy ** 2 + dz ** 2
            same = vidx[:, None] == vidx[None, :]
            Wv = jnp.where(
                (d2 < p.nn_dist ** 2) & ~same & vv[:, None] & vv[None, :],
                1.0, 0.0,
            )
            vdeg = jnp.sum(Wv, axis=1)
            diag_p = bk.deg_static + dG * (
                jnp.zeros(n_sites).at[vidx.clip(0)].add(
                    jnp.where(vv, vdeg, 0.0))
            )
        elif reuse_vidx:
            vidx, vv = kc.vidx, kc.vv
            pp = bk.pos_p[vidx.clip(0)]
            d = pp[:, None, :] - pp[None, :, :]
            dy = d[..., 1] / lattice[1]
            dy = (dy - jnp.round(dy)) * lattice[1]
            dz = d[..., 2] / lattice[2]
            dz = (dz - jnp.round(dz)) * lattice[2]
            d2 = d[..., 0] ** 2 + dy ** 2 + dz ** 2
            same = vidx[:, None] == vidx[None, :]
            Wv = jnp.where(
                (d2 < p.nn_dist ** 2) & ~same & vv[:, None] & vv[None, :],
                1.0, 0.0,
            )
            vdeg = jnp.sum(Wv, axis=1)
            diag_p = bk.deg_static + dG * (
                jnp.zeros(n_sites).at[vidx.clip(0)].add(
                    jnp.where(vv, vdeg, 0.0))
            )
        else:
            cvac_p, planes, diag_p, _, _, _, _ = _assemble_banded(
                bk, meta, element, charge, Vd, p.high_G, p.low_G,
                p.num_atoms_first_layer, p.nn_dist, lattice, bool(p.pbc),
                model.vmax,
            )
            vidx, vv, Wv = planes
        is_int_p = bk.is_int
        rhs_p = (bk.lsum * (-Vd / 2.0) + bk.rsum * (Vd / 2.0)) * is_int_p

        def S_corr(x_p, vidx_, vv_, Wv_):
            xv = jnp.where(vv_, x_p[vidx_.clip(0)], 0.0)
            corr = dG * f64_matvec(Wv_, xv)
            return jnp.zeros(n_sites).at[vidx_.clip(0)].add(
                jnp.where(vv_, corr, 0.0)
            )

        def A_frame(x_p):
            xz = jnp.where(is_int_p, x_p, 0.0)
            y = diag_p * xz - band_matvec(bk, meta, xz)
            y = y - S_corr(xz, vidx, vv, Wv)
            return jnp.where(is_int_p, y, x_p)

        x0_p = jnp.where(is_int_p, pb[bk.perm], 0.0)
        inv_diag_p = jnp.where(is_int_p, 1.0 / diag_p, 1.0)
        if skip_rebase:
            r0 = kc.r
        else:
            d_diag = (kc.diag - diag_p) * x0_p
            dS = S_corr(x0_p, vidx, vv, Wv) - S_corr(
                x0_p, kc.vidx, kc.vv, kc.Wv
            )
            r0 = jnp.where(is_int_p, kc.r + d_diag + dS, 0.0)
        res = jacobi_cg(A_frame, rhs_p, x0_p, inv_diag_p, rtol, 10000, r0=r0)
        full = jnp.where(is_int_p, res.x, 0.0)[bk.inv_perm]
        if carry_stale:
            return full, res.iterations, kc
        return full, res.iterations, KCarry(
            r=res.r, diag=diag_p, vidx=vidx, vv=vv, Wv=Wv
        )

    def variant(mode):
        def run(t, kop, element, charge, pb):
            # fresh init step (unrolled, like _step_multi)
            fr0 = model._fields(t, kop, element, charge, pb, state.T_bg, Vd,
                                k_carry="init")
            kc0 = fr0.k_carry
            pb0 = fr0.potential_boundary

            def step(carry, _):
                element, charge, pb, kc = carry
                charge = update_charge_compact(
                    element, charge, t.neigh_idx, t.any_metal_nbr, model.vmax
                )
                if mode == "noK":
                    pot_b, cg_it = pb, jnp.asarray(1, jnp.int32)
                    kc_new = kc
                else:
                    pot_b, cg_it, kc_new = carried_solve(
                        element, charge, pb, kc,
                        skip_cvac=mode in ("nocvac", "norebase"),
                        skip_rebase=mode == "norebase",
                        carry_stale=mode == "staleW",
                        reuse_vidx={"novidx": True, "altvidx": "alt",
                                    "mxuvidx": "mxu"}.get(mode, False),
                    )
                pot_pair, _ = pairwise_potential_table(
                    t.pair_gT, t.abs2act, charge, model.qmax
                )
                pot_sum = pot_pair + pot_b
                P, etype = build_event_table(
                    element, charge, pot_sum,
                    jnp.asarray(300.0, jnp.float64),
                    t.act_neigh, t.act_self2, t.act_layer,
                    t.E_gen, t.E_rec, t.E_Vdiff, t.E_Odiff,
                    p.freq, p.sigma, p.k, rows=t.act_idx,
                )
                s = jnp.sum(P) * 1e-300
                return (element, charge + (s != 0.0).astype(charge.dtype) * 0,
                        pot_b, kc_new), cg_it

            (element, charge, pb, kc), its = jax.lax.scan(
                step, (element, fr0.charge, pb0, kc0), None, length=k - 1,
            )
            return charge, pb, its

        opts = (
            {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
            if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            else {}
        )
        return jax.jit(run, **opts)

    def timeit(fn, label):
        times = []
        its_seen = None
        for r in range(reps + 1):
            pb = state.potential_boundary + r * 1e-15
            t0 = time.perf_counter()
            ch2, pb2, its = fn(model.tables, model.kop, state.element,
                               state.charge, pb)
            _ = float(jnp.sum(ch2)) + float(jnp.sum(pb2))
            dt = (time.perf_counter() - t0) / k
            if r:
                times.append(dt)
            else:
                its_seen = np.asarray(its)
        med = float(np.median(times))
        print(f"{label:28s} median {med*1e3:8.2f} ms/step "
              f"min {min(times)*1e3:8.2f}  cg_max={its_seen.max()}",
              flush=True)
        return med

    t0 = time.time()
    res = {}
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             ("full", "staleW", "novidx", "nocvac", "norebase", "noK"))
    for name in names:
        res[name] = timeit(variant(name), f"kc fields [{name}]")
    print(f"[total {time.time()-t0:.0f}s]")
    if "staleW" in res and "novidx" in res:
        print(f"carry-write of planes (V0-Vs): {(res['full']-res['staleW'])*1e3:7.2f} ms")
        print(f"nonzero compaction  (Vs-Vnv) : {(res['staleW']-res['novidx'])*1e3:7.2f} ms")
    if "nocvac" in res and "norebase" in res and "noK" in res:
        print(f"plane+vdeg+diag    (Vnv-V1)  : {(res['novidx']-res['nocvac'])*1e3:7.2f} ms")
        print(f"rebase terms        (V1-V2)  : {(res['nocvac']-res['norebase'])*1e3:7.2f} ms")
        print(f"rest of K solve     (V2-V3)  : {(res['norebase']-res['noK'])*1e3:7.2f} ms")
    print(f"fields total        (V0)     : {res.get('full', 0)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
