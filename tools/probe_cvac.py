"""Micro-attribution of cvac_correction (the measured 6.7 ms/step dominant
cost of the carried-residual warm K solve — tools/probe_kcarry_ablate.py).

Pieces, each a k-step scan over k DIFFERENT masks (defeats hoisting), on
the real 5 nm band geometry:

  nonzero   idx/vv compaction only            (jnp.nonzero size=vmax)
  gather    + (VMAX, 3) position row gather
  plane     + the (VMAX, VMAX) PBC distance plane + W + row sums (as-is, dd)
  plane32   same but distances classified in f32 (W is a 0/1 mask decided
            with >= 1e-3 relative margin — same mask, 4x less dd work)

    python tools/probe_cvac.py [k] [reps]
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
    from akmc_tpu.lattice import build_lattice, read_xyz, ELEM
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import ReferenceRNG
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
    bk = model.kop
    vmax = model.vmax
    lattice = jnp.asarray(np.asarray(p.lattice))
    nn2 = p.nn_dist * p.nn_dist
    n = len(e)

    cvac0 = np.asarray(
        (state.element == int(ELEM.VACANCY)) & (state.charge == 0)
    )[np.asarray(bk.perm)]
    # k distinct masks: roll by i so each scan step compacts different rows
    masks = np.stack([np.roll(cvac0, 7 * i) for i in range(k)])
    masks = jnp.asarray(masks)

    pos32 = bk.pos_p.astype(jnp.float32)
    lat32 = lattice.astype(jnp.float32)

    def piece(mode):
        def one(cv):
            idx = jnp.nonzero(cv, size=vmax, fill_value=-1)[0].astype(jnp.int32)
            vv = idx >= 0
            if mode == "nonzero":
                return jnp.sum(idx)
            pp = bk.pos_p[idx.clip(0)]
            if mode == "gather":
                return jnp.sum(idx) + jnp.sum(pp).astype(jnp.int64)
            if mode == "plane":
                d = pp[:, None, :] - pp[None, :, :]
                dy = d[..., 1] / lattice[1]
                dy = (dy - jnp.round(dy)) * lattice[1]
                dz = d[..., 2] / lattice[2]
                dz = (dz - jnp.round(dz)) * lattice[2]
                d2 = d[..., 0] ** 2 + dy**2 + dz**2
            else:  # plane32
                pp = pos32[idx.clip(0)]
                d = pp[:, None, :] - pp[None, :, :]
                dy = d[..., 1] / lat32[1]
                dy = (dy - jnp.round(dy)) * lat32[1]
                dz = d[..., 2] / lat32[2]
                dz = (dz - jnp.round(dz)) * lat32[2]
                d2 = d[..., 0] ** 2 + dy**2 + dz**2
                nn2_ = jnp.float32(nn2)
                same = idx[:, None] == idx[None, :]
                W = jnp.where(
                    (d2 < nn2_) & ~same & vv[:, None] & vv[None, :], 1.0, 0.0
                )
                return (jnp.sum(idx)
                        + jnp.sum(W).astype(jnp.int64)
                        + jnp.sum(jnp.sum(W, 1)).astype(jnp.int64))
            same = idx[:, None] == idx[None, :]
            W = jnp.where(
                (d2 < nn2) & ~same & vv[:, None] & vv[None, :], 1.0, 0.0
            )
            return (jnp.sum(idx) + jnp.sum(W).astype(jnp.int64)
                    + jnp.sum(jnp.sum(W, 1)).astype(jnp.int64))

        def run(ms):
            def step(acc, cv):
                return acc + one(cv), None
            acc, _ = jax.lax.scan(step, jnp.asarray(0, jnp.int64), ms)
            return acc
        opts = (
            {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
            if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            else {}
        )
        return jax.jit(run, **opts)

    for mode in ("nonzero", "gather", "plane", "plane32"):
        fn = piece(mode)
        times = []
        for r in range(reps + 1):
            ms = jnp.roll(masks, r, axis=0)
            t0 = time.perf_counter()
            _ = int(fn(ms))
            dt = (time.perf_counter() - t0) / k
            if r:
                times.append(dt)
        print(f"{mode:10s} median {float(np.median(times))*1e3:7.3f} ms/step"
              f"  min {min(times)*1e3:7.3f}", flush=True)

    # mask equality check: f64 vs f32 classification on the real geometry
    pp = np.asarray(bk.pos_p)
    idx = np.nonzero(cvac0)[0]
    d = pp[idx][:, None, :] - pp[idx][None, :, :]
    latn = np.asarray(lattice)
    for ax in (1, 2):
        w = d[..., ax] / latn[ax]
        d[..., ax] = (w - np.round(w)) * latn[ax]
    d2_64 = (d ** 2).sum(-1)
    d32 = (pp.astype(np.float32)[idx][:, None, :]
           - pp.astype(np.float32)[idx][None, :, :])
    for ax in (1, 2):
        w = d32[..., ax] / latn.astype(np.float32)[ax]
        d32[..., ax] = (w - np.round(w)) * latn.astype(np.float32)[ax]
    d2_32 = (d32.astype(np.float32) ** 2).sum(-1)
    m64 = d2_64 < nn2
    m32 = d2_32 < np.float32(nn2)
    print(f"mask identical: {bool((m64 == m32).all())}  "
          f"edge margin: closest-in {np.sqrt(d2_64[m64].max(initial=0)):.3f} "
          f"closest-out {np.sqrt(d2_64[~m64 & (d2_64 > 0)].min(initial=1e9)):.3f} "
          f"nn_dist {p.nn_dist:.3f}")


if __name__ == "__main__":
    main()
