"""Isolated K band-matvec timing on the attached device (int8-coded band).

Forced-sync protocol: each call pulls a scalar (float(jnp.sum(...))) —
jax.block_until_ready returns early on this runtime's remote buffers
(PERF_NOTES). Dispatch RTT is calibrated with an identity-sum jit and
reported alongside.

    python tools/probe_band.py [reps]
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".cache", "jaxcache")
    )
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.solvers.banded import band_matvec, build_banded_k
    from akmc_tpu.state import make_substoichiometric
    from akmc_tpu.lattice import ELEM

    REF = "/root/reference/structures/5nm_device"
    p = KMCParameters.from_file(os.path.join(REF, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(here, ".cache"))

    is_metal = np.isin(lat.element0, [int(ELEM.Ti), int(ELEM.N)])
    out = build_banded_k(
        np.stack([lat.x, lat.y, lat.z], 1), lat.k_neigh_idx, is_metal,
        lat.element0, p.num_atoms_first_layer, p.high_G, p.low_G,
    )
    assert out is not None
    bk, meta = out
    n = lat.N
    print(f"[band] nb={bk.blocks.shape[0]} T={meta.block_rows} "
          f"W={bk.blocks.shape[2]} dtype={bk.blocks.dtype} "
          f"bytes={bk.blocks.size * bk.blocks.dtype.itemsize/1e6:.0f} MB",
          file=sys.stderr)

    mv = jax.jit(lambda b, v: band_matvec(b, meta, v))
    ident = jax.jit(lambda v: v)

    xs = [jnp.asarray(np.random.default_rng(i).standard_normal(n)) for i in range(reps)]
    # warm both executables
    float(jnp.sum(mv(bk, xs[0])))
    float(jnp.sum(ident(xs[0])))

    def timed(label, fn):
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(xs[i])))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{label:24s} median {med:8.2f} ms  min {min(ts)*1e3:8.2f} ms",
              file=sys.stderr)
        return med

    rtt = timed("identity-sum (RTT)", lambda v: ident(v))
    band = timed("band matvec int8", lambda v: mv(bk, v))
    print(f"[net] band matvec ~ {band - rtt:.2f} ms device time "
          f"(round-1 f64-block figure: ~10 ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
