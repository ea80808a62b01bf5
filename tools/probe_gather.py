"""Gather-cost scaling probe on the attached device: same (R, NN) index set
gathering from (N,) arrays of different dtypes and from a packed (N, 2) f64
row layout (complex128 is unsupported on this TPU) — decides how to cut the rate build's two
gathers (potential[j] f64 + code[j] int32).

Forced-sync protocol per PERF_NOTES (scalar pull per call, identity-RTT
calibrated).

    python tools/probe_gather.py [reps]
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

    N, R, NN = 37650, 20224, 40
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, (R, NN)), jnp.int32)

    f64 = jnp.asarray(rng.standard_normal(N))
    i32 = jnp.asarray(rng.integers(0, 100, N), jnp.int32)
    i8 = jnp.asarray(rng.integers(0, 100, N), jnp.int8)
    pack2 = jnp.stack([f64, i32.astype(jnp.float64)], axis=1)   # (N, 2) f64

    g = jax.jit(lambda a, j: jnp.sum(a[j].astype(jnp.float64)))
    grow = jax.jit(lambda a, j: jnp.sum(a[j]))                  # (N,2)[j] -> (R,NN,2)
    ident = jax.jit(lambda j: jnp.sum(j).astype(jnp.float64))

    idxs = [jnp.asarray(rng.integers(0, N, (R, NN)), jnp.int32) for _ in range(reps)]

    def timed(label, fn, a):
        float(fn(a, idxs[0]))  # warm/compile
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(fn(a, idxs[i]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{label:24s} median {med:8.2f} ms", file=sys.stderr)
        return med

    float(ident(idxs[0]))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(ident(idxs[i]))
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts)) * 1e3
    print(f"{'identity-sum (RTT)':24s} median {rtt:8.2f} ms", file=sys.stderr)

    a = timed("f64 (N,)[j]", g, f64)
    b = timed("int32 (N,)[j]", g, i32)
    c = timed("int8 (N,)[j]", g, i8)
    d = timed("f64 (N,2)[j] rows", grow, pack2)
    print(f"[net ms] f64={a-rtt:.1f} i32={b-rtt:.1f} i8={c-rtt:.1f} "
          f"pack2={d-rtt:.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
