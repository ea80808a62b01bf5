"""Compile-check + A/B timing of the Pallas DIA kernel on the real TPU.

Compares dia_combined_matvec (XLA dd-f64), the stacked variant, and the
Pallas two-f32 kernel on a synthetic system with the real crossbar offset
geometry, at a configurable scale. Values are checked to the kernel's
accuracy class (~2^-45 relative); per-matvec time is measured with the
forced-pull bracket (PERF_NOTES: block_until_ready returns early).

Usage: python tools/probe_pallas_dia.py [n] [reps]
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

from akmc_tpu.solvers.dia import (
    DiaK, DiaMeta, dia_combined_matvec, dia_combined_matvec_stacked,
)
from akmc_tpu.ops.pallas_dia import dia_combined_matvec_pallas, plan_dia_pallas


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    # real grid-native crossbar offset classes: +-1 (chain), +-S-ish slice
    # strides, and the two-sublattice interleave couplings
    S = 4 * 208 * 2   # x-slice stride class for a 104-cell cross-section
    offsets = sorted(
        {-1, 1, -2, 2, -S, S, -S - 1, S + 1, -S + 1, S - 1,
         -2 * S, 2 * S, -S - 2, S + 2, -3, 3, -S + 2, S - 2}
    )
    D = len(offsets)
    rng = np.random.RandomState(0)
    diags = np.where(rng.rand(D, n) < 0.6, rng.randint(1, 3, (D, n)), 0).astype(np.int8)
    dia = DiaK(
        diags=jnp.asarray(diags), deg_static=jnp.zeros(n), lsum=jnp.zeros(n),
        rsum=jnp.zeros(n), pos=jnp.zeros((n, 3)), active_row=jnp.ones(n, bool),
    )
    meta = DiaMeta(offsets=tuple(offsets), val_low=1e-8, val_high=1.0)
    plan = plan_dia_pallas(offsets, n)
    print(f"n={n} D={D} plan: G={len(plan.group_base)} block={plan.block} "
          f"win={plan.win} n_pad={plan.n_pad}", file=sys.stderr)

    x = jnp.asarray(rng.randn(n) * np.exp(2 * rng.randn(n)))
    xv = jnp.asarray(rng.randn(n) * (rng.rand(n) < 0.3))

    f_ref = jax.jit(lambda x, xv: dia_combined_matvec(dia, meta, x, xv))
    f_stk = jax.jit(lambda x, xv: dia_combined_matvec_stacked(dia, meta, x, xv))
    f_pal = jax.jit(lambda x, xv: dia_combined_matvec_pallas(dia, meta, plan, x, xv))

    y0, v0 = f_ref(x, xv)
    sy = float(jnp.max(jnp.abs(y0)))
    y1, v1 = f_pal(x, xv)
    err_y = float(jnp.max(jnp.abs(y1 - y0))) / sy
    err_v = float(jnp.max(jnp.abs(v1 - v0))) / (float(jnp.max(jnp.abs(v0))) + 1e-300)
    print(f"pallas rel err: y={err_y:.3e} v={err_v:.3e}", file=sys.stderr)
    assert err_y < 1e-11 and err_v < 1e-11, "ACCURACY FAIL"

    def bench(f, name):
        # vary inputs per call (runtime result-caches identical calls)
        ts = []
        for i in range(reps):
            xi = x * (1.0 + 1e-9 * i)
            t0 = time.perf_counter()
            y, v = f(xi, xv)
            _ = float(jnp.sum(y) + jnp.sum(v))   # forced pull = sync
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med*1e3:.1f} ms  (all: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", file=sys.stderr)
        return med

    m_ref = bench(f_ref, "xla default ")
    m_stk = None
    if "--no-stacked" not in sys.argv:
        m_stk = bench(f_stk, "xla stacked ")
    m_pal = bench(f_pal, "pallas      ")

    # chained mode: K dependent matvecs inside ONE jit, one pull — resolves
    # true device time below the ~28 ms dispatch/RTT floor the per-call
    # bracket can't see under (PERF_NOTES: per-dispatch ~90 ms, RTT ~28 ms).
    K = 50

    def chain(mv):
        def body(i, xc):
            y, v = mv(xc, xv)
            # keep the chain norm-stable and data-dependent
            return y * (1.0 / (jnp.max(jnp.abs(y)) + 1.0)) + xc * 1e-3
        return jax.jit(lambda x0: jax.lax.fori_loop(0, K, body, x0))

    c_ref = chain(lambda a, b: dia_combined_matvec(dia, meta, a, b))
    c_pal = chain(lambda a, b: dia_combined_matvec_pallas(dia, meta, plan, a, b))

    def bench_chain(f, name):
        ts = []
        for i in range(reps):
            xi = x * (1.0 + 1e-9 * i)
            t0 = time.perf_counter()
            y = f(xi)
            _ = float(jnp.sum(y))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med/K*1e3:.2f} ms/matvec (chain of {K}: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + " ms)", file=sys.stderr)
        return med / K

    mc_ref = bench_chain(c_ref, "chained xla   ")
    mc_pal = bench_chain(c_pal, "chained pallas")
    print({"n": n, "D": D, "ms_default": m_ref * 1e3,
           "ms_stacked": None if m_stk is None else m_stk * 1e3,
           "ms_pallas": m_pal * 1e3,
           "ms_chain_default": mc_ref * 1e3, "ms_chain_pallas": mc_pal * 1e3,
           "err_y": err_y, "err_v": err_v})


if __name__ == "__main__":
    main()
