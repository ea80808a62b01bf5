"""Decompose the CG body's vector-algebra cost at crossbar scale.

probe_cg_phase measured the jacobi_cg body's dots/axpys/z-mul at ~108
ms/iteration (n=4.62M) — 5x the DIA matvec. This probe times each
primitive alone, chained-in-one-jit, to find which dd-f64 op is
pathological and test candidate replacements:

  axpy        x + a*p                     (3 per CG iteration)
  mul         r * inv_diag                (1 per iteration)
  dot         jnp.dot(v, w)               (2 per iteration)
  mulsum      jnp.sum(v * w)              (dot written as mul+reduce)
  sum         jnp.sum(v)
  sum2d       v.reshape(-1, 4096).sum(0).sum()   (two-stage reduction)
  dot_f32     f32 cast + dot + f64 cast   (production-lever candidate)
  fused_iter  all 6 body vector ops in one chain link (fusion check)

Usage: python tools/probe_vec_ops.py [n] [K] [reps]
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_622_500
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(n))
    w = jnp.asarray(rng.randn(n))

    def bench(make_body, name, per=K):
        def chain(x0):
            return jax.lax.fori_loop(0, K, make_body, x0)
        f = jax.jit(chain)
        ts = []
        for i in range(reps):
            xi = v * (1.0 + 1e-9 * i)
            t0 = time.perf_counter()
            out = f(xi)
            _ = float(jnp.sum(out) if out.ndim else out)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med/per*1e3:8.3f} ms/op  (chain of {per}: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + " ms)", file=sys.stderr)
        return med / per

    r = {}
    r["axpy"] = bench(lambda i, x: x + 1.0000001 * w, "axpy   ")
    r["mul"] = bench(lambda i, x: x * w, "mul    ")

    # dot chains: keep a scalar-dependent chain so nothing is hoisted
    def dot_body(i, x):
        s = jnp.dot(x, w)
        return x * (1.0 + 1e-18 * s)
    r["dot"] = bench(dot_body, "dot    ")

    def mulsum_body(i, x):
        s = jnp.sum(x * w)
        return x * (1.0 + 1e-18 * s)
    r["mulsum"] = bench(mulsum_body, "mulsum ")

    def sum_body(i, x):
        s = jnp.sum(x)
        return x * (1.0 + 1e-18 * s)
    r["sum"] = bench(sum_body, "sum    ")

    pad = (-n) % 4096
    def sum2d_body(i, x):
        xp = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x
        s = jnp.sum(jnp.sum(xp.reshape(-1, 4096), axis=0))
        return x * (1.0 + 1e-18 * s)
    r["sum2d"] = bench(sum2d_body, "sum2d  ")

    def dotf32_body(i, x):
        s = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32)).astype(jnp.float64)
        return x * (1.0 + 1e-18 * s)
    r["dot_f32"] = bench(dotf32_body, "dot_f32")

    # the full body vector algebra fused in one link (what XLA makes of it)
    inv_diag = jnp.abs(w) + 1.0
    def fused_body(i, x):
        Ap = x * w                      # stub operator
        pAp = jnp.dot(x, Ap)
        a = 1.0 / (pAp + 3.0)
        xn = x + a * x
        rn = x - a * Ap
        z = rn * inv_diag
        rz = jnp.dot(rn, z)
        beta = rz / (rz + 1.0)
        p = z + beta * x
        return p * (1.0 / (jnp.max(jnp.abs(p)) + 1.0)) + xn * 1e-6
    r["fused_iter"] = bench(fused_body, "fused  ")

    import json
    print(json.dumps({"n": n, "K": K, **{k: val * 1e3 for k, val in r.items()}}))


if __name__ == "__main__":
    main()
