"""Standalone distributed-CG test harness.

Reference equivalent: dist_iterative_test/ — a driver that exercises the
distributed solver library against stored matrices with hardcoded sizes
(main_test.cpp:46-56) and checks the relative error of the solution. That
harness only runs on the LUMI cluster against /scratch data; this one
generates reference-class systems synthetically (K-operator structure:
SPD graph Laplacian + boundary ties, high_G/low_G contrast) and runs on any
device mesh, including the virtual CPU mesh.

CLI:
    python -m akmc_tpu.solvers.cg_harness --n 100000 --devices 8 --contrast 1e8
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_system(n: int, nnz_per_row: int = 12, contrast: float = 1e8, seed: int = 0):
    """Random SPD system with K-matrix character: banded sparse graph
    Laplacian with bimodal edge weights {1, 1/contrast} + diagonal ties."""
    rng = np.random.RandomState(seed)
    bw = max(4, nnz_per_row * 4)
    nbr = (np.arange(n)[:, None] + rng.randint(1, bw, size=(n, nnz_per_row))) % n
    w = np.where(rng.rand(n, nnz_per_row) < 0.2, 1.0, 1.0 / contrast)
    return nbr.astype(np.int32), w


def run(n: int, devices: int, contrast: float, rtol_coeff: float = 1e-14):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from akmc_tpu.parallel.mesh import make_mesh
    from akmc_tpu.solvers.cg import jacobi_cg

    nbr, w = make_system(n, contrast=contrast)
    # operator: A = (I + D_sym) - 0.5 (W + W^T) with
    # D_sym_i = 0.5*(row_i(W) + col_i(W)) — symmetric and strictly
    # diagonally dominant with positive diagonal, hence SPD (the +I is the
    # boundary tie, mirroring the K matrix's contact reductions)
    colsum = np.zeros(n)
    np.add.at(colsum, nbr.reshape(-1), w.reshape(-1))
    nbr_j = jnp.asarray(nbr)
    w_j = jnp.asarray(w)
    diag = jnp.asarray(0.5 * (w.sum(1) + colsum) + 1.0)

    mesh = None
    if devices > 1:
        mesh = make_mesh(devices)
        rs = NamedSharding(mesh, P("sites"))
        nbr_j = jax.device_put(nbr_j, rs)
        w_j = jax.device_put(w_j, rs)
        diag = jax.device_put(diag, NamedSharding(mesh, P()))

    def A(x):
        # -0.5 W via gather (row action) and -0.5 W^T via scatter (transpose
        # action): together the symmetric off-diagonal part
        y = diag * x - 0.5 * jnp.sum(w_j * x[nbr_j], axis=1)
        contrib = 0.5 * w_j * x[:, None]
        y = y - jnp.zeros_like(x).at[nbr_j.reshape(-1)].add(contrib.reshape(-1))
        return y

    rng = np.random.RandomState(1)
    x_true = jnp.asarray(rng.randn(n))
    solve = jax.jit(
        lambda b, x0: jacobi_cg(A, b, x0, 1.0 / diag, rtol_coeff * n, 20000)
    )
    b = A(x_true)
    t0 = time.perf_counter()
    res = solve(b, jnp.zeros(n))
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    rel_err = float(jnp.linalg.norm(res.x - x_true) / jnp.linalg.norm(x_true))
    return {
        "n": n,
        "devices": devices,
        "iterations": int(res.iterations),
        "wall_s": dt,
        "rel_l2_error": rel_err,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--contrast", type=float, default=1e8)
    args = ap.parse_args()
    print(run(args.n, args.devices, args.contrast))


if __name__ == "__main__":
    main()
