"""Standalone distributed-CG test harness.

Reference equivalent: dist_iterative_test/ — a driver that exercises the
distributed solver library against stored matrices with hardcoded sizes
(main_test.cpp:46-56) and checks the relative error of the solution. That
harness only runs on the LUMI cluster against /scratch data; this one
generates reference-class systems synthetically and runs on any device
mesh, including the virtual CPU mesh. Two system classes:

* K-class (``make_system``): SPD graph Laplacian + boundary ties,
  high_G/low_G contrast — the boundary-potential system.
* T-class (``make_system_split``): the SPLIT operator the reference's
  harness drives through ``spmm_split_sparse`` (main_test_cg_split.cpp,
  dist_spmv_split_sparse.cpp:5-78) — a sparse neighbor part over ALL
  nodes ⊕ a DENSE tunnel subblock on a node subset. The reference's
  flagship instance is 102,722 nodes with a 14,854-site subblock at
  94.2 M nnz = 43% dense (main_test.cpp:46-52); here the subblock is a
  masked dense Laplacian at the same density, applied as
  gather → row-sharded dense matvec → scatter-add (the TPU-native form
  of their pack → rocsparse_spmv → unpack_add; PERF_NOTES round 3 has
  the measured sparse-vs-dense argument).

CLI:
    python -m akmc_tpu.solvers.cg_harness --n 100000 --devices 8 --contrast 1e8
    python -m akmc_tpu.solvers.cg_harness --t-class --n 102722 --sub 14854 --devices 8
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


def make_system_split(
    n: int,
    n_sub: int,
    density: float = 0.43,
    nnz_per_row: int = 12,
    contrast: float = 1e8,
    seed: int = 0,
):
    """T-class split system: the K-class sparse neighbor part over all n
    nodes plus a dense tunnel subblock on ``n_sub`` randomly chosen nodes.

    The subblock mirrors the reference instance's structure
    (main_test.cpp:46-52): symmetric, ~``density`` of entries nonzero
    (their "sparsity" criterion is species eligibility + |dE| tolerance,
    initialize_sparsity_T.cu:212-290 — not geometric decay), positive
    off-diagonal conductances folded into the global diagonal so the total
    operator stays SPD (Laplacian construction).

    Returns (nbr, w, sub_idx, W_off, sub_rowsum):
      * nbr/w: the sparse part (as ``make_system``),
      * sub_idx: (n_sub,) sorted node indices of the subblock,
      * W_off: (n_sub, n_sub) symmetric off-diagonal weights, zero diagonal,
      * sub_rowsum: (n_sub,) row sums of W_off (the diagonal contribution).
    """
    rng = np.random.RandomState(seed + 7)
    nbr, w = make_system(n, nnz_per_row=nnz_per_row, contrast=contrast, seed=seed)
    sub_idx = np.sort(rng.choice(n, size=n_sub, replace=False)).astype(np.int32)
    # symmetric mask at the target density; symmetric positive weights
    mask = rng.rand(n_sub, n_sub) < density
    mask = np.triu(mask, 1)
    mask = mask | mask.T
    W_off = np.where(mask, rng.rand(n_sub, n_sub), 0.0)
    W_off = 0.5 * (W_off + W_off.T)
    sub_rowsum = W_off.sum(axis=1)
    return nbr, w, sub_idx, W_off, sub_rowsum


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


def run_split(
    n: int,
    n_sub: int,
    devices: int,
    contrast: float = 1e8,
    density: float = 0.43,
    rtol_coeff: float = 1e-14,
):
    """Drive the T-class split operator (sparse neighbor ⊕ dense tunnel
    subblock) through the same Jacobi-CG the production power solve uses.

    The subblock applies as gather → dense row-sharded matvec
    (``f64_matvec`` — f64 dot_general is pathological on this runtime) →
    scatter-add, replacing the reference's pack_gpu → Isend/Irecv ring →
    rocsparse_spmv → unpack_add (dist_spmv_split_sparse.cpp:5-78).
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from akmc_tpu.parallel.mesh import make_mesh
    from akmc_tpu.solvers.cg import f64_matvec, jacobi_cg

    nbr, w, sub_idx, W_off, sub_rowsum = make_system_split(
        n, n_sub, density=density, contrast=contrast
    )
    colsum = np.zeros(n)
    np.add.at(colsum, nbr.reshape(-1), w.reshape(-1))
    diag_np = 0.5 * (w.sum(1) + colsum) + 1.0
    diag_np[sub_idx] += sub_rowsum   # subblock Laplacian diagonal
    nbr_j = jnp.asarray(nbr)
    w_j = jnp.asarray(w)
    diag = jnp.asarray(diag_np)
    sub_j = jnp.asarray(sub_idx)
    W_j = jnp.asarray(W_off)

    mesh = None
    if devices > 1:
        mesh = make_mesh(devices)
        rs = NamedSharding(mesh, P("sites"))
        rep = NamedSharding(mesh, P())
        nbr_j = jax.device_put(nbr_j, rs)
        w_j = jax.device_put(w_j, rs)
        # the dense tunnel block row-shards over the mesh (the reference
        # distributes it "over rows, NOT over blocks" — main_test_cg_split);
        # pad rows to a mesh multiple if needed
        W_j = jax.device_put(W_j, rs if n_sub % devices == 0 else rep)
        diag = jax.device_put(diag, rep)
        sub_j = jax.device_put(sub_j, rep)

    def A(x):
        y = diag * x - 0.5 * jnp.sum(w_j * x[nbr_j], axis=1)
        contrib = 0.5 * w_j * x[:, None]
        y = y - jnp.zeros_like(x).at[nbr_j.reshape(-1)].add(contrib.reshape(-1))
        # tunnel subblock: gather the subvector, dense matvec, scatter-add
        x_sub = x[sub_j]
        y = y.at[sub_j].add(-f64_matvec(W_j, x_sub))
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
        "n_sub": n_sub,
        "subblock_density": density,
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
    ap.add_argument("--t-class", action="store_true",
                    help="split T-class system (sparse ⊕ dense tunnel "
                         "subblock, main_test_cg_split.cpp equivalent)")
    ap.add_argument("--sub", type=int, default=None,
                    help="T-class subblock size (default: 14.46%% of n, the "
                         "reference instance's ratio)")
    ap.add_argument("--density", type=float, default=0.43,
                    help="T-class subblock density (reference: 94.2M nnz in "
                         "14854^2 = 43%%)")
    args = ap.parse_args()
    if args.t_class:
        n_sub = args.sub if args.sub is not None else max(2, int(args.n * 0.1446))
        print(run_split(args.n, n_sub, args.devices, args.contrast, args.density))
    else:
        print(run(args.n, args.devices, args.contrast))


if __name__ == "__main__":
    main()
