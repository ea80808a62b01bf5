"""Boundary-potential (K system) and CB-edge (Laplace) solvers.

Reference: background_potential_gpu_sparse (potential_solver_gpu.cu:846-1128)
and update_CB_edge_gpu_sparse (potential_solver_gpu.cu:673-772).

The Kirchhoff network over the interface sites (everything except the first /
last contact slice of ``num_atoms_first_layer`` sites):

    A_ii = sum_j G_ij   (over ALL neighbors j, incl. contact slices)
    A_ij = -G_ij        (j an interface neighbor)
    rhs_i = Lsum_i * VL + Rsum_i * VR,  VL = -Vd/2, VR = +Vd/2
            (calc_rhs_for_A, potential_solver_gpu.cu:438-454; the committed
             solve stores the sign-flipped potential — kept as-is for parity)

with edge conductances (calc_off_diagonal_dist, potential_solver_gpu.cu:246):

    G_ij = high_G  if (metal_i and metal_j) or (neutral-vacancy_i and _j)
           low_G   otherwise

TPU realization: NO matrix assembly. The adjacency is the static padded ELL
table (PBC-aware, = the K CSR sparsity); edge values are recomputed on the
fly from element/charge inside the SpMV closure — a gather + select + masked
row-sum, which XLA fuses into one VPU pass. The conductance table ``G`` is
computed once per superstep and reused across CG iterations.

The contact-slice entries of the returned N-vector remain 0: the committed
reference never writes boundary values into site_potential_boundary
(kmc_main.cpp:567-573 is commented out), and sum_and_gather_potential only
broadcasts the interface span (potential_solver_gpu.cu:1130-1148).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from akmc_tpu.lattice import ELEM
from akmc_tpu.solvers.cg import CGResult, jacobi_cg, symscaled_cg


def edge_conductance(
    element: jnp.ndarray,       # (N,) int32
    charge: jnp.ndarray,        # (N,) int32
    k_neigh_idx: jnp.ndarray,   # (N, NN) int32 PBC-aware adjacency, -1 pad
    metal_edge: jnp.ndarray,    # (N, NN) bool: metal_i & metal_j (static)
    high_G: float,
    low_G: float,
) -> jnp.ndarray:
    """(N, NN) f64 edge conductances G_ij on the K sparsity."""
    j = k_neigh_idx.clip(0)
    cvac = (element == int(ELEM.VACANCY)) & (charge == 0)
    cvac_edge = cvac[:, None] & cvac[j]
    return jnp.where(metal_edge | cvac_edge, high_G, low_G)


def solve_potential_boundary(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    potential_boundary_prev: jnp.ndarray,   # (N,) f64 warm start
    k_neigh_idx: jnp.ndarray,
    metal_edge: jnp.ndarray,
    Vd,
    high_G: float,
    low_G: float,
    num_atoms_first_layer: int,
    rtol_coeff: float = 1e-14,
    max_iterations: int = 10000,
) -> Tuple[jnp.ndarray, CGResult]:
    """Solve the K system; returns the full-length N-vector (contacts zero)
    and CG diagnostics. rtol = rtol_coeff * N_interface
    (potential_solver_gpu.cu:884-886)."""
    n = element.shape[0]
    L = num_atoms_first_layer
    R = num_atoms_first_layer
    n_int = n - L - R

    G = edge_conductance(element, charge, k_neigh_idx, metal_edge, high_G, low_G)

    nbr = k_neigh_idx
    valid = nbr >= 0
    Gv = jnp.where(valid, G, 0.0)

    # row sums split by neighbor region (diagonal / rhs contributions)
    j = nbr.clip(0)
    in_left = valid & (j < L)
    in_right = valid & (j >= n - R)
    in_int = valid & ~(j < L) & ~(j >= n - R)

    # interface rows only
    diag = jnp.sum(Gv, axis=1)[L : n - R]                 # A_ii = sum all G_ij
    lsum = jnp.sum(jnp.where(in_left, G, 0.0), axis=1)[L : n - R]
    rsum = jnp.sum(jnp.where(in_right, G, 0.0), axis=1)[L : n - R]

    VL = -Vd / 2.0
    VR = Vd / 2.0
    rhs = lsum * VL + rsum * VR

    G_int = jnp.where(in_int, G, 0.0)[L : n - R]          # (N_int, NN)
    nbr_int = (j - L).clip(0)[L : n - R]                  # interface-local col

    def A(x):
        # A x = diag*x - sum_j G_ij x_j  over interface neighbors
        return diag * x - jnp.sum(G_int * x[nbr_int], axis=1)

    x0 = potential_boundary_prev[L : n - R]
    # zero-degree interface rows (e.g. a grid structure's null placeholder
    # slots) have diag 0: 1/diag = inf would NaN the preconditioned residual
    # and kill CG on the FIRST iteration; such rows carry rhs 0 and stay 0
    inv_diag = jnp.where(diag > 0.0, 1.0 / jnp.where(diag > 0.0, diag, 1.0), 1.0)
    res = jacobi_cg(A, rhs, x0, inv_diag, rtol_coeff * n_int, max_iterations)
    full = jnp.zeros(n, res.x.dtype).at[L : n - R].set(res.x)
    return full, res


def solve_cb_edge(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    cb_edge_prev: jnp.ndarray,              # (N,) f64 [J] warm start
    k_neigh_idx: jnp.ndarray,
    metal_or_edge: jnp.ndarray,             # (N, NN) bool: metal_i | metal_j (static)
    Vd,
    high_G: float,
    low_G: float,
    num_atoms_first_layer: int,
    tol: float = 1e-14,
    eV_to_J: float = 1.60217663e-19,
) -> Tuple[jnp.ndarray, CGResult]:
    """Laplace solve for the conduction-band edge profile, once per bias point.

    Reference: Assemble_A_CB + solve_sparse_CG_Jacobi + boundary fix + eV->J
    scaling (potential_solver_gpu.cu:574-772). Note the CB solve uses
    VL=+Vd/2, VR=-Vd/2 (the electron-energy sign) and the metal-OR rule for
    high-G edges (calc_off_diagonal_A_CB_gpu, 290-319).
    """
    n = element.shape[0]
    L = R = num_atoms_first_layer
    n_int = n - L - R

    nbr = k_neigh_idx
    valid = nbr >= 0
    G = jnp.where(metal_or_edge, high_G, low_G)
    Gv = jnp.where(valid, G, 0.0)

    j = nbr.clip(0)
    in_left = valid & (j < L)
    in_right = valid & (j >= n - R)
    in_int = valid & ~(j < L) & ~(j >= n - R)

    diag = jnp.sum(Gv, axis=1)[L : n - R]
    lsum = jnp.sum(jnp.where(in_left, G, 0.0), axis=1)[L : n - R]
    rsum = jnp.sum(jnp.where(in_right, G, 0.0), axis=1)[L : n - R]

    VL = Vd / 2.0
    VR = -Vd / 2.0
    rhs = lsum * VL + rsum * VR

    G_int = jnp.where(in_int, G, 0.0)[L : n - R]
    nbr_int = (j - L).clip(0)[L : n - R]

    def A(x):
        return diag * x - jnp.sum(G_int * x[nbr_int], axis=1)

    # warm start: the reference feeds the previous (J-scaled) buffer directly
    # as the V-space guess without undoing the eV->J scaling — i.e. a
    # near-zero guess. Kept as-is for parity (potential_solver_gpu.cu:738).
    x0 = cb_edge_prev[L : n - R]
    res = symscaled_cg(A, diag, rhs, x0, tol=tol)

    full = jnp.zeros(n, res.x.dtype)
    full = full.at[L : n - R].set(res.x)
    full = full.at[:L].set(Vd / 2.0)
    full = full.at[n - R :].set(-Vd / 2.0)
    return full * eV_to_J, res
