"""Matrix tooling: COO assembly equals the matrix-free operator; row-sum
invariant; dump round trip (reference: test_matrices.py / spy_CSR.py class)."""

import os

import jax.numpy as jnp
import numpy as np

from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.ops.charge import update_charge_compact
from akmc_tpu.postprocessing.matrices import (
    assemble_k_coo,
    check_row_sum_invariant,
    dump_matrix_txt,
)
from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.state import make_substoichiometric


def test_k_coo_matches_operator(tmp_path):
    from tests.util_toy import toy_device

    from akmc_tpu.solvers.poisson import solve_potential_boundary

    p, lat = toy_device(nx=8, ny=3, nz=3)
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(3))
    model = VCMModel(p, lat)
    elem = jnp.asarray(lat.element0)
    q = update_charge_compact(
        elem, jnp.zeros(lat.N, jnp.int32), model.tables.neigh_idx,
        model.tables.any_metal_nbr, vmax=64,
    )
    Vd = 2.0
    A, rhs = assemble_k_coo(model, lat.element0, np.asarray(q), Vd)

    # matrix action == matrix-free operator action (via a solve both ways)
    x = np.linalg.solve(A.toarray(), rhs)
    full, res = solve_potential_boundary(
        elem, q, jnp.zeros(lat.N), model.tables.k_neigh_idx,
        model.tables.metal_edge, Vd, p.high_G, p.low_G,
        p.num_atoms_first_layer,
    )
    L = p.num_atoms_first_layer
    got = np.asarray(full)[L : lat.N - L]
    resid = np.abs(A @ got - rhs).max() / np.abs(rhs).max()
    assert resid < 1e-8

    # invariant: row sums equal the contact contributions (lsum+rsum)
    lr = rhs * 0
    # recompute lsum+rsum directly
    from akmc_tpu.solvers.poisson import edge_conductance

    G = np.asarray(
        edge_conductance(elem, q, model.tables.k_neigh_idx,
                         model.tables.metal_edge, p.high_G, p.low_G)
    )
    nbr = lat.k_neigh_idx
    valid = nbr >= 0
    j = np.clip(nbr, 0, None)
    lsum = np.where(valid & (j < L), G, 0).sum(1)[L : lat.N - L]
    rsum = np.where(valid & (j >= lat.N - L), G, 0).sum(1)[L : lat.N - L]
    assert check_row_sum_invariant(A, lsum + rsum)

    path = os.path.join(tmp_path, "K.txt")
    dump_matrix_txt(A, path)
    header = open(path).readline().split()
    assert int(header[0]) == A.shape[0] and int(header[1]) == A.nnz
