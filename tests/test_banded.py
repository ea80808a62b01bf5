"""Banded-dense K operator vs the ELL reference path: identical matrix
action and equivalent solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.state import make_substoichiometric

METALS = ["Ti", "N"]


@pytest.fixture(scope="module")
def setup():
    from tests.util_toy import toy_device

    from akmc_tpu.lattice import metal_mask
    from akmc_tpu.ops.charge import update_charge
    from akmc_tpu.solvers.banded import build_banded_k

    p, lat = toy_device(nx=10, ny=4, nz=4, contact_layers=2)
    lat.element0[:] = make_substoichiometric(lat.element0, 0.25, ReferenceRNG(3))
    pos = np.stack([lat.x, lat.y, lat.z], 1)
    is_metal = metal_mask(lat.element0, METALS)

    built = build_banded_k(
        pos, lat.k_neigh_idx, is_metal, lat.element0,
        p.num_atoms_first_layer, p.high_G, p.low_G, block_rows=64,
    )
    assert built is not None
    bk, meta = built

    jc = np.clip(lat.neigh_idx, 0, None)
    any_metal = (is_metal[jc] & (lat.neigh_idx >= 0)).any(axis=1)
    charge = np.asarray(
        update_charge(
            jnp.asarray(lat.element0), jnp.zeros(lat.N, jnp.int32),
            jnp.asarray(lat.neigh_idx), jnp.asarray(any_metal),
        )
    )
    return p, lat, bk, meta, is_metal, charge


def test_band_operator_matches_ell(setup):
    from akmc_tpu.lattice import ELEM
    from akmc_tpu.solvers.banded import band_matvec, cvac_correction
    from akmc_tpu.solvers.poisson import edge_conductance

    p, lat, bk, meta, is_metal, charge = setup
    n = lat.N
    elem = jnp.asarray(lat.element0)
    q = jnp.asarray(charge)
    dG = p.high_G - p.low_G

    metal_edge = (
        is_metal[:, None] & is_metal[np.clip(lat.k_neigh_idx, 0, None)]
    ) & (lat.k_neigh_idx >= 0)
    G = edge_conductance(
        elem, q, jnp.asarray(lat.k_neigh_idx), jnp.asarray(metal_edge),
        p.high_G, p.low_G,
    )
    valid = lat.k_neigh_idx >= 0
    Gv = np.where(valid, np.asarray(G), 0.0)

    rng = np.random.RandomState(0)
    x = rng.randn(n)

    # ELL action of the full off-diagonal operator: sum_j G_ij x_j
    y_ell = (Gv * x[np.clip(lat.k_neigh_idx, 0, None)]).sum(1)

    # banded action: static band + cvac correction (solver frame)
    xp = jnp.asarray(x)[bk.perm]
    y_band_p = band_matvec(bk, meta, xp)
    cvac = (elem == int(ELEM.VACANCY)) & (q == 0)
    vidx, vv, Wv, _ = cvac_correction(
        bk, cvac[bk.perm], p.nn_dist, jnp.asarray(np.asarray(p.lattice)),
        False, vmax=64,
    )
    xv = jnp.where(vv, xp[vidx.clip(0)], 0.0)
    corr = dG * (Wv @ xv)
    y_band_p = y_band_p + jnp.zeros(n).at[vidx.clip(0)].add(jnp.where(vv, corr, 0.0))
    y_band = np.asarray(y_band_p)[np.asarray(bk.inv_perm)]

    np.testing.assert_allclose(y_band, y_ell, rtol=1e-12, atol=1e-13)
    assert int(np.asarray(vv).sum()) > 0, "toy must exercise cvac correction"


def test_banded_solve_matches_ell_solve(setup):
    from akmc_tpu.solvers.banded import solve_potential_boundary_banded
    from akmc_tpu.solvers.poisson import solve_potential_boundary

    p, lat, bk, meta, is_metal, charge = setup
    elem = jnp.asarray(lat.element0)
    q = jnp.asarray(charge)
    Vd = 2.0
    metal_edge = (
        is_metal[:, None] & is_metal[np.clip(lat.k_neigh_idx, 0, None)]
    ) & (lat.k_neigh_idx >= 0)

    full_ell, res_ell = solve_potential_boundary(
        elem, q, jnp.zeros(lat.N), jnp.asarray(lat.k_neigh_idx),
        jnp.asarray(metal_edge), Vd, p.high_G, p.low_G,
        p.num_atoms_first_layer,
    )
    full_band, res_band = solve_potential_boundary_banded(
        bk, meta, elem, q, jnp.zeros(lat.N), Vd, p.high_G, p.low_G,
        p.num_atoms_first_layer, p.nn_dist,
        jnp.asarray(np.asarray(p.lattice)), False, vmax=64,
    )
    # same system, same stopping rule -> solutions agree within the solver
    # tolerance of this ill-conditioned system
    np.testing.assert_allclose(
        np.asarray(full_band), np.asarray(full_ell), rtol=1e-5, atol=1e-7
    )
    # similar iteration counts (fp ordering shifts the CG path slightly)
    assert abs(int(res_band.iterations) - int(res_ell.iterations)) <= max(
        3, int(res_ell.iterations) // 5
    )


def test_compact_mask_matches_nonzero():
    """ops.compact.compact_mask must reproduce jnp.nonzero(size, fill=-1)
    exactly — it replaces nonzero in the warm K solve's cvac compaction
    (the nonzero lowering measured ~6 ms/step on the tunneled v5e,
    tools/probe_kcarry_ablate.py round 3)."""
    import jax.numpy as jnp
    import numpy as np

    from akmc_tpu.ops.compact import compact_mask

    rng = np.random.default_rng(11)
    for n, size, p_true in [
        (37650, 768, 0.02),    # the 5 nm cvac shape
        (1000, 64, 0.05),
        (513, 8, 0.5),         # non-multiple of the 512 block
        (512, 16, 0.0),        # empty mask
        (100, 100, 1.0),       # full mask
        (64, 4, 0.5),          # overflow: more set bits than size
    ]:
        mask = jnp.asarray(rng.random(n) < p_true)
        want = jnp.nonzero(mask, size=size, fill_value=-1)[0].astype(jnp.int32)
        got, valid = compact_mask(mask, size)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(want) >= 0)
