"""DIA (offset-diagonal) K operator on grid-native crossbar structures:
exactness vs explicit assembly, solver equivalence vs the ELL path, and
end-to-end superstep equivalence."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM
from akmc_tpu.models.crossbar import build_grid_crossbar
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.solvers.dia import build_dia_k, dia_matvec
from akmc_tpu.state import make_device_state


@pytest.fixture(scope="module")
def grid():
    p, lat = build_grid_crossbar(
        n_yz=6, contact_slices=2, oxide_slices=6, ti_slices=2,
        defect_fraction=0.3, vacancy_concentration=0.1, seed=3,
    )
    return p, lat


def test_grid_structure_is_dia(grid):
    from akmc_tpu.lattice import metal_mask

    p, lat = grid
    is_metal = metal_mask(lat.element0, p.metals)
    built = build_dia_k(
        np.stack([lat.x, lat.y, lat.z], 1), lat.k_neigh_idx, is_metal,
        p.num_atoms_first_layer, p.high_G, p.low_G,
    )
    assert built is not None, "grid crossbar not DIA-representable"
    dia, meta = built
    assert len(meta.offsets) <= 160
    # null slots carry no edges
    null = lat.element0 == int(ELEM.NULL_ELEMENT)
    assert null.any()
    assert not np.asarray(dia.active_row)[null].any()

    # matvec == explicit static-part assembly
    n = lat.N
    rng = np.random.RandomState(0)
    x = rng.randn(n)
    valid = lat.k_neigh_idx >= 0
    jc = np.clip(lat.k_neigh_idx, 0, None)
    mm = is_metal[:, None] & is_metal[jc] & valid
    w = np.where(valid, np.where(mm, p.high_G, p.low_G), 0.0)
    y_ref = (w * x[jc]).sum(1)
    y = np.asarray(dia_matvec(dia, meta, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-13, atol=1e-18)


def test_dia_solver_matches_ell(grid):
    p, lat = grid
    m_dia = VCMModel(p, lat)
    assert m_dia.dia is not None, "VCMModel did not select the DIA operator"
    m_ell = VCMModel(p, lat, use_dia_k=False, use_banded_k=False)
    assert m_ell.dia is None and m_ell.banded is None

    state = make_device_state(lat, p.background_temp)
    fr_d = m_dia._run_fields(state, 2.0)
    fr_e = m_ell._run_fields(state, 2.0)
    np.testing.assert_array_equal(np.asarray(fr_d.charge), np.asarray(fr_e.charge))
    # the conductive-vacancy correction (adjacency shift pass) must actually
    # be exercised: uncharged vacancies present
    cvac = (np.asarray(lat.element0) == int(ELEM.VACANCY)) & (
        np.asarray(fr_d.charge) == 0
    )
    assert cvac.sum() >= 2, "fixture has no conductive vacancies"
    # same matrix/rhs/CG semantics; fp association differs below tolerance
    np.testing.assert_allclose(
        np.asarray(fr_d.potential_boundary),
        np.asarray(fr_e.potential_boundary),
        rtol=1e-6, atol=1e-9,
    )


def test_dia_superstep_matches_ell(grid):
    p, lat = grid

    def run(**kw):
        model = VCMModel(p, lat, **kw)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        ev = []
        for _ in range(3):
            state, stats = model.superstep(state, 2.0, stream)
            ev.append(stats["n_events"])
        return state, ev

    s_d, ev_d = run()
    s_e, ev_e = run(use_dia_k=False, use_banded_k=False)
    assert ev_d == ev_e
    np.testing.assert_array_equal(np.asarray(s_d.element), np.asarray(s_e.element))
    assert float(s_d.kmc_time) == pytest.approx(float(s_e.kmc_time), rel=1e-9)
    # null slots never mutate
    null0 = lat.element0 == int(ELEM.NULL_ELEMENT)
    assert (np.asarray(s_d.element)[null0] == int(ELEM.NULL_ELEMENT)).all()


def test_stacked_matvec_matches_loop(grid):
    """dia_combined_matvec_stacked must agree with the per-diagonal loop
    form to reassociation tolerance (same entries, axis-0 reduce order),
    and the stacked CG solve must land on the same solution."""
    import jax.numpy as jnp

    from akmc_tpu.solvers.dia import (
        build_dia_k, dia_combined_matvec, dia_combined_matvec_stacked,
    )
    from akmc_tpu.lattice import metal_mask

    p, lat = grid
    pos = np.stack([lat.x, lat.y, lat.z], 1)
    is_metal = metal_mask(lat.element0, p.metals)
    built = build_dia_k(
        pos, lat.k_neigh_idx, is_metal, p.num_atoms_first_layer,
        p.high_G, p.low_G,
    )
    assert built is not None
    dia, meta = built
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(lat.N))
    xv = jnp.asarray(rng.standard_normal(lat.N))
    y1, v1 = dia_combined_matvec(dia, meta, x, xv)
    y2, v2 = dia_combined_matvec_stacked(dia, meta, x, xv)
    scale = float(np.abs(np.asarray(y1)).max())
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y1), rtol=1e-12, atol=1e-12 * scale
    )
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-12, atol=1e-14)

    # full solve equivalence (same matrix, same rhs; fp association only)
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.state import make_device_state

    m1 = VCMModel(p, lat)
    m2 = VCMModel(p, lat, dia_stacked=True)
    assert m1.dia is not None and m2.dia is not None
    state = make_device_state(lat, p.background_temp)
    f1 = m1._run_fields(state, 2.0)
    f2 = m2._run_fields(state, 2.0)
    pb1 = np.asarray(f1.potential_boundary)
    pb2 = np.asarray(f2.potential_boundary)
    np.testing.assert_allclose(
        pb2, pb1, rtol=1e-8, atol=1e-9 * max(1.0, np.abs(pb1).max())
    )


def test_shared_matvec_matches_combined(grid):
    """dia_combined_matvec_shared + fold_cvac_codes is BIT-IDENTICAL to the
    two-buffer dia_combined_matvec on CG-shaped inputs (xv = cvac-masked x):
    same per-offset accumulation order, and the source-mask fold only
    replaces multiplications by exact zeros. This is the default K-CG form
    (one padded buffer, D fewer full-N window reads per iteration)."""
    import jax.numpy as jnp

    from akmc_tpu.lattice import metal_mask
    from akmc_tpu.solvers.dia import (
        build_dia_k,
        dia_combined_matvec,
        dia_combined_matvec_shared,
        fold_cvac_codes,
    )

    p, lat = grid
    pos = np.stack([lat.x, lat.y, lat.z], 1)
    is_metal = metal_mask(lat.element0, p.metals)
    dia, meta = build_dia_k(
        pos, lat.k_neigh_idx, is_metal, p.num_atoms_first_layer,
        p.high_G, p.low_G,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(lat.N))
    cvac = jnp.asarray(rng.random(lat.N) < 0.3)
    xv = jnp.where(cvac, x, 0.0)

    y1, v1 = dia_combined_matvec(dia, meta, x, xv)
    dcodes = fold_cvac_codes(dia, meta, cvac)
    y2, v2 = dia_combined_matvec_shared(dcodes, dia, meta, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
