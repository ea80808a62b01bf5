"""Crossbar generation + initialization path (the reference's 40 nm workload
ships without structure files; generators synthesize equivalents)."""

import numpy as np
import pytest

from akmc_tpu.config import KMCParameters, Layer
from akmc_tpu.lattice import ELEM, build_lattice
from akmc_tpu.models.crossbar import synthetic_stack, tile_device
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


def test_tile_device_doubles():
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=6, ny=3, nz=3)
    e2, x2, y2, z2, latt = tile_device(
        lat.element0, lat.x, lat.y, lat.z, tuple(p.lattice), 2, 3
    )
    assert len(e2) == 6 * lat.N
    assert latt[1] == 2 * p.lattice[1]
    assert latt[2] == 3 * p.lattice[2]
    # element census scales exactly
    for el in np.unique(lat.element0):
        assert (e2 == el).sum() == 6 * (lat.element0 == el).sum()


def test_synthetic_stack_runs_end_to_end():
    e, x, y, z, latt, patch = synthetic_stack(
        n_yz=6, contact_slices=3, oxide_slices=6, ti_slices=2,
        vacancy_defect_fraction=0.3, seed=1,
    )
    assert (e == int(ELEM.DEFECT)).sum() > 0
    assert (e == int(ELEM.O)).sum() > 0

    x_span = x.max() - x.min()
    layers = [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, x.min() - 1, x.min() + 3 * 2.14),
        Layer("oxide", 1.5, 0.1, 1.09, 0.76, x.min() + 3 * 2.14, x.max() - 5 * 2.14),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, x.max() - 5 * 2.14, x.max() + 1),
    ]
    p = KMCParameters(
        lattice=list(latt),
        nn_dist=2.14 * 1.3,
        metals=["Ti", "N"],
        num_atoms_first_layer=patch["num_atoms_first_layer"],
        num_layers_contact=patch["num_layers_contact"],
        layers=layers,
        max_num_neighbors=32,
        cutoff_radius=8.0,
        solve_potential=True,
        perturb_structure=True,
        freq=10e13,
    )
    e = make_substoichiometric(e, 0.1, ReferenceRNG(4))
    lat = build_lattice(e, x, y, z, p)
    model = VCMModel(p, lat)
    state = make_device_state(lat, 300.0)
    stream = BufferedStream(ReferenceRNG(1))
    state, stats = model.superstep(state, 3.0, stream)
    assert stats["n_events"] >= 1
    assert np.isfinite(float(state.kmc_time))


def test_grid_crossbar_production_path_regression():
    """Pinned trajectory for the crossbar PRODUCTION configuration (DIA K
    operator + tiled pairwise + shifted-exponent rates) — the path has no
    reference golden, so this guards it against silent regressions. Any
    INTENTIONAL fp-reassociation change (new operator formulations) will
    trip this test; re-pin consciously after validating equivalence the way
    the round-2 changes were (tiled-vs-on-the-fly oracle, DIA-vs-ELL)."""
    from akmc_tpu.models.crossbar import build_grid_crossbar

    p, lat = build_grid_crossbar(
        n_yz=8, contact_slices=3, oxide_slices=8, ti_slices=3,
        defect_fraction=0.2, vacancy_concentration=0.1, seed=11,
    )
    model = VCMModel(
        p, lat, rate_normalize=True, pair_table_budget=0, pair_tiling_min_n=1
    )
    assert model.dia is not None and model.tables.pair_tiling is not None
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(2))
    events, cg = [], []
    for _ in range(3):
        state, stats = model.superstep(state, 15.0, stream)
        events.append(stats["n_events"])
        cg.append(stats["cg_iterations"])
    assert events == [13, 13, 15]
    assert cg == [68, 83, 56]
    np.testing.assert_allclose(float(state.kmc_time), 457.239148068819, rtol=1e-9)


def test_normalized_rates_cross_validated_at_moderate_bias():
    """Independent oracle for the production (rate_normalize) path at the
    crossbar structure class and a bias where BOTH formulations are in
    range on CPU's true-f64 (Vd=8: |EA/kT| < 700 everywhere): the
    shifted-exponent trajectory must equal the absolute-rate trajectory
    event-for-event. Upgrades the Vd=15 self-pinned regression (where the
    absolute path overflows even real f64) to cross-validated status.
    Reference rate formula: kmc_events.cu:150."""
    from akmc_tpu.models.crossbar import build_grid_crossbar

    p, lat = build_grid_crossbar(
        n_yz=12, contact_slices=3, oxide_slices=8, ti_slices=3,
        defect_fraction=0.2, vacancy_concentration=0.1, seed=11,
    )

    def run(normalize):
        model = VCMModel(
            p, lat, rate_normalize=normalize, pair_table_budget=0,
            pair_tiling_min_n=1,
        )
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(2))
        ev = []
        for _ in range(2):
            state, stats = model.superstep(state, 8.0, stream)
            ev.append(stats["n_events"])
        return state, ev

    s_abs, ev_abs = run(False)
    s_norm, ev_norm = run(True)
    assert ev_abs == ev_norm and sum(ev_abs) >= 2
    np.testing.assert_array_equal(
        np.asarray(s_abs.element), np.asarray(s_norm.element)
    )
    np.testing.assert_array_equal(
        np.asarray(s_abs.charge), np.asarray(s_norm.charge)
    )
    # waiting times reconstructed in log space agree to fp-reassociation
    np.testing.assert_allclose(
        float(s_norm.kmc_time), float(s_abs.kmc_time), rtol=1e-12
    )


def test_max_in_reach_count():
    """The pair_cand_cap auto-sizer's branch-and-bound counter: exact with
    an unbounded budget, exact on clustered fields via the early stop, and
    within 10% under the default budget backstop (whose residual the
    runtime c-cap overflow growth covers). Replaced the O(T*Q) all-pairs
    count that took ~25 min on the 1-core host at the 2.41M-site crossbar."""
    import numpy as np

    from akmc_tpu.models.vcm import _max_in_reach_count

    rng = np.random.default_rng(0)
    for _ in range(6):
        Q = int(rng.integers(50, 3000))
        T = int(rng.integers(10, 3000))
        box = rng.uniform(20, 200)
        pos_q = rng.uniform(0, box, (Q, 3))
        cen = rng.uniform(-10, box + 10, (T, 3))
        reach = rng.uniform(3, 40)
        d2 = ((cen[:, None, :] - pos_q[None, :, :]) ** 2).sum(-1)
        exact = int((d2 < reach * reach).sum(axis=1).max())
        assert _max_in_reach_count(cen, pos_q, reach, budget=1 << 30) == exact
        gb = _max_in_reach_count(cen, pos_q, reach)
        assert 0.9 * exact <= gb <= exact
    # clustered: the early stop proves exactness within the default budget
    pos_q = np.concatenate(
        [rng.normal(50, 2, (3000, 3)), rng.uniform(0, 100, (1000, 3))]
    )
    cen = rng.uniform(0, 100, (5000, 3))
    d2 = ((cen[:, None, :] - pos_q[None, :, :]) ** 2).sum(-1)
    exact = int((d2 < 64.0).sum(axis=1).max())
    assert _max_in_reach_count(cen, pos_q, 8.0) == exact


def test_pair_f32_production_statistics():
    """pair_f32 (f32 kernel plane) on the toy crossbar production config:
    trajectories cannot be bit-identical (the potential differs at 1e-6
    relative), but the superstep event statistics must stay consistent
    with the f64 plane from the same initial state and key."""
    import jax

    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.state import make_device_state

    p, lat = build_grid_crossbar(
        n_yz=8, contact_slices=3, oxide_slices=8, ti_slices=3,
        defect_fraction=0.2, vacancy_concentration=0.1, seed=11,
    )

    def run(f32):
        model = VCMModel(
            p, lat, rate_normalize=True, pair_table_budget=0,
            pair_tiling_min_n=1, pair_f32=f32,
        )
        state = make_device_state(lat, p.background_temp)
        key = jax.random.PRNGKey(3)
        ev = 0
        for _ in range(3):
            state, stats, key = model.superstep_native_batched(
                state, 15.0, key, batch=16
            )
            ev += stats["n_events"]
        return ev, float(state.kmc_time)

    ev64, t64 = run(False)
    ev32, t32 = run(True)
    assert ev64 >= 3 and ev32 >= 3
    assert 0.3 <= (ev32 + 1) / (ev64 + 1) <= 3.0
    assert np.isfinite(t32) and t32 > 0


def test_grid_neighbor_list_matches_cell_list():
    """The analytic grid-native neighbor builder must reproduce the native
    C++ cell-list table EXACTLY (same neighbors, same ascending order,
    same padding) — it replaces the 234 s spatial search in crossbar init
    (BENCH_init_r03)."""
    from akmc_tpu import native
    from akmc_tpu.models.crossbar import grid_neighbor_list, grid_stack

    if not native.available():
        import pytest

        pytest.skip("native builder unavailable")

    n_yz, cs, os_, ts = 10, 3, 6, 2
    e, x, y, z, lattice, patch = grid_stack(
        n_yz=n_yz, contact_slices=cs, oxide_slices=os_, ti_slices=ts,
        defect_fraction=0.3, seed=0,
    )
    pos = np.stack([x, y, z], 1)
    nn_dist, max_nn = 3.5, 52
    want = native.neighbor_list_cell(pos, nn_dist, max_nn)
    got = grid_neighbor_list(n_yz, 2 * cs + os_ + ts, 2.131255, nn_dist, max_nn)
    np.testing.assert_array_equal(got, want)

    # null-aware mode must equal mask_null_slots' filter applied to the
    # cell-list table (same drops, same left-compaction order)
    null = e == 9
    drop = null[:, None] | (null[np.clip(want, 0, None)] & (want >= 0))
    wm = np.where(drop, -1, want)
    order = np.argsort(wm < 0, axis=1, kind="stable")
    wm = np.take_along_axis(wm, order, axis=1)
    gm = grid_neighbor_list(
        n_yz, 2 * cs + os_ + ts, 2.131255, nn_dist, max_nn, null_mask=null
    )
    np.testing.assert_array_equal(gm, wm)


def test_grid_dia_matches_generic():
    """The analytic grid DIA operator must be BIT-identical to the generic
    build_dia_k on the same grid structure: same offsets, same int8 codes,
    same degree/boundary sums to the last bit (constant edge values +
    same ascending-delta accumulation order)."""
    from akmc_tpu.lattice import metal_mask
    from akmc_tpu.models.crossbar import grid_dia_k, grid_stack
    from akmc_tpu.solvers.dia import build_dia_k
    from akmc_tpu.models.crossbar import grid_neighbor_list

    n_yz, cs, os_, ts = 10, 3, 6, 2
    a = 2.131255
    e, x, y, z, lattice, patch = grid_stack(
        n_yz=n_yz, contact_slices=cs, oxide_slices=os_, ti_slices=ts,
        defect_fraction=0.3, seed=0,
    )
    pos = np.stack([x, y, z], 1)
    nx_total = 2 * cs + os_ + ts
    is_metal = metal_mask(e, patch["metals"])
    nl = grid_neighbor_list(n_yz, nx_total, a, 3.5, 52)
    L = patch["num_atoms_first_layer"]
    high_G, low_G = 10.0, 1e-7

    # the real usage masks NULL-slot edges first (mask_null_slots) — the
    # analytic builder must exclude them identically
    null = e == 9
    drop = null[:, None] | (null[np.clip(nl, 0, None)] & (nl >= 0))
    nlm = np.where(drop, -1, nl)
    order = np.argsort(nlm < 0, axis=1, kind="stable")
    nlm = np.take_along_axis(nlm, order, axis=1)

    want = build_dia_k(pos, nlm, is_metal, L, high_G, low_G)
    got = grid_dia_k(
        n_yz, nx_total, a, 3.5, is_metal, L, high_G, low_G, pos,
        null_mask=null,
    )
    assert want is not None and got is not None
    dw, mw = want
    dg, mg = got
    assert mg.offsets == mw.offsets
    np.testing.assert_array_equal(np.asarray(dg.diags), np.asarray(dw.diags))
    np.testing.assert_array_equal(
        np.asarray(dg.deg_static), np.asarray(dw.deg_static)
    )
    np.testing.assert_array_equal(np.asarray(dg.lsum), np.asarray(dw.lsum))
    np.testing.assert_array_equal(np.asarray(dg.rsum), np.asarray(dw.rsum))
    np.testing.assert_array_equal(
        np.asarray(dg.active_row), np.asarray(dw.active_row)
    )
