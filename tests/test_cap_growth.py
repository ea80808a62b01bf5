"""Static-cap overflow detection + growth (qmax / vmax).

Round-1 advisor findings: vmax-capped compactions (charge update, banded
cvac correction, current-solver tunnel block) silently truncated via
jnp.nonzero(size=vmax), and a qmax grow left the batched `_multi_jits` /
native-path executables stale. Both paths must detect overflow, grow the
cap, invalidate every executable that baked it in, and reproduce the
trajectory of a roomy-cap model exactly.
"""

import numpy as np
import pytest

from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


@pytest.fixture(scope="module")
def toy():
    from tests.util_toy import toy_device

    p, lat = toy_device()
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
    return p, lat


def _run_multi(model, p, lat, k=3, chunk=512):
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))
    all_stats = []
    for _ in range(2):
        state, stats = model.superstep_multi(state, 2.0, stream, k=k, rand_chunk=chunk)
        all_stats += stats
    return state, all_stats


def test_vmax_overflow_grows_and_matches(toy):
    """vmax below the initial vacancy count: the first superstep must flag
    v_overflow (NOT silently truncate the charge update), grow, and match the
    roomy-cap trajectory bit-for-bit."""
    p, lat = toy
    roomy = VCMModel(p, lat)
    small = VCMModel(p, lat, vmax=8)

    s_r, st_r = _run_multi(roomy, p, lat)
    s_s, st_s = _run_multi(small, p, lat)

    assert small.vmax >= 16  # grew at least once
    np.testing.assert_array_equal(np.asarray(s_s.element), np.asarray(s_r.element))
    np.testing.assert_array_equal(np.asarray(s_s.charge), np.asarray(s_r.charge))
    assert [s["n_events"] for s in st_s] == [s["n_events"] for s in st_r]
    assert float(s_s.kmc_time) == float(s_r.kmc_time)


def test_qmax_growth_revives_batched_path(toy):
    """After a qmax grow, the NEXT superstep_multi batch must run through the
    (re-traced) batched executable, not fall back to sequential replay
    forever (round-1 advisor: stale _multi_jits)."""
    p, lat = toy
    model = VCMModel(p, lat, qmax=8)

    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))

    # first batch: overflows, replays sequentially, grows qmax
    state, _ = model.superstep_multi(state, 2.0, stream, k=2, rand_chunk=512)
    assert model.qmax > 8

    # second batch: must NOT take the sequential-replay path
    calls = {"n": 0}
    orig = model.superstep

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    model.superstep = spy
    state, stats = model.superstep_multi(state, 2.0, stream, k=2, rand_chunk=512)
    assert calls["n"] == 0, "batched path still replaying after cap growth"
    assert all(s["n_events"] >= 0 for s in stats)


def test_native_path_grows_caps(toy):
    import jax

    p, lat = toy
    roomy = VCMModel(p, lat)
    small = VCMModel(p, lat, qmax=8, vmax=8)

    def run(model):
        state = make_device_state(lat, p.background_temp)
        key = jax.random.PRNGKey(3)
        for _ in range(2):
            state, stats, key = model.superstep_native(state, 2.0, key)
        return state

    s_r, s_s = run(roomy), run(small)
    assert small.qmax > 8 and small.vmax > 8
    np.testing.assert_array_equal(np.asarray(s_s.element), np.asarray(s_r.element))
    assert float(s_s.kmc_time) == float(s_r.kmc_time)


def test_update_power_grows_vmax(toy):
    p, lat = toy
    p2 = p.replace(solve_current=True)
    roomy = VCMModel(p2, lat)
    small = VCMModel(p2, lat, vmax=8)

    state = make_device_state(lat, p2.background_temp)
    state = roomy.update_cb_edge(state, 2.0)

    _, I_r, _, _ = roomy.update_power(state, 2.0)
    _, I_s, _, _ = small.update_power(state, 2.0)
    assert small.vmax > 8
    assert I_s == pytest.approx(I_r, rel=1e-12)


def test_tiled_pairwise_superstep_matches_and_grows(toy):
    """A model forced onto the tiled-pairwise path (crossbar-scale
    production path) must reproduce the default-path event trajectory, and
    an undersized per-tile candidate cap must be detected (diag slot 7),
    grown, and replayed — not silently truncated."""
    p, lat = toy

    def run(**kw):
        model = VCMModel(p, lat, **kw)
        return model, *_run_multi(model, p, lat)

    _, s_ref, st_ref = run()                       # table path (default)
    m_t, s_t, st_t = run(pair_table_budget=0, pair_tiling_min_n=1)
    assert m_t.tables.pair_tiling is not None
    m_g, s_g, st_g = run(
        pair_table_budget=0, pair_tiling_min_n=1, pair_cand_cap=2
    )
    assert m_g.pair_cand_cap > 2                   # grew on overflow

    for st in (st_t, st_g):
        assert [s["n_events"] for s in st] == [s["n_events"] for s in st_ref]
    for s in (s_t, s_g):
        np.testing.assert_array_equal(
            np.asarray(s.element), np.asarray(s_ref.element)
        )
        np.testing.assert_allclose(
            float(s.kmc_time), float(s_ref.kmc_time), rtol=1e-12
        )
