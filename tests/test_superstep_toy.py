"""End-to-end superstep smoke + physics invariants on the toy device."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


@pytest.fixture(scope="module")
def toy():
    from tests.util_toy import toy_device

    p, lat = toy_device()
    # seed some vacancies so charges/events exist
    e2 = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
    lat.element0[:] = e2
    return p, lat


def test_superstep_runs_and_conserves(toy):
    p, lat = toy
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))

    n_v0 = int((np.asarray(state.element) == int(ELEM.VACANCY)).sum())
    n_metal0 = int(
        np.isin(np.asarray(state.element), [int(ELEM.Ti), int(ELEM.N)]).sum()
    )

    for _ in range(3):
        state, stats = model.superstep(state, 2.0, stream)
        assert stats["n_events"] >= 1
        assert np.isfinite(stats["event_time"])

    elem = np.asarray(state.element)
    # metals never transform
    assert int(np.isin(elem, [int(ELEM.Ti), int(ELEM.N)]).sum()) == n_metal0
    # V count minus Od count is invariant under all four event types
    n_v = int((elem == int(ELEM.VACANCY)).sum())
    n_od = int((elem == int(ELEM.OXYGEN_DEFECT)).sum())
    assert n_v - n_od == n_v0
    # kmc clock advanced
    assert float(state.kmc_time) > 0

    # charges only on V (+2) / Od (-2) / or zero
    q = np.asarray(state.charge)
    assert set(np.unique(q)).issubset({-2, 0, 2})
    pot = np.asarray(state.potential_charge)
    assert np.isfinite(pot).all()


def test_superstep_deterministic(toy):
    p, lat = toy
    model = VCMModel(p, lat)

    def run():
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        for _ in range(2):
            state, _ = model.superstep(state, 2.0, stream)
        return state

    s1, s2 = run(), run()
    assert (np.asarray(s1.element) == np.asarray(s2.element)).all()
    assert float(s1.kmc_time) == float(s2.kmc_time)


def test_superstep_native_rng(toy):
    import jax

    p, lat = toy
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    key = jax.random.PRNGKey(42)
    for _ in range(2):
        state, stats, key = model.superstep_native(state, 2.0, key)
        assert stats["n_events"] >= 1
    assert float(state.kmc_time) > 0


def test_superstep_multi_matches_sequential(toy):
    """k supersteps per dispatch (lax.scan batching) must equal k sequential
    superstep calls event-for-event: the scan threads the rand-buffer cursor
    exactly like the host does between single-step calls."""
    p, lat = toy
    model = VCMModel(p, lat)
    k, chunk = 3, 512

    state_a = make_device_state(lat, p.background_temp)
    stream_a = BufferedStream(ReferenceRNG(1))
    stats_a = []
    for _ in range(k):
        state_a, st = model.superstep(state_a, 2.0, stream_a, rand_chunk=chunk)
        stats_a.append(st)

    state_b = make_device_state(lat, p.background_temp)
    stream_b = BufferedStream(ReferenceRNG(1))
    state_b, stats_b = model.superstep_multi(
        state_b, 2.0, stream_b, k=k, rand_chunk=chunk
    )

    assert [s["n_events"] for s in stats_b] == [s["n_events"] for s in stats_a]
    assert [s["event_time"] for s in stats_b] == [s["event_time"] for s in stats_a]
    np.testing.assert_array_equal(np.asarray(state_b.element), np.asarray(state_a.element))
    np.testing.assert_array_equal(np.asarray(state_b.charge), np.asarray(state_a.charge))
    np.testing.assert_allclose(
        np.asarray(state_b.potential_charge), np.asarray(state_a.potential_charge)
    )
    assert float(state_b.kmc_time) == pytest.approx(float(state_a.kmc_time), rel=1e-15)
    # streams consumed identically: the next peeked draw matches
    assert float(stream_a.peek(1)[0]) == float(stream_b.peek(1)[0])


def test_carried_residual_multi_matches_fresh():
    """k_carry_residual: the batched path's incrementally-rebased warm K
    solve must reproduce the fresh-matvec trajectory. On converged warm
    starts (CG body runs zero iterations) the returned iterate is x0 in
    both paths, so the equality is BIT-exact — verified here on the toy
    and in round 3 on the real 5nm bench workload (16 supersteps:
    elements, events, cg counts and kmc_time identical; pb max diff 0.0)."""
    import numpy as np

    from tests.util_toy import toy_device
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state

    p, lat = toy_device()

    def run(flag):
        model = VCMModel(p, lat, k_carry_residual=flag, use_dia_k=False)
        assert model.banded is not None
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        evs, cgs = [], []
        for _ in range(3):
            state, sl = model.superstep_multi(state, 2.0, stream, k=6)
            evs += [s["n_events"] for s in sl]
            cgs += [s["cg_iterations"] for s in sl]
        return state, evs, cgs

    s0, e0, cg0 = run(False)
    s1, e1, cg1 = run(True)
    assert e0 == e1 and cg0 == cg1
    np.testing.assert_array_equal(np.asarray(s0.element), np.asarray(s1.element))
    assert float(s0.kmc_time) == float(s1.kmc_time)
    np.testing.assert_array_equal(
        np.asarray(s0.potential_boundary), np.asarray(s1.potential_boundary)
    )
