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
