"""PBC semantics (K adjacency differs from the event list's non-PBC one) and
multi-bias-point sweeps."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM, build_lattice
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


def test_pbc_k_adjacency_differs_from_event_adjacency():
    """With pbc=1 the K sparsity wraps y/z (iterative_solvers_gpu.cu:96-124)
    while the event neighbor list never does (kmc_events.cu:154-155)."""
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=8, ny=3, nz=3)
    p2 = p.replace(pbc=True)
    lat2 = build_lattice(lat.element0.copy(), lat.x, lat.y, lat.z, p2)
    # wrap-around edges exist only in the K adjacency
    deg_k = (lat2.k_neigh_idx >= 0).sum()
    deg_ev = (lat2.neigh_idx >= 0).sum()
    assert deg_k > deg_ev
    np.testing.assert_array_equal(lat2.neigh_idx, lat.neigh_idx)


def test_pbc_superstep_runs_ell_or_banded():
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=8, ny=3, nz=3)
    p = p.replace(pbc=True)
    lat = build_lattice(
        make_substoichiometric(lat.element0, 0.25, ReferenceRNG(3)),
        lat.x, lat.y, lat.z, p,
    )
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))
    state, stats = model.superstep(state, 2.0, stream)
    assert stats["n_events"] >= 1
    assert np.isfinite(np.asarray(state.potential_charge)).all()


def test_driver_multi_bias_sweep(tmp_path, monkeypatch):
    """Two bias points: clock resets per bias (kmc_main.cpp:304), snapshots
    per Results_<Vd> folder, log sections in order."""
    import os

    from akmc_tpu.postprocessing.extract import parse_output_txt
    from akmc_tpu.runtime import driver
    from tests.test_driver import _patch_layers, _write_toy_deck

    deck, p = _write_toy_deck(tmp_path)
    # patch the deck for two bias points
    text = open(deck).read().replace(
        "V_switch = 2.0", "V_switch = 2.0 3.0"
    ).replace("t_switch = 1e-12", "t_switch = 1e-13 1e-13")
    open(deck, "w").write(text)
    _patch_layers(monkeypatch, p)

    driver.run(str(deck), workdir=str(tmp_path / "out"), log=False)
    d = parse_output_txt(str(tmp_path / "out" / "output1_0.txt"))
    assert d.voltages == [2.0, 3.0]
    assert len(d.kmc_times) >= 2
    assert os.path.isdir(tmp_path / "out" / "Results_2.000000")
    assert os.path.isdir(tmp_path / "out" / "Results_3.000000")
