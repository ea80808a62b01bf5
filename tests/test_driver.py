"""End-to-end driver runs on the toy device: committed-parity and
full-physics modes, log format, snapshots, metrics."""

import json
import os
import re

import numpy as np
import pytest

from akmc_tpu.config import KMCParameters
from akmc_tpu.lattice import ELEM, write_xyz_snapshot
from akmc_tpu.postprocessing.extract import parse_metrics_jsonl, parse_output_txt


def _write_toy_deck(
    tmp_path, full=False, t_switch=1e-12,
    perturb=1, solve_potential=1, heating_local=0,
):
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=10, ny=3, nz=3, contact_layers=3)
    # write the structure as a restart file + a parameters deck
    struct = os.path.join(tmp_path, "toy.xyz")
    write_xyz_snapshot(
        struct, lat.element0, lat.x, lat.y, lat.z,
        np.zeros(lat.N), np.zeros(lat.N),
    )
    deck = os.path.join(tmp_path, "parameters.txt")
    with open(deck, "w") as f:
        f.write(f"""
rnd_seed = 5
restart = 1
restart_xyz_file = toy.xyz
pristine = 1
initial_vacancy_concentration = 0.25
attempt_frequency = 10e13
lattice = {p.lattice[0]} {p.lattice[1]} {p.lattice[2]}
nn_dist = {p.nn_dist}
pbc = 0
perturb_structure = {perturb}
solve_potential = {solve_potential}
solve_current = {1 if full else 0}
solve_heating_global = {1 if (full and not heating_local) else 0}
solve_heating_local = {heating_local}
delta_t = 1e-13
sigma = 3.5e-10
epsilon = 23.0
m_r = 0.85
V0 = 1.6
k_therm = 1.1
background_temp = 300
V_switch = 2.0
t_switch = {t_switch}
num_atoms_first_layer = {p.num_atoms_first_layer}
num_layers_contact = {p.num_layers_contact}
num_atoms_contact = {p.num_atoms_first_layer * p.num_layers_contact}
metals = Ti N
output_freq = 1
t_ox = 5e-9
A = 2.4e-9 * 2.4e-9
c_p = 1.92
dissipation_constant = 1e-13
alpha = 0.1
L_char = 3.5e-10
k_th_metal = 29
k_th_non_vacancy = 0.5
k_th_vacancies = 5
""")
    return deck, p


def _patch_layers(monkeypatch, p):
    # driver builds layers from config defaults; inject the toy layer table
    from akmc_tpu import config as cfgmod

    monkeypatch.setattr(cfgmod, "default_layers", lambda: list(p.layers))


def test_driver_committed_parity(tmp_path, monkeypatch):
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path)
    _patch_layers(monkeypatch, p)
    summary = driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=4, log=False
    )
    assert summary["total_steps"] >= 1

    d = parse_output_txt(str(tmp_path / "out" / "output1_0.txt"))
    assert d.voltages == [2.0]
    assert len(d.kmc_times) == summary["total_steps"]
    assert all(t > 0 for t in d.kmc_times)
    # monotone clock
    assert d.kmc_times == sorted(d.kmc_times)

    ms = parse_metrics_jsonl(str(tmp_path / "out" / "metrics.jsonl"))
    assert len(ms) == summary["total_steps"]
    assert all("n_events" in m for m in ms)

    # snapshots exist and are re-readable
    from akmc_tpu.lattice import read_xyz

    folder = tmp_path / "out" / "Results_2.000000"
    e0, *_ = read_xyz(str(folder / "snapshot_init.xyz"))
    assert (e0 == int(ELEM.VACANCY)).sum() > 0


def test_driver_full_physics(tmp_path, monkeypatch):
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path, full=True)
    _patch_layers(monkeypatch, p)
    summary = driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=3,
        log=False, committed_parity=False,
    )
    d = parse_output_txt(str(tmp_path / "out" / "output1_0.txt"))
    assert len(d.currents_uA) == summary["total_steps"]
    assert all(np.isfinite(c) for c in d.currents_uA)
    assert len(d.temperatures_K) == summary["total_steps"]
    assert all(np.isfinite(t) and t > 0 for t in d.temperatures_K)
    # conductance and total-power lines (current_solver.cpp:278, 375 schema)
    assert len(d.conductances_uS) == summary["total_steps"]
    np.testing.assert_allclose(
        d.conductances_uS, np.abs(np.asarray(d.currents_uA) / 2.0), rtol=1e-5
    )
    assert len(d.powers_mW) == summary["total_steps"]
    assert all(np.isfinite(pw) for pw in d.powers_mW)
    # auto power-rtol policy is observable in metrics.jsonl: loose on the
    # first superstep (no I_macro history), tightened 100x after any
    # sub-nA |I_macro| (toy currents are tiny)
    import json as _json

    rows = [
        _json.loads(line)
        for line in open(tmp_path / "out" / "metrics.jsonl")
    ]
    assert rows[0]["power_rtol_scale"] == 1.0
    for prev, row in zip(rows, rows[1:]):
        expect = 1e-2 if abs(prev["I_macro"]) < 1e-9 else 1.0
        assert row["power_rtol_scale"] == expect


def test_driver_checkpoint_resume(tmp_path, monkeypatch):
    """Interrupted driver run resumed from checkpoint == uninterrupted run."""
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path)
    _patch_layers(monkeypatch, p)

    driver.run(str(deck), workdir=str(tmp_path / "a"), max_supersteps=4, log=False)
    da = parse_output_txt(str(tmp_path / "a" / "output1_0.txt"))

    driver.run(
        str(deck), workdir=str(tmp_path / "b"), max_supersteps=2, log=False,
        checkpoint_every=1,
    )
    driver.run(
        str(deck), workdir=str(tmp_path / "b2"), max_supersteps=2, log=False,
        resume_from=str(tmp_path / "b" / "checkpoint.npz"),
    )
    db2 = parse_output_txt(str(tmp_path / "b2" / "output1_0.txt"))
    # steps 3..4 of the uninterrupted run == the resumed run's steps
    np.testing.assert_allclose(db2.kmc_times, da.kmc_times[2:4], rtol=1e-12)


def test_driver_steps_per_dispatch(tmp_path, monkeypatch):
    """Batched dispatch (k supersteps per device call) produces the same
    trajectory log as the single-step driver."""
    from akmc_tpu.runtime import driver

    # long t_switch so max_supersteps (a multiple of k) is the binding stop:
    # the batched bias loop checks kmc_time only between batches, so it may
    # overshoot t_switch by up to k-1 supersteps (documented CLI behavior)
    deck, p = _write_toy_deck(tmp_path, t_switch=1e3)
    _patch_layers(monkeypatch, p)
    driver.run(str(deck), workdir=str(tmp_path / "a"), max_supersteps=4, log=False)
    driver.run(
        str(deck), workdir=str(tmp_path / "b"), max_supersteps=4, log=False,
        steps_per_dispatch=2,
    )
    da = parse_output_txt(str(tmp_path / "a" / "output1_0.txt"))
    db = parse_output_txt(str(tmp_path / "b" / "output1_0.txt"))
    assert len(da.kmc_times) == len(db.kmc_times) == 4
    assert db.kmc_times == da.kmc_times
