"""Deck-flag semantics the reference's main loop gates on
(kmc_main.cpp:334-511): perturb_structure, solve_potential, shift,
solve_heating_local, plus --module-timing telemetry."""

import os
import re

import numpy as np

from tests.test_driver import _patch_layers, _write_toy_deck


def test_fields_only_mode(tmp_path, monkeypatch):
    """perturb_structure=0: no events run; the field solvers execute each
    iteration and the clock jumps to t once kmc_step_count > 0 — exactly two
    logged field passes (kmc_main.cpp:506-511)."""
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path, perturb=0, t_switch=1e-9)
    _patch_layers(monkeypatch, p)
    summary = driver.run(str(deck), workdir=str(tmp_path / "out"), log=False)
    assert summary["total_steps"] == 2
    out = open(tmp_path / "out" / "output1_0.txt").read()
    # no event-module timing lines, no events executed
    assert "kmc events" not in out
    times = [float(m) for m in re.findall(r"KMC time is: ([\d.eE+-]+)", out)]
    assert times == [0.0, 1e-9]
    # potentials were actually computed
    assert "potential from boundaries" in out
    # structure unperturbed: final snapshot elements == initial snapshot
    from akmc_tpu.lattice import read_xyz

    folder = tmp_path / "out" / "Results_2.000000"
    e0, *_ = read_xyz(str(folder / "snapshot_init.xyz"))
    e1, *_ = read_xyz(str(folder / "snapshot_2.xyz"))
    np.testing.assert_array_equal(e0, e1)


def test_events_without_potential(tmp_path, monkeypatch):
    """solve_potential=0 + perturb_structure=1: events run on the stale
    (zero) potential; no field-module timing lines are logged."""
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path, solve_potential=0)
    _patch_layers(monkeypatch, p)
    summary = driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=3, log=False
    )
    assert summary["total_steps"] >= 1
    out = open(tmp_path / "out" / "output1_0.txt").read()
    assert "potential from boundaries" not in out
    assert "kmc events" in out
    times = [float(m) for m in re.findall(r"KMC time is: ([\d.eE+-]+)", out)]
    assert all(t > 0 for t in times)


def test_shift_translates_cell(tmp_path, monkeypatch):
    """shift=1: coordinates are translated across the periodic boundary at
    load (Device.cpp:44-45 -> translate_cell, utils.cpp:267-299)."""
    from akmc_tpu.runtime import driver
    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import translate_cell, read_xyz

    deck, p = _write_toy_deck(tmp_path)
    # append shift config (y/z only: shifting x would scramble the contacts)
    with open(deck, "a") as f:
        f.write("shift = 1\nshifts = 0.0 0.5 0.5\n")
    pp = KMCParameters.from_file(str(deck))
    assert pp.shift and pp.shifts == [0.0, 0.5, 0.5]

    e, x, y, z = read_xyz(str(tmp_path / "toy.xyz"))
    xs, ys, zs = translate_cell(x, y, z, pp.lattice, pp.shifts)
    got = driver.load_structure(pp, str(tmp_path))
    np.testing.assert_array_equal(got[1], xs)
    np.testing.assert_array_equal(got[2], ys)
    np.testing.assert_array_equal(got[3], zs)
    # x untouched (shift fraction 0), y/z actually moved
    np.testing.assert_array_equal(got[1], x)
    assert not np.array_equal(got[2], y)

    # exact reference semantics: center -> lift below-cut up one cell -> center
    cut = 0.5 * pp.lattice[1]
    y0 = y - y.min()
    y_ref = np.where(y0 < cut, y0 + pp.lattice[1], y0)
    y_ref -= y_ref.min()
    np.testing.assert_allclose(got[2], y_ref)


def test_local_heating_wired(tmp_path, monkeypatch):
    """solve_heating_local=1 (full physics): the LOCAL Laplacian model runs —
    site temperatures move, the global T_bg does not (Device::updateTemperature
    dispatch, heat_solver.cpp:75-97)."""
    from akmc_tpu.runtime import driver
    from akmc_tpu.runtime.checkpoint import load_checkpoint

    deck, p = _write_toy_deck(tmp_path, full=True, heating_local=1)
    _patch_layers(monkeypatch, p)
    driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=2, log=False,
        committed_parity=False, checkpoint_every=1,
    )
    state, *_ = load_checkpoint(str(tmp_path / "out" / "checkpoint.npz"))
    assert float(state.T_bg) == 300.0                      # global untouched
    temp = np.asarray(state.temperature)
    assert np.isfinite(temp).all()
    assert (temp != 300.0).any(), "local model never ran"


def test_module_timing_lines(tmp_path, monkeypatch):
    """--module-timing: the four Z-lines carry per-module measured values
    (not one repeated superstep total) and the trajectory is unchanged."""
    from akmc_tpu.runtime import driver
    from akmc_tpu.postprocessing.extract import parse_output_txt

    deck, p = _write_toy_deck(tmp_path, t_switch=1e3)
    _patch_layers(monkeypatch, p)
    driver.run(str(deck), workdir=str(tmp_path / "a"), max_supersteps=3, log=False)
    driver.run(
        str(deck), workdir=str(tmp_path / "b"), max_supersteps=3, log=False,
        module_timing=True,
    )
    da = parse_output_txt(str(tmp_path / "a" / "output1_0.txt"))
    db = parse_output_txt(str(tmp_path / "b" / "output1_0.txt"))
    assert db.kmc_times == da.kmc_times          # identical trajectory

    out = open(tmp_path / "b" / "output1_0.txt").read()
    per_step = re.findall(
        r"charge \[s\]([\d.eE+-]+)\n"
        r"Z - calculation time - potential from boundaries \[s\]([\d.eE+-]+)\n"
        r"Z - calculation time - potential from charges \[s\]([\d.eE+-]+)\n"
        r"Z - calculation time - kmc events \[s\]([\d.eE+-]+)",
        out,
    )
    assert len(per_step) == 3
    for vals in per_step:
        vals = [float(v) for v in vals]
        assert all(v > 0 for v in vals)
        assert len(set(vals)) > 1, "module timings identical — not measured"


def test_synthesized_crossbar_deck(tmp_path):
    """--synthesize-crossbar: a crossbar DECK (the reference strips the 40 nm
    structure files — .MISSING_LARGE_BLOBS) runs end-to-end on a grid-native
    stand-in structure honoring every deck parameter; high bias auto-selects
    the shifted-exponent rate path (absolute rates at Vd=15 overflow even
    real f64: exp(11 eV / kT) ~ e^425)."""
    from akmc_tpu.lattice import read_xyz
    from akmc_tpu.runtime import driver

    a = 2.131255
    deck = tmp_path / "parameters.txt"
    # the 40 nm deck's shape (V=15, potential-only, pristine), scaled down:
    # lattice x = 24 slices, 4-slice contacts
    deck.write_text(f"""
rnd_seed = 32
restart = 1
restart_xyz_file = crossbar_40_original_order.xyz
lattice = {24 * a:.6f} {8 * a:.6f} {8 * a:.6f}
pristine = 1
initial_vacancy_concentration = 0.05
attempt_frequency = 10e13
nn_dist = 3.5
perturb_structure = 1
solve_potential = 1
solve_current = 0
sigma = 3.5e-10
epsilon = 23.0
background_temp = 300
pbc = 0
V_switch = 15
t_switch = 1e30
output_freq = 1
num_atoms_first_layer = 33600
num_layers_contact = 4
num_atoms_contact = 336000
metals = Ti N
""")
    summary = driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=2, log=False,
        synthesize_crossbar=8,
    )
    assert summary["total_steps"] == 2
    out = (tmp_path / "out" / "output1_0.txt").read_text()
    assert "Synthesized crossbar structure" in out
    assert "Applied Voltage = 15 V" in out
    times = [float(m) for m in re.findall(r"KMC time is: ([\d.eE+-]+)", out)]
    assert len(times) == 2 and all(t > 0 for t in times) and np.isfinite(times).all()
    # snapshots carry only physical sites (null placeholder slots dropped):
    # 24 slices x (64 grid + defect-occupied centers) sites
    e0, *_ = read_xyz(str(tmp_path / "out" / "Results_15.000000" / "snapshot_init.xyz"))
    n_slots = 24 * 2 * 8 * 8
    assert len(e0) < n_slots
    assert len(e0) >= 24 * 64


def test_concern_split_driver(tmp_path, monkeypatch):
    """--concern-split K:P: the K and pairwise solves run as concurrent
    dispatches on disjoint device groups inside the driver loop (reference
    split=true, KMC_comm.h:132-223) and reproduce the sequential
    trajectory."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from akmc_tpu.postprocessing.extract import parse_output_txt
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path, t_switch=1e3)
    _patch_layers(monkeypatch, p)
    driver.run(str(deck), workdir=str(tmp_path / "a"), max_supersteps=3, log=False)
    driver.run(
        str(deck), workdir=str(tmp_path / "b"), max_supersteps=3, log=False,
        concern_split=(1, 3),
    )
    da = parse_output_txt(str(tmp_path / "a" / "output1_0.txt"))
    db = parse_output_txt(str(tmp_path / "b" / "output1_0.txt"))
    assert db.kmc_times == da.kmc_times          # identical trajectory
    out = open(tmp_path / "b" / "output1_0.txt").read()
    assert "Concern groups: 2 K-solve device(s) + 6 pairwise device(s)" in out


def test_batched_events_driver(tmp_path, monkeypatch):
    """--batched-events B: the driver's production throughput mode runs the
    multi-event batched residence-time loop (threefry stream) end-to-end —
    events execute, the clock advances, and the log schema is intact."""
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path)
    _patch_layers(monkeypatch, p)
    summary = driver.run(
        str(deck), workdir=str(tmp_path / "out"), max_supersteps=3,
        log=False, batched_events=8,
    )
    assert summary["total_steps"] >= 1
    out = open(tmp_path / "out" / "output1_0.txt").read()
    times = [float(m) for m in re.findall(r"KMC time is: ([\d.eE+-]+)", out)]
    assert times and all(t > 0 for t in times)
    assert "kmc events" in out


def test_warmup_flag(tmp_path, monkeypatch):
    """--warmup: the driver AOT-compiles the run's executables before the
    first superstep and logs the compile summary; the trajectory must be
    unchanged (warmup only compiles, it executes nothing)."""
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path)
    _patch_layers(monkeypatch, p)
    s1 = driver.run(
        str(deck), workdir=str(tmp_path / "w"), max_supersteps=2, log=False,
        warmup=True,
    )
    s2 = driver.run(
        str(deck), workdir=str(tmp_path / "n"), max_supersteps=2, log=False,
    )
    out = open(tmp_path / "w" / "output1_0.txt").read()
    assert "AOT warmup:" in out
    assert "AOT warmup:" not in open(tmp_path / "n" / "output1_0.txt").read()
    assert s1["total_steps"] == s2["total_steps"]
    w1 = [l for l in out.splitlines() if l.startswith("KMC time is:")]
    w2 = [
        l for l in open(tmp_path / "n" / "output1_0.txt").read().splitlines()
        if l.startswith("KMC time is:")
    ]
    assert w1 == w2


def test_devices_mesh_driver(tmp_path, monkeypatch):
    """--devices N: the production driver runs the deck sharded over an
    N-device `sites` mesh (the reference binary is born distributed —
    `mpirun runKMC`, kmc_main.cpp:56-101) and reproduces the single-device
    event trajectory element-for-element, including when the site count
    does not divide the mesh (inert-site padding)."""
    from akmc_tpu.lattice import read_xyz
    from akmc_tpu.runtime import driver

    deck, p = _write_toy_deck(tmp_path)
    _patch_layers(monkeypatch, p)
    s1 = driver.run(
        str(deck), workdir=str(tmp_path / "d1"), max_supersteps=3, log=False,
    )
    # N = toy site count is odd-shaped: 4-way forces the padding path
    s4 = driver.run(
        str(deck), workdir=str(tmp_path / "d4"), max_supersteps=3, log=False,
        devices=4,
    )
    assert s1["total_steps"] == s4["total_steps"]
    out4 = open(tmp_path / "d4" / "output1_0.txt").read()
    assert "Device mesh: 4 device(s)" in out4
    t1 = [
        float(m)
        for m in re.findall(
            r"KMC time is: ([\d.eE+-]+)",
            open(tmp_path / "d1" / "output1_0.txt").read(),
        )
    ]
    t4 = [float(m) for m in re.findall(r"KMC time is: ([\d.eE+-]+)", out4)]
    # waiting times drift in the last ulps (padding changes the total-rate
    # reduction tree; same accepted class as the TPU golden drift) — the
    # EVENT SEQUENCE (elements below) is the exact invariant
    np.testing.assert_allclose(t1, t4, rtol=1e-4)
    # final snapshots element-identical; padded sites excluded
    f1 = sorted((tmp_path / "d1" / "Results_2.000000").glob("snapshot_*.xyz"))
    f4 = sorted((tmp_path / "d4" / "Results_2.000000").glob("snapshot_*.xyz"))
    assert [f.name for f in f1] == [f.name for f in f4]
    e1, x1, *_ = read_xyz(str(f1[-1]))
    e4, x4, *_ = read_xyz(str(f4[-1]))
    np.testing.assert_array_equal(e1, e4)
    np.testing.assert_array_equal(x1, x4)
