"""Postprocessing parity: log scraping (extract_data.py / plot_*.py regex
schema), timeline plots, structure views, crossbar re-sorting."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM, write_xyz_snapshot
from akmc_tpu.models.crossbar import sort_crossbar
from akmc_tpu.postprocessing.extract import parse_output_txt

LOG = """Applied Voltage = 5 V
Current [uA]: 12.5
Conductance [uS]: 2.5
Total dissipated power [mW]: 0.75
Global temperature [K]: 301.5
KMC time is: 1e-13
Current [uA]: 13.5
Conductance [uS]: 2.7
Total dissipated power [mW]: 0.8
Global temperature [K]: 302.0
KMC time is: 3e-13
Applied Voltage = -2 V
Current [uA]: -4.0
Conductance [uS]: 2.0
Total dissipated power [mW]: 0.1
Global temperature [K]: 300.1
KMC time is: 2e-13
"""


@pytest.fixture()
def logfile(tmp_path):
    p = tmp_path / "output1_0.txt"
    p.write_text(LOG)
    return str(p)


def test_parse_output_scrapes_all_series(logfile):
    d = parse_output_txt(logfile)
    assert d.voltages == [5.0, -2.0]
    assert d.currents_uA == [12.5, 13.5, -4.0]
    assert d.conductances_uS == [2.5, 2.7, 2.0]
    assert d.powers_mW == [0.75, 0.8, 0.1]
    assert d.temperatures_K == [301.5, 302.0, 300.1]
    # cumulative time resets like the reference scrapers
    # (plot_current.py:28-32): offset = last accumulated time at each
    # "Applied Voltage" line
    assert d.kmc_times == [1e-13, 3e-13, 2e-13]
    assert np.allclose(d.cum_times, [1e-13, 3e-13, 5e-13])


def test_timeline_plots_render(logfile, tmp_path):
    from akmc_tpu.postprocessing import plots

    for fn in (
        plots.plot_iv,
        plots.plot_kmc_timeline,
        plots.plot_temperature,
        plots.plot_current,
        plots.plot_conductance,
        plots.plot_power,
        plots.plot_temperature_current,
    ):
        out = str(tmp_path / (fn.__name__ + ".png"))
        assert fn(logfile, out) == out
        assert (tmp_path / (fn.__name__ + ".png")).stat().st_size > 0


def test_device_views_render(tmp_path):
    from akmc_tpu.postprocessing import plots

    e = np.array(
        [int(ELEM.Ti), int(ELEM.VACANCY), int(ELEM.O), int(ELEM.OXYGEN_DEFECT), int(ELEM.N)],
        np.int32,
    )
    x = np.arange(5.0)
    snap = str(tmp_path / "snapshot_0.xyz")
    write_xyz_snapshot(snap, e, x, x * 0.5, x * 0.25, x * 0.1, x * 0.01)
    for fn in (plots.plot_device, plots.plot_device_top):
        out = str(tmp_path / (fn.__name__ + ".png"))
        assert fn(snap, out) == out
        assert (tmp_path / (fn.__name__ + ".png")).stat().st_size > 0


def test_bond_current_plot(tmp_path):
    from akmc_tpu.postprocessing import plots

    e = np.full(4, int(ELEM.Ti), np.int32)
    x = np.arange(4.0)
    snap = str(tmp_path / "snap.xyz")
    write_xyz_snapshot(snap, e, x, x, x, np.zeros(4), np.zeros(4))
    X = -np.abs(np.random.default_rng(0).normal(size=(4, 4))) - 0.1
    xf = str(tmp_path / "X.txt")
    np.savetxt(xf, X)
    out = str(tmp_path / "bond.png")
    assert plots.plot_bond_current(snap, xf, out) == out


def test_sort_crossbar_groups_contacts():
    # 4 left Ti/N, 3 oxide, 4 right Ti/N; wordlines split by z, bitlines by y
    e = np.array(
        [int(ELEM.Ti), int(ELEM.N), int(ELEM.Ti), int(ELEM.N),
         int(ELEM.Hf), int(ELEM.O), int(ELEM.Hf),
         int(ELEM.Ti), int(ELEM.N), int(ELEM.Ti), int(ELEM.N)],
        np.int32,
    )
    x = np.arange(11.0)
    y = np.array([0, 0, 0, 0, 5, 5, 5, 1, 9, 1, 9], float)
    z = np.array([1, 9, 1, 9, 5, 5, 5, 0, 0, 0, 0], float)
    eo, xo, yo, zo = sort_crossbar(e, x, y, z, split_y=5.0, split_z=5.0)
    assert len(eo) == 11
    # wordline1 (z<5) comes first, then wordline2, oxide in the middle
    assert list(zo[:2]) == [1, 1] and list(zo[2:4]) == [9, 9]
    assert set(xo[4:7]) == {4.0, 5.0, 6.0}
    # bitline1 (y<5) then bitline2
    assert list(yo[7:9]) == [1, 1] and list(yo[9:]) == [9, 9]
    # permutation: every original site present exactly once
    assert sorted(xo) == sorted(x)
