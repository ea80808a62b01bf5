"""Lattice / structure tests: xyz parity, distances, index lists, layers,
golden substoichiometry placement (reference: Device.cpp, utils.cpp,
neighbor_lists_gpu.cu, KMCProcess.cpp:33-50)."""

import os

import numpy as np
import pytest

from akmc_tpu.config import KMCParameters, default_layers
from akmc_tpu.lattice import (
    ELEM,
    assign_layers,
    build_cutoff_list,
    build_neighbor_list,
    metal_mask,
    read_xyz,
    site_dist,
)
from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.state import make_substoichiometric


def test_site_dist_pbc_yz_only():
    lat = [10.0, 8.0, 6.0]
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([9.0, 7.0, 5.0])
    # open in x: dx stays 9; periodic y: 7 -> -1; periodic z: 5 -> -1
    d = site_dist(p1, p2, lat, True)
    assert np.isclose(d, np.sqrt(81 + 1 + 1))
    d_open = site_dist(p1, p2, lat, False)
    assert np.isclose(d_open, np.sqrt(81 + 49 + 25))


def _toy_chain(n=10, a=1.0):
    x = np.arange(n) * a
    y = np.zeros(n)
    z = np.zeros(n)
    return np.stack([x, y, z], 1)


def test_neighbor_list_chain():
    pos = _toy_chain(10)
    nl = build_neighbor_list(pos, nn_dist=1.5, max_num_neighbors=4)
    # interior sites have exactly 2 neighbors, ascending order
    assert list(nl[5][:2]) == [4, 6]
    assert (nl[5][2:] == -1).all()
    assert list(nl[0][:1]) == [1]
    assert (nl[0][1:] == -1).all()


def test_cutoff_list_filters_metals():
    pos = _toy_chain(6)
    elem = np.array(
        [int(ELEM.Ti), int(ELEM.O), int(ELEM.VACANCY), int(ELEM.N),
         int(ELEM.OXYGEN_DEFECT), int(ELEM.DEFECT)], np.int32
    )
    idx, maxc = build_cutoff_list(pos, elem, cutoff_radius=10.0)
    # metals (Ti at 0, N at 3) are never candidates
    for row in idx:
        assert 0 not in row[row >= 0]
        assert 3 not in row[row >= 0]
    # row 0 candidates: 1,2,4,5
    assert list(idx[0][idx[0] >= 0]) == [1, 2, 4, 5]
    assert maxc == 4


def test_assign_layers_last_match_wins():
    layers = default_layers()
    # boundary x=0.0 belongs to both layer 0 ([-22,0]) and layer 1 ([0,3]);
    # the reference's loop keeps the LAST match (KMCProcess.cpp:36-43)
    lid = assign_layers(np.array([-5.0, 0.0, 1.0, 50.0, 60.0]), layers)
    assert list(lid) == [0, 1, 1, 3, 4]
    with pytest.raises(ValueError):
        assign_layers(np.array([1000.0]), layers)


def test_metal_mask():
    elem = np.array([int(ELEM.Ti), int(ELEM.O), int(ELEM.N)], np.int32)
    m = metal_mask(elem, ["Ti", "N"])
    assert list(m) == [True, False, True]


@pytest.mark.slow
def test_golden_substoichiometry(ref_5nm_dir):
    """Vacancy placement must be draw-for-draw identical to the golden
    snapshot_init.xyz (Device RNG stream, seed 5)."""
    e, x, y, z = read_xyz(os.path.join(ref_5nm_dir, "reordered_device_5.xyz"))
    e2 = make_substoichiometric(e, 0.05, ReferenceRNG(5))
    eg, xg, _, _ = read_xyz(
        os.path.join(ref_5nm_dir, "expected_output/Results_5.000000/snapshot_init.xyz")
    )
    assert (e2 == eg).all()
    assert np.allclose(x, xg, atol=5e-4)


def test_translate_cell_and_sorts():
    from akmc_tpu.lattice import center_coords, sort_by_xyz, translate_cell

    x = np.array([0.0, 5.0, 9.0])
    y = np.array([1.0, 2.0, 3.0])
    z = np.array([0.0, 0.0, 0.0])
    # reference semantics (translate_cell, utils.cpp:267-299): center ->
    # lift coords below cut=shift*L up one cell -> re-center by the new min
    x2, y2, z2 = translate_cell(x, y, z, [10.0, 4.0, 4.0], [0.5, 0.5, 0.0])
    np.testing.assert_allclose(x2, [5.0, 0.0, 4.0])
    np.testing.assert_allclose(y2, [2.0, 3.0, 0.0])

    e = np.array([1, 2, 3])
    es, xs, ys, zs = sort_by_xyz(e, x2, y2, z2)
    assert list(xs) == sorted(xs)

    xc, yc, zc = center_coords(x, y, z, (True, False, True))
    assert xc.min() == 0.0 and (yc == y).all()


def test_count_contact_sites():
    from akmc_tpu.lattice import ELEM, count_contact_sites

    # [metal, defect, metal, O, ...]: 2 atoms on the left span 3 entries
    e = np.array([int(ELEM.Ti), int(ELEM.DEFECT), int(ELEM.N), int(ELEM.O)])
    assert count_contact_sites(e, 2, "left") == 3
