"""Native C++ components vs Python implementations."""

import numpy as np
import pytest

from akmc_tpu import native
from akmc_tpu.lattice import build_neighbor_list, read_xyz

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _toy_pos(n=500, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(n, 3) * np.array([30.0, 12.0, 12.0])


def test_neighbor_list_matches_python_open():
    pos = _toy_pos()
    a = build_neighbor_list(pos, 2.5, 32)
    b = native.neighbor_list_cell(pos, 2.5, 32)
    np.testing.assert_array_equal(a, b)


def test_neighbor_list_matches_python_pbc():
    pos = _toy_pos(300, 1)
    lat = np.array([30.0, 12.0, 12.0])
    a = build_neighbor_list(pos, 2.5, 48, lat, pbc=True)
    b = native.neighbor_list_cell(pos, 2.5, 48, lat, pbc=True)
    np.testing.assert_array_equal(a, b)


def test_neighbor_list_overflow():
    pos = np.zeros((10, 3))
    pos[:, 0] = np.arange(10) * 0.1
    with pytest.raises(ValueError):
        native.neighbor_list_cell(pos, 5.0, 4)


def test_xyz_read_native(ref_5nm_dir):
    import os

    path = os.path.join(ref_5nm_dir, "reordered_device_5.xyz")
    e_ref, x, y, z = read_xyz(path)
    e, pos = native.read_xyz_native(path)
    np.testing.assert_array_equal(e, e_ref)
    np.testing.assert_allclose(pos[:, 0], x)
    np.testing.assert_allclose(pos[:, 1], y)
    np.testing.assert_allclose(pos[:, 2], z)
