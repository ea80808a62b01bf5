"""Device (top_k) index-list builders must match the numpy scan builders
exactly — same candidates, same ascending order, same padding."""

import numpy as np

from akmc_tpu.lattice import build_cutoff_list, build_neighbor_list
from akmc_tpu.lattice_jax import build_cutoff_list_device, build_neighbor_list_device
from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.state import make_substoichiometric


def _toy():
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=9, ny=4, nz=4)
    e = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(11))
    pos = np.stack([lat.x, lat.y, lat.z], 1)
    return p, pos, e


def test_neighbor_list_device_matches_numpy():
    p, pos, e = _toy()
    a = build_neighbor_list(pos, p.nn_dist, p.max_num_neighbors)
    b = build_neighbor_list_device(pos, p.nn_dist, p.max_num_neighbors)
    np.testing.assert_array_equal(a, b)


def test_neighbor_list_device_pbc_matches_numpy():
    p, pos, e = _toy()
    lat_dims = np.array(p.lattice)
    a = build_neighbor_list(
        pos, p.nn_dist, p.max_num_neighbors, lat_dims, pbc=True
    )
    b = build_neighbor_list_device(
        pos, p.nn_dist, p.max_num_neighbors, lat_dims, pbc=True
    )
    np.testing.assert_array_equal(a, b)


def test_cutoff_list_device_matches_numpy():
    p, pos, e = _toy()
    a, amax = build_cutoff_list(pos, e, p.cutoff_radius)
    b, bmax = build_cutoff_list_device(pos, e, p.cutoff_radius)
    assert amax == bmax
    np.testing.assert_array_equal(a, b)
