"""Crossbar generation + initialization path (the reference's 40 nm workload
ships without structure files; generators synthesize equivalents)."""

import numpy as np
import pytest

from akmc_tpu.config import KMCParameters, Layer
from akmc_tpu.lattice import ELEM, build_lattice
from akmc_tpu.models.crossbar import synthetic_stack, tile_device
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


def test_tile_device_doubles():
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=6, ny=3, nz=3)
    e2, x2, y2, z2, latt = tile_device(
        lat.element0, lat.x, lat.y, lat.z, tuple(p.lattice), 2, 3
    )
    assert len(e2) == 6 * lat.N
    assert latt[1] == 2 * p.lattice[1]
    assert latt[2] == 3 * p.lattice[2]
    # element census scales exactly
    for el in np.unique(lat.element0):
        assert (e2 == el).sum() == 6 * (lat.element0 == el).sum()


def test_synthetic_stack_runs_end_to_end():
    e, x, y, z, latt, patch = synthetic_stack(
        n_yz=6, contact_slices=3, oxide_slices=6, ti_slices=2,
        vacancy_defect_fraction=0.3, seed=1,
    )
    assert (e == int(ELEM.DEFECT)).sum() > 0
    assert (e == int(ELEM.O)).sum() > 0

    x_span = x.max() - x.min()
    layers = [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, x.min() - 1, x.min() + 3 * 2.14),
        Layer("oxide", 1.5, 0.1, 1.09, 0.76, x.min() + 3 * 2.14, x.max() - 5 * 2.14),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, x.max() - 5 * 2.14, x.max() + 1),
    ]
    p = KMCParameters(
        lattice=list(latt),
        nn_dist=2.14 * 1.3,
        metals=["Ti", "N"],
        num_atoms_first_layer=patch["num_atoms_first_layer"],
        num_layers_contact=patch["num_layers_contact"],
        layers=layers,
        max_num_neighbors=32,
        cutoff_radius=8.0,
        solve_potential=True,
        perturb_structure=True,
        freq=10e13,
    )
    e = make_substoichiometric(e, 0.1, ReferenceRNG(4))
    lat = build_lattice(e, x, y, z, p)
    model = VCMModel(p, lat)
    state = make_device_state(lat, 300.0)
    stream = BufferedStream(ReferenceRNG(1))
    state, stats = model.superstep(state, 3.0, stream)
    assert stats["n_events"] >= 1
    assert np.isfinite(float(state.kmc_time))
