"""Crossbar-array structure generation.

The reference's 40 nm crossbar workload (structures/40nm_crossbar/
parameters.txt: lattice 108.98 x 409.6 x 409.6 A, 33,600 contact atoms per
slice, V=15 V, potential-only) ships WITHOUT its structure files
(.MISSING_LARGE_BLOBS strips crossbar_40_*.xyz), so an equivalent generator
is required to run that configuration at all (SURVEY.md §7.3).

Two generators:

  * ``tile_device``: tile any existing device cell (e.g. the shipped 5 nm
    TiN/HfO2/Ti/TiN stack) periodically in y/z — produces arbitrarily large
    crossbar sheets with the exact same local structure, layer profile and
    x-extent as the unit device.
  * ``synthetic_stack``: build a rocksalt-like TiN/HfO2/Ti/TiN stack from
    scratch with prescribed slice counts — useful for scaling studies with
    controlled sizes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from akmc_tpu.lattice import ELEM


def tile_device(
    element: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    unit_lattice: Tuple[float, float, float],
    ny: int,
    nz: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile a unit device ny x nz times along y/z.

    Returns (element, x, y, z, lattice). Sites are ordered tile-major then
    original order, keeping each x-slice contiguous per tile — re-sort with
    np.lexsort if strict x-major ordering is needed.
    """
    n = len(element)
    ey, ez = unit_lattice[1], unit_lattice[2]
    elems, xs, ys, zs = [], [], [], []
    for iy in range(ny):
        for iz in range(nz):
            elems.append(element)
            xs.append(x)
            ys.append(y + iy * ey)
            zs.append(z + iz * ez)
    e_out = np.concatenate(elems)
    x_out = np.concatenate(xs)
    y_out = np.concatenate(ys)
    z_out = np.concatenate(zs)
    order = np.lexsort((z_out, y_out, x_out))
    lattice = np.array([unit_lattice[0], ny * ey, nz * ez])
    return e_out[order], x_out[order], y_out[order], z_out[order], lattice


def synthetic_stack(
    n_yz: int = 24,
    a: float = 2.131255,
    contact_slices: int = 10,
    oxide_slices: int = 20,
    ti_slices: int = 8,
    vacancy_defect_fraction: float = 0.3,
    seed: int = 0,
):
    """Generate a TiN | HfO2 | Ti | TiN stack on a simple lattice.

    x-slice layout (matching the 5 nm device's element profile):
      contact_slices of alternating Ti/N  |  oxide_slices of Hf+O (+ DEFECT
      interstitial sites at cell centers)  |  ti_slices of Ti  |
      contact_slices of alternating Ti/N.

    Returns (element, x, y, z, lattice, params_patch) where params_patch
    holds num_atoms_first_layer / num_layers_contact / lattice consistent
    with the structure.
    """
    rng = np.random.RandomState(seed)
    nx_total = 2 * contact_slices + oxide_slices + ti_slices
    elems, xs, ys, zs = [], [], [], []

    def add_site(e, ix, iy, iz, off=0.0):
        elems.append(int(e))
        xs.append(ix * a + off)
        ys.append(iy * a + off)
        zs.append(iz * a + off)

    x_cursor = 0
    # left contact
    for s in range(contact_slices):
        for iy in range(n_yz):
            for iz in range(n_yz):
                e = ELEM.Ti if (iy + iz + s) % 2 else ELEM.N
                add_site(e, x_cursor, iy, iz)
        x_cursor += 1
    # oxide: Hf + O rocksalt + interstitial DEFECT mesh
    for s in range(oxide_slices):
        for iy in range(n_yz):
            for iz in range(n_yz):
                e = ELEM.Hf if (iy + iz + s) % 2 else ELEM.O
                add_site(e, x_cursor, iy, iz)
        # interstitial sites at cell centers (sparse random subset)
        n_def = int(vacancy_defect_fraction * n_yz * n_yz)
        picks = rng.choice(n_yz * n_yz, n_def, replace=False)
        for pk in picks:
            iy, iz = divmod(int(pk), n_yz)
            add_site(ELEM.DEFECT, x_cursor, iy, iz, off=a / 2)
        x_cursor += 1
    # Ti scavenging layer
    for s in range(ti_slices):
        for iy in range(n_yz):
            for iz in range(n_yz):
                add_site(ELEM.Ti, x_cursor, iy, iz)
        x_cursor += 1
    # right contact
    for s in range(contact_slices):
        for iy in range(n_yz):
            for iz in range(n_yz):
                e = ELEM.Ti if (iy + iz + s) % 2 else ELEM.N
                add_site(e, x_cursor, iy, iz)
        x_cursor += 1

    e = np.array(elems, np.int32)
    x = np.array(xs)
    y = np.array(ys)
    z = np.array(zs)
    order = np.lexsort((z, y, x))
    e, x, y, z = e[order], x[order], y[order], z[order]

    lattice = np.array([nx_total * a, n_yz * a, n_yz * a])
    params_patch = dict(
        lattice=list(lattice),
        num_atoms_first_layer=n_yz * n_yz,
        num_layers_contact=contact_slices,
        num_atoms_contact=contact_slices * n_yz * n_yz,
        metals=["Ti", "N"],
    )
    return e, x, y, z, lattice, params_patch


def sort_crossbar(
    element: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    split_y: float,
    split_z: float,
) -> Tuple[np.ndarray, ...]:
    """Reorder crossbar sites so the boundary-condition contacts sit at the
    beginning/end, grouped into word/bit lines (postprocessing/
    sort_crossbar.py equivalent).

    Like the reference: the left contact block is every leading Ti/N site up
    to the first oxide (Hf/O) site, the right contact is the same count of
    trailing Ti/N sites; the left contact splits into two wordlines by z <
    split_z, the right into two bitlines by y < split_y
    (sort_crossbar.py:49-115). Returns (element, x, y, z) ordered
    wordline1, wordline2, oxide, bitline1, bitline2 (the reference script
    truncates after bitline1; we emit the complete structure).
    """
    is_metal = np.isin(element, [int(ELEM.Ti), int(ELEM.N)])
    is_oxide = np.isin(element, [int(ELEM.Hf), int(ELEM.O)])
    n = len(element)
    first_oxide = int(np.argmax(is_oxide)) if is_oxide.any() else n
    left = np.arange(first_oxide)[is_metal[:first_oxide]]
    num_contact = len(left)
    # trailing Ti/N sites, scanning backwards until oxide or count reached
    right = []
    for i in range(n - 1, -1, -1):
        if is_oxide[i] or len(right) == num_contact:
            break
        if is_metal[i]:
            right.append(i)
    right = np.array(right[::-1], dtype=np.int64)
    middle = np.setdiff1d(np.arange(n), np.concatenate([left, right]))

    word1 = left[z[left] < split_z]
    word2 = left[z[left] >= split_z]
    bit1 = right[y[right] < split_y]
    bit2 = right[y[right] >= split_y]
    order = np.concatenate([word1, word2, middle, bit1, bit2])
    return element[order], x[order], y[order], z[order]
