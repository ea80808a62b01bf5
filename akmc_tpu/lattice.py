"""Lattice / structure handling: xyz I/O, element coding, distances, index lists.

TPU-first layout decisions:
  * All per-site arrays are padded to ``N_pad`` (a multiple of 128 lanes) and
    masked; shapes are static for XLA.
  * The neighbor list is a padded ELL table ``neigh_idx[N_pad, NN_pad]`` with
    ``-1`` padding — the natural TPU format (fixed fan-out <= 52, reference:
    Device.cpp:59) which doubles as the sparsity pattern of the K and T
    operators (matrix-free SpMV, no CSR assembly).
  * Site positions never change during a simulation, so neighbor/cutoff lists
    are built once (reference: kmc_main.cpp:197-207).

Reference behavior reproduced exactly:
  * element coding (utils.cpp:7-53),
  * xyz format (utils.cpp:72-98; snapshots Device.cpp:214-232),
  * distances: PBC in y/z only, open in x (utils.cpp:100-174); the event and
    pairwise kernels use the NON-PBC distance regardless of the pbc flag
    (kmc_events.cu:154-155, potential_solver_gpu.cu:1555-1557) while the
    K/T sparsity uses the PBC-aware distance (iterative_solvers_gpu.cu:96-124)
    — this asymmetry is preserved.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from enum import IntEnum
from typing import List, Optional, Sequence, Tuple

import numpy as np


class ELEM(IntEnum):
    """Site element coding (reference: utils.h:37-44)."""

    DEFECT = 0          # "d"  - lattice interstitial site
    OXYGEN_DEFECT = 1   # "Od" - oxygen interstitial defect
    VACANCY = 2         # "V"  - lattice vacancy
    O = 3
    Hf = 4
    Ni = 5
    Ti = 6
    Pt = 7
    N = 8
    NULL_ELEMENT = 9


ELEMENT_NAMES = {
    ELEM.DEFECT: "d",
    ELEM.OXYGEN_DEFECT: "Od",
    ELEM.VACANCY: "V",
    ELEM.O: "O",
    ELEM.Hf: "Hf",
    ELEM.Ni: "Ni",
    ELEM.Ti: "Ti",
    ELEM.Pt: "Pt",
    ELEM.N: "N",
}
NAME_TO_ELEMENT = {v: k for k, v in ELEMENT_NAMES.items()}

# event type coding (reference: utils.h:53-60)
class EVENT(IntEnum):
    VACANCY_GENERATION = 0
    VACANCY_RECOMBINATION = 1
    VACANCY_DIFFUSION = 2
    ION_DIFFUSION = 3
    NULL_EVENT = 4


# sites that can ever carry charge / participate in events
# (reference: neighbor_lists_gpu.cu:96 'possibly_charged')
_POSSIBLY_CHARGED = (ELEM.OXYGEN_DEFECT, ELEM.O, ELEM.VACANCY, ELEM.DEFECT)


def read_xyz(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Read an xyz file -> (element codes, x, y, z). Reference: utils.cpp:72-98."""
    with open(path) as f:
        n = int(f.readline().split()[0])
        f.readline()  # comment line
        elems = np.empty(n, dtype=np.int32)
        xyz = np.empty((n, 3), dtype=np.float64)
        for i in range(n):
            parts = f.readline().split()
            elems[i] = int(NAME_TO_ELEMENT[parts[0]])
            xyz[i, 0] = float(parts[1])
            xyz[i, 1] = float(parts[2])
            xyz[i, 2] = float(parts[3])
    return elems, xyz[:, 0].copy(), xyz[:, 1].copy(), xyz[:, 2].copy()


def write_xyz_snapshot(
    path: str,
    element: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    potential: np.ndarray,
    power: np.ndarray,
) -> None:
    """Write a snapshot in the reference format (Device.cpp:214-232):
    ``element x y z potential power`` with a site-count header."""
    n = len(element)
    with open(path, "w") as f:
        f.write(f"{n}\n\n")
        lines = []
        for i in range(n):
            lines.append(
                f"{ELEMENT_NAMES[ELEM(int(element[i]))]}   {_fmt(x[i])}   {_fmt(y[i])}"
                f"   {_fmt(z[i])}   {_fmt(potential[i])}   {_fmt(power[i])}\n"
            )
        f.writelines(lines)


def _fmt(v: float) -> str:
    # reference streams doubles with default precision (6 significant digits)
    return f"{float(v):.6g}"


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def site_dist(
    p1: np.ndarray, p2: np.ndarray, lattice: Sequence[float], pbc: bool
) -> np.ndarray:
    """Distance between position rows, PBC in y/z only (utils.cpp:100-174).

    p1: (..., 3), p2: (..., 3) broadcastable.
    """
    d = p1 - p2
    if pbc:
        dy = d[..., 1] / lattice[1]
        dy = (dy - np.round(dy)) * lattice[1]
        dz = d[..., 2] / lattice[2]
        dz = (dz - np.round(dz)) * lattice[2]
        return np.sqrt(d[..., 0] ** 2 + dy**2 + dz**2)
    return np.sqrt((d**2).sum(-1))


def translate_cell(
    x: np.ndarray, y: np.ndarray, z: np.ndarray,
    lattice: Sequence[float], shifts: Sequence[float],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Translate coordinates across the periodic cell by fractional shifts
    (reference: translate_cell, utils.cpp:267-299; used when `shift = 1`).

    Exact reference sequence: center the shifted dims to min=0, lift every
    coordinate below ``cut = shift*L`` up by one cell, then re-center — i.e.
    the periodic image boundary moves DOWN by ``cut`` (x_new ~ (x - cut) mod L
    up to the final re-centering by the actual minimum)."""
    dims = [s != 0.0 for s in shifts]
    x, y, z = center_coords(x, y, z, dims)
    out = []
    for arr, dim, frac, do in zip((x, y, z), lattice, shifts, dims):
        if do:
            arr = np.where(arr < frac * dim, arr + dim, arr)
        out.append(arr)
    return center_coords(*out, dims)


def sort_by_x(element, x, y, z):
    """Stable sort of sites by x (reference: sort_by_x, utils.cpp:176+)."""
    order = np.argsort(x, kind="stable")
    return element[order], x[order], y[order], z[order]


def sort_by_xyz(element, x, y, z):
    """Lexicographic (x, then y, then z) sort (reference: sort_by_xyz)."""
    order = np.lexsort((z, y, x))
    return element[order], x[order], y[order], z[order]


def center_coords(x, y, z, dims=(True, True, True)):
    """Shift the minimum coordinate to 0 in the selected dims
    (reference: center_coords, utils.h:121)."""
    out = []
    for arr, do in zip((x, y, z), dims):
        out.append(arr - arr.min() if do else arr)
    return tuple(out)


def count_contact_sites(element: np.ndarray, num_atoms_contact: int, side: str) -> int:
    """Number of leading/trailing site-array entries spanning
    `num_atoms_contact` non-defect atoms (reference: get_num_in_contacts,
    heat_solver.cpp:4-36)."""
    n = len(element)
    count = 0
    found = 0
    rng = range(n) if side == "left" else range(n - 1, -1, -1)
    for i in rng:
        count += 1
        if element[i] != int(ELEM.DEFECT):
            found += 1
            if found >= num_atoms_contact:
                break
    return count


# ---------------------------------------------------------------------------
# index-list construction (cell-list accelerated, blocked, exact semantics)
# ---------------------------------------------------------------------------

def _pairwise_block_dist(
    pos: np.ndarray, rows: np.ndarray, lattice: Sequence[float], pbc: bool
) -> np.ndarray:
    """(len(rows), N) distance block."""
    return site_dist(pos[rows][:, None, :], pos[None, :, :], lattice, pbc)


def build_neighbor_list(
    pos: np.ndarray,
    nn_dist: float,
    max_num_neighbors: int,
    lattice: Optional[Sequence[float]] = None,
    pbc: bool = False,
    block: int = 2048,
    strict: bool = True,
) -> np.ndarray:
    """Padded ELL neighbor table: for each site i, ascending indices j with
    dist(i,j) < nn_dist, padded with -1 up to ``max_num_neighbors``.

    Matches populate_neighbor_list (neighbor_lists_gpu.cu:55-78): the reference
    kernel uses the NON-PBC distance; pass ``pbc=False`` for parity. Index order
    is ascending j, as in the reference's j-loop.

    ``strict=True`` raises if any site exceeds ``max_num_neighbors`` (the
    reference silently truncates — pass strict=False to reproduce that).
    """
    n = pos.shape[0]
    out = np.full((n, max_num_neighbors), -1, dtype=np.int32)
    lat = lattice if lattice is not None else (0.0, 1.0, 1.0)
    for s in range(0, n, block):
        rows = np.arange(s, min(s + block, n))
        d = _pairwise_block_dist(pos, rows, lat, pbc)
        mask = d < nn_dist
        mask[np.arange(len(rows)), rows] = False
        for r_local, i in enumerate(rows):
            js = np.nonzero(mask[r_local])[0]
            if strict and len(js) > max_num_neighbors:
                raise ValueError(
                    f"site {i} has {len(js)} neighbors > max_num_neighbors="
                    f"{max_num_neighbors}; raise the cap (reference would "
                    f"silently truncate, Device.cpp:59)"
                )
            js = js[:max_num_neighbors]
            out[i, : len(js)] = js
    return out


def build_cutoff_list(
    pos: np.ndarray,
    element: np.ndarray,
    cutoff_radius: float,
    block: int = 1024,
) -> Tuple[np.ndarray, int]:
    """Padded cutoff-candidate table for the pairwise Coulomb sum.

    For each site i: ascending indices j != i with (non-PBC) dist < cutoff and
    element[j] possibly-charged (neighbor_lists_gpu.cu:107-136). Returns
    (cutoff_idx[N, N_cutoff], N_cutoff) where N_cutoff is the global max row
    count (compute_cutoff_list, neighbor_lists_gpu.cu:340-342).
    """
    n = pos.shape[0]
    poss = np.isin(element, np.array(_POSSIBLY_CHARGED, dtype=element.dtype))
    rows_js: List[np.ndarray] = []
    maxc = 0
    for s in range(0, n, block):
        rows = np.arange(s, min(s + block, n))
        d = _pairwise_block_dist(pos, rows, (0, 1, 1), False)
        mask = (d < cutoff_radius) & poss[None, :]
        mask[np.arange(len(rows)), rows] = False
        for r_local, i in enumerate(rows):
            js = np.nonzero(mask[r_local])[0]
            rows_js.append(js.astype(np.int32))
            maxc = max(maxc, len(js))
    out = np.full((n, maxc), -1, dtype=np.int32)
    for i, js in enumerate(rows_js):
        out[i, : len(js)] = js
    return out, maxc


def build_k_adjacency(
    pos: np.ndarray,
    nn_dist: float,
    max_num_neighbors: int,
    lattice: Sequence[float],
    pbc: bool,
    block: int = 2048,
) -> np.ndarray:
    """Neighbor table for the K/T matrix sparsity, PBC-aware distance
    (calc_nnz_per_row, iterative_solvers_gpu.cu:96-124). Ascending j order =
    ascending CSR column order, so matrix-free row sums reproduce the
    reference's CSR accumulation order. Identical to build_neighbor_list when
    pbc=False."""
    return build_neighbor_list(pos, nn_dist, max_num_neighbors, lattice, pbc)


# ---------------------------------------------------------------------------
# Lattice container
# ---------------------------------------------------------------------------

@dataclass
class Lattice:
    """Static geometry + connectivity of a device. Everything here is
    immutable during a simulation run."""

    element0: np.ndarray            # (N,) initial element codes (int32)
    x: np.ndarray                   # (N,) f64 Angstrom
    y: np.ndarray
    z: np.ndarray
    lattice: np.ndarray             # (3,) cell dims [Angstrom]
    pbc: bool
    nn_dist: float
    neigh_idx: np.ndarray           # (N, NN) ELL neighbor table (non-PBC dist)
    k_neigh_idx: np.ndarray         # (N, NN) PBC-aware table for K sparsity
    cutoff_idx: np.ndarray          # (N, N_cutoff) pairwise candidates
    site_layer: np.ndarray          # (N,) layer id per site
    # grid-native descriptor (n_yz, nx_total, a) when the structure lives
    # on the two-sublattice slot enumeration (models/crossbar.py) — lets
    # downstream builders (DIA operator) use analytic generation
    grid: Optional[Tuple[int, int, float]] = None

    @property
    def N(self) -> int:
        return int(self.element0.shape[0])

    @property
    def max_num_neighbors(self) -> int:
        return int(self.neigh_idx.shape[1])

    @property
    def N_cutoff(self) -> int:
        return int(self.cutoff_idx.shape[1])


def assign_layers(x: np.ndarray, layers) -> np.ndarray:
    """Per-site layer id by x binning; the LAST matching layer wins
    (KMCProcess.cpp:33-50). Raises if a site is outside every layer."""
    n = x.shape[0]
    lid = np.full(n, 1000, dtype=np.int32)
    for j, lay in enumerate(layers):
        m = (lay.start_x <= x) & (x <= lay.end_x)
        lid[m] = j
    if (lid == 1000).any():
        bad = int(np.nonzero(lid == 1000)[0][0])
        raise ValueError(f"Site #{bad} at x={x[bad]} is not inside the device!")
    return lid


def build_lattice(
    element: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    params,
    cache_dir: Optional[str] = None,
    need_cutoff_table: bool = False,
    precomputed_lists: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    grid: Optional[Tuple[int, int, float]] = None,
) -> Lattice:
    """Construct connectivity (optionally cached on disk — positions are
    static, so lists are reusable across runs of the same structure).

    ``precomputed_lists``: (neigh_idx, k_neigh_idx) built by a
    structure-aware generator (the grid-native crossbar builds them
    analytically — models/crossbar.py::grid_neighbor_list); skips the
    spatial search entirely. The disk cache still applies on top."""
    lattice_dims = np.asarray(params.lattice, dtype=np.float64)
    pos = np.stack([x, y, z], axis=1)

    cache_path = None
    if cache_dir and precomputed_lists is None:
        # with precomputed (analytic) lists the disk cache LOSES:
        # decompressing the ~GB-scale npz at crossbar scale takes longer
        # than regenerating the tables (~30 s analytic vs minutes of
        # np.load on this host)
        import hashlib

        h = hashlib.sha1()
        h.update(pos.tobytes())
        h.update(element.tobytes())
        h.update(
            f"{params.nn_dist}:{params.max_num_neighbors}:{params.cutoff_radius}:{params.pbc}".encode()
        )
        cache_path = os.path.join(cache_dir, f"lists_{h.hexdigest()[:16]}.npz")

    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        neigh_idx = data["neigh_idx"]
        k_neigh_idx = data["k_neigh_idx"]
        cutoff_idx = data["cutoff_idx"]
    elif precomputed_lists is not None:
        neigh_idx, k_neigh_idx = precomputed_lists
        if need_cutoff_table:
            cutoff_idx, _ = build_cutoff_list(pos, element, params.cutoff_radius)
        else:
            cutoff_idx = np.zeros((len(x), 0), np.int32)
    else:
        # builder priority: native C++ cell lists > device (TPU) top_k scan
        # > numpy reference scan — all three produce identical tables
        from akmc_tpu import native as _native

        if _native.available():
            neigh_idx = _native.neighbor_list_cell(
                pos, params.nn_dist, params.max_num_neighbors
            )
            if params.pbc:
                k_neigh_idx = _native.neighbor_list_cell(
                    pos, params.nn_dist, params.max_num_neighbors,
                    lattice_dims, pbc=True,
                )
            else:
                k_neigh_idx = neigh_idx
            if need_cutoff_table:
                cutoff_idx, _ = build_cutoff_list(pos, element, params.cutoff_radius)
            else:
                cutoff_idx = np.zeros((len(x), 0), np.int32)
        else:
            try:
                from akmc_tpu.lattice_jax import (
                    build_cutoff_list_device,
                    build_neighbor_list_device,
                )

                neigh_idx = build_neighbor_list_device(
                    pos, params.nn_dist, params.max_num_neighbors
                )
                if params.pbc:
                    k_neigh_idx = build_neighbor_list_device(
                        pos, params.nn_dist, params.max_num_neighbors,
                        lattice_dims, True,
                    )
                else:
                    k_neigh_idx = neigh_idx
            except ImportError:
                neigh_idx = build_neighbor_list(
                    pos, params.nn_dist, params.max_num_neighbors
                )
                if params.pbc:
                    k_neigh_idx = build_k_adjacency(
                        pos, params.nn_dist, params.max_num_neighbors,
                        lattice_dims, True,
                    )
                else:
                    k_neigh_idx = neigh_idx
            if need_cutoff_table:
                # the pairwise op uses charged-site compaction at runtime
                # (ops/pairwise.py); this explicit candidate table is only
                # parity tooling
                cutoff_idx, _ = build_cutoff_list(pos, element, params.cutoff_radius)
            else:
                cutoff_idx = np.zeros((len(x), 0), np.int32)
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez_compressed(
                cache_path,
                neigh_idx=neigh_idx,
                k_neigh_idx=k_neigh_idx,
                cutoff_idx=cutoff_idx,
            )

    site_layer = assign_layers(x, params.layers)
    return Lattice(
        element0=element.astype(np.int32),
        x=np.asarray(x, np.float64),
        y=np.asarray(y, np.float64),
        z=np.asarray(z, np.float64),
        lattice=lattice_dims,
        pbc=bool(params.pbc),
        nn_dist=float(params.nn_dist),
        neigh_idx=neigh_idx,
        k_neigh_idx=k_neigh_idx,
        cutoff_idx=cutoff_idx,
        site_layer=site_layer,
        grid=grid,
    )


def metal_mask(element: np.ndarray, metals: Sequence[str]) -> np.ndarray:
    """Boolean mask of metallic sites given metal element names
    (is_in_array_gpu usage, gpu_solvers.h:268-278)."""
    codes = np.array([int(NAME_TO_ELEMENT[m]) for m in metals], dtype=element.dtype)
    return np.isin(element, codes)
