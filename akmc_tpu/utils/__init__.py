"""Utility namespace (reference: src/utils.{h,cpp}).

Element coding, xyz I/O, distances and structure manipulation live in
akmc_tpu.lattice; RNG in akmc_tpu.rng; re-exported here for discoverability.
"""

from akmc_tpu.lattice import (
    ELEM,
    ELEMENT_NAMES,
    EVENT,
    NAME_TO_ELEMENT,
    center_coords,
    count_contact_sites,
    read_xyz,
    site_dist,
    sort_by_x,
    sort_by_xyz,
    translate_cell,
    write_xyz_snapshot,
)
from akmc_tpu.rng import MT19937, BufferedStream, ReferenceRNG

__all__ = [
    "ELEM", "ELEMENT_NAMES", "EVENT", "NAME_TO_ELEMENT",
    "center_coords", "count_contact_sites", "read_xyz", "site_dist",
    "sort_by_x", "sort_by_xyz", "translate_cell", "write_xyz_snapshot",
    "MT19937", "BufferedStream", "ReferenceRNG",
]
