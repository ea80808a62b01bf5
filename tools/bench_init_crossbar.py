"""40 nm-crossbar-scale initialization benchmark.

The reference reports ~20 minutes on a LUMI-G node for 40 nm crossbar
initialization (README.md:11) — dominated by O(N^2) neighbor scans and
sparsity construction (SURVEY.md §3.1). This benchmark builds a structure of
the same scale (the 5 nm device tiled 8x8 in y/z -> N = 2.4M sites, matching
the 40 nm crossbar's 409.6 A lateral lattice) and times the full
initialization path: structure assembly, neighbor lists (native cell lists),
connectivity tables.

Usage: python tools/bench_init_crossbar.py [ny] [nz]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_5NM = "/root/reference/structures/5nm_device"


def main():
    ny = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import read_xyz
    from akmc_tpu.models.crossbar import tile_device
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.state import make_substoichiometric
    from akmc_tpu import native

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))

    t0 = time.perf_counter()
    e2, x2, y2, z2, latt = tile_device(e, x, y, z, tuple(p.lattice), ny, nz)
    t_tile = time.perf_counter() - t0
    n = len(e2)
    print(f"structure: N = {n} sites ({ny}x{nz} tiles), lattice = {latt}")

    t0 = time.perf_counter()
    e2 = make_substoichiometric(e2, p.initial_vacancy_concentration, ReferenceRNG(5))
    t_sub = time.perf_counter() - t0

    pos = np.stack([x2, y2, z2], 1)
    t0 = time.perf_counter()
    assert native.available(), "native builder required for this benchmark"
    neigh = native.neighbor_list_cell(pos, p.nn_dist, p.max_num_neighbors)
    t_nl = time.perf_counter() - t0
    print(f"neighbor list: {t_nl:.1f} s "
          f"(max degree {int((neigh >= 0).sum(1).max())})")

    result = {
        "metric": "crossbar_scale_init",
        "N": n,
        "tile_s": t_tile,
        "substoichiometry_s": t_sub,
        "neighbor_list_s": t_nl,
        "total_s": t_tile + t_sub + t_nl,
        "reference_baseline_s": 1200.0,
        "vs_baseline": 1200.0 / (t_tile + t_sub + t_nl),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
