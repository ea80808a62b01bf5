"""40 nm-crossbar-scale initialization benchmark — apples-to-apples with the
reference's ~20 min/node initialization (README.md:11), which covers
structure build, neighbor+cutoff scans AND K-sparsity construction up to the
first K solve of the superstep loop (SURVEY.md §3.1, kmc_main.cpp:197-228).

This benchmark therefore times ALL of:
  1. structure generation (grid-native crossbar at the deck's 409.6 A
     lateral scale, n_yz=192 -> 3.76M slots / ~2.1M physical sites),
  2. substoichiometric vacancy placement,
  3. neighbor/K index tables (native C++ cell lists),
  4. model table construction — StaticTables + the DIA K operator, the
     matrix-free equivalent of the reference's initialize_sparsity_K
     (iterative_solvers_gpu.cu:262-488),
  5. (--solve) the first cold K CG solve on the attached device — the
     reference's first-superstep 0.106 s/20-min-init boundary
     (expected_output/output1_0.txt:7).

Usage:
    python tools/bench_init_crossbar.py [n_yz] [--solve]
    python tools/bench_init_crossbar.py --tiled [ny] [nz]   # legacy mode:
        the 5 nm device tiled ny x nz (no DIA/solve — disordered structure)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REF_5NM = "/root/reference/structures/5nm_device"
REF_BASELINE_S = 1200.0     # ~20 min on a LUMI-G node (reference README.md:11)


def run_tiled(ny: int, nz: int) -> dict:
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
    print(f"structure: N = {n} sites ({ny}x{nz} tiles), lattice = {latt}",
          file=sys.stderr)

    t0 = time.perf_counter()
    e2 = make_substoichiometric(e2, p.initial_vacancy_concentration, ReferenceRNG(5))
    t_sub = time.perf_counter() - t0

    pos = np.stack([x2, y2, z2], 1)
    t0 = time.perf_counter()
    assert native.available(), "native builder required for this benchmark"
    neigh = native.neighbor_list_cell(pos, p.nn_dist, p.max_num_neighbors)
    t_list = time.perf_counter() - t0
    print(f"neighbor list: {t_list:.1f} s "
          f"(max degree {int((neigh >= 0).sum(1).max())})", file=sys.stderr)
    total = t_tile + t_sub + t_list
    return {
        "metric": "crossbar_scale_init",
        "mode": "tiled_5nm",
        "N": n,
        "structure_s": t_tile,
        "substoichiometry_s": t_sub,
        "lists_s": t_list,
        "total_s": total,
        "reference_baseline_s": REF_BASELINE_S,
        "vs_baseline": REF_BASELINE_S / total,
    }


def run_grid(n_yz: int, solve: bool) -> dict:
    from akmc_tpu.lattice import build_lattice
    from akmc_tpu.models.crossbar import (
        crossbar_layers, grid_neighbor_list, grid_stack, mask_null_slots,
    )
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric
    import dataclasses

    from akmc_tpu.config import KMCParameters

    contact, oxide, ti = 10, 33, 8        # 51 slices ~ the deck's 108.98 A
    t0 = time.perf_counter()
    e, x, y, z, lattice, patch = grid_stack(
        n_yz=n_yz, contact_slices=contact, oxide_slices=oxide, ti_slices=ti,
        defect_fraction=0.1, seed=32,
    )
    t_gen = time.perf_counter() - t0
    n = len(e)
    n_phys = int((e != 9).sum())
    print(f"structure: N = {n} slots ({n_phys} physical sites), "
          f"lattice = {lattice}", file=sys.stderr)

    t0 = time.perf_counter()
    e = make_substoichiometric(e, 0.05, ReferenceRNG(32))
    t_sub = time.perf_counter() - t0

    p = KMCParameters(
        lattice=list(lattice), nn_dist=3.5, sigma=3.5e-10, epsilon=23.0,
        metals=patch["metals"],
        num_atoms_first_layer=patch["num_atoms_first_layer"],
        num_layers_contact=patch["num_layers_contact"],
        num_atoms_contact=patch["num_atoms_contact"],
        layers=crossbar_layers(contact, oxide, ti),
        initial_vacancy_concentration=0.05,
        solve_potential=True, perturb_structure=True, pbc=False,
    )
    t0 = time.perf_counter()
    # the analytic grid-native list builder (the production path for
    # grid-native structures; exact-equality-tested vs the C++ cell list)
    nl = grid_neighbor_list(
        n_yz, 2 * contact + oxide + ti, 2.131255, p.nn_dist,
        p.max_num_neighbors, null_mask=e == 9,
    )
    lat = build_lattice(
        e, x, y, z, p, cache_dir=None, precomputed_lists=(nl, nl)
    )   # uncached: measure it
    mask_null_slots(lat)
    t_list = time.perf_counter() - t0
    print(f"index tables: {t_list:.1f} s", file=sys.stderr)

    # StaticTables + DIA K operator — the reference's initialize_sparsity_K
    # equivalent (per-rank nnz counting, CSR blocks, Distributed_matrix ctor)
    t0 = time.perf_counter()
    model = VCMModel(p, lat, rate_normalize=True)
    t_tables = time.perf_counter() - t0
    kind = ("dia" if model.dia is not None
            else "banded" if model.banded is not None else "ell")
    print(f"model tables + K operator ({kind}): {t_tables:.1f} s",
          file=sys.stderr)

    result = {
        "metric": "crossbar_scale_init",
        "mode": "grid_native",
        "N": n,
        "N_physical": n_phys,
        "structure_s": t_gen,
        "substoichiometry_s": t_sub,
        "lists_s": t_list,
        "tables_s": t_tables,
        "k_operator": kind,
    }

    total = t_gen + t_sub + t_list + t_tables
    if solve:
        import jax

        jax.config.update("jax_enable_x64", True)
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "jaxcache")
        jax.config.update("jax_compilation_cache_dir", cache)
        state = make_device_state(lat, 300.0)
        t0 = time.perf_counter()
        pot, cg = jax.block_until_ready(jax.jit(
            lambda el, ch, pb: model._solve_boundary(
                model.kop, model.tables, el, ch, pb, 15.0)
        )(state.element, state.charge, state.potential_boundary))
        t_solve = time.perf_counter() - t0
        print(f"first K solve: {t_solve:.1f} s "
              f"({int(cg.iterations)} iters, incl. compile)", file=sys.stderr)
        result["first_k_solve_s"] = t_solve
        result["first_k_solve_iters"] = int(cg.iterations)
        total += t_solve

    result["total_s"] = total
    result["reference_baseline_s"] = REF_BASELINE_S
    result["vs_baseline"] = REF_BASELINE_S / total
    return result


def main():
    args = [a for a in sys.argv[1:]]
    if "--cpu" in args:
        # host-init measurement independent of the accelerator (also the
        # only way to run while the TPU tunnel is down): must be set via
        # jax.config BEFORE backend init — the sitecustomize force-selects
        # the axon platform in every process
        args.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if "--tiled" in args:
        args.remove("--tiled")
        ny = int(args[0]) if args else 8
        nz = int(args[1]) if len(args) > 1 else 8
        result = run_tiled(ny, nz)
    else:
        solve = "--solve" in args
        if solve:
            args.remove("--solve")
        n_yz = int(args[0]) if args else 192
        result = run_grid(n_yz, solve)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
