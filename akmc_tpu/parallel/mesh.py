"""Device-mesh setup and sharding rules.

The reference scales by a 1-D row decomposition of the site/atom axis over
MPI ranks, with replicated field vectors refreshed by Allgatherv and
solver-internal halo exchange (KMC_comm.h:245-392, dist_objects.h:67-68).

TPU-native mapping (SURVEY.md §2.3): ONE mesh axis ``sites``:
  * O(N) field vectors (element, charge, potentials) stay REPLICATED —
    they are tiny (N ≲ millions of f64) and every module reads them with
    arbitrary-neighbor gathers;
  * all O(N*NN) / O(N*C) pair tables (neighbor adjacency, conductances,
    event rates, cutoff candidates) are row-sharded — these carry the
    compute and the memory;
  * jit propagates the shardings: row-sharded gathers of replicated vectors
    are local; reductions to scalars (CG dots, total rates) lower to psum
    over ICI — exactly the collectives the reference hand-codes with
    hipblasDdot + MPI_Allreduce.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SITE_AXIS = "sites"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"mesh needs {n_devices} devices, only {len(devs)} visible "
                "(on CPU set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SITE_AXIS,))


def pad_lattice(lat, multiple: int, pad_element: Optional[int] = None,
                pad_layer: Optional[int] = None):
    """Pad the site axis with far-away, isolated, inert sites so rows shard
    evenly over a ``multiple``-device mesh. Returns ``(lat_padded, n_real)``.

    Pad sites are metal (default Ti): outside the active event species set
    (so they carry exactly-zero rates forever), possibly-charged never (no
    neighbors), absent from every adjacency/cutoff table (all -1 rows) and
    placed ~1e6 Angstrom away. The reference's row decomposition has the
    same need met by hand-chosen rank counts (KMC_comm.h:245-290 divides
    N by comm size with remainder ranks); TPU meshes want equal shards.
    """
    from akmc_tpu.lattice import ELEM, Lattice

    n = lat.N
    pad = (-n) % multiple
    if pad == 0:
        return lat, n
    if pad_element is None:
        pad_element = int(ELEM.Ti)
    if pad_layer is None:
        pad_layer = int(np.max(lat.site_layer))
    far = 1e6 + np.arange(pad) * 1e3
    lat2 = Lattice(
        element0=np.concatenate(
            [lat.element0, np.full(pad, pad_element, np.int32)]
        ),
        x=np.concatenate([lat.x, far]),
        y=np.concatenate([lat.y, np.zeros(pad)]),
        z=np.concatenate([lat.z, np.zeros(pad)]),
        lattice=lat.lattice,
        pbc=lat.pbc,
        nn_dist=lat.nn_dist,
        neigh_idx=np.concatenate(
            [lat.neigh_idx,
             np.full((pad, lat.neigh_idx.shape[1]), -1, np.int32)]
        ),
        k_neigh_idx=np.concatenate(
            [lat.k_neigh_idx,
             np.full((pad, lat.k_neigh_idx.shape[1]), -1, np.int32)]
        ),
        cutoff_idx=np.concatenate(
            [lat.cutoff_idx,
             np.full((pad, lat.cutoff_idx.shape[1]), -1, np.int32)]
        ),
        site_layer=np.concatenate(
            [lat.site_layer, np.full(pad, pad_layer, np.int32)]
        ),
        # padding breaks the grid-native slot enumeration (analytic DIA
        # builders assume exact nx*2*n_yz^2 layout) — drop the descriptor;
        # the banded/ELL operators handle the padded rows
        grid=None,
    )
    return lat2, n


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (sites/rows) over the mesh."""
    return NamedSharding(mesh, P(SITE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_ROW_SHARDED = (
    "neigh_idx",
    "k_neigh_idx",
    "metal_edge",
    "metal_or_edge",
    # compacted event tables: NA rows (padded to a multiple of 256, so any
    # power-of-two mesh divides evenly); abs2act is an O(N) site-indexed
    # vector and stays replicated like the field vectors
    "act_idx",
    "act_neigh",
    "act_self2",
    "act_layer",
    "act_zero_rows",
)


def shard_model(model, mesh: Mesh):
    """Place a VCMModel's static tables row-sharded on the mesh (in place).

    Requires N % mesh size == 0 (pad the lattice if needed) and, for even
    event-table sharding, ``VCMModel(act_pad=k*mesh_size)``. The banded-K
    block stack is sharded over its block axis when divisible (each device
    owns a contiguous row range of the band — the same 1-D row decomposition
    the reference gives Distributed_matrix, dist_objects.h:67-68).
    """
    rs = row_sharding(mesh)
    rep = replicated(mesh)
    t = model.tables
    model.tables = t._replace(
        **{n: jax.device_put(getattr(t, n), rs) for n in _ROW_SHARDED},
        **{
            n: jax.device_put(getattr(t, n), rep)
            for n in t._fields
            if n not in _ROW_SHARDED and n not in ("pair_gT", "pair_tiling")
        },
        # the (NP, N) pairwise table shards over its SITE axis (columns):
        # charged-row gathers stay local slices, the multiply-reduce output
        # is row-sharded like every other per-site product
        pair_gT=(
            None
            if t.pair_gT is None
            else jax.device_put(
                t.pair_gT, NamedSharding(mesh, P(None, SITE_AXIS))
            )
        ),
        # the tiled-pairwise tables shard over the TILE axis when it
        # divides the mesh (per-tile planes are independent); replicated
        # otherwise (they are O(N) ints + positions, small)
        pair_tiling=(
            None
            if t.pair_tiling is None
            else jax.device_put(
                t.pair_tiling,
                rs
                if t.pair_tiling.tile_sites.shape[0] % mesh.size == 0
                else rep,
            )
        ),
    )
    if getattr(model, "banded", None) is not None:
        bk = model.banded
        nb = bk.blocks.shape[0]
        blocks_sh = rs if nb % mesh.size == 0 else rep
        model.banded = bk._replace(
            blocks=jax.device_put(bk.blocks, blocks_sh),
            **{
                n: jax.device_put(getattr(bk, n), rep)
                for n in bk._fields
                if n != "blocks"
            },
        )
    # solve_power's static atom band (same 1-D block-row decomposition);
    # the property builds it on first access, so only touch it when the
    # model will actually run the full-physics branch
    if getattr(getattr(model, "params", None), "solve_current", False):
        pb = model.power_band
        if pb is not None:
            nb = pb.blocks.shape[0]
            blocks_sh = rs if nb % mesh.size == 0 else rep
            model._power_band = pb._replace(
                blocks=jax.device_put(pb.blocks, blocks_sh),
                **{
                    n: jax.device_put(getattr(pb, n), rep)
                    for n in pb._fields
                    if n != "blocks"
                },
            )
    if getattr(model, "dia", None) is not None:
        dk = model.dia
        model.dia = dk._replace(
            diags=jax.device_put(
                dk.diags, NamedSharding(mesh, P(None, SITE_AXIS))
            ),
            **{
                n: jax.device_put(getattr(dk, n), rep)
                for n in dk._fields
                if n != "diags"
            },
        )
    # the event while-loop is serial and replicated-redundant by design
    # (reference: every rank applies the Bcast event, kmc_events.cu:494-504);
    # the model re-traces with explicit one-shot replication of the loop
    # arrays so GSPMD does NOT all-gather the rate table per iteration
    model.mesh = mesh
    model._invalidate_jits()
    return model


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), state)


# ----------------------------------------------------------------------
# Concern-group splitting (P7, split=true): the reference's KMC_comm can
# partition WORLD into a dedicated K-solve group and a pairwise-solve group
# by `ratio` and run the two solves CONCURRENTLY on disjoint ranks
# (KMC_comm.h:132-223; constructed split=false in the committed binary,
# kmc_main.cpp:161-171). TPU equivalent: two disjoint device sub-meshes and
# two independent async dispatches — JAX enqueues both without blocking, so
# they execute concurrently on their device groups, exactly the reference's
# task parallelism; a third combine step sums the potentials (the
# sum_and_gather_potential Bcast+add, potential_solver_gpu.cu:1130-1151).
# ----------------------------------------------------------------------
def split_concern_groups(ratio=(1, 3), n_devices: Optional[int] = None):
    """Partition the visible devices into (mesh_K, mesh_pairwise) by ratio
    (reference default ratio {8, 24}, kmc_main.cpp:163). Needs >= 2 devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(devs) < 2:
        raise ValueError("concern-group splitting needs >= 2 devices")
    nk = min(len(devs) - 1, max(1, (len(devs) * ratio[0]) // sum(ratio)))
    mesh_k = Mesh(np.array(devs[:nk]), (SITE_AXIS,))
    mesh_pair = Mesh(np.array(devs[nk:]), (SITE_AXIS,))
    return mesh_k, mesh_pair


class ConcernGroups:
    """Concurrent K-solve / pairwise-solve execution over two device groups.

    ``fields(element, charge, pb_prev, T_bg, Vd)`` reproduces the model's
    sequential ``_fields`` result (same math; fp differences only from the
    groups' own reduction orders). The charge update is computed redundantly
    in both groups — replicated work, like the reference's events-group
    recomputation — so neither dispatch waits on the other."""

    def __init__(self, model, ratio=(1, 3), n_devices: Optional[int] = None):
        self.model = model
        self._ratio = tuple(ratio)
        self._n_devices = n_devices
        self.mesh_k, self.mesh_pair = split_concern_groups(ratio, n_devices)
        p = model.params

        def _k_side(t, kop, element, charge_in, pb_prev, Vd):
            from akmc_tpu.ops.charge import update_charge_compact

            charge = update_charge_compact(
                element, charge_in, t.neigh_idx, t.any_metal_nbr, model.vmax
            )
            pot, cg = model._solve_boundary(kop, t, element, charge, pb_prev, Vd)
            return pot, cg.iterations

        def _pair_side(t, element, charge_in):
            import jax.numpy as jnp

            from akmc_tpu.lattice import ELEM
            from akmc_tpu.ops.charge import update_charge_compact
            from akmc_tpu.ops.pairwise import (
                pairwise_potential,
                pairwise_potential_tiled,
            )

            v_ovf = jnp.sum(element == int(ELEM.VACANCY)) > model.vmax
            charge = update_charge_compact(
                element, charge_in, t.neigh_idx, t.any_metal_nbr, model.vmax
            )
            if t.pair_tiling is not None:
                # crossbar-scale production config: the tiled solve (the
                # on-the-fly (N, qmax) erfc plane is the measured ~6 s
                # path at 1M+ slots — round-2 advisor). PairTiling is O(N)
                # ints + tile centers: cheap to replicate per group.
                pot_pair, q_ovf, c_ovf = pairwise_potential_tiled(
                    t.pair_tiling, model._pair_r_tile, t.pos, charge,
                    p.cutoff_radius, p.sigma, p.k, qmax=model.qmax,
                    cand_cap=model.pair_cand_cap, plane_f32=model.pair_f32,
                )
            else:
                pot_pair, q_ovf = pairwise_potential(
                    t.pos, charge, p.cutoff_radius, p.sigma, p.k,
                    qmax=model.qmax,
                )
                c_ovf = jax.numpy.asarray(False)
            return charge, pot_pair, q_ovf, c_ovf, v_ovf

        self._k_jit = jax.jit(_k_side)
        self._pair_jit = jax.jit(_pair_side)

        # each group holds its own replicated copy of the (static) tables;
        # the optional multi-GB pairwise table is dropped (the pair group
        # computes tiled or on the fly — identical semantics, no 2x
        # replication of the (NP, N) table)
        t = model.tables._replace(pair_gT=None)
        self._t_k = jax.tree.map(
            lambda a: jax.device_put(a, replicated(self.mesh_k)), t
        )
        self._kop_k = jax.tree.map(
            lambda a: jax.device_put(a, replicated(self.mesh_k)), model.kop
        )
        self._t_pair = jax.tree.map(
            lambda a: jax.device_put(a, replicated(self.mesh_pair)), t
        )

    def fields(self, element, charge, pb_prev, T_bg, Vd):
        """Concurrent charge+K (group K) and charge+pairwise (group pair):
        both dispatches are enqueued before either result is awaited.
        Returns (charge, pot_b, pot_sum, cg_iters, q_ovf, c_ovf); the
        caller owns cap growth on q_ovf/c_ovf (grow model.qmax /
        model.pair_cand_cap, rebuild the groups, replay — see
        VCMModel.superstep's loop)."""
        rep_k = replicated(self.mesh_k)
        rep_p = replicated(self.mesh_pair)
        e_k = jax.device_put(element, rep_k)
        c_k = jax.device_put(charge, rep_k)
        pb_k = jax.device_put(pb_prev, rep_k)
        e_p = jax.device_put(element, rep_p)
        c_p = jax.device_put(charge, rep_p)
        # async: neither .block_until_ready nor host pull between dispatches
        pot_b, cg_iters = self._k_jit(self._t_k, self._kop_k, e_k, c_k, pb_k, Vd)
        charge_new, pot_pair, q_ovf, c_ovf, v_ovf = self._pair_jit(
            self._t_pair, e_p, c_p
        )
        # combine on the pairwise group (sum_AB_into_A)
        pot_sum = pot_pair + jax.device_put(pot_b, rep_p)
        return charge_new, pot_b, pot_sum, cg_iters, q_ovf, c_ovf, v_ovf

    def superstep(self, state, Vd: float, stream, rand_chunk: int = 8192):
        """One full superstep with the field solves task-split over the two
        groups (driver flag --concern-split), followed by the standard
        rates+events dispatch. Same module math/order as VCMModel.superstep;
        fp differences only from the groups' own reduction orders."""
        model = self.model
        charge, pot_b, pot_sum, cg_iters, q_ovf, c_ovf, v_ovf = self.fields(
            state.element, state.charge, state.potential_boundary,
            state.T_bg, Vd,
        )
        import numpy as _np

        if (
            bool(_np.asarray(q_ovf))
            or bool(_np.asarray(c_ovf))
            or bool(_np.asarray(v_ovf))
        ):
            if bool(_np.asarray(q_ovf)):
                model.qmax *= 2
            if bool(_np.asarray(c_ovf)):
                model.pair_cand_cap *= 2
            if bool(_np.asarray(v_ovf)):
                model.vmax *= 2
            model._invalidate_jits()
            self.__init__(model, self._ratio, self._n_devices)
            return self.superstep(state, Vd, stream, rand_chunk)
        mid = state._replace(
            charge=charge, potential_boundary=pot_b, potential_charge=pot_sum
        )
        new_state, stats = model.superstep_events_only(mid, stream, rand_chunk)
        stats["cg_iterations"] = int(cg_iters)
        return new_state, stats
