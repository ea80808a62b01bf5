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
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SITE_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (sites/rows) over the mesh."""
    return NamedSharding(mesh, P(SITE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_ROW_SHARDED = (
    "neigh_idx",
    "k_neigh_idx",
    "cutoff_idx",
    "self2_nn",
    "layer_nbr",
    "metal_edge",
    "metal_or_edge",
    # compacted event tables: NA rows (padded to a multiple of 256, so any
    # power-of-two mesh divides evenly); abs2act is an O(N) site-indexed
    # vector and stays replicated like the field vectors
    "act_idx",
    "act_neigh",
    "act_self2",
    "act_layer",
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
            if n not in _ROW_SHARDED
        },
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
