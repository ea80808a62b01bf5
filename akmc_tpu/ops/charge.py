"""Site-charge assignment from local neighborhood rules.

Reference: the ``update_charge`` kernel (potential_solver_gpu.cu:12-63):
  * VACANCY sites get +2, demoted to 0 if they have >= 2 vacancy neighbors
    or any metallic neighbor;
  * OXYGEN_DEFECT sites get -2, demoted to 0 if they have any metallic
    neighbor;
  * all other sites keep their current charge (events manage it).

TPU realization: one vectorized gather over the padded ELL neighbor table +
``where`` selects — no per-site loops, no Allgatherv (the charge vector is
computed for all rows; under a mesh the row dimension shards and XLA inserts
the all-gather where consumers need the full vector).

The metal-neighbor predicate is STATIC: metallic sites never transform
(events only touch d/O/V/Od sites), so ``any_metal_nbr`` is precomputed once.
"""

from __future__ import annotations

import jax.numpy as jnp

from akmc_tpu.lattice import ELEM
from akmc_tpu.ops.compact import compact_mask


def update_charge(
    element: jnp.ndarray,        # (N,) int32
    charge: jnp.ndarray,         # (N,) int32 current charges
    neigh_idx: jnp.ndarray,      # (N, NN) int32, -1 padded
    any_metal_nbr: jnp.ndarray,  # (N,) bool, static
) -> jnp.ndarray:
    valid = neigh_idx >= 0
    nbr_elem = element[neigh_idx.clip(0)]

    vac_nbrs = jnp.sum(valid & (nbr_elem == int(ELEM.VACANCY)), axis=1)
    return _apply_rules(element, charge, any_metal_nbr, vac_nbrs)


def update_charge_compact(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    neigh_idx: jnp.ndarray,
    any_metal_nbr: jnp.ndarray,
    vmax: int,
) -> jnp.ndarray:
    """Identical rules, O(VMAX*NN) work: the vacancy-neighbor count only
    depends on WHERE the vacancies are, so count via the compacted vacancy
    list and the (symmetric) adjacency — a scatter-add over <= VMAX*NN
    positions instead of an (N, NN) element gather (TPU gathers serialize
    on the scalar unit)."""
    is_v = element == int(ELEM.VACANCY)
    # compact_mask, not jnp.nonzero: the nonzero lowering (full-length s64
    # cumsum + full-length scatter) measured ~6 ms/step at N = 37,650 on
    # the tunneled v5e (tools/probe_events_5nm.py E2-E3); compact_mask is
    # bit-identical (tests/test_banded.py::test_compact_mask_matches_nonzero)
    vidx, vv = compact_mask(is_v, vmax)
    rows = neigh_idx[vidx.clip(0)]                       # (VMAX, NN)
    ok = (rows >= 0) & vv[:, None]
    vac_nbrs = jnp.zeros(element.shape[0], jnp.int32).at[rows.clip(0)].add(
        jnp.where(ok, 1, 0).astype(jnp.int32)
    )
    return _apply_rules(element, charge, any_metal_nbr, vac_nbrs)


def _apply_rules(element, charge, any_metal_nbr, vac_nbrs):
    is_v = element == int(ELEM.VACANCY)
    is_od = element == int(ELEM.OXYGEN_DEFECT)

    v_charge = jnp.where(any_metal_nbr | (vac_nbrs >= 2), 0, 2)
    od_charge = jnp.where(any_metal_nbr, 0, -2)

    return jnp.where(
        is_v, v_charge, jnp.where(is_od, od_charge, charge)
    ).astype(charge.dtype)
