"""Pairwise screened-Coulomb potential of the charged defects.

Reference: poisson_gridless_gpu / calculate_pairwise_interaction_indexed
(potential_solver_gpu.cu:1525-1655):

    potential[i] = sum_{j in cutoff_idx[i], charge_j != 0}
                   charge_j * erfc(d_ij / (sigma*sqrt(2))) * k * e / d_ij

with d_ij = 1e-10 * Euclidean (NON-PBC) distance — the candidate list was
prefiltered at build time to possibly-charged sites within the 20 A cutoff
(neighbor_lists_gpu.cu:107-136); positions are static so the list never needs
rebuilding.

TPU realization: the candidate table is a padded (N, N_cutoff) gather.  To
bound transient memory, rows are processed in blocks via ``lax.map`` — each
block is a fused gather + VPU pass (erfc/rsqrt), no host involvement, no
MPI_Gatherv. A Pallas streaming kernel is a planned upgrade for the
charged-compaction formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import erfc

Q_E = 1.60217663e-19


def pairwise_potential(
    pos: jnp.ndarray,          # (N, 3) f64 [Angstrom]
    charge: jnp.ndarray,       # (N,) int32
    cutoff_idx: jnp.ndarray,   # (N, C) int32, -1 padded
    sigma: float,              # [m]
    k: float,                  # [N m^2 / C^2]
    row_block: int = 4096,
) -> jnp.ndarray:
    """(N,) f64 potential from charged defects [V]."""
    n = pos.shape[0]
    c = cutoff_idx.shape[1]
    nblk = -(-n // row_block)
    npad = nblk * row_block

    idx_p = jnp.full((npad, c), -1, cutoff_idx.dtype).at[:n].set(cutoff_idx)
    rows = jnp.arange(npad).reshape(nblk, row_block)

    qf = charge.astype(pos.dtype)
    inv_sig = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0, pos.dtype)))

    def block(r):
        ji = idx_p[r]                       # (B, C)
        j = ji.clip(0)
        rr = r.clip(0, n - 1)
        d2 = jnp.sum((pos[rr][:, None, :] - pos[j]) ** 2, axis=-1)
        d = 1e-10 * jnp.sqrt(d2)
        qj = qf[j]
        valid = (ji >= 0) & (qj != 0.0)
        v = qj * erfc(d * inv_sig) * (k * Q_E) / jnp.where(d > 0, d, 1.0)
        return jnp.sum(jnp.where(valid, v, 0.0), axis=1)

    out = lax.map(block, rows)              # (nblk, B)
    return out.reshape(npad)[:n]
