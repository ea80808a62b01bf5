"""Pairwise screened-Coulomb potential of the charged defects.

Reference: poisson_gridless_gpu / calculate_pairwise_interaction_indexed
(potential_solver_gpu.cu:1525-1655):

    potential[i] = sum_{j in cutoff_idx[i], charge_j != 0}
                   charge_j * erfc(d_ij / (sigma*sqrt(2))) * k * e / d_ij

with d_ij = 1e-10 * Euclidean (NON-PBC) distance and a candidate list
prefiltered at build time to possibly-charged sites within the 20 A cutoff
(neighbor_lists_gpu.cu:107-136).

TPU realization — NOT the reference's indexed gather (a (N, ~4e3) gather
table is the slowest possible TPU access pattern). Key observation: the
summand is nonzero only for *currently charged* sites (charge != 0 implies
the possibly-charged class, and positions are static), so

    potential[i] = sum_{q in charged, d_iq < cutoff, q != i} q * g(d_iq)

over a COMPACTED charged-site list (|charged| = #V + #Od << N). Distances
come from the MXU:  d^2 = |x_i|^2 + |x_q|^2 - 2 x_i . x_q  — one (N,3)x(3,Q)
matmul — and the erfc/mask/sum is one fused VPU pass over (N, Q). This is
mathematically identical to the reference's candidate-list sum (same pairs,
same distances); only the float accumulation order differs.

The charged count must fit the static cap ``qmax``; ``pairwise_potential``
returns an overflow flag the host checks per superstep.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import erfc

from akmc_tpu.ops.compact import compact_mask

Q_E = 1.60217663e-19


class PairTiling(NamedTuple):
    """Static spatial tiling for the tiled pairwise solve (crossbar scale,
    where neither the on-the-fly (N, qmax) plane — measured 5.96 s/superstep
    at N=1.08M, qmax=8960 — nor the (NP, N) table fits).

    Sites are binned into cubic tiles of edge ~cutoff; per superstep each
    tile gets a compacted list of the charged sites within reach
    (cutoff + tile circumradius), and the erfc plane shrinks from
    (N, qmax) to (T, S, C) with C ~ tens-hundreds — the same pair set
    beyond the cutoff filter, so the result equals the on-the-fly solve up
    to summation order."""

    tile_sites: jax.Array    # (T, S) int32 site ids, -1 pad
    pos_tiles: jax.Array     # (T, S, 3) site positions (pad -> 1e30)
    tile_center: jax.Array   # (T, 3) tile centers


class PairTable(NamedTuple):
    """Static (NP_pad, N) pairwise interaction table, in one of two storage
    forms: ``full`` f64 (exact, parity backends) or ``hi``/``lo`` f32 planes
    (dd-emulated TPU runtime — see pairwise_potential_table)."""

    full: Optional[jax.Array] = None
    hi: Optional[jax.Array] = None
    lo: Optional[jax.Array] = None


def pairwise_potential(
    pos: jnp.ndarray,          # (N, 3) f64 [Angstrom]
    charge: jnp.ndarray,       # (N,) int32
    cutoff_radius: float,      # [Angstrom]
    sigma: float,              # [m]
    k: float,                  # [N m^2 / C^2]
    qmax: int = 2048,
    row_block: int = None,
    plane_budget: int = 512 * 1024 * 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ((N,) potential [V], overflow flag).

    Row blocking: rows are independent, so any partition is bit-identical;
    a single fused (N, Q) pass minimizes the op count (the tunneled runtime
    charges a fixed per-op cost, PERF_NOTES), while very large N*Q planes
    are row-blocked via ``lax.map`` to bound the fused buffer size."""
    n = pos.shape[0]
    dt = pos.dtype
    if row_block is None:
        row_block = n if n * qmax * 8 <= plane_budget else 4096

    charged = charge != 0
    n_charged = jnp.sum(charged)
    # compact_mask, not jnp.nonzero: the nonzero lowering (full-N s64
    # cumsum + full-N scatter) costs ~6 ms at N = 37,650 on the tunneled
    # v5e; compact_mask is bit-identical (ops/compact.py)
    q_idx, qv = compact_mask(charged, qmax)
    qi = q_idx.clip(0)

    q_pos = pos[qi]                                   # (Q, 3)
    q_val = jnp.where(qv, charge[qi], 0).astype(dt)   # (Q,)

    inv_sig = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0, dt)))
    cut2 = jnp.asarray(cutoff_radius * cutoff_radius, dt)
    kq = k * Q_E

    nblk = -(-n // row_block)
    npad = nblk * row_block
    pos_p = jnp.concatenate([pos, jnp.full((npad - n, 3), 1e30, dt)])
    rows = jnp.arange(npad, dtype=jnp.int32).reshape(nblk, row_block)

    def block(r):
        pr = pos_p[r]                                  # (B, 3)
        # exact difference-based d^2 (same rounding class as the reference's
        # site_dist_gpu) — XLA fuses the (B, Q, 3) broadcast into the
        # reduction, no materialization
        d2 = jnp.sum((pr[:, None, :] - q_pos[None, :, :]) ** 2, axis=-1)
        valid = (d2 < cut2) & (r[:, None] != q_idx[None, :]) & qv[None, :]
        d = 1e-10 * jnp.sqrt(jnp.where(valid, d2, 1.0))
        v = q_val[None, :] * erfc(d * inv_sig) * kq / d
        return jnp.sum(jnp.where(valid, v, 0.0), axis=1)

    out = lax.map(block, rows).reshape(npad)[:n]
    return out, n_charged > qmax


def build_pair_table(
    pos: jnp.ndarray,          # (N, 3) f64 [Angstrom]
    poss_idx: jnp.ndarray,     # (NP,) int32 possibly-charged sites (static)
    cutoff_radius: float,
    sigma: float,
    k: float,
    row_block: int = 256,
    split_f32: bool = False,
) -> "PairTable":
    """Static screened-Coulomb interaction table gT[(q, i)] = g(d_iq) for
    every (possibly-charged site q, site i) pair, cutoff and self-exclusion
    baked in as exact zeros. Returned with NP padded up to the block size
    (pad rows all-zero).

    Positions are static and charged sites are always drawn from the static
    possibly-charged class, so the erfc/sqrt/divide plane of
    ``pairwise_potential`` can be precomputed ONCE: the per-superstep solve
    collapses to a (qmax, N) contiguous-row gather + one multiply-reduce
    (measured on the chip: the on-the-fly 5 nm pairwise pass cost ~22 ms
    device; the table apply is bandwidth-bound). The values are computed
    with the same per-pair operations as the on-the-fly path; only the
    q_val multiply is deferred to apply time (one reassociation — same
    class of fp change as the compaction reorderings, golden-gated).

    Memory: NP*N*8 bytes ((19969, 37650) -> 6.0 GB on the 5 nm device);
    callers gate on a byte budget (VCMModel.pair_table_budget).
    """
    n = pos.shape[0]
    dt = pos.dtype
    np_rows = poss_idx.shape[0]
    nblk = -(-np_rows // row_block)
    pad = nblk * row_block - np_rows

    # ONE jitted program for the whole build. Built eagerly, each op
    # (lax.map, reshape) dispatches its own executable whose multi-GB output
    # buffer coexists with the previous one — a 2x transient that left the
    # 16 GB chip exhausted (measured). Under jit the reshape is metadata and
    # exactly one output buffer materializes.
    # Keep the block-padded row count: pad rows (pi=-1) are exact zeros and
    # never gathered (site2col targets real rows only); slicing to np_rows
    # would copy.
    def _build(pos_a, poss_a):
        inv_sig = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0, dt)))
        cut2 = jnp.asarray(cutoff_radius * cutoff_radius, dt)
        kq = k * Q_E
        pi = jnp.concatenate([poss_a, jnp.full(pad, -1, poss_a.dtype)])
        site_ids = jnp.arange(n, dtype=jnp.int32)

        def block(pi_blk):
            q_pos = pos_a[pi_blk.clip(0)]              # (B, 3)
            d2 = jnp.sum((q_pos[:, None, :] - pos_a[None, :, :]) ** 2, axis=-1)
            valid = (d2 < cut2) & (pi_blk[:, None] != site_ids[None, :]) & (
                pi_blk[:, None] >= 0
            )
            d = 1e-10 * jnp.sqrt(jnp.where(valid, d2, 1.0))
            g = erfc(d * inv_sig) * kq / d
            g = jnp.where(valid, g, 0.0)
            if not split_f32:
                return g
            # hi/lo f32 split INSIDE the block: the full f64 table is never
            # materialized. hi = f32 round of g; lo = the exact residual
            # (f32-representable: on the dd-emulated backend g IS a
            # normalized (hi, lo) pair, and the rounding correction stays
            # within one f32 ulp — Sterbenz).
            hi = g.astype(jnp.float32)
            lo = (g - hi.astype(dt)).astype(jnp.float32)
            return hi, lo

        out = lax.map(block, pi.reshape(nblk, row_block))
        if not split_f32:
            return PairTable(full=out.reshape(nblk * row_block, n))
        hi, lo = out
        return PairTable(
            hi=hi.reshape(nblk * row_block, n),
            lo=lo.reshape(nblk * row_block, n),
        )

    return jax.jit(_build)(pos, poss_idx)


def pairwise_potential_table(
    pt: "PairTable",           # static interaction table (full f64 OR hi/lo f32)
    site2col: jnp.ndarray,     # (N,) int32 site -> table row (abs2act works:
    #                            charged sites are always active-class rows)
    charge: jnp.ndarray,       # (N,) int32
    qmax: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Table-based pairwise solve: identical pair set / distances / erfc
    values as ``pairwise_potential`` (same ops at build time), same charged
    compaction order, same (N, Q) axis-1 reduction orientation.

    ``full`` storage keeps the exact f64 values (parity backends). ``hi/lo``
    f32 storage is for the dd-emulated TPU runtime, whose X64-rewrite pass
    otherwise materializes TWO extra f32 half-tables per executable for an
    f64 parameter (measured: 5.69 + 2*2.84 GB for the 6 GB table — OOM);
    the split arrays pass through natively and only the gathered (Q, N)
    rows are reconstructed to f64."""
    first = pt.full if pt.full is not None else pt.hi
    np_rows = first.shape[0]
    dt = jnp.float64 if pt.full is None else pt.full.dtype
    charged = charge != 0
    n_charged = jnp.sum(charged)
    # compact_mask, not jnp.nonzero: the nonzero lowering (full-N s64
    # cumsum + full-N scatter) costs ~6 ms at N = 37,650 on the tunneled
    # v5e; compact_mask is bit-identical (ops/compact.py)
    q_idx, qv = compact_mask(charged, qmax)
    qi = q_idx.clip(0)
    q_val = jnp.where(qv, charge[qi], 0).astype(dt)
    cols = site2col[qi].clip(0, np_rows - 1)
    if pt.full is not None:
        rows = pt.full[cols]                           # (Q, N) contiguous rows
    else:
        rows = pt.hi[cols].astype(dt) + pt.lo[cols].astype(dt)
    pot = jnp.sum(rows.T * q_val[None, :], axis=1)     # (N, Q) -> (N,)
    return pot, n_charged > qmax


def build_pair_tiling(
    pos: np.ndarray,           # (N, 3) f64 [Angstrom], host
    cutoff_radius: float,
    tile_edge: float = None,
) -> Tuple[PairTiling, float]:
    """Host-side tile construction. Returns (tiling, r_tile) where r_tile is
    the tile circumradius (static float — bake it into the jit)."""
    import numpy as _np

    h = float(tile_edge if tile_edge is not None else cutoff_radius)
    mins = pos.min(axis=0)
    idx3 = _np.floor((pos - mins) / h).astype(_np.int64)
    dims = idx3.max(axis=0) + 1
    tid = (idx3[:, 0] * dims[1] + idx3[:, 1]) * dims[2] + idx3[:, 2]
    uniq, inv = _np.unique(tid, return_inverse=True)
    T = len(uniq)
    order = _np.argsort(inv, kind="stable")
    counts = _np.bincount(inv, minlength=T)
    S = int(counts.max())
    tile_sites = _np.full((T, S), -1, _np.int32)
    col = _np.concatenate([_np.arange(c) for c in counts])
    tile_sites[inv[order], col] = order.astype(_np.int32)
    pos_tiles = _np.where(
        (tile_sites >= 0)[:, :, None], pos[tile_sites.clip(0)], 1e30
    )
    # centers of the occupied tiles, in the same grid frame
    t3 = _np.stack(
        [uniq // (dims[1] * dims[2]), (uniq // dims[2]) % dims[1], uniq % dims[2]],
        axis=1,
    )
    centers = mins[None, :] + (t3 + 0.5) * h
    r_tile = h * float(_np.sqrt(3.0)) / 2.0
    return (
        PairTiling(
            tile_sites=jnp.asarray(tile_sites),
            pos_tiles=jnp.asarray(pos_tiles),
            tile_center=jnp.asarray(centers),
        ),
        r_tile,
    )


def pairwise_potential_tiled(
    tiling: PairTiling,
    r_tile: float,             # static tile circumradius [Angstrom]
    pos: jnp.ndarray,          # (N, 3) f64 (charged-site position source)
    charge: jnp.ndarray,       # (N,) int32
    cutoff_radius: float,
    sigma: float,
    k: float,
    qmax: int,
    cand_cap: int,             # static per-tile candidate cap (host-grown
    #                            on overflow like qmax)
    tile_block: int = None,
    plane_budget: int = 512 * 1024 * 1024,
    plane_f32: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ((N,) potential, q_overflow, cand_overflow).

    Same pair set as ``pairwise_potential`` (the extra tile filter only
    removes pairs beyond the cutoff); per-site summation order follows the
    per-tile candidate list instead of the global charged list, so values
    agree to summation-order reassociation (oracle-tested).

    ``plane_f32``: evaluate the (B, S, C) distance/erfc kernel plane in
    f32 (production crossbar option — the dd-emulated f64 pays ~10x per
    op for the dominant fields plane). The f64 path stays the default
    and the validation oracle. Error model: coordinates are exact in f32
    to ~1e-5 relative, the difference-first d2 has no cancellation, and
    the per-site sum over <=C kernel terms lands ~1e-6 relative on the
    potential — ~1e-6 eV on activation energies, far below kT/25. The
    in-cutoff membership test also rounds in f32, so a pair within
    ~1e-5 relative of the cutoff shell may classify differently from the
    f64 path (physically meaningless at the shell edge, but a REAL pair-set
    difference — not just rounding: tests compare against a matching-mode
    oracle)."""
    n = pos.shape[0]
    dt = pos.dtype
    T, S = tiling.tile_sites.shape
    # a tile can never hold more than qmax candidates (the mask row has
    # qmax slots), so clamp: keeps host-side cap growth from pushing
    # top_k's k past the row length (trace-time crash); at cand_cap ==
    # qmax overflow is impossible
    cand_cap = min(cand_cap, qmax)

    charged = charge != 0
    n_charged = jnp.sum(charged)
    # compact_mask, not jnp.nonzero: the nonzero lowering (full-N s64
    # cumsum + full-N scatter) costs ~6 ms at N = 37,650 on the tunneled
    # v5e; compact_mask is bit-identical (ops/compact.py)
    q_idx, qv = compact_mask(charged, qmax)
    qi = q_idx.clip(0)
    q_pos = pos[qi]                                    # (Q, 3)
    q_val = jnp.where(qv, charge[qi], 0).astype(dt)

    inv_sig = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0, dt)))
    cut2 = jnp.asarray(cutoff_radius * cutoff_radius, dt)
    kq = k * Q_E

    # (T, Q) reach filter -> per-tile top-C candidate compaction (top_k on
    # the 0/1 mask is index-stable, so candidates keep q-list order).
    # The filter runs in f32 and BLOCKED over tile chunks: at the 4.6M-slot
    # crossbar (T=24k, qmax=38k) a single f64 plane is 7.3 GB (measured
    # execution OOM). f32 is selection-only — the reach is padded against
    # rounding PROPORTIONALLY to the coordinate magnitude (f32 position
    # error ~eps32*|x| enters d2 scaled by the distance; a fixed pad would
    # silently under-select on large structures), and the exact f64
    # `d2 < cutoff^2` test still runs in the compute plane below.
    # Over-inclusion is harmless (candidates only; the cap auto-grows).
    cen32 = tiling.tile_center.astype(jnp.float32)
    qp32 = q_pos.astype(jnp.float32)
    coord_scale = jnp.max(jnp.abs(cen32))
    pad = jnp.float32(1e-3) + 64.0 * jnp.float32(1.2e-7) * coord_scale
    reach = (jnp.float32(cutoff_radius + r_tile) + pad) ** 2
    fblk = max(1, min(T, plane_budget // max(1, 4 * qmax)))
    nfb = -(-T // fblk)
    cen_p = jnp.pad(
        cen32, ((0, nfb * fblk - T), (0, 0)), constant_values=1e30
    ).reshape(nfb, fblk, 3)

    def filt(cen_b):
        d2c = jnp.sum(
            (cen_b[:, None, :] - qp32[None, :, :]) ** 2, axis=-1
        )
        mask = (d2c < reach) & qv[None, :]
        mv, ci = jax.lax.top_k(mask.astype(jnp.int32), cand_cap)
        return mv, ci, jnp.sum(mask, axis=1)

    mvals, candq, cnt = lax.map(filt, cen_p)
    mvals = mvals.reshape(nfb * fblk, cand_cap)[:T]
    candq = candq.reshape(nfb * fblk, cand_cap)[:T]
    cand_overflow = jnp.max(cnt.reshape(-1)[: nfb * fblk]) > cand_cap
    sel = mvals > 0                                    # (T, C)
    pdt = jnp.float32 if plane_f32 else dt
    q_posc = q_pos.astype(pdt)[candq]                  # (T, C, 3)
    q_valc = jnp.where(sel, q_val[candq], 0.0).astype(pdt)
    q_sitec = jnp.where(sel, q_idx[candq], -1)         # absolute site ids

    if tile_block is None:
        tile_block = (
            T if T * S * cand_cap * 8 <= plane_budget
            else max(1, plane_budget // (S * cand_cap * 8))
        )
    nblk = -(-T // tile_block)

    cut2_p = cut2.astype(pdt)
    inv_sig_p = jnp.asarray(inv_sig, pdt)

    def block(a):
        ts, ptile, qp, qw, qs = a
        d2 = jnp.sum(
            (ptile[:, :, None, :] - qp[:, None, :, :]) ** 2, axis=-1
        )                                              # (B, S, C)
        valid = (
            (d2 < cut2_p)
            & (ts[:, :, None] != qs[:, None, :])
            & (qs[:, None, :] >= 0)
        )
        d = jnp.asarray(1e-10, pdt) * jnp.sqrt(jnp.where(valid, d2, 1.0))
        v = qw[:, None, :] * erfc(d * inv_sig_p) * jnp.asarray(kq, pdt) / d
        return jnp.sum(jnp.where(valid, v, 0.0), axis=2)   # (B, S)

    def pad_blk(a, fill):
        extra = nblk * tile_block - a.shape[0]
        if extra == 0:
            return a.reshape((nblk, tile_block) + a.shape[1:])
        pad_widths = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_widths, constant_values=fill).reshape(
            (nblk, tile_block) + a.shape[1:]
        )

    vals = lax.map(
        block,
        (
            pad_blk(tiling.tile_sites, -1),
            pad_blk(tiling.pos_tiles.astype(pdt), 1e30),
            pad_blk(q_posc, 0.0),
            pad_blk(q_valc, 0.0),
            pad_blk(q_sitec, -1),
        ),
    ).reshape(nblk * tile_block, S)[:T].astype(dt)

    pot = jnp.zeros(n, dt).at[tiling.tile_sites.clip(0)].add(
        jnp.where(tiling.tile_sites >= 0, vals, 0.0)
    )
    return pot, n_charged > qmax, cand_overflow
