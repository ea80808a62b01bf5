"""DIA (diagonal-offset) K operator: the gather-free TPU SpMV for
grid-native structures.

Motivation (crossbar scale): the banded-dense operator (solvers/banded.py)
stores T+2B values per row — at 40 nm-crossbar cross-sections the lexsort
bandwidth B is ~1e4-1e5 and the band no longer fits; the padded-ELL gather
path serializes on the TPU scalar unit (~70M elem/s) and its >50k-site
executables hit the remote-compile wall (PERF_NOTES round 1). But when the
structure lives on a REGULAR slot enumeration (models/crossbar.py::
grid_stack), the index offset j−i of every edge takes values in a SMALL
static set {o_1..o_D} (D ≈ 40-90 for two interleaved cubic sublattices).
The matvec then decomposes by offset:

    (K x)_i = diag_i x_i − Σ_d  w_d[i] · x[i + o_d]

i.e. D shift-multiply-adds over contiguous slices — pure VPU work, ZERO
gathers, O(D) HLO ops regardless of N, memory D·N·8 bytes. This is the DIA
sparse format, which maps to TPUs the way stencils map to vector hardware.

Same decomposition as the banded solver (reference semantics preserved —
background_potential_gpu_sparse, potential_solver_gpu.cu:846-1128): the
static part (low_G adjacency + metal-metal high_G upgrades) lives in the
offset diagonals; the dynamic conductive-vacancy correction is applied on a
compacted ≤VMAX vacancy list per CG iteration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from akmc_tpu.lattice import ELEM
from akmc_tpu.solvers.cg import CGResult, f64_vdot, jacobi_cg


class DiaK(NamedTuple):
    """Static pieces of the DIA-format K operator (site order = file order;
    no solver-frame permutation needed — the generator emits slot order)."""

    diags: jax.Array         # (D, N) int8 edge CODES: 0 = no edge,
    #                          1 = low_G edge, 2 = metal-metal high_G edge.
    #                          Values are decoded in dia_matvec from
    #                          DiaMeta's baked constants (same int8 trick as
    #                          the banded operator: an f64 plane this size
    #                          costs 3x in-program copies under the
    #                          X64-rewrite — 3.5 GB at the 4.6M crossbar).
    #                          Code != 0 doubles as the adjacency mask that
    #                          drives the conductive-vacancy correction as a
    #                          second O(D*N) offset pass — cvac pairs obey
    #                          the SAME nn_dist rule as the K sparsity (the
    #                          former dense (vmax, vmax) plane was 11.6 GB
    #                          and 1.45G MACs PER CG ITERATION at vmax=38k)
    deg_static: jax.Array    # (N,) static diagonal (all-neighbor G sums)
    lsum: jax.Array          # (N,) static left-contact row sums
    rsum: jax.Array          # (N,) static right-contact row sums
    pos: jax.Array           # (N, 3)
    active_row: jax.Array    # (N,) bool: row has any edge (null slots -> False)


class DiaMeta(NamedTuple):
    offsets: Tuple[int, ...]     # static offsets (python ints, baked into jit)
    # decode constants for the int8 diagonal codes (host f64 floats)
    val_low: float = 0.0
    val_high: float = 0.0


def build_dia_k(
    pos: np.ndarray,
    k_neigh_idx: np.ndarray,
    is_metal: np.ndarray,
    num_atoms_first_layer: int,
    high_G: float,
    low_G: float,
    max_diags: int = 160,
) -> Optional[Tuple[DiaK, DiaMeta]]:
    """Host-side construction. Returns None when the structure's offset set
    is too large for DIA to pay off (disordered structures like the shipped
    5 nm device: ~4000 distinct offsets — use the banded operator there)."""
    n = pos.shape[0]
    valid = k_neigh_idx >= 0
    if not valid.any():
        return None
    # edge-list form: every (N, KNN) f64/bool intermediate of the previous
    # dense form cost seconds of host memory traffic each (measured 49-60 s
    # total at the 1.08M-slot crossbar; this form builds in ~2 s). The
    # row-sum accumulation order changes (bincount vs axis-reduce) — a
    # <=1 ulp difference on the static degree vector, permitted on the DIA
    # (production, non-parity) path; the golden 5 nm device uses the
    # banded operator.
    rows_v, cols_v = np.nonzero(valid)
    jc_v = k_neigh_idx[rows_v, cols_v].astype(np.int64)
    offs_v = jc_v - rows_v
    uniq = np.unique(offs_v)
    if len(uniq) > max_diags:
        return None

    mm_v = is_metal[rows_v] & is_metal[jc_v]
    vals_v = np.where(mm_v, high_G, low_G)

    diags = np.zeros((len(uniq), n), np.int8)
    # np.unique returns uniq sorted, so the offset -> diagonal-index map is
    # one vectorized searchsorted (the python dict-lookup loop over ~7M
    # edges was the bulk of the 49 s DIA build at the 1.08M crossbar)
    d_idx = np.searchsorted(uniq, offs_v)
    np.add.at(diags, (d_idx, rows_v), np.int8(1))
    # no two edges may share a (row, offset) slot — a collision would have
    # SUMMED values in an f64 diagonal, and code 2 is reserved for the
    # metal-metal value (a hard error, not an assert: python -O must not
    # silently produce a wrong K matrix)
    if int(diags.max()) > 1:
        raise ValueError("duplicate (row, offset) edge in k_neigh_idx")
    np.add.at(diags, (d_idx[mm_v], rows_v[mm_v]), np.int8(1))

    deg_static = np.bincount(rows_v, weights=vals_v, minlength=n)
    L = R = num_atoms_first_layer
    in_left = jc_v < L
    in_right = jc_v >= n - R
    lsum = np.bincount(rows_v[in_left], weights=vals_v[in_left], minlength=n)
    rsum = np.bincount(rows_v[in_right], weights=vals_v[in_right], minlength=n)

    dia = DiaK(
        diags=jnp.asarray(diags),
        deg_static=jnp.asarray(deg_static),
        lsum=jnp.asarray(lsum),
        rsum=jnp.asarray(rsum),
        pos=jnp.asarray(pos),
        active_row=jnp.asarray(valid.any(axis=1)),
    )
    return dia, DiaMeta(
        offsets=tuple(int(o) for o in uniq),
        val_low=float(low_G), val_high=float(high_G),
    )


def dia_matvec(dia: DiaK, meta: DiaMeta, x: jnp.ndarray) -> jnp.ndarray:
    """y = W @ x via D static shift-multiply-adds (no gathers). Edge values
    decode from the int8 codes via two selects fused into the multiply —
    only 1 byte/slot crosses HBM and the products are identical to an f64
    diagonal holding the same {0, low_G, high_G} values."""
    n = x.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    xp = jnp.zeros(n + 2 * maxo, x.dtype).at[maxo : maxo + n].set(x)
    y = jnp.zeros_like(x)
    for d, o in enumerate(meta.offsets):
        c = dia.diags[d]
        bf = jnp.where(
            c == 2, meta.val_high, jnp.where(c == 1, meta.val_low, 0.0)
        )
        y = y + bf * jax.lax.dynamic_slice(xp, (maxo + o,), (n,))
    return y


def dia_combined_matvec(
    dia: DiaK, meta: DiaMeta, x: jnp.ndarray, xv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(W @ x, adjacency @ xv) in ONE offset loop: one diags read and one
    pair of padded buffers per CG iteration instead of two full passes.
    Per-offset accumulation order identical to the separate passes (same
    fp results)."""
    n = x.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    xp = jnp.zeros(n + 2 * maxo, x.dtype).at[maxo : maxo + n].set(x)
    vp = jnp.zeros(n + 2 * maxo, xv.dtype).at[maxo : maxo + n].set(xv)
    y = jnp.zeros_like(x)
    yv = jnp.zeros_like(xv)
    for d, o in enumerate(meta.offsets):
        c = dia.diags[d]
        bf = jnp.where(
            c == 2, meta.val_high, jnp.where(c == 1, meta.val_low, 0.0)
        )
        y = y + bf * jax.lax.dynamic_slice(xp, (maxo + o,), (n,))
        yv = yv + jnp.where(
            c != 0, jax.lax.dynamic_slice(vp, (maxo + o,), (n,)), 0.0
        )
    return y, yv


def dia_combined_matvec_stacked(
    dia: DiaK, meta: DiaMeta, x: jnp.ndarray, xv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """dia_combined_matvec with the per-diagonal loop collapsed to a few
    large ops: stack the D shifted x/xv windows into (D, N) planes, decode
    + multiply + axis-0 reduce once. ~5x fewer HLO ops per CG iteration
    (the per-diagonal chain is ~6 ops x D; the measured 0.13 s/iteration
    at the 4.62M-slot crossbar sits 20-40x above the byte bound — per-op
    overhead, PERF_NOTES round 3). The axis-0 reduction reassociates the
    per-row sum, so results differ from the loop form in the last ulps —
    production (DIA) path only, flag-gated off by default."""
    n = x.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    xp = jnp.zeros(n + 2 * maxo, x.dtype).at[maxo : maxo + n].set(x)
    vp = jnp.zeros(n + 2 * maxo, xv.dtype).at[maxo : maxo + n].set(xv)
    xs = jnp.stack(
        [jax.lax.dynamic_slice(xp, (maxo + o,), (n,)) for o in meta.offsets]
    )
    vs = jnp.stack(
        [jax.lax.dynamic_slice(vp, (maxo + o,), (n,)) for o in meta.offsets]
    )
    c = dia.diags
    bf = jnp.where(c == 2, meta.val_high, jnp.where(c == 1, meta.val_low, 0.0))
    y = jnp.sum(bf * xs, axis=0)
    yv = jnp.sum(jnp.where(c != 0, vs, 0.0), axis=0)
    return y, yv


def dia_combined_matvec_shared(
    diags_cvac: jnp.ndarray, dia: DiaK, meta: DiaMeta, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(W @ x, adjacency @ (cvac * x)) from ONE padded x buffer.

    ``diags_cvac``: per-solve (D, N) int8 codes with the conductive-vacancy
    SOURCE mask folded in: diags_cvac[d, i] = diags[d, i] if cvac[i + o_d]
    else 0 (built once per solve by ``fold_cvac_codes``). The correction
    matvec then reads the SAME shifted x windows as the K matvec instead of
    a second padded cvac-masked buffer — per CG iteration this removes one
    full-N buffer write and D full-N window reads (~half the stream traffic
    of dia_combined_matvec; the masked entries are exact zeros either way,
    so results are bit-identical to the two-buffer form:
    tests/test_dia.py::test_shared_matvec_matches_combined)."""
    n = x.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    xp = jnp.zeros(n + 2 * maxo, x.dtype).at[maxo : maxo + n].set(x)
    y = jnp.zeros_like(x)
    yv = jnp.zeros_like(x)
    for d, o in enumerate(meta.offsets):
        c = dia.diags[d]
        bf = jnp.where(
            c == 2, meta.val_high, jnp.where(c == 1, meta.val_low, 0.0)
        )
        w = jax.lax.dynamic_slice(xp, (maxo + o,), (n,))
        y = y + bf * w
        yv = yv + jnp.where(diags_cvac[d] != 0, w, 0.0)
    return y, yv


def fold_cvac_codes(dia: DiaK, meta: DiaMeta, cvac: jnp.ndarray) -> jnp.ndarray:
    """Once-per-solve (D, N) int8: the adjacency codes with the dynamic
    conductive-vacancy mask applied at the SOURCE column (j = i + o_d) —
    the companion of dia_combined_matvec_shared."""
    n = cvac.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    cp = jnp.zeros(n + 2 * maxo, jnp.int8).at[maxo : maxo + n].set(
        cvac.astype(jnp.int8)
    )
    rows = [
        (dia.diags[d] != 0).astype(jnp.int8)
        * jax.lax.dynamic_slice(cp, (maxo + o,), (n,))
        for d, o in enumerate(meta.offsets)
    ]
    return jnp.stack(rows)


def dia_adj_matvec(dia: DiaK, meta: DiaMeta, x: jnp.ndarray) -> jnp.ndarray:
    """y_i = sum over K-adjacency edges (i, i+o_d) of x[i+o_d] — the same
    shift pass as dia_matvec with 0/1 edge weights (select, no multiply)."""
    n = x.shape[0]
    maxo = max(abs(o) for o in meta.offsets)
    xp = jnp.zeros(n + 2 * maxo, x.dtype).at[maxo : maxo + n].set(x)
    y = jnp.zeros_like(x)
    for d, o in enumerate(meta.offsets):
        y = y + jnp.where(
            dia.diags[d] != 0, jax.lax.dynamic_slice(xp, (maxo + o,), (n,)), 0.0
        )
    return y


def solve_potential_boundary_dia(
    dia: DiaK,
    meta: DiaMeta,
    element: jnp.ndarray,
    charge: jnp.ndarray,
    potential_boundary_prev: jnp.ndarray,
    Vd,
    high_G: float,
    low_G: float,
    num_atoms_first_layer: int,
    nn_dist: float = 0.0,      # unused: the cvac pair rule (pairs within
    lattice: jnp.ndarray = None,  # nn_dist) is realized through the static
    pbc: bool = False,            # adjacency mask itself; kept for
    vmax: int = 0,                # signature parity with the banded solver
    rtol_coeff: float = 1e-14,
    max_iterations: int = 10000,
    stacked: bool = False,
    pallas_plan=None,       # ops.pallas_dia.DiaPlan: fuse the whole offset
    #                         loop into ONE Pallas kernel (two-f32 exact-sum
    #                         chains; ~same accuracy class as the runtime's
    #                         dd-f64). Takes precedence over `stacked`.
) -> Tuple[jnp.ndarray, CGResult]:
    """Drop-in replacement for solve_potential_boundary(_banded) on DIA
    structures. Same matrix entries / rhs / CG stopping rule."""
    n = element.shape[0]
    L = R = num_atoms_first_layer
    n_int = n - L - R
    dG = high_G - low_G

    # conductive-vacancy correction via the STATIC adjacency: cvac pairs
    # are pairs within nn_dist — exactly the K sparsity rule — so the
    # offset-diagonal edge mask already enumerates them. O(D*N) per
    # iteration, no vacancy-count cap (the former compacted dense
    # (vmax, vmax) block cost vmax^2 MACs per CG iteration — 1.45G at the
    # 4.6M-slot crossbar's vmax=38k — and 8*vmax^2 bytes of HBM).
    cvac = (element == int(ELEM.VACANCY)) & (charge == 0)
    cvac_f = jnp.where(cvac, 1.0, 0.0)
    vdeg = dia_adj_matvec(dia, meta, cvac_f)       # cvac-neighbor counts
    diag = dia.deg_static + dG * jnp.where(cvac, vdeg, 0.0)

    idxs = jnp.arange(n)
    is_int = (idxs >= L) & (idxs < n - R) & dia.active_row

    rhs = (dia.lsum * (-Vd / 2.0) + dia.rsum * (Vd / 2.0)) * is_int

    if pallas_plan is not None:
        from akmc_tpu.ops.pallas_dia import dia_combined_matvec_pallas

        def mv_fn(dia_, meta_, x_, xv_):
            return dia_combined_matvec_pallas(dia_, meta_, pallas_plan, x_, xv_)
    elif stacked:
        mv_fn = dia_combined_matvec_stacked
    else:
        mv_fn = None   # default: the shared-buffer form below

    # Per-solve precomputations that strip full-N elementwise work out of
    # the CG body (the measured ~11 ms/iter of masks/diag at the 4.62M
    # crossbar, tools/probe_cg_phase.py): CG keeps every iterate EXACTLY
    # zero outside the interior (x0/rhs are masked, A passes exterior rows
    # through, 0 * scalar == 0), so the per-iteration input masks are
    # identities and can be dropped; the interior/diag/cvac selects fold
    # into precomputed vectors and (for the default path) into the int8
    # codes the matvec already streams.
    diag_i = jnp.where(is_int, diag, 1.0)
    dgc = jnp.where(cvac, dG, 0.0)
    if mv_fn is None:
        # source-side cvac & interior mask folded into once-per-solve codes:
        # the correction matvec then shares the K matvec's padded x buffer
        dcodes = fold_cvac_codes(dia, meta, cvac & is_int)

        def A(x):
            mv, corr = dia_combined_matvec_shared(dcodes, dia, meta, x)
            y = diag_i * x - mv - dgc * corr
            return jnp.where(is_int, y, x)
    else:
        def A(x):
            xv = jnp.where(cvac, x, 0.0)
            mv, corr = mv_fn(dia, meta, x, xv)
            y = diag_i * x - mv - dgc * corr
            return jnp.where(is_int, y, x)

    x0 = jnp.where(is_int, potential_boundary_prev, 0.0)
    inv_diag = jnp.where(is_int, 1.0 / jnp.where(is_int, diag, 1.0), 1.0)

    # f64_vdot: jnp.dot on f64 vectors is ~48x slower than mul+reduce at
    # crossbar n (tools/probe_vec_ops.py) — the two per-iteration dots were
    # 101 of the 138 ms/iteration. DIA is the production (non-parity) path,
    # so the reassociated reduction order is permitted (same class as the
    # builder's bincount note above).
    res = jacobi_cg(
        A, rhs, x0, inv_diag, rtol_coeff * n_int, max_iterations,
        dot_fn=f64_vdot,
    )
    return jnp.where(is_int, res.x, 0.0), res
