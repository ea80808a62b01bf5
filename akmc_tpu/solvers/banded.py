"""Banded-dense K operator: the TPU-native SpMV.

Problem: the K conductance matrix's SpMV is the inner loop of every CG
iteration. A padded-ELL gather formulation serializes on the TPU scalar
unit (~70M gathered elements/s — no hardware gather), costing ~30 ms per
iteration at N=37,650.

Key decomposition (this module's reason to exist): the edge conductance

    G_ij = high_G  if (metal_i & metal_j) or (cvac_i & cvac_j) else low_G
         = low_G + dG*[metal_i & metal_j] + dG*[cvac_i & cvac_j]

(the two indicator sets are disjoint — metals are never vacancies). The
first two terms are STATIC: positions, adjacency and metal sites never
change during a run. Only the conductive-vacancy correction is dynamic,
and it is supported on <= VMAX vacancy sites. Therefore:

    A x = diag .* x - BAND(x) - dG * S_cvac(x)

where BAND is a PRECOMPUTED dense-banded matrix (low_G*adjacency +
dG*metal-metal edges) applied as blocked dense matvecs on the MXU, and
S_cvac is a tiny on-the-fly (VMAX x VMAX) adjacency among the compacted
conductive vacancies. Sites are internally permuted to a locality
(lexicographic) order so the adjacency bandwidth is ~2 x-slices;
permutation in/out of the solver frame costs two O(N) gathers per solve.

Reference semantics preserved exactly (same matrix entries, same CG,
same stopping rule — background_potential_gpu_sparse,
potential_solver_gpu.cu:846-1128); only float summation order changes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from akmc_tpu.lattice import ELEM
from akmc_tpu.ops.compact import compact_mask
from akmc_tpu.solvers.cg import CGResult, f64_matvec, jacobi_cg


class BandedK(NamedTuple):
    perm: jax.Array          # (N,) site index (orig) per solver-frame slot
    inv_perm: jax.Array      # (N,) solver-frame slot per site
    blocks: jax.Array        # (nb, T, W) int8 band codes [solver frame]:
    #                          0 = no edge, 1 = low_G edge, 2 = metal-metal
    #                          (low_G + dG) edge. Values are decoded inside
    #                          band_matvec from BandMeta's baked constants —
    #                          8x less HBM traffic than f64 value blocks,
    #                          bit-identical products (same stored values).
    deg_static: jax.Array    # (N,) static diagonal part, SOLVER frame
    lsum: jax.Array          # (N,) static left-contact row sums, solver frame
    rsum: jax.Array          # (N,) static right-contact row sums, solver frame
    pos_p: jax.Array         # (N, 3) positions in solver frame
    is_vac_site: jax.Array   # (N,) static possibly-vacancy mask (solver frame)
    is_int: jax.Array        # (N,) static interface-row mask, solver frame
    # static geometry ints live in BandMeta (not traced through jit args)


class BandMeta(NamedTuple):
    half_band: int
    block_rows: int
    n_pad: int
    # band-value decode constants (host f64, baked static into the jit):
    # code 1 -> val_low, code 2 -> val_both (= low_G + dG summed on HOST in
    # real f64, so the decoded values match the former f64 blocks bit-exactly
    # on every backend)
    val_low: float = 0.0
    val_both: float = 0.0


def build_banded_k(
    pos: np.ndarray,                # (N, 3)
    k_neigh_idx: np.ndarray,        # (N, NN) PBC-aware adjacency, -1 pad
    is_metal: np.ndarray,           # (N,) bool
    element0: np.ndarray,           # (N,) initial elements (for vacancy support)
    num_atoms_first_layer: int,
    high_G: float,
    low_G: float,
    block_rows: int = 512,
    max_bandwidth: Optional[int] = None,
    max_band_bytes: float = 4e9,
) -> Optional[BandedK]:
    """Host-side construction. Returns None if the lexsorted bandwidth is too
    wide for the dense band to pay off, or if the band blocks would exceed
    ``max_band_bytes`` (fall back to the ELL path)."""
    n = pos.shape[0]
    valid = k_neigh_idx >= 0
    if not valid.any():
        return None

    # internal ordering: axis-permuted lexsort, keeping whichever outer axis
    # yields the smallest measured bandwidth. The band width under an
    # "a-outer" lexsort scales with the (b x c) cross-section, so thin-x
    # device stacks prefer x-outer while wide-y/z crossbar sheets prefer
    # z-outer (2x2-tiled 5 nm: 8638 -> 5786, measured round 2). Morton/SFC
    # codes were measured FAR worse for the max |i-j| metric a dense band
    # needs (104,952 on the same structure — power-of-2 boundary jumps), so
    # space-filling curves are rejected here (PERF_NOTES).
    jc = np.clip(k_neigh_idx, 0, None)
    best = None
    for keys in (
        (pos[:, 2], pos[:, 1], pos[:, 0]),      # x-outer
        (pos[:, 2], pos[:, 0], pos[:, 1]),      # y-outer
        (pos[:, 0], pos[:, 1], pos[:, 2]),      # z-outer
    ):
        o = np.lexsort(keys)
        iv = np.empty(n, np.int64)
        iv[o] = np.arange(n)
        b = int(np.abs(np.where(valid, iv[jc] - iv[:, None], 0)).max())
        if best is None or b < best[0]:
            best = (b, o, iv)
    B, order, inv = best

    rows_p = inv[np.arange(n)][:, None]
    cols_p = inv[jc]
    limit = max_bandwidth if max_bandwidth is not None else n // 4
    if B > limit:
        return None

    T = block_rows
    nb = -(-n // T)
    n_pad = nb * T
    W = T + 2 * B
    # int8 code blocks (1 byte/slot; the decode to f64 happens on the fly
    # inside band_matvec's fused mul+reduce)
    if nb * T * W * 1.0 > max_band_bytes:
        return None

    dG = high_G - low_G
    mm = is_metal[:, None] & is_metal[np.clip(k_neigh_idx, 0, None)] & valid

    # scatter edge CODES into band blocks (solver frame): 1 = low_G edge,
    # 2 = metal-metal (low_G + dG) edge
    blocks = np.zeros((nb, T, W), np.int8)
    src_rows = rows_p.repeat(k_neigh_idx.shape[1]).reshape(n, -1)[valid]
    src_cols = cols_p[valid]
    b_idx = src_rows // T
    r_idx = src_rows % T
    w_idx = src_cols - (b_idx * T - B)
    ok = (w_idx >= 0) & (w_idx < W)
    assert ok.all()
    np.add.at(blocks, (b_idx, r_idx, w_idx), np.int8(1))
    # no two edges may share a band slot (adjacency rows hold unique cols) —
    # a collision would have SUMMED values in the former f64 band; must
    # survive `python -O` (a colliding edge would silently decode as code 2
    # = the metal-metal value), so raise instead of assert (cf. build_dia_k)
    if blocks.max() > 1:
        raise ValueError("duplicate (row, col) edge in k_neigh_idx")
    mm_e = mm[valid]
    np.add.at(blocks, (b_idx[mm_e], r_idx[mm_e], w_idx[mm_e]), np.int8(1))

    # static diagonal / contact row sums / interface mask — stored PERMUTED
    # (solver frame): re-permuting them per solve cost 3 O(N) gathers + 2
    # compares in the warm path
    L = R = num_atoms_first_layer
    degs = np.where(valid, np.where(mm, high_G, low_G), 0.0)
    deg_static = degs.sum(1)
    jj = np.clip(k_neigh_idx, 0, None)
    in_left = valid & (jj < L)
    in_right = valid & (jj >= n - R)
    lsum = np.where(in_left, np.where(mm, high_G, low_G), 0.0).sum(1)
    rsum = np.where(in_right, np.where(mm, high_G, low_G), 0.0).sum(1)

    poss_vac = np.isin(
        element0, [int(ELEM.O), int(ELEM.VACANCY), int(ELEM.OXYGEN_DEFECT), int(ELEM.DEFECT)]
    )

    bk = BandedK(
        perm=jnp.asarray(order.astype(np.int32)),
        inv_perm=jnp.asarray(inv.astype(np.int32)),
        blocks=jnp.asarray(blocks),
        deg_static=jnp.asarray(deg_static[order]),
        lsum=jnp.asarray(lsum[order]),
        rsum=jnp.asarray(rsum[order]),
        pos_p=jnp.asarray(pos[order]),
        is_vac_site=jnp.asarray(poss_vac[order]),
        is_int=jnp.asarray((order >= L) & (order < n - R)),
    )
    return bk, BandMeta(
        half_band=B, block_rows=T, n_pad=n_pad,
        val_low=float(low_G), val_both=float(low_G + dG),
    )


def band_matvec(bk: BandedK, meta: BandMeta, x_p: jnp.ndarray) -> jnp.ndarray:
    """y = BAND @ x in the solver frame. x_p: (N,) full-length (contacts
    included).

    ONE batched mul+reduce over all blocks (a lax.map of per-block matvecs
    serializes; a f64 einsum/dot_general lowers ~12x slower on this runtime —
    see f64_matvec). The overlapping windows x[t*T - B : t*T + T + B] are
    assembled from ceil(W/T)+1 STATIC shifted slices of the padded vector —
    reshapes only, no gathers."""
    n = x_p.shape[0]
    B, T, n_pad = meta.half_band, meta.block_rows, meta.n_pad
    nb = bk.blocks.shape[0]
    W = T + 2 * B
    npieces = -(-W // T)

    xe = jnp.zeros(n_pad + 2 * B + npieces * T, x_p.dtype).at[B : B + n].set(x_p)

    # windows[t] = xe[t*T : t*T + W]; build from static strided block views
    pieces = [
        jax.lax.dynamic_slice(xe, (k * T,), (nb * T,)).reshape(nb, T)
        for k in range(npieces)
    ]
    windows = jnp.concatenate(pieces, axis=1)[:, :W]        # (nb, W)

    # mul+reduce, NOT einsum: f64 dot_general lowers pathologically on this
    # runtime (~125 ms vs ~10 ms for this formulation at N=37,650 — measured,
    # PERF_NOTES round 2); XLA fuses the int8->f64 decode and the (nb, 1, W)
    # broadcast into the reduction, so only the 1-byte codes cross HBM
    c = bk.blocks
    bf = jnp.where(
        c == 2, meta.val_both, jnp.where(c == 1, meta.val_low, 0.0)
    )
    y = jnp.sum(bf * windows[:, None, :], axis=2)
    return y.reshape(n_pad)[:n]


def cvac_correction(
    bk: BandedK,
    cvac_p: jnp.ndarray,         # (N,) bool conductive-vacancy mask, solver frame
    nn_dist: float,
    lattice: jnp.ndarray,
    pbc: bool,
    vmax: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compacted conductive-vacancy adjacency: returns (idx (VMAX,), valid,
    W (VMAX, VMAX) 0/1, deg (VMAX,)). Edges = pairs of cvac sites within
    nn_dist (PBC-aware — matches the K sparsity rule).

    The compaction uses ops.compact.compact_mask, NOT jnp.nonzero: the
    nonzero lowering (full-length s64 log-depth cumsum + full-length
    drop-mode scatter) measured ~6.3 ms/step of the carried warm K solve
    at N = 37,650 on the tunneled v5e — independent of the mask's
    producer and of an optimization_barrier (both probed,
    tools/probe_kcarry_ablate.py round 3). compact_mask produces the
    bit-identical index list from one MXU matmul + log-depth searchsorted
    gathers."""
    idx, vv = compact_mask(cvac_p, vmax)
    p = bk.pos_p[idx.clip(0)]
    d = p[:, None, :] - p[None, :, :]
    if pbc:
        dy = d[..., 1] / lattice[1]
        dy = (dy - jnp.round(dy)) * lattice[1]
        dz = d[..., 2] / lattice[2]
        dz = (dz - jnp.round(dz)) * lattice[2]
        d2 = d[..., 0] ** 2 + dy**2 + dz**2
    else:
        d2 = jnp.sum(d * d, -1)
    same = idx[:, None] == idx[None, :]
    W = jnp.where(
        (d2 < nn_dist * nn_dist) & ~same & vv[:, None] & vv[None, :], 1.0, 0.0
    )
    return idx, vv, W, jnp.sum(W, axis=1)


class KCarry(NamedTuple):
    """Warm-solve carry (solver frame): the previous solve's final
    residual, diagonal and compacted cvac correction. Lets the next solve
    rebase  r0 = r + (diag_prev - diag_new)∘x0 + (S_new - S_prev)(x0)
    — exact ΔA·x0 terms supported on O(N) vector ops + the two compacted
    (vmax, vmax) planes — instead of paying the band matvec for a fresh
    b - A·x0. On a converged warm start (steady-state supersteps: CG runs
    ZERO body iterations) the whole K solve then applies the operator
    zero times. The band part of A is STATIC, which is what makes the
    delta exact; r is a recurrence residual, so VCMModel._step_multi
    re-bases with a fresh matvec on the first step of every batch (the
    fresh step is UNROLLED outside the scan — a lax.cond inside the scan
    body lowered to executing BOTH branches on TPU, measured as a
    slowdown)."""

    r: jnp.ndarray           # (N,) final residual, solver frame
    diag: jnp.ndarray        # (N,) diagonal used in that solve
    vidx: jnp.ndarray        # (VMAX,) compacted cvac sites of that solve
    vv: jnp.ndarray          # (VMAX,) valid mask
    Wv: jnp.ndarray          # (VMAX, VMAX) cvac adjacency of that solve


def _assemble_banded(bk, meta, element, charge, Vd, high_G, low_G,
                     num_atoms_first_layer, nn_dist, lattice, pbc, vmax):
    n = element.shape[0]
    dG = high_G - low_G
    cvac = (element == int(ELEM.VACANCY)) & (charge == 0)
    cvac_p = cvac[bk.perm]
    vidx, vv, Wv, vdeg = cvac_correction(bk, cvac_p, nn_dist, lattice, pbc, vmax)

    # diagonal: static all-neighbor sums + dynamic cvac-edge upgrades
    # (deg/lsum/rsum/is_int are stored pre-permuted — solver frame)
    diag_p = bk.deg_static + dG * (
        jnp.zeros(n).at[vidx.clip(0)].add(jnp.where(vv, vdeg, 0.0))
    )
    is_int_p = bk.is_int
    rhs_p = (bk.lsum * (-Vd / 2.0) + bk.rsum * (Vd / 2.0)) * is_int_p

    def S_corr(x_p, vidx_, vv_, Wv_):
        """dG-scaled compacted cvac-adjacency scatter term."""
        xv = jnp.where(vv_, x_p[vidx_.clip(0)], 0.0)
        corr = dG * f64_matvec(Wv_, xv)
        return jnp.zeros(n).at[vidx_.clip(0)].add(jnp.where(vv_, corr, 0.0))

    # NOTE: folding the cvac edges into a per-superstep copy of the band was
    # measured ~90 ms/superstep SLOWER on the tunneled runtime (the 1.5 GB
    # functional block update dominates warm 1-iteration solves), so the
    # correction is applied per iteration on the compacted vacancy lists.
    def A_frame(x_p):
        # x_p: solver-frame full-length vector, contacts implicitly zero
        xz = jnp.where(is_int_p, x_p, 0.0)
        y = diag_p * xz - band_matvec(bk, meta, xz)
        y = y - S_corr(xz, vidx, vv, Wv)
        # BAND includes edges to contact columns, but xz zeroes them; rows of
        # contacts are masked out of the solve entirely:
        return jnp.where(is_int_p, y, x_p)

    return cvac_p, (vidx, vv, Wv), diag_p, is_int_p, rhs_p, A_frame, S_corr


def solve_potential_boundary_banded(
    bk: BandedK,
    meta: BandMeta,
    element: jnp.ndarray,
    charge: jnp.ndarray,
    potential_boundary_prev: jnp.ndarray,
    Vd,
    high_G: float,
    low_G: float,
    num_atoms_first_layer: int,
    nn_dist: float,
    lattice: jnp.ndarray,
    pbc: bool,
    vmax: int,
    rtol_coeff: float = 1e-14,
    max_iterations: int = 10000,
) -> Tuple[jnp.ndarray, CGResult]:
    """Drop-in replacement for poisson.solve_potential_boundary using the
    static band + dynamic cvac correction."""
    n = element.shape[0]
    L = R = num_atoms_first_layer
    n_int = n - L - R

    _, _, diag_p, is_int_p, rhs_p, A_frame, _ = _assemble_banded(
        bk, meta, element, charge, Vd, high_G, low_G,
        num_atoms_first_layer, nn_dist, lattice, pbc, vmax,
    )

    # CG over the full-length frame with identity on contact rows: keeps the
    # solve equivalent to the interface-restricted system since rhs and x0
    # are zero on contacts.
    x0_p = jnp.where(is_int_p, potential_boundary_prev[bk.perm], 0.0)
    inv_diag_p = jnp.where(is_int_p, 1.0 / diag_p, 1.0)

    res = jacobi_cg(
        A_frame, rhs_p, x0_p, inv_diag_p, rtol_coeff * n_int, max_iterations
    )
    full = jnp.where(is_int_p, res.x, 0.0)[bk.inv_perm]
    return full, res


def solve_potential_boundary_banded_carry(
    bk: BandedK,
    meta: BandMeta,
    element: jnp.ndarray,
    charge: jnp.ndarray,
    potential_boundary_prev: jnp.ndarray,
    Vd,
    high_G: float,
    low_G: float,
    num_atoms_first_layer: int,
    nn_dist: float,
    lattice: jnp.ndarray,
    pbc: bool,
    vmax: int,
    carry: Optional[KCarry],
    rtol_coeff: float = 1e-14,
    max_iterations: int = 10000,
) -> Tuple[jnp.ndarray, CGResult, KCarry]:
    """Warm solve with an incrementally-rebased initial residual.

    With ``carry`` (trace-time: None = fresh) the entry matvec
    r0 = b - A·x0 is replaced by the EXACT identity r0 = carry.r +
    (carry.diag - diag)∘x0 + (S_new - S_prev)(x0): the band is static, so
    A only changes through the diagonal and the compacted cvac adjacency,
    both cheap; S_prev reuses the carried compacted plane. b is constant
    within a bias (rhs = static contact sums × Vd). carry=None (first
    step of a dispatch batch, or a bias change) runs the fresh path —
    which also re-bases any recurrence-residual drift from CG iterations
    of previous steps."""
    n = element.shape[0]
    L = R = num_atoms_first_layer
    n_int = n - L - R

    cvac_p, (vidx, vv, Wv), diag_p, is_int_p, rhs_p, A_frame, S_corr = (
        _assemble_banded(
            bk, meta, element, charge, Vd, high_G, low_G,
            num_atoms_first_layer, nn_dist, lattice, pbc, vmax,
        )
    )
    x0_p = jnp.where(is_int_p, potential_boundary_prev[bk.perm], 0.0)
    inv_diag_p = jnp.where(is_int_p, 1.0 / diag_p, 1.0)

    if carry is None:
        r0 = rhs_p - A_frame(x0_p)
    else:
        d_diag = (carry.diag - diag_p) * x0_p
        dS = S_corr(x0_p, vidx, vv, Wv) - S_corr(
            x0_p, carry.vidx, carry.vv, carry.Wv
        )
        r0 = jnp.where(is_int_p, carry.r + d_diag + dS, 0.0)

    res = jacobi_cg(
        A_frame, rhs_p, x0_p, inv_diag_p, rtol_coeff * n_int,
        max_iterations, r0=r0,
    )
    full = jnp.where(is_int_p, res.x, 0.0)[bk.inv_perm]
    new_carry = KCarry(r=res.r, diag=diag_p, vidx=vidx, vv=vv, Wv=Wv)
    return full, res, new_carry
