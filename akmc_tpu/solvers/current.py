"""Current / dissipated-power solver (transmission-matrix linear system).

Reference: the dense `update_power_gpu` path (current_solver_gpu.cu:2382-2573,
create_X 2175-2316) — the COMPLETE intended physics — and its scalable
sparse+tunnel split (update_power_gpu_sparse_dist, 1430-1855). The committed
reference never executes this module at runtime (comm_T is nulled,
KMC_comm.h:243); numerics here are validated against an independent scipy
oracle instead of golden outputs.

System: nodes [0]=extraction, [1]=injection, [2..N_atom+2)=atoms (non-defect
sites; this SET is static — events only exchange elements within the
{V,O}/{Od,d} classes). The last atom is grounded (the dense path solves the
leading (N_atom+1) principal block). Terms:

  * neighbor conductances (PBC-aware dist < nn_dist): -high_G for
    metal-metal / neutral-vacancy pairs else -low_G;
  * WKB tunneling between non-neighbor tunnel-eligible pairs
    (vacancy <-> vacancy, vacancy <-> inner-contact metal, metal <-> metal)
    with |dE_CB| > tol:
      trap/trap & contact/contact:  T = exp(prefac * d/|dE| * (E1^1.5 - E2^1.5))
                                    (E2 < 0: drop the E2 term — triangular barrier)
      contact->trap: sum the same expression over occupied contact energies
                     E1 = V0*q + s*dE_step for s*dE_step < |dE|;
  * injection/extraction rails: -high_G from node 1 to the first
    num_source_inj atoms and node 0 to the last num_ground_ext-1 atoms
    (the reference's strict `i > N - num_ground_ext` is preserved);
  * -loop_G between nodes 0 and 1; rhs = (-loop_G*Vd, +loop_G*Vd, 0...).

TPU realization: no (N_atom+2)^2 matrix. The CG operator is
  diag*v - ELL-neighbor gather - W_tunnel block matvec - rail rank-terms
where W_tunnel lives on compacted vacancy/contact index lists — the dense
tunnel block is an MXU matmul (the reference's own split treats it as an
effectively-dense subblock, dist_iterative_test/main_test.cpp:46-52).

Post-solve (scaled by G0): I_macro over the extraction rail; per-atom
dissipated power P_i = sum_j ineg_ij (m_j - m_i) with ineg the
forward-current matrix (set_ineg, 2353-2379); site_power = -alpha * P_i on
non-metal atoms (copy_pdisp, 462-474).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from akmc_tpu.config import EV_TO_J, H_BAR
from akmc_tpu.lattice import ELEM
from akmc_tpu.ops.compact import compact_mask
from akmc_tpu.solvers.cg import f64_matvec, f64_vdot, jacobi_cg


class CurrentTables(NamedTuple):
    """Static atom-level tables (the atom SET never changes)."""

    atom_ind: jax.Array        # (N_atom,) site index of each atom
    atom_pos: jax.Array        # (N_atom, 3) [Angstrom]
    atom_neigh_idx: jax.Array  # (N_atom, NNa) atom-index adjacency, -1 pad
    atom_is_metal: jax.Array   # (N_atom,) bool
    metal_p: jax.Array         # (N_atom,) bool: metal in the tunnel window
    contact_idx: jax.Array     # (NCp,) atom indices of metal_p contacts,
    #                            padded to a 256-multiple with -1 so the
    #                            W_cc/W_ct tunnel blocks row-shard evenly
    #                            over device meshes (same policy as vmax;
    #                            pad rows are exact zeros via the contact
    #                            mask and scatter to index -1, a no-op add
    #                            of 0.0)
    inj_tie: jax.Array         # (N_atom,) bool: tied to injection node
    ext_tie: jax.Array         # (N_atom,) bool: tied to extraction node
    n_inj: int
    n_ext: int


def build_current_tables(
    element0: np.ndarray,
    pos: np.ndarray,                # (N, 3)
    lattice: np.ndarray,
    pbc: bool,
    nn_dist: float,
    metals: list,
    num_source_inj: int,
    num_ground_ext: int,
    num_layers_contact: int,
    max_num_neighbors: int = 52,
) -> CurrentTables:
    from akmc_tpu.lattice import metal_mask
    from akmc_tpu.lattice_jax import build_neighbor_list_device

    # NULL placeholder slots (grid-native crossbar enumeration,
    # models/crossbar.py::grid_stack) are not atoms: they carry no physics
    # and must not contribute neighbor conductances. Reference structures
    # have no NULL slots, so this is a no-op there.
    is_atom = (
        (element0 != int(ELEM.DEFECT))
        & (element0 != int(ELEM.OXYGEN_DEFECT))
        & (element0 != int(ELEM.NULL_ELEMENT))
    )
    atom_ind = np.nonzero(is_atom)[0].astype(np.int32)
    n_atom = len(atom_ind)
    apos = pos[atom_ind]

    a_nbr = build_neighbor_list_device(
        apos, nn_dist, max_num_neighbors, lattice, pbc, strict=True
    )

    am = metal_mask(element0[atom_ind], metals)
    ai = np.arange(n_atom)
    # tunnel-window contacts exclude the outer num_layers_contact-1 slices
    # (create_X metal1p/metal2p, current_solver_gpu.cu:2206-2213)
    metal_p = (
        am
        & (ai > (num_layers_contact - 1) * num_source_inj)
        & (ai < n_atom - (num_layers_contact - 1) * num_ground_ext)
    )
    inj_tie = ai < num_source_inj
    # reference quirk kept: strict '>', so num_ground_ext-1 atoms
    # (create_X, current_solver_gpu.cu:2306)
    ext_tie = ai > (n_atom - num_ground_ext)

    cidx = np.nonzero(metal_p)[0].astype(np.int32)
    ncp = max(256, -(-len(cidx) // 256) * 256)
    cidx = np.concatenate([cidx, np.full(ncp - len(cidx), -1, np.int32)])

    return CurrentTables(
        atom_ind=jnp.asarray(atom_ind),
        atom_pos=jnp.asarray(apos, jnp.float64),
        atom_neigh_idx=jnp.asarray(a_nbr),
        atom_is_metal=jnp.asarray(am),
        metal_p=jnp.asarray(metal_p),
        contact_idx=jnp.asarray(cidx),
        inj_tie=jnp.asarray(inj_tie),
        ext_tie=jnp.asarray(ext_tie),
        n_inj=int(inj_tie.sum()),
        n_ext=int(ext_tie.sum()),
    )


# ---------------------------------------------------------------------------
# WKB tunneling coefficients
# ---------------------------------------------------------------------------

def _wkb_single(dist_m, dE_abs, m_e, V0, f32: bool = False):
    """Single-barrier transmission (trap/trap & contact/contact),
    create_X else-branch (current_solver_gpu.cu:2258-2272).

    ``f32``: evaluate the plane in f32 (production lever, wkb_f32 flag).
    The emulated dd-f64 exp is the dominant per-pair cost and already has
    the f32 EXPONENT range on this runtime (underflow at ~1e-38 either
    way); f32 costs ~1e-7 relative coefficient error — far below the WKB
    model's own accuracy and the power-CG tolerance's demands."""
    prefac = -(np.sqrt(2.0 * m_e) / H_BAR) * (2.0 / 3.0)
    if f32:
        dist_m = dist_m.astype(jnp.float32)
        dE_abs = dE_abs.astype(jnp.float32)
        prefac = np.float32(prefac)   # keep the plane f32 (numpy f64
        #                               scalars re-promote jnp f32 to f64)
    E1 = dist_m.dtype.type(EV_TO_J * V0)
    E2 = E1 - dE_abs
    if f32:
        # cancellation-free form of (E1^1.5 - E2^1.5)/dE:
        # a^1.5 - b^1.5 = (a - b)(a + sqrt(ab) + b)/(sqrt(a) + sqrt(b)),
        # a - b = dE exactly — the division cancels and no near-equal
        # subtraction remains (plain f32 lost ~2 digits at small dE)
        E2p = jnp.maximum(E2, 0.0)
        expo_trap = prefac * dist_m * (
            (E1 + jnp.sqrt(E1 * E2p) + E2p) / (jnp.sqrt(E1) + jnp.sqrt(E2p))
        )
    else:
        expo_trap = prefac * (dist_m / dE_abs) * (
            E1**1.5 - jnp.where(E2 > 0, E2, 0.0) ** 1.5
        )
    expo_tri = prefac * (dist_m / dE_abs) * E1**1.5
    # f32 results stay f32: the W blocks are also STORED in f32 under the
    # lever (halves HBM traffic and skips the X64-rewrite's extra in-program
    # f64 half-copies — W_tt at 15k vacancies: ~5.3 GB -> ~0.9 GB);
    # downstream matvecs promote to f64 on multiply with the f64 vectors.
    # select-then-exp: bit-identical to exp-then-select and evaluates ONE
    # exp per pair instead of two (the emulated dd-f64 exp is the dominant
    # per-pair cost)
    return jnp.exp(jnp.where(E2 > 0, expo_trap, expo_tri))


def _wkb_contact_trap(dist_m, dE_abs, m_e, V0, ne_max, mask=None, f32: bool = False):
    """Energy-integrated transmission for contact<->trap pairs
    (create_X contact_to_trap branch, current_solver_gpu.cu:2229-2256).

    Sums s = 0..: E1 = q*V0 + s*dE_step while s*dE_step < |dE| (the
    reference's `for (iv = 0; iv < energy_window; iv += dE)` per-pair
    loop, current_solver_gpu.cu:2238), masked over a shared iteration
    range. ``ne_max`` may be a TRACED scalar (the per-superstep bound
    ceil(max eligible |dE| / dE_step), solvers/current.py callers):
    every term past a pair's own window is an exact masked zero, so
    truncating the shared range at the max needed count is bit-identical
    to any larger static cap while cutting the dominant full-physics
    cost ~4x at 5 nm (2048 -> ~560 iterations at Vd=5).

    ``mask`` (optional, bool, broadcastable): pairs whose integral is
    never read — skipped via a masked exponent to keep exp() in range.
    """
    prefac = -(np.sqrt(2.0 * m_e) / H_BAR) * (2.0 / 3.0)
    dE_step = EV_TO_J * 0.01
    if mask is not None:
        dE_abs = jnp.where(mask, dE_abs, 1.0)
        dist_m = jnp.where(mask, dist_m, 1.0)
    if f32:
        prefac = np.float32(prefac)   # see _wkb_single: avoid re-promotion
        # production lever (wkb_f32): the integral plane is the dominant
        # full-physics build cost (ne_max exp-planes per superstep); f32
        # native exp replaces the emulated dd-f64 chain. Kahan-compensated
        # accumulation keeps the sum's error ~2^-24 despite up to ~1.5k
        # terms; the f32 exponent range equals this runtime's dd-f64 range.
        dist_m = dist_m.astype(jnp.float32)
        dE_abs = dE_abs.astype(jnp.float32)

    # loop-invariant per-pair factors, hoisted out of the energy loop
    # (bit-identical: same association order as the inline forms)
    q_tri = prefac * (dist_m / dE_abs)
    q_trap = (prefac * dist_m) if f32 else q_tri

    def body(s, carry):
        acc, comp = carry
        iv = s * dE_step
        active = iv < dE_abs
        E1 = (EV_TO_J * V0 + iv).astype(dist_m.dtype)
        E2 = E1 - dE_abs
        if f32:
            # cancellation-free (see _wkb_single): dE divides out exactly
            E2p = jnp.maximum(E2, 0.0)
            expo_trap = q_trap * (
                (E1 + jnp.sqrt(E1 * E2p) + E2p)
                / (jnp.sqrt(E1) + jnp.sqrt(E2p))
            )
        else:
            expo_trap = q_trap * (
                E1**1.5 - jnp.where(E2 > 0, E2, 0.0) ** 1.5
            )
        expo_tri = q_tri * E1**1.5
        # select-then-exp: one emulated exp per pair per step, not two
        term = jnp.exp(jnp.where(E2 > 0, expo_trap, expo_tri))
        term = jnp.where(active, term, 0.0)
        if not f32:
            return acc + term, comp
        # Kahan: comp carries the low-order residue
        y = term - comp
        t = acc + y
        comp = (t - acc) - y
        return t, comp

    zero = jnp.zeros_like(dist_m)
    out, _ = jax.lax.fori_loop(0, ne_max, body, (zero, zero))
    # f32 stays f32 (stored block dtype under the lever — see _wkb_single)
    return out if mask is None else jnp.where(mask, out, zero)


def _ct_loop_bound(dE_abs, ok, ne_max: int):
    """Traced shared iteration count for _wkb_contact_trap: the largest
    per-pair window among eligible pairs, capped at the static ne_max."""
    dE_step = EV_TO_J * 0.01
    max_dE = jnp.max(jnp.where(ok, dE_abs, 0.0))
    return jnp.minimum(
        jnp.ceil(max_dE / dE_step).astype(jnp.int32) + 1, ne_max
    )


# ---------------------------------------------------------------------------
# per-superstep dynamic assembly (compact pieces, no big matrix)
# ---------------------------------------------------------------------------

# W-block build row-chunk size (see wkb_block inside build_power_system);
# module-level so tests can shrink it to pin chunked == direct equality
_WKB_ROW_BLOCK = 1024


class PowerSystem(NamedTuple):
    """Per-superstep operator pieces for the transmission system."""

    G_nbr: jax.Array          # (N_atom, NNa) neighbor conductances (masked 0)
    vac_idx: jax.Array        # (VMAX,) compacted vacancy atom idx, -1 pad
    W_tt: jax.Array           # (VMAX, VMAX) trap-trap tunnel coefficients
    W_ct: jax.Array           # (NC, VMAX) contact-trap (integrated)
    W_cc: jax.Array           # (NC, NC) contact-contact
    diag: jax.Array           # (N_atom,) atom diagonal
    diag0: jax.Array          # () extraction-node diagonal
    diag1: jax.Array          # () injection-node diagonal


def _pair_dist_m(pos_a, pos_b, lattice, pbc):
    # per-axis (rows, cols) planes, never the (rows, cols, 3) delta tensor
    # (at the T-system scale that tensor alone is ~GBs of transient HBM)
    dx = pos_a[:, 0][:, None] - pos_b[None, :, 0]
    dy = pos_a[:, 1][:, None] - pos_b[None, :, 1]
    dz = pos_a[:, 2][:, None] - pos_b[None, :, 2]
    if pbc:
        dy = dy / lattice[1]
        dy = (dy - jnp.round(dy)) * lattice[1]
        dz = dz / lattice[2]
        dz = (dz - jnp.round(dz)) * lattice[2]
    d2 = dx * dx + dy * dy + dz * dz
    return 1e-10 * jnp.sqrt(d2), jnp.sqrt(d2)


def build_power_system(
    ct: CurrentTables,
    atom_element: jnp.ndarray,     # (N_atom,) gathered site elements
    atom_charge: jnp.ndarray,
    atom_cb_edge: jnp.ndarray,     # (N_atom,) [J]
    lattice: jnp.ndarray,
    pbc: bool,
    nn_dist: float,
    high_G: float,
    low_G: float,
    loop_G: float,
    tol: float,
    m_e: float,
    V0: float,
    vmax: int,
    ne_max: int,
    wkb_f32: bool = False,
) -> PowerSystem:
    n_atom = atom_element.shape[0]
    nbr = ct.atom_neigh_idx
    valid = nbr >= 0
    j = nbr.clip(0)

    metal_i = ct.atom_is_metal
    cvac = (atom_element == int(ELEM.VACANCY)) & (atom_charge == 0)
    pair_high = (metal_i[:, None] & metal_i[j]) | (cvac[:, None] & cvac[j])
    G_nbr = jnp.where(valid, jnp.where(pair_high, high_G, low_G), 0.0)

    # compacted vacancy list (dynamic; static cap vmax)
    is_vac = atom_element == int(ELEM.VACANCY)
    # compact_mask, not jnp.nonzero (full-N cumsum+scatter lowering is
    # ~6 ms at N = 37,650 on the tunneled v5e; bit-identical — ops/compact.py)
    vac_idx, vv = compact_mask(is_vac, vmax)
    vi = vac_idx.clip(0)

    cb = atom_cb_edge
    cidx = ct.contact_idx

    pos_v = ct.atom_pos[vi]
    pos_c = ct.atom_pos[cidx]

    def wkb_block_direct(pos_a, pos_b, cb_a, cb_b, mask_a, mask_b, idx_a, idx_b, integrate):
        dist_m, dist_ang = _pair_dist_m(pos_a, pos_b, lattice, pbc)
        dE = jnp.abs(cb_a[:, None] - cb_b[None, :])
        neighbor = dist_ang < nn_dist
        same = idx_a[:, None] == idx_b[None, :]
        ok = (
            mask_a[:, None]
            & mask_b[None, :]
            & ~same
            & ~neighbor
            & (dE > tol)
        )
        dE_safe = jnp.where(ok, dE, 1.0)
        if integrate:
            T = _wkb_contact_trap(
                dist_m, dE_safe, m_e, V0,
                _ct_loop_bound(dE, ok, ne_max), mask=ok, f32=wkb_f32,
            )
        else:
            T = _wkb_single(dist_m, dE_safe, m_e, V0, f32=wkb_f32)
        return jnp.where(ok, T, 0.0)

    # Row-chunked build: the direct form materializes ~15-25 (rows, cols)
    # transients (the pair-delta tensor is (rows, cols, 3)); at the
    # reference-scale T system (vmax = 22,528) that is ~47 GB of compile-
    # time HBM (measured OOM, BENCH notes r04) — 3x the chip. lax.map over
    # row blocks caps transients at one (B, cols) chunk while the OUTPUT
    # block alone stays resident. Bit-identical to the direct form: the
    # per-element math is unchanged and the per-chunk integration bound
    # (_ct_loop_bound) only truncates masked exact zeros. Reference
    # analogue: the reference streams the same blocks per-rank
    # (assemble_T / create_X, current_solver_gpu.cu:2130-2290).

    def wkb_block(pos_a, pos_b, cb_a, cb_b, mask_a, mask_b, idx_a, idx_b, integrate):
        rows = pos_a.shape[0]
        cols = pos_b.shape[0]
        B = _WKB_ROW_BLOCK
        if rows * cols <= 4 * B * B:
            return wkb_block_direct(
                pos_a, pos_b, cb_a, cb_b, mask_a, mask_b, idx_a, idx_b,
                integrate,
            )
        if integrate:
            # COLUMN-chunked (over the trap axis): each chunk's energy
            # integration bound (_ct_loop_bound inside the direct builder)
            # adapts to its own pairs' window spread — contiguous site-order
            # columns span a narrow cb_edge range, and the all-pad tail
            # chunks (vmax headroom above the live vacancy count) collapse
            # to one iteration instead of burning the global max bound.
            # Entries are BIT-IDENTICAL to the direct form (per-element
            # math unchanged; truncated terms are masked exact zeros) —
            # pinned by test_wkb_chunked_build_matches_direct. Reference
            # analogue: the per-pair energy windows of create_X's
            # contact_to_trap loop (current_solver_gpu.cu:2229-2256).
            pad = (-cols) % B
            padded = (
                jnp.concatenate([pos_b, jnp.zeros((pad, 3), pos_b.dtype)]),
                jnp.concatenate([cb_b, jnp.zeros(pad, cb_b.dtype)]),
                jnp.concatenate([mask_b, jnp.zeros(pad, bool)]),
                jnp.concatenate([idx_b, jnp.full(pad, -2, idx_b.dtype)]),
            )
            nb = (cols + pad) // B
            chunks = tuple(
                a.reshape((nb, B) + a.shape[1:]) for a in padded
            )

            def one_cols(chunk):
                cpos, ccb, cmask, cidx = chunk
                return wkb_block_direct(
                    pos_a, cpos, cb_a, ccb, mask_a, cmask, idx_a, cidx, True
                )

            out = jax.lax.map(one_cols, chunks)        # (nb, rows, B)
            return out.transpose(1, 0, 2).reshape(rows, nb * B)[:, :cols]
        pad = (-rows) % B
        padded = (
            jnp.concatenate([pos_a, jnp.zeros((pad, 3), pos_a.dtype)]),
            jnp.concatenate([cb_a, jnp.zeros(pad, cb_a.dtype)]),
            jnp.concatenate([mask_a, jnp.zeros(pad, bool)]),   # pad rows -> ok=False -> 0
            jnp.concatenate([idx_a, jnp.full(pad, -2, idx_a.dtype)]),
        )
        nb = (rows + pad) // B
        chunks = tuple(a.reshape((nb, B) + a.shape[1:]) for a in padded)

        def one(chunk):
            ca, cba, cma, cia = chunk
            return wkb_block_direct(
                ca, pos_b, cba, cb_b, cma, mask_b, cia, idx_b, integrate
            )

        out = jax.lax.map(one, chunks)
        return out.reshape(nb * B, cols)[:rows]

    ones_c = cidx >= 0   # contact mask (pad slots carry exact-zero rows)
    W_tt = wkb_block(pos_v, pos_v, cb[vi], cb[vi], vv, vv, vac_idx, vac_idx, False)
    W_cc = wkb_block(pos_c, pos_c, cb[cidx], cb[cidx], ones_c, ones_c, cidx, cidx, False)
    W_ct = wkb_block(pos_c, pos_v, cb[cidx], cb[vi], ones_c, vv, cidx, vac_idx, True)

    # diagonal: all row sums positive (write_to_diag, iterative_solvers_gpu.cu:39-47)
    diag = jnp.sum(G_nbr, axis=1)
    diag = diag + high_G * ct.inj_tie + high_G * ct.ext_tie
    # tunnel row sums scattered back to atoms; dtype=f64 keeps the
    # accumulation in f64 when the blocks are stored f32 (wkb_f32)
    diag = diag.at[vi].add(
        jnp.where(
            vv,
            jnp.sum(W_tt, axis=1, dtype=jnp.float64)
            + jnp.sum(W_ct, axis=0, dtype=jnp.float64),
            0.0,
        )
    )
    diag = diag.at[cidx].add(
        jnp.sum(W_cc, axis=1, dtype=jnp.float64)
        + jnp.sum(W_ct, axis=1, dtype=jnp.float64)
    )

    diag0 = loop_G + high_G * ct.n_ext
    diag1 = loop_G + high_G * ct.n_inj
    return PowerSystem(
        G_nbr=G_nbr, vac_idx=vac_idx, W_tt=W_tt, W_ct=W_ct, W_cc=W_cc,
        diag=diag, diag0=jnp.asarray(diag0, diag.dtype), diag1=jnp.asarray(diag1, diag.dtype),
    )


def _X_atoms_matvec(ct: CurrentTables, ps: PowerSystem, va: jnp.ndarray) -> jnp.ndarray:
    """Off-diagonal atom-atom part: (-G_nbr - W_tunnel) @ va, over all atoms."""
    nbr = ct.atom_neigh_idx
    y = -jnp.sum(ps.G_nbr * va[nbr.clip(0)], axis=1)

    vi = ps.vac_idx.clip(0)
    vv = ps.vac_idx >= 0
    v_v = jnp.where(vv, va[vi], 0.0)
    v_c = va[ct.contact_idx]

    y_v = -f64_matvec(ps.W_tt, v_v) - f64_matvec(ps.W_ct, v_c, axis=0)   # per vacancy slot
    y_c = -f64_matvec(ps.W_cc, v_c) - f64_matvec(ps.W_ct, v_v)           # per contact
    y = y.at[vi].add(jnp.where(vv, y_v, 0.0))
    y = y.at[ct.contact_idx].add(y_c)
    return y


def build_power_band(
    ct: CurrentTables,
    atom_element0: np.ndarray,
    high_G: float,
    low_G: float,
    max_band_bytes: float = 2e9,
):
    """Static int8 band operator over the ATOM adjacency for solve_power.

    The (N_atom, NNa) f64 neighbor gather in _X_atoms_matvec costs
    ~19 ms/CG-iteration at the 5 nm system — 93% of the CG body
    (tools/probe_power_phase.py). The neighbor conductance rule is the
    SAME rule the boundary-K operator encodes (high_G on metal-metal or
    conductive-vacancy pairs, low_G otherwise; build_power_system
    `pair_high`), so the static part rides the identical int8 band
    (code 1 = low_G, code 2 = metal-metal high_G) decoded inside the MXU
    mul+reduce — zero gathers per iteration. The dynamic cvac-cvac dG
    edges fold into the dense W_tt block once per solve (_cvac_fold).

    Returns (BandedK, BandMeta) or None (gather fallback) — None when the
    lexsorted atom bandwidth is too wide for the dense band to pay off.
    Reference analogue: the neighbor part of the distributed sparse T
    matvec (dist_spmv_split_sparse.cpp:5-78)."""
    from akmc_tpu.solvers.banded import build_banded_k

    return build_banded_k(
        np.asarray(ct.atom_pos),
        np.asarray(ct.atom_neigh_idx),
        np.asarray(ct.atom_is_metal),
        np.asarray(atom_element0),
        0, high_G, low_G,
        max_band_bytes=max_band_bytes,
    )


def _cvac_fold(pos_v, cvac_v, vac_idx, lattice, pbc, nn_dist, dtype, dG):
    """dG * (neighbor & cvac_i & cvac_j) adjacency over the compacted
    vacancy list — the dynamic part of build_power_system's `pair_high`
    rule that the static band codes cannot carry. Folding it into W_tt
    costs nothing per CG iteration (it rides the existing dense matvec).
    Row-chunked like wkb_block: the direct (V, V) distance build is fine
    at device scale (vmax ~1k) but transient-heavy at the reference's
    distributed T scale (vmax 22k)."""

    def block(chunk_pos, chunk_cvac, chunk_idx):
        _, dist_ang = _pair_dist_m(chunk_pos, pos_v, lattice, pbc)
        same = chunk_idx[:, None] == vac_idx[None, :]
        adj = (
            (dist_ang < nn_dist) & ~same
            & chunk_cvac[:, None] & cvac_v[None, :]
        )
        return jnp.where(adj, jnp.asarray(dG, dtype), jnp.asarray(0, dtype))

    rows = pos_v.shape[0]
    B = _WKB_ROW_BLOCK
    if rows * rows <= 4 * B * B:
        return block(pos_v, cvac_v, vac_idx)
    pad = (-rows) % B
    pp = jnp.concatenate([pos_v, jnp.zeros((pad, 3), pos_v.dtype)])
    pc = jnp.concatenate([cvac_v, jnp.zeros(pad, bool)])
    pi = jnp.concatenate([vac_idx, jnp.full(pad, -2, vac_idx.dtype)])
    nb = (rows + pad) // B
    chunks = (pp.reshape(nb, B, 3), pc.reshape(nb, B), pi.reshape(nb, B))
    out = jax.lax.map(lambda c: block(*c), chunks)
    return out.reshape(nb * B, rows)[:rows]


def solve_power(
    ct: CurrentTables,
    ps: PowerSystem,
    Vd,
    high_G: float,
    loop_G: float,
    G0: float,
    alpha: float,
    m_prev: jnp.ndarray,            # (N_atom+2,) warm start (unscaled units)
    atom_element: jnp.ndarray,
    rtol_coeff: float = 1e-16,
    max_iterations: int = 10000,
    band=None,                      # (BandedK) static atom band — see
    band_meta=None,                 #   build_power_band; None = gather path
    cvac=None,                      # (N_atom,) conductive-vacancy mask
    nn_dist: float = 0.0,
    lattice=None,
    pbc: bool = False,
    rtol_scale=1.0,                 # traced multiplier on the relative
    #                                 tolerance: the low-bias I-V points are
    #                                 a sub-nA cancellation of large virtual
    #                                 potentials, so callers tighten the
    #                                 solve where |I_macro| would otherwise
    #                                 sit below kappa*rtol resolution (the
    #                                 reference's own T-solve pins these
    #                                 with an absolute 1e-30*N_atom
    #                                 residual, current_solver_gpu.cu:
    #                                 1455-1456)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve X m = b, return (I_macro [A], atom_power (N_atom,) [W],
    m (N_atom+2) unscaled, cg_iters).

    Tolerance choice (measured at 2,304 atoms vs dense LU,
    tests/test_current_oracle.py::test_cg_tolerance_scaling_at_2k_atoms):
    I_macro is an extraction-row difference of large virtual potentials, so
    it needs ~2 digits more residual than the potentials themselves —
    rtol_coeff 1e-12 leaves 3.4e-2 relative I_macro error, 1e-14 leaves
    1.5e-4, 1e-16 (default) reaches 9e-9 at 333 iterations. (The reference's
    own sparse T-solve uses an absolute 1e-30*N_atom residual with <=100
    iterations as benchmark scaffolding, current_solver_gpu.cu:1455-1456;
    the relative-residual semantics here follow its K-solve convention,
    potential_solver_gpu.cu:884-886.)

    Unknowns: nodes [0,1] + atoms 0..N_atom-2 (last atom grounded, matching
    the dense path's leading-principal-block LU, current_solver_gpu.cu:2466).

    With ``band`` (build_power_band), the CG runs in the band's solver
    frame: the neighbor part is the int8 band_matvec (no gather), the
    dynamic cvac-cvac dG edges are folded into W_tt once per solve, and
    the grounded atom's row is replaced by an identity row (its residual
    starts and stays exactly zero, so the iteration is equivalent to
    dropping it). Measured: CG body 20.6 -> ~6 ms/iteration at 5 nm.
    """
    n_atom = ct.atom_ind.shape[0]

    if band is not None:
        from akmc_tpu.solvers.banded import band_matvec

        bk, meta = band, band_meta
        perm, invp = bk.perm, bk.inv_perm
        dGv = meta.val_both - meta.val_low
        diag_p = ps.diag[perm]
        inj_p = ct.inj_tie[perm]
        ext_p = ct.ext_tie[perm]
        g_p = invp[n_atom - 1]                     # grounded atom's slot
        gmask = jnp.ones(n_atom, bool).at[g_p].set(False)
        vi = ps.vac_idx.clip(0)
        vv = ps.vac_idx >= 0
        vi_p = invp[vi]
        cidx_p = invp[ct.contact_idx]

        W_tt = ps.W_tt + _cvac_fold(
            ct.atom_pos[vi], jnp.where(vv, cvac[vi], False), ps.vac_idx,
            lattice, pbc, nn_dist, ps.W_tt.dtype, dGv,
        )

        def A(v):
            # v: (N_atom + 2,) = [ext, inj, atoms (solver frame; grounded
            # slot pinned by the identity row)]
            va = jnp.where(gmask, v[2:], 0.0)
            y = diag_p * va - band_matvec(bk, meta, va)
            v_v = jnp.where(vv, va[vi_p], 0.0)
            v_c = va[cidx_p]
            y_v = -f64_matvec(W_tt, v_v) - f64_matvec(ps.W_ct, v_c, axis=0)
            y_c = -f64_matvec(ps.W_cc, v_c) - f64_matvec(ps.W_ct, v_v)
            y = y.at[vi_p].add(jnp.where(vv, y_v, 0.0))
            y = y.at[cidx_p].add(y_c)
            y = y - high_G * inj_p * v[1] - high_G * ext_p * v[0]
            y0 = ps.diag0 * v[0] - loop_G * v[1] - high_G * jnp.sum(
                jnp.where(ext_p, va, 0.0)
            )
            y1 = ps.diag1 * v[1] - loop_G * v[0] - high_G * jnp.sum(
                jnp.where(inj_p, va, 0.0)
            )
            y = jnp.where(gmask, y, v[2:])
            return jnp.concatenate([jnp.stack([y0, y1]), y])

        b = jnp.zeros(n_atom + 2).at[0].set(-loop_G * Vd).at[1].set(loop_G * Vd)
        inv_diag = jnp.concatenate([
            1.0 / jnp.stack([ps.diag0, ps.diag1]),
            jnp.where(gmask, 1.0 / jnp.where(gmask, diag_p, 1.0), 1.0),
        ])
        x0 = jnp.concatenate(
            [m_prev[:2], jnp.where(gmask, m_prev[2:][perm], 0.0)]
        )
        res = jacobi_cg(
            A, b, x0, inv_diag, rtol_coeff * n_atom * rtol_scale, max_iterations,
            dot_fn=f64_vdot,
        )
        m = jnp.concatenate([res.x[:2], res.x[2:][invp]])
    else:
        def A(v):
            # v: (N_atom + 1,) = [ext, inj, atoms[:-1]]
            va = jnp.concatenate([v[2:], jnp.zeros(1, v.dtype)])
            y_at = ps.diag * va + _X_atoms_matvec(ct, ps, va)
            y_at = y_at - high_G * ct.inj_tie * v[1] - high_G * ct.ext_tie * v[0]
            y0 = ps.diag0 * v[0] - loop_G * v[1] - high_G * jnp.sum(jnp.where(ct.ext_tie, va, 0.0))
            y1 = ps.diag1 * v[1] - loop_G * v[0] - high_G * jnp.sum(jnp.where(ct.inj_tie, va, 0.0))
            return jnp.concatenate([jnp.stack([y0, y1]), y_at[:-1]])

        b = jnp.zeros(n_atom + 1).at[0].set(-loop_G * Vd).at[1].set(loop_G * Vd)
        inv_diag = 1.0 / jnp.concatenate(
            [jnp.stack([ps.diag0, ps.diag1]), ps.diag[:-1]]
        )
        x0 = m_prev[: n_atom + 1]
        # f64_vdot: the power system is full-physics (never the golden parity
        # path); the mul+reduce dot avoids the f64 jnp.dot pathology measured
        # at multi-100k n (tools/probe_vec_ops.py)
        res = jacobi_cg(
            A, b, x0, inv_diag, rtol_coeff * n_atom * rtol_scale, max_iterations,
            dot_fn=f64_vdot,
        )

        m = jnp.concatenate([res.x, jnp.zeros(1, res.x.dtype)])   # grounded atom
    m_scaled = m * G0

    # I_macro: extraction-rail sum (get_imacro, current_solver_gpu.cu:2493-2507)
    m_at = m_scaled[2:]
    I_macro = jnp.sum(
        jnp.where(ct.ext_tie, (-high_G) * (m_scaled[0] - m_at), 0.0)
    )

    # forward-current power: pdisp_i = sum_j ineg_ij (m_j - m_i)
    # (set_ineg + row_reduce + write_to_diag + gemv, 2520-2559);
    # the min-shift of m cancels in differences and is omitted.
    sgn = jnp.sign(Vd)

    def ineg_contrib(x_off, mi, mj):
        ical = -x_off * (mi - mj)      # X_ij = -coef
        fwd = jnp.where(sgn >= 0, ical < 0, ical > 0)
        return jnp.where(fwd, -ical, 0.0)

    nbr = ct.atom_neigh_idx
    jm = m_at[nbr.clip(0)]
    ineg_n = ineg_contrib(ps.G_nbr, m_at[:, None], jm)
    pdisp = jnp.sum(ineg_n * (jm - m_at[:, None]), axis=1)

    vi = ps.vac_idx.clip(0)
    vv = ps.vac_idx >= 0
    m_v = jnp.where(vv, m_at[vi], 0.0)
    m_c = m_at[ct.contact_idx]

    in_tt = ineg_contrib(ps.W_tt, m_v[:, None], m_v[None, :])
    in_cc = ineg_contrib(ps.W_cc, m_c[:, None], m_c[None, :])
    in_ct = ineg_contrib(ps.W_ct, m_c[:, None], m_v[None, :])
    in_tc = ineg_contrib(ps.W_ct.T, m_v[:, None], m_c[None, :])

    p_v = jnp.sum(in_tt * (m_v[None, :] - m_v[:, None]), axis=1) + jnp.sum(
        in_tc * (m_c[None, :] - m_v[:, None]), axis=1
    )
    p_c = jnp.sum(in_cc * (m_c[None, :] - m_c[:, None]), axis=1) + jnp.sum(
        in_ct * (m_v[None, :] - m_c[:, None]), axis=1
    )
    pdisp = pdisp.at[vi].add(jnp.where(vv, p_v, 0.0))
    pdisp = pdisp.at[ct.contact_idx].add(p_c)

    atom_power = jnp.where(ct.atom_is_metal, 0.0, -alpha * pdisp)
    return I_macro, atom_power, m, res.iterations


# ---------------------------------------------------------------------------
# dense oracle path (small systems / tests) — full intended physics
# ---------------------------------------------------------------------------

def assemble_dense_X(
    ct: CurrentTables,
    atom_element: jnp.ndarray,
    atom_charge: jnp.ndarray,
    atom_cb_edge: jnp.ndarray,
    lattice: jnp.ndarray,
    pbc: bool,
    nn_dist: float,
    high_G: float,
    low_G: float,
    loop_G: float,
    tol: float,
    m_e: float,
    V0: float,
    ne_max: int = 2048,
) -> jnp.ndarray:
    """Full (N_atom+2)^2 transmission matrix — mirrors create_X exactly.
    For tests and small devices only."""
    n = atom_element.shape[0]
    dist_m, dist_ang = _pair_dist_m(ct.atom_pos, ct.atom_pos, lattice, pbc)
    ii = jnp.arange(n)
    same = ii[:, None] == ii[None, :]
    neighbor = (dist_ang < nn_dist) & ~same

    metal = ct.atom_is_metal
    cvac = (atom_element == int(ELEM.VACANCY)) & (atom_charge == 0)
    pair_high = (metal[:, None] & metal[None, :]) | (cvac[:, None] & cvac[None, :])
    Xnn = jnp.where(neighbor, jnp.where(pair_high, -high_G, -low_G), 0.0)

    vac = atom_element == int(ELEM.VACANCY)
    mp = ct.metal_p
    tt = vac[:, None] & vac[None, :]
    cc = mp[:, None] & mp[None, :]
    ctp = (vac[:, None] & mp[None, :]) | (mp[:, None] & vac[None, :])
    dE = jnp.abs(atom_cb_edge[:, None] - atom_cb_edge[None, :])
    elig = (tt | cc | ctp) & (dE > tol) & ~same & ~neighbor
    dE_safe = jnp.where(elig, dE, 1.0)
    T_single = _wkb_single(dist_m, dE_safe, m_e, V0)
    T_int = _wkb_contact_trap(dist_m, dE_safe, m_e, V0, ne_max)
    Xt = jnp.where(elig, jnp.where(ctp, -T_int, -T_single), 0.0)

    X = jnp.zeros((n + 2, n + 2))
    X = X.at[2:, 2:].set(Xnn + Xt)
    X = X.at[1, 2:].add(jnp.where(ct.inj_tie, -high_G, 0.0))
    X = X.at[2:, 1].add(jnp.where(ct.inj_tie, -high_G, 0.0))
    X = X.at[0, 2:].add(jnp.where(ct.ext_tie, -high_G, 0.0))
    X = X.at[2:, 0].add(jnp.where(ct.ext_tie, -high_G, 0.0))
    X = X.at[0, 1].set(-loop_G)
    X = X.at[1, 0].set(-loop_G)

    rowsum = jnp.sum(X, axis=1)
    X = X + jnp.diag(-rowsum)
    return X
