"""KMC event engine: rate-table build + fused residence-time loop.

Reference: kmc_events.cu. The reference builds the (site, neighbor-slot) rate
table on GPU (build_event_list_split, kmc_events.cu:130-229) but runs the
rejection-free residence-time algorithm as a host-orchestrated loop with a
full-table scan, a D2H copy, an MPI_Allgather, a host RNG draw and an
MPI_Bcast PER EXECUTED EVENT (execute_kmc_step_mpi, kmc_events.cu:333-563).

TPU realization — the single biggest structural win of the rebuild:
  * the whole residence-time loop is ONE ``lax.while_loop`` on device;
  * selection draws come from a precomputed buffer of the replicated host
    mt19937 stream (bit-parity mode) or an on-device threefry stream;
  * selection is two-level (cumsum over per-site rate sums, then within the
    row) — mathematically identical to the reference's flat
    inclusive_scan + upper_bound;
  * after an event, only the <= 2 + 2*NN affected rows are rewritten
    (gather/scatter) instead of re-scanning the full N*NN table — the
    reference's zero-out semantics (zero_out_events_split,
    kmc_events.cu:247-266) at O(NN^2) instead of O(N*NN) cost per event.

Committed-path quirks preserved (kmc_events.cu:448-516):
  * the loop runs while the LAST single-event waiting time < 1/freq,
  * each iteration executes an event first and draws its waiting time after,
  * the returned event_time is the final (loop-breaking) waiting time, which
    the driver adds to kmc_time.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from akmc_tpu.config import KB_EV, Q_C
from akmc_tpu.lattice import ELEM, EVENT

_EPS_OVERFLOW = 1e-200   # exponential overflow guard (kmc_events.cu:150)


def v_solve(d: jnp.ndarray, charge, sigma, k) -> jnp.ndarray:
    """Screened point-charge potential [V]; d in meters
    (v_solve_gpu, gpu_solvers.h:321-327)."""
    from jax.scipy.special import erfc

    return (
        charge
        * erfc(d / (sigma * jnp.sqrt(jnp.asarray(2.0, d.dtype))))
        * k
        * Q_C
        / d
    )


def build_event_table(
    element: jnp.ndarray,        # (N,) int32
    charge: jnp.ndarray,         # (N,) int32
    potential: jnp.ndarray,      # (N,) f64 summed site potential [V]
    T_bg: jnp.ndarray,           # () f64 [K]
    neigh_idx: jnp.ndarray,      # (R, NN) int32, -1 padded
    self2_nn: jnp.ndarray,       # (R, NN) f64 v_solve(d_ij, 2) [V] (static)
    layer_nbr: jnp.ndarray,      # (R, NN) int32 layer id of neighbor (static)
    E_gen: jnp.ndarray,          # (num_layers,) f64 [eV] per-layer energies
    E_rec: jnp.ndarray,
    E_Vdiff: jnp.ndarray,
    E_Odiff: jnp.ndarray,
    freq: float,
    sigma: float,
    k: float,
    rows: jnp.ndarray = None,    # (R,) absolute site of each row, -1 padded
    normalize: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rates P (R, NN) f64 and event types (R, NN) int32.

    Reference: build_event_list_split (kmc_events.cu:130-229). Distances are
    NON-PBC (kmc_events.cu:154-155); field term E from the summed potential;
    P = freq / (exp(EA / kB T_bg) + 1e-200).

    Without ``rows``, R = N (one row per site, the reference layout). With
    ``rows``, the table is COMPACTED to the statically event-capable sites
    (element in {DEFECT, O, V, Od} — a set closed under all four event
    types, so it never changes after initialization): ``neigh_idx`` /
    ``self2_nn`` / ``layer_nbr`` are the same tables gathered at ``rows``.
    Since every excluded row has exactly-zero rate in the full table,
    cumulative sums — and therefore event selection — are bit-identical;
    only the gather volume shrinks (~1.9x on the 5 nm device).
    """
    valid = neigh_idx >= 0
    j = neigh_idx.clip(0)

    if rows is None:
        ei = element[:, None]
        qi = charge[:, None].astype(potential.dtype)
        pot_i = potential[:, None]
    else:
        rc = rows.clip(0)   # -1 pad rows gather site 0; killed by `valid`
        ei = element[rc][:, None]
        qi = charge[rc][:, None].astype(potential.dtype)
        pot_i = potential[rc][:, None]
    # ONE packed row gather for the whole neighbor read: code = packed
    # element+charge int (charge in {-2,0,2} -> code < 44, exact in f64)
    # stored next to the potential in an (N, 2) array. Measured on the chip
    # (tools/probe_gather.py): gathering (N,2) f64 rows costs 10.3 ms for
    # this index set vs 13.6 (f64) + 7.2 (int32) separate — gathers are
    # byte-bound, and the row layout amortizes the per-index cost.
    code = element * 4 + (charge // 2 + 1)
    packed = jnp.stack([potential, code.astype(potential.dtype)], axis=1)
    pj = packed[j]                                     # (R, NN, 2)
    codej = pj[..., 1].astype(jnp.int32)
    ej = codej // 4
    qj = ((codej % 4) - 1).astype(potential.dtype) * 2.0
    phi = pot_i - pj[..., 0]

    is_gen = (ei == int(ELEM.DEFECT)) & (ej == int(ELEM.O))
    is_rec = (ei == int(ELEM.OXYGEN_DEFECT)) & (ej == int(ELEM.VACANCY))
    is_vdiff = (ei == int(ELEM.VACANCY)) & (ej == int(ELEM.O))
    is_odiff = (ei == int(ELEM.OXYGEN_DEFECT)) & (ej == int(ELEM.DEFECT))

    # v_solve is linear in charge: v_solve(d, q) = (q/2) * v_solve(d, 2),
    # and distances are static, so the erfc kernel is fully precomputed
    self_2 = self2_nn
    self_qi = (qi / 2.0) * self2_nn

    # zero-field activation energies by the NEIGHBOR's layer
    # (kmc_events.cu:162, 178, 199, 217)
    Eg = E_gen[layer_nbr]
    Er = E_rec[layer_nbr]
    Ev = E_Vdiff[layer_nbr]
    Eo = E_Odiff[layer_nbr]

    cs = qi - qj
    E_gen_t = 2.0 * phi
    E_rec_t = cs * (phi + (cs / 2.0) * self_2)
    E_vdiff_t = cs * (phi + jnp.where(qi != 0, self_qi, 0.0))
    E_odiff_t = cs * (phi - jnp.where(qi != 0, self_2, 0.0))

    EA = jnp.where(
        is_gen, Eg - E_gen_t,
        jnp.where(
            is_rec, Er - E_rec_t,
            jnp.where(is_vdiff, Ev - E_vdiff_t, Eo - E_odiff_t),
        ),
    )

    any_event = (is_gen | is_rec | is_vdiff | is_odiff) & valid
    kT = KB_EV * T_bg
    ln_S = None
    if not normalize:
        P = freq * (1.0 / (jnp.exp(EA / kT) + _EPS_OVERFLOW))
        P = jnp.where(any_event, P, 0.0)
    else:
        # shifted-exponent rates for high-bias/large devices: this runtime's
        # f64 is double-double emulation with the f32 EXPONENT RANGE
        # (exp(100) = inf, exp(-100) = 0, saturation at ~3.4e38 — measured,
        # PERF_NOTES round 2), so absolute rates freq*e^{-z} overflow at
        # |z| ≳ 55. Store P~ = e^{z_min - z} <= 1 (identical selection
        # ORDER; sums bounded by the row count) and return the log scale
        # ln S = ln(freq) - z_min so the event loop reconstructs waiting
        # times in log space.
        z = EA / kT
        z_valid = jnp.where(any_event, z, jnp.inf)
        z_min = jnp.min(z_valid)
        z_min = jnp.where(jnp.isfinite(z_min), z_min, 0.0)
        P = jnp.where(any_event, jnp.exp(z_min - z), 0.0)
        ln_S = jnp.log(freq) - z_min

    etype = jnp.where(
        is_gen, int(EVENT.VACANCY_GENERATION),
        jnp.where(
            is_rec, int(EVENT.VACANCY_RECOMBINATION),
            jnp.where(
                is_vdiff, int(EVENT.VACANCY_DIFFUSION),
                jnp.where(is_odiff, int(EVENT.ION_DIFFUSION), int(EVENT.NULL_EVENT)),
            ),
        ),
    )
    etype = jnp.where(any_event, etype, int(EVENT.NULL_EVENT)).astype(jnp.int32)
    if normalize:
        return P, etype, ln_S
    return P, etype



_BLK = 256


def _select_site(R, r_sel, n):
    """Two-level site selection: block partial sums (one fast reduce) +
    cumsum over n/256 blocks + cumsum inside the selected block, replacing a
    full-length f64 cumsum per event (whose reduce-window lowering dominates
    the loop body on TPU). Returns (site, prev_cum_below_site, total, target).

    Equivalent to searchsorted(cumsum(R), r_sel*total): excluded-slot rates
    are exact zeros and rates differ by orders of magnitude, so the
    re-associated partial sums select the same event (golden-verified); only
    the fp value of `total` shifts at the 1e-16 level.
    """
    if n % _BLK:
        cum = jnp.cumsum(R)
        total = cum[-1]
        target = r_sel * total
        site = jnp.clip(
            jnp.searchsorted(cum, target, side="right").astype(jnp.int32), 0, n - 1
        )
        prev = jnp.where(site > 0, cum[site - 1], 0.0)
        return site, prev, total, target

    nb = n // _BLK
    bs = jnp.sum(R.reshape(nb, _BLK), axis=1)
    return _select_site_bs(R, bs, r_sel, n)


def _select_site_bs(R, bs, r_sel, n):
    """Second level of the two-level selection given the block partial sums
    (either freshly reduced or carried incrementally — identical values)."""
    nb = n // _BLK
    cumb = jnp.cumsum(bs)
    total = cumb[-1]
    target = r_sel * total
    blk = jnp.clip(
        jnp.searchsorted(cumb, target, side="right").astype(jnp.int32), 0, nb - 1
    )
    prev_b = jnp.where(blk > 0, cumb[blk - 1], 0.0)
    Rblk = lax.dynamic_slice(R, (blk * _BLK,), (_BLK,))
    cumr = jnp.cumsum(Rblk)
    off = jnp.clip(
        jnp.searchsorted(cumr, target - prev_b, side="right").astype(jnp.int32),
        0, _BLK - 1,
    )
    site = blk * _BLK + off
    prev = prev_b + jnp.where(off > 0, cumr[off - 1], 0.0)
    return site, prev, total, target


def _execute_event(element, charge, isel, jsel, etype):
    """Apply the element/charge mutation of an executed event
    (execute_event, kmc_events.cu:292-331)."""
    ei = element[isel]
    ej = element[jsel]
    qi = charge[isel]
    qj = charge[jsel]

    gen = etype == int(EVENT.VACANCY_GENERATION)
    rec = etype == int(EVENT.VACANCY_RECOMBINATION)
    swap = (etype == int(EVENT.VACANCY_DIFFUSION)) | (
        etype == int(EVENT.ION_DIFFUSION)
    )

    new_ei = jnp.where(
        gen, int(ELEM.OXYGEN_DEFECT), jnp.where(rec, int(ELEM.DEFECT), jnp.where(swap, ej, ei))
    )
    new_ej = jnp.where(
        gen, int(ELEM.VACANCY), jnp.where(rec, int(ELEM.O), jnp.where(swap, ei, ej))
    )
    new_qi = jnp.where(gen, -2, jnp.where(rec, 0, jnp.where(swap, qj, qi)))
    new_qj = jnp.where(gen, 2, jnp.where(rec, 0, jnp.where(swap, qi, qj)))

    element = element.at[isel].set(new_ei.astype(element.dtype))
    element = element.at[jsel].set(new_ej.astype(element.dtype))
    charge = charge.at[isel].set(new_qi.astype(charge.dtype))
    charge = charge.at[jsel].set(new_qj.astype(charge.dtype))
    return element, charge


def _execute_event_code(code, isel, jsel, etype):
    """_execute_event on the packed element+charge code (code = element*4 +
    charge//2 + 1): one gather pair + one scatter pair instead of two of
    each. The event outcomes have fixed (element, charge) pairs, so their
    codes are compile-time constants; swaps exchange whole codes. Integer
    arithmetic — bit-identical semantics to the two-array form."""
    ci = code[isel]
    cj = code[jsel]
    gen = etype == int(EVENT.VACANCY_GENERATION)
    rec = etype == int(EVENT.VACANCY_RECOMBINATION)
    swap = (etype == int(EVENT.VACANCY_DIFFUSION)) | (
        etype == int(EVENT.ION_DIFFUSION)
    )
    code_od_neg = int(ELEM.OXYGEN_DEFECT) * 4 + 0   # Od, q=-2
    code_v_pos = int(ELEM.VACANCY) * 4 + 2          # V,  q=+2
    code_d_0 = int(ELEM.DEFECT) * 4 + 1             # d,  q=0
    code_o_0 = int(ELEM.O) * 4 + 1                  # O,  q=0
    new_ci = jnp.where(
        gen, code_od_neg, jnp.where(rec, code_d_0, jnp.where(swap, cj, ci))
    )
    new_cj = jnp.where(
        gen, code_v_pos, jnp.where(rec, code_o_0, jnp.where(swap, ci, cj))
    )
    code = code.at[isel].set(new_ci.astype(code.dtype))
    code = code.at[jsel].set(new_cj.astype(code.dtype))
    return code


class EventLoopResult(NamedTuple):
    element: jnp.ndarray
    charge: jnp.ndarray
    P: jnp.ndarray            # mutated rate table (for chunk resumption)
    event_time: jnp.ndarray   # final (loop-breaking) waiting time [s]
    n_events: jnp.ndarray     # int32 events executed in this chunk
    draws_used: jnp.ndarray   # int32 rands consumed
    done: jnp.ndarray         # bool: superstep finished (vs. buffer exhausted)


def run_event_loop(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    P: jnp.ndarray,            # (R, NN) rate table (consumed/mutated)
    etype: jnp.ndarray,        # (R, NN) int32 event types
    neigh_idx: jnp.ndarray,    # (R, NN) int32 (absolute neighbor site ids)
    rand_buf: jnp.ndarray,     # (2*max_events,) f64 uniform draws
    freq: float,
    event_time_in=None,        # carry when resuming an exhausted chunk
    act_idx: jnp.ndarray = None,   # (R,) absolute site per row, -1 padded
    abs2act: jnp.ndarray = None,   # (N,) absolute site -> row (pad row if none)
    ln_S=None,                 # log rate scale when P is shifted-exponent
    incremental_select: bool = False,  # carry the selection's block partial
    #                            sums and recompute only the <= 2+2*NN
    #                            TOUCHED blocks per event (same (BLK,)-reduce
    #                            over the same values — bit-identical to the
    #                            fresh per-event reduce; ablation flag for
    #                            the per-event cost model, PERF_NOTES)
    zero_rows: jnp.ndarray = None,  # (R, 1+NN) STATIC per-row zero-out row
    #                            set {r} ∪ abs2act[neigh[r]] — replaces the
    #                            per-event 6-op index algebra with 2 row
    #                            gathers (same multiset of rows, identical
    #                            written values -> bit-identical trajectory)
) -> EventLoopResult:
    """Fused residence-time loop (execute_kmc_step_mpi, kmc_events.cu:430-528).

    Runs until the latest single-event waiting time exceeds 1/freq, or the
    rand buffer is exhausted (the host then refills and resumes — only
    happens in bit-parity mode with very active supersteps).

    With ``act_idx``/``abs2act`` the table is row-compacted to the
    event-capable sites (see build_event_table): selection is bit-identical
    because excluded rows carry exactly-zero rates; zero-out maps the
    affected absolute sites back through ``abs2act`` (inactive neighbors
    land on an all-zero pad row, a no-op write).
    """
    n, nn = P.shape
    buf_len = rand_buf.shape[0]
    inv_freq = 1.0 / freq
    incremental_select = incremental_select and n % _BLK == 0

    R0 = jnp.sum(P, axis=1)
    t0 = (
        jnp.asarray(0.0, P.dtype)
        if event_time_in is None
        else jnp.asarray(event_time_in, P.dtype)
    )

    # element+charge carried as ONE packed code (code = element*4 +
    # charge//2 + 1 — the exact int packing the rate build already uses):
    # halves the per-event state gathers and scatters. Integer ops are
    # exact, so the trajectory is bit-identical to the two-array carry.
    code0 = element * 4 + (charge // 2 + 1)

    def unpack(c):
        if incremental_select:
            return c
        code, P, R, cnt, ev_time, n_ev = c
        return code, P, R, None, cnt, ev_time, n_ev

    def pack(code, P, R, bs, cnt, ev_time, n_ev):
        if incremental_select:
            return (code, P, R, bs, cnt, ev_time, n_ev)
        return (code, P, R, cnt, ev_time, n_ev)

    def cond(c):
        return (c[-2] < inv_freq) & (c[-3] + 2 <= buf_len)

    def body(c):
        code, P, R, bs, cnt, ev_time, n_ev = unpack(c)

        r_sel = rand_buf[cnt]
        if incremental_select:
            site, prev, total, target = _select_site_bs(R, bs, r_sel, n)
        else:
            site, prev, total, target = _select_site(R, r_sel, n)
        row = P[site]
        rowcum = jnp.cumsum(row)
        slot = jnp.searchsorted(rowcum, target - prev, side="right").astype(jnp.int32)
        slot = jnp.clip(slot, 0, nn - 1)

        isel = site if act_idx is None else act_idx[site].clip(0)
        jsel = neigh_idx[site, slot].clip(0)
        ety = etype[site, slot]

        ok = total > 0.0

        code2 = _execute_event_code(code, isel, jsel, ety)
        code = jnp.where(ok, code2, code)

        # zero out all pairs involving isel or jsel — only rows that can
        # contain such pairs: the two sites' rows + their neighbors' rows
        if act_idx is None:
            jrow = jsel
        else:
            jrow = abs2act[jsel]
        if zero_rows is not None:
            # static per-row zero-out sets: same multiset of rows as the
            # on-the-fly concat below (duplicates scatter identical values)
            ar = jnp.concatenate([zero_rows[site], zero_rows[jrow]])
        elif act_idx is None:
            ar = jnp.concatenate(
                [jnp.stack([site, jrow]), neigh_idx[site].clip(0), neigh_idx[jrow].clip(0)]
            )                                               # (2 + 2*NN,) rows
        else:
            ar = jnp.concatenate(
                [
                    jnp.stack([site, jrow]),
                    abs2act[neigh_idx[site].clip(0)],
                    abs2act[neigh_idx[jrow].clip(0)],
                ]
            )
        rows_P = P[ar]
        rows_nbr = neigh_idx[ar]
        kill = (
            (ar == site)[:, None]
            | (ar == jrow)[:, None]
            | (rows_nbr == isel)
            | (rows_nbr == jsel)
        )
        new_rows = jnp.where(kill & ok, 0.0, rows_P)
        P = P.at[ar].set(new_rows)
        R = R.at[ar].set(jnp.sum(new_rows, axis=1))
        if incremental_select:
            # refresh ONLY the touched blocks' partial sums from the updated
            # R: the same (BLK,)-axis reduce over the same values a full
            # recompute would do -> bit-identical selection state
            b_ids = ar // _BLK
            bs = bs.at[b_ids].set(
                jnp.sum(R.reshape(n // _BLK, _BLK)[b_ids], axis=1)
            )

        r_time = rand_buf[cnt + 1]
        if ln_S is None:
            ev_time = jnp.where(ok, -jnp.log(r_time) / total, jnp.inf)
        else:
            # waiting time in log space: -ln(r)/(S*total~) with
            # ln S carried separately (S itself may exceed the emulated
            # f64 exponent range)
            ev_time = jnp.where(
                ok,
                jnp.exp(jnp.log(-jnp.log(r_time)) - jnp.log(
                    jnp.where(ok, total, 1.0)) - ln_S),
                jnp.inf,
            )
        # a total-rate-0 iteration executes nothing and terminates via
        # ev_time=inf: consume no draws and count no event (the reference's
        # behavior here is degenerate/UB — no stream to match, but counting
        # a spurious event would desync the host mt19937 cursor)
        dcnt = jnp.where(ok, 2, 0).astype(jnp.int32)
        return pack(
            code, P, R, bs, cnt + dcnt, ev_time, n_ev + dcnt // 2
        )

    bs0 = (
        jnp.sum(R0.reshape(n // _BLK, _BLK), axis=1)
        if incremental_select
        else None
    )
    init = pack(
        code0,
        P,
        R0,
        bs0,
        jnp.asarray(0, jnp.int32),
        t0,
        jnp.asarray(0, jnp.int32),
    )
    code, P, R, _, cnt, ev_time, n_ev = unpack(
        lax.while_loop(cond, body, init)
    )
    return EventLoopResult(
        element=(code // 4).astype(element.dtype),
        charge=(((code % 4) - 1) * 2).astype(charge.dtype),
        P=P,
        event_time=ev_time,
        n_events=n_ev,
        draws_used=cnt,
        done=ev_time >= inv_freq,
    )


def _topk_smallest(tau: jnp.ndarray, B: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact B smallest entries of tau (values, indices), two-stage:
    top-B blocks by block-min, then top-B inside the gathered block
    contents. Exact: a top-B element's block min is <= the element, so if
    its block ranked below the top-B blocks there would be >= B strictly
    smaller elements. Avoids a full-length top_k on the (NA,) f64 vector
    (lax.top_k sorts; two short top_ks + one contiguous row gather are
    cheaper on a runtime with ~70M elem/s gathers)."""
    n = tau.shape[0]
    blk = 256
    if n % blk or n <= 4 * blk:
        neg, idx = lax.top_k(-tau, B)
        return -neg, idx
    nb = n // blk
    bmin = jnp.min(tau.reshape(nb, blk), axis=1)
    _, bsel = lax.top_k(-bmin, B)                  # B best blocks
    cand = tau.reshape(nb, blk)[bsel].reshape(-1)  # (B*blk,) contiguous rows
    neg, ci = lax.top_k(-cand, B)
    idx = bsel[ci // blk] * blk + ci % blk
    return -neg, idx


class BatchedLoopResult(NamedTuple):
    element: jnp.ndarray
    charge: jnp.ndarray
    P: jnp.ndarray
    event_time: jnp.ndarray
    n_events: jnp.ndarray
    n_batches: jnp.ndarray
    done: jnp.ndarray
    # batches whose accept-prefix was cut by each cause (diagnosing WHY
    # amortization stops: row-conflict vs killed-mass staleness bound)
    n_cut_conflict: jnp.ndarray = jnp.asarray(0, jnp.int32)
    n_cut_mass: jnp.ndarray = jnp.asarray(0, jnp.int32)


def run_event_loop_batched(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    P: jnp.ndarray,            # (R, NN) rate table (consumed/mutated)
    etype: jnp.ndarray,
    neigh_idx: jnp.ndarray,
    key: jax.Array,
    freq: float,
    batch: int = 64,
    max_batches: int = 1 << 14,
    act_idx: jnp.ndarray = None,
    abs2act: jnp.ndarray = None,
    ln_S=None,
    mass_eps: float = 1e-3,
    clock_f32: bool = False,
) -> BatchedLoopResult:
    """Multi-event batches via the exponential-race (next-reaction)
    formulation of the residence-time algorithm — the crossbar-scale
    answer to the serial one-event-per-iteration wall (~0.39 ms/event of
    op-count overhead at 1M+ slots, PERF_NOTES round 3; the reference's
    loop is also serial, kmc_events.cu:448-516).

    Exactness argument (production/threefry mode — not reference-stream
    parity, which stays on the serial loop):

      * Per-row clocks tau_i = -ln(u_i)/R_i realize the exponential race:
        (argmin, min-gap) is distributed exactly as (selection ~ rates,
        waiting time ~ Exp(total)) — the serial law.
      * Slot choice within a winning row uses the row's batch-start rates.
        Rates only DECREASE within a superstep (the loop only zeroes
        executed pairs; rebuild happens next superstep), so by the
        thinning identity  select~stale + accept-iff-alive == thin to
        current total + select~current  the composition is exact.
      * Candidates are processed in tau order and the batch is CUT at the
        first candidate whose row lies in any earlier candidate's touched
        row set (the serial zero-out's ar set): before the cut no
        accepted row's rates were touched, so every accepted clock and
        slot draw is exact. Cut events' clocks are redrawn next batch —
        exact by memorylessness.
      * The one inexactness: accepted events zero rate mass elsewhere, so
        later gaps in the SAME batch race against a total that is stale
        by the killed mass still racing (the executed row's own clock is
        consumed by firing, so its mass cannot distort later gaps and is
        excluded from the bound). The batch is cut when that cumulative
        racing killed mass exceeds ``mass_eps`` of the total, bounding the
        relative gap-law (waiting-time) distortion by mass_eps (default
        1e-3). Batches restart with fresh rates, so the distortion does
        not accumulate. Measured at the 1.08 M-slot crossbar
        (tools/probe_batched_eps.py): the mass cut is what limits batch
        amortization (conflict cuts ~0.1%); superstep event counts and CG
        iterations are stable from eps=1e-3 to 0.3 while events/batch
        goes 1.1 -> 19.

    Termination matches the committed loop: the first accepted gap
    >= 1/freq executes its event, returns that gap as event_time and
    stops (kmc_events.cu:448-516 executes first, draws after)."""
    n, nn = P.shape
    inv_freq = 1.0 / freq
    B = batch
    R0 = jnp.sum(P, axis=1)

    def cond(c):
        done, n_b = c[8], c[7]
        return (~done) & (n_b < max_batches)

    def body(c):
        element, charge, P, R, key, ev_time, n_ev, n_b, done, n_cc, n_cm = c
        key, k_clk, k_slot = jax.random.split(key, 3)

        # 1. per-row clocks at batch-start rates. In shifted-exponent mode
        # R~ = R/S with ln S carried: tau~ = tau*S keeps every clock in the
        # emulated-f64 exponent range (R~ <= NN); gaps are rescaled by S in
        # log space only at the termination test.
        # clock_f32: draw/transform the full-N clock vector in f32 — the
        # dd-f64 log over every row was 41% of the measured per-batch cost
        # at the 4.6M crossbar (tools/probe_batched_phase.py). The race is
        # exact-in-law up to f32 rounding: selection uses the order of the
        # realized taus, and the accepted gaps carry ~1e-6 relative
        # rounding noise (order-statistic spacing ~ tau/k at k <= B) —
        # orders below the mode's own mass_eps waiting-time budget.
        # Production flag (not reference-stream parity either way).
        if clock_f32:
            u = jax.random.uniform(k_clk, (n,), dtype=jnp.float32)
            tau = -jnp.log(u) / R.astype(jnp.float32)
        else:
            u = jax.random.uniform(k_clk, (n,), dtype=P.dtype)
            tau = -jnp.log(u) / R              # inf on zero-rate rows
        total = jnp.sum(R)
        ok = total > 0.0

        tau_b, rows_b = _topk_smallest(tau, B)

        # 2. slot per candidate from the (stale = current, untouched) rows
        rows_P = P[rows_b]                                  # (B, NN)
        cumr = jnp.cumsum(rows_P, axis=1)
        rowtot = cumr[:, -1]
        t_slot = jax.random.uniform(k_slot, (B,), dtype=P.dtype) * rowtot
        slot_b = jnp.clip(
            jnp.sum(cumr < t_slot[:, None], axis=1).astype(jnp.int32), 0, nn - 1
        )

        isel_b = rows_b if act_idx is None else act_idx[rows_b].clip(0)
        jsel_b = neigh_idx[rows_b, slot_b].clip(0)
        ety_b = etype[rows_b, slot_b]

        # 3. touched row set per candidate (the serial ar set)
        if act_idx is None:
            jrow_b = jsel_b
            ar_b = jnp.concatenate(
                [
                    jnp.stack([rows_b, jrow_b], 1),
                    neigh_idx[rows_b].clip(0),
                    neigh_idx[jrow_b].clip(0),
                ],
                axis=1,
            )                                               # (B, 2 + 2*NN)
        else:
            jrow_b = abs2act[jsel_b]
            ar_b = jnp.concatenate(
                [
                    jnp.stack([rows_b, jrow_b], 1),
                    abs2act[neigh_idx[rows_b].clip(0)],
                    abs2act[neigh_idx[jrow_b].clip(0)],
                ],
                axis=1,
            )

        # 4. exact prefix cut: first candidate whose row an earlier
        # candidate touches (strict lower-triangular any)
        touch = jnp.any(rows_b[None, :, None] == ar_b[:, None, :], axis=2)
        lower = jnp.tril(jnp.ones((B, B), bool), k=-1)
        conflicted = jnp.any(touch.T & lower, axis=1)       # (B,) ∃i<j touch(i,j)

        # killed-mass staleness bound: pairs killed by candidate i live in
        # rows untouched by other accepted candidates (else the cut fired),
        # so per-candidate killed masses are disjoint and their cumsum is
        # the exact total-rate decrease
        ar_P = P[ar_b]                                      # (B, 106, NN)
        ar_nbr = neigh_idx[ar_b]
        kill_b = (
            (ar_b == rows_b[:, None])[:, :, None]
            | (ar_b == jrow_b[:, None])[:, :, None]
            | (ar_nbr == isel_b[:, None, None])
            | (ar_nbr == jsel_b[:, None, None])
        )
        killed_mass = jnp.sum(jnp.where(kill_b, ar_P, 0.0), axis=(1, 2))
        # Only mass whose clock KEEPS RACING stale can distort later gaps.
        # The executed row's own clock is consumed by firing (it IS the
        # arrival), so its row total — typically the dominant chunk, the
        # winners are high-rate rows — is excluded from the racing-staleness
        # bound. Partner-row and neighbor-slot mass stays counted: those
        # clocks race on at stale rates until the batch ends.
        racing_killed = jnp.maximum(killed_mass - rowtot, 0.0)
        mass_ok = (
            jnp.cumsum(racing_killed) - racing_killed
        ) <= mass_eps * total                               # mass killed BEFORE i

        # finite clock + no invalid rows (padded/zero-rate never win unless
        # the table is empty)
        valid = jnp.isfinite(tau_b) & (rowtot > 0.0) & ok
        acceptable = valid & ~conflicted & mass_ok
        # accept the maximal all-acceptable prefix
        acc_prefix = jnp.cumprod(acceptable.astype(jnp.int32)) == 1  # (B,)

        # cut-cause diagnostics: attribute the prefix boundary (if any)
        n_prefix = jnp.sum(acc_prefix.astype(jnp.int32))
        cut_here = n_prefix < B
        cut_i = jnp.clip(n_prefix, 0, B - 1)
        cut_conflict = cut_here & conflicted[cut_i]
        cut_mass = cut_here & ~conflicted[cut_i] & ~mass_ok[cut_i]

        # 5. termination: first accepted gap >= 1/freq executes, then stops
        gaps = jnp.diff(tau_b, prepend=jnp.zeros(1, tau_b.dtype))
        if ln_S is None:
            big = gaps >= inv_freq
        else:
            # f64 log-space regardless of the clock dtype (1e-300 would
            # underflow an f32 guard; ln_S is f64)
            big = (
                jnp.log(jnp.maximum(gaps.astype(jnp.float64), 1e-300)) - ln_S
                >= jnp.log(inv_freq)
            )
        first_big = jnp.argmax(big & acc_prefix)
        has_big = jnp.any(big & acc_prefix)
        accept = acc_prefix & (
            jnp.arange(B) <= jnp.where(has_big, first_big, B - 1)
        )

        n_acc = jnp.sum(accept.astype(jnp.int32))

        # 6. execute accepted events (vectorized; sites pairwise disjoint —
        # overlap would have tripped the row-touch cut)
        w = accept
        ei = element[isel_b]
        ej = element[jsel_b]
        qi = charge[isel_b]
        qj = charge[jsel_b]
        gen = ety_b == int(EVENT.VACANCY_GENERATION)
        rec = ety_b == int(EVENT.VACANCY_RECOMBINATION)
        swap = (ety_b == int(EVENT.VACANCY_DIFFUSION)) | (
            ety_b == int(EVENT.ION_DIFFUSION)
        )
        new_ei = jnp.where(
            gen, int(ELEM.OXYGEN_DEFECT),
            jnp.where(rec, int(ELEM.DEFECT), jnp.where(swap, ej, ei)),
        )
        new_ej = jnp.where(
            gen, int(ELEM.VACANCY),
            jnp.where(rec, int(ELEM.O), jnp.where(swap, ei, ej)),
        )
        new_qi = jnp.where(gen, -2, jnp.where(rec, 0, jnp.where(swap, qj, qi)))
        new_qj = jnp.where(gen, 2, jnp.where(rec, 0, jnp.where(swap, qi, qj)))
        # rejected candidates may SHARE a site with an accepted one (that is
        # what got them rejected) — scatter only accepted writes (mode=drop
        # on an out-of-range sentinel), or a rejected write could clobber an
        # accepted update
        nsites = element.shape[0]
        wi = jnp.where(w, isel_b, nsites)
        wj = jnp.where(w, jsel_b, nsites)
        element = element.at[wi].set(new_ei.astype(element.dtype), mode="drop")
        element = element.at[wj].set(new_ej.astype(element.dtype), mode="drop")
        charge = charge.at[wi].set(new_qi.astype(charge.dtype), mode="drop")
        charge = charge.at[wj].set(new_qj.astype(charge.dtype), mode="drop")

        # 7. zero-out: each gathered ar row's new value accounts for ALL
        # accepted events, so duplicate rows across candidates scatter
        # identical values (last-writer-wins is safe)
        kill_all = (
            (ar_b[:, :, None] == jnp.where(w, rows_b, -1)[None, None, :])
            | (ar_b[:, :, None] == jnp.where(w, jrow_b, -1)[None, None, :])
        ).any(axis=2)[:, :, None] | (
            (ar_nbr[:, :, :, None] == jnp.where(w, isel_b, -1)[None, None, None, :])
            | (ar_nbr[:, :, :, None] == jnp.where(w, jsel_b, -1)[None, None, None, :])
        ).any(axis=3)
        new_rows = jnp.where(kill_all, 0.0, ar_P)
        ar_flat = ar_b.reshape(-1)
        P = P.at[ar_flat].set(new_rows.reshape(-1, nn))
        R = R.at[ar_flat].set(jnp.sum(new_rows, axis=2).reshape(-1))

        # event_time: the terminating gap (committed semantics return only
        # the loop-breaking waiting time); in shifted mode rescale by S in
        # log space
        last_gap = gaps[jnp.where(has_big, first_big, B - 1)].astype(
            jnp.float64
        )
        if ln_S is None:
            t_out = last_gap
        else:
            t_out = jnp.exp(
                jnp.log(jnp.maximum(last_gap, 1e-300)) - ln_S
            )
        done_now = has_big | ~ok
        ev_time = jnp.where(done_now, jnp.where(ok, t_out, jnp.inf), ev_time)
        return (
            element, charge, P, R, key,
            ev_time,
            (n_ev + jnp.where(ok, n_acc, 0)).astype(jnp.int32),
            n_b + jnp.asarray(1, jnp.int32),
            done_now,
            n_cc + jnp.where(ok & cut_conflict, 1, 0).astype(jnp.int32),
            n_cm + jnp.where(ok & cut_mass, 1, 0).astype(jnp.int32),
        )

    init = (
        element, charge, P, R0, key,
        jnp.asarray(0.0, P.dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (element, charge, P, R, key, ev_time, n_ev, n_b, done, n_cc, n_cm) = (
        lax.while_loop(cond, body, init)
    )
    return BatchedLoopResult(
        element=element, charge=charge, P=P, event_time=ev_time,
        n_events=n_ev, n_batches=n_b, done=done,
        n_cut_conflict=n_cc, n_cut_mass=n_cm,
    )


def run_event_loop_native(
    element: jnp.ndarray,
    charge: jnp.ndarray,
    P: jnp.ndarray,
    etype: jnp.ndarray,
    neigh_idx: jnp.ndarray,
    key: jax.Array,            # jax PRNG key (threefry)
    freq: float,
    max_events: int = 1 << 20,
    act_idx: jnp.ndarray = None,
    abs2act: jnp.ndarray = None,
    ln_S=None,
) -> EventLoopResult:
    """Production-mode residence-time loop: draws come from JAX's on-device
    threefry stream instead of the replicated host mt19937 buffer. Same
    algorithm, different (non-reference) random stream — use for production
    runs where bit-parity with the reference is not required. Never
    exhausts a buffer; `draws_used` reports 2*events for accounting.
    ``act_idx``/``abs2act`` enable the compacted-row layout (see
    run_event_loop)."""
    n, nn = P.shape
    inv_freq = 1.0 / freq
    R0 = jnp.sum(P, axis=1)

    def cond(c):
        element, charge, P, R, key, cnt, ev_time, n_ev = c
        return (ev_time < inv_freq) & (n_ev < max_events)

    def body(c):
        element, charge, P, R, key, cnt, ev_time, n_ev = c
        key, k_sel, k_time = jax.random.split(key, 3)

        r_sel = jax.random.uniform(k_sel, dtype=P.dtype)
        site, prev, total, target = _select_site(R, r_sel, n)
        row = P[site]
        slot = jnp.clip(
            jnp.searchsorted(jnp.cumsum(row), target - prev, side="right").astype(jnp.int32),
            0, nn - 1,
        )
        isel = site if act_idx is None else act_idx[site].clip(0)
        jsel = neigh_idx[site, slot].clip(0)
        ety = etype[site, slot]
        ok = total > 0.0

        element2, charge2 = _execute_event(element, charge, isel, jsel, ety)
        element = jnp.where(ok, element2, element)
        charge = jnp.where(ok, charge2, charge)

        if act_idx is None:
            jrow = jsel
            ar = jnp.concatenate(
                [jnp.stack([site, jrow]), neigh_idx[site].clip(0), neigh_idx[jrow].clip(0)]
            )
        else:
            jrow = abs2act[jsel]
            ar = jnp.concatenate(
                [
                    jnp.stack([site, jrow]),
                    abs2act[neigh_idx[site].clip(0)],
                    abs2act[neigh_idx[jrow].clip(0)],
                ]
            )
        rows_P = P[ar]
        rows_nbr = neigh_idx[ar]
        kill = (
            (ar == site)[:, None] | (ar == jrow)[:, None]
            | (rows_nbr == isel) | (rows_nbr == jsel)
        )
        new_rows = jnp.where(kill & ok, 0.0, rows_P)
        P = P.at[ar].set(new_rows)
        R = R.at[ar].set(jnp.sum(new_rows, axis=1))

        r_time = jax.random.uniform(k_time, dtype=P.dtype)
        if ln_S is None:
            ev_time = jnp.where(ok, -jnp.log1p(-r_time) / total, jnp.inf)
        else:
            ev_time = jnp.where(
                ok,
                jnp.exp(jnp.log(-jnp.log1p(-r_time)) - jnp.log(
                    jnp.where(ok, total, 1.0)) - ln_S),
                jnp.inf,
            )
        dcnt = jnp.where(ok, 2, 0).astype(jnp.int32)
        return (element, charge, P, R, key, cnt + dcnt, ev_time, n_ev + dcnt // 2)

    init = (
        element, charge, P, R0, key,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, P.dtype),
        jnp.asarray(0, jnp.int32),
    )
    element, charge, P, R, key, cnt, ev_time, n_ev = lax.while_loop(cond, body, init)
    return EventLoopResult(
        element=element, charge=charge, P=P, event_time=ev_time,
        n_events=n_ev, draws_used=cnt, done=ev_time >= inv_freq,
    )
