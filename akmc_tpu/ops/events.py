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

    # the carry layout must be IDENTICAL to the historical one when the
    # incremental flag is off (an extra empty leaf changes the compiled
    # program's hash and invalidates warm-start caches)
    def unpack(c):
        if incremental_select:
            return c
        element, charge, P, R, cnt, ev_time, n_ev = c
        return element, charge, P, R, None, cnt, ev_time, n_ev

    def pack(element, charge, P, R, bs, cnt, ev_time, n_ev):
        if incremental_select:
            return (element, charge, P, R, bs, cnt, ev_time, n_ev)
        return (element, charge, P, R, cnt, ev_time, n_ev)

    def cond(c):
        return (c[-2] < inv_freq) & (c[-3] + 2 <= buf_len)

    def body(c):
        element, charge, P, R, bs, cnt, ev_time, n_ev = unpack(c)

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

        element2, charge2 = _execute_event(element, charge, isel, jsel, ety)
        element = jnp.where(ok, element2, element)
        charge = jnp.where(ok, charge2, charge)

        # zero out all pairs involving isel or jsel — only rows that can
        # contain such pairs: the two sites' rows + their neighbors' rows
        if act_idx is None:
            jrow = jsel
            ar = jnp.concatenate(
                [jnp.stack([site, jrow]), neigh_idx[site].clip(0), neigh_idx[jrow].clip(0)]
            )                                               # (2 + 2*NN,) rows
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
            element, charge, P, R, bs, cnt + dcnt, ev_time, n_ev + dcnt // 2
        )

    bs0 = (
        jnp.sum(R0.reshape(n // _BLK, _BLK), axis=1)
        if incremental_select
        else None
    )
    init = pack(
        element,
        charge,
        P,
        R0,
        bs0,
        jnp.asarray(0, jnp.int32),
        t0,
        jnp.asarray(0, jnp.int32),
    )
    element, charge, P, R, _, cnt, ev_time, n_ev = unpack(
        lax.while_loop(cond, body, init)
    )
    return EventLoopResult(
        element=element,
        charge=charge,
        P=P,
        event_time=ev_time,
        n_events=n_ev,
        draws_used=cnt,
        done=ev_time >= inv_freq,
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
