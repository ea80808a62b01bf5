"""The flagship model: a valence-change-memory (VCM) RRAM device.

Couples the physics modules into ONE jitted KMC superstep over static-shape
arrays (reference equivalent: the module sequence in kmc_main.cpp:328-540):

    charge update -> K-system CG potential -> pairwise Coulomb potential
    -> potential sum -> fused residence-time KMC event loop

plus the per-bias-point CB-edge solve and the (optional) current/power and
heating updates.

``VCMModel`` owns all static tables (adjacency, distances, layer/metal
masks) as device arrays; ``DeviceState`` carries the dynamic fields.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from akmc_tpu.config import KMCParameters
from akmc_tpu.lattice import ELEM, Lattice, metal_mask
from akmc_tpu.ops.charge import update_charge_compact
from akmc_tpu.ops.events import (
    build_event_table,
    run_event_loop,
    run_event_loop_native,
)
from akmc_tpu.ops.pairwise import (
    pairwise_potential,
    pairwise_potential_table,
    pairwise_potential_tiled,
)
from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.solvers.current import (
    CurrentTables,
    build_current_tables,
    build_power_band,
    build_power_system,
    solve_power,
)
from akmc_tpu.solvers.banded import (
    BandedK,
    BandMeta,
    KCarry,
    build_banded_k,
    solve_potential_boundary_banded,
    solve_potential_boundary_banded_carry,
)
from akmc_tpu.solvers.dia import (
    DiaK,
    build_dia_k,
    solve_potential_boundary_dia,
)
from akmc_tpu.solvers.heat import (
    build_local_heat,
    update_temperature_global,
    update_temperature_local_ref,
)
from akmc_tpu.solvers.poisson import solve_cb_edge, solve_potential_boundary
from akmc_tpu.state import DeviceState


class StaticTables(NamedTuple):
    """All static per-structure device arrays. Passed as a jit ARGUMENT (not
    closed over) so they enter the executable as parameters, not baked
    constants."""

    pos: jax.Array
    neigh_idx: jax.Array
    k_neigh_idx: jax.Array
    any_metal_nbr: jax.Array
    metal_edge: jax.Array
    metal_or_edge: jax.Array
    is_metal: jax.Array
    E_gen: jax.Array
    E_rec: jax.Array
    E_Vdiff: jax.Array
    E_Odiff: jax.Array
    # event tables compacted to the statically event-capable rows (element
    # in {DEFECT, O, V, Od} — closed under all event types). Padded to a
    # multiple of 256 rows; pad rows are all-zero-rate (-1 entries), so
    # selection stays bit-identical to the full N-row layout.
    act_idx: jax.Array            # (NA,) absolute site per row, -1 padded
    abs2act: jax.Array            # (N,) site -> row; inactive -> last pad row
    act_neigh: jax.Array          # (NA, NN) absolute neighbor ids, -1 padded
    act_self2: jax.Array          # (NA, NN)
    act_layer: jax.Array          # (NA, NN)
    act_zero_rows: jax.Array      # (NA, 1+NN) static zero-out row set per
    #                               row: {r} ∪ abs2act[neigh[r]] — the event
    #                               loop's per-event touched rows as 2 row
    #                               gathers instead of index algebra
    # optional static pairwise interaction table (pairwise.PairTable,
    # full-f64 or hi/lo-f32 storage): present when NP*N*8 fits
    # pair_table_budget — collapses the per-superstep pairwise solve to a
    # row gather + multiply-reduce. None => tiled or on-the-fly path.
    pair_gT: Optional[object] = None
    # optional spatial tiling (pairwise.PairTiling) for structures too large
    # for the table: per-tile charged-candidate compaction shrinks the erfc
    # plane ~30x (measured 5.96 s -> sub-second at crossbar scale).
    pair_tiling: Optional[object] = None


class FieldsResult(NamedTuple):
    charge: jax.Array
    potential_boundary: jax.Array
    potential_sum: jax.Array        # pairwise + boundary (site_potential_charge)
    P: jax.Array                    # (N, NN) event rates
    etype: jax.Array                # (N, NN) event types
    cg_iterations: jax.Array
    q_overflow: jax.Array           # charged count exceeded the static cap
    v_overflow: jax.Array           # vacancy count exceeded the static cap
    ln_S: object = None             # log rate scale (shifted-exponent mode)
    c_overflow: object = None       # tiled pairwise: per-tile candidate cap
    #                                 exceeded (None on non-tiled paths)
    k_carry: object = None          # banded.KCarry when the warm K solve
    #                                 runs with a carried residual (the
    #                                 k_carry_residual batched path)


@dataclass
class VCMModel:
    """Static data + jitted physics for one device structure."""

    params: KMCParameters
    lat: Lattice
    qmax: Optional[int] = None      # static cap on charged-site count
    vmax: Optional[int] = None      # static cap on vacancy count (tunnel block)
    ne_max: int = 2048              # energy-integration steps cap (WKB)
    use_banded_k: bool = True       # banded-MXU K operator when band is narrow
    use_dia_k: bool = True          # gather-free DIA K operator when the
                                    # structure's offset set is small
    act_pad: int = 256              # event-table row padding multiple (set to
                                    # a multiple of the mesh size for even
                                    # sharding; pad rows are zero-rate, so the
                                    # event sequence is identical regardless)
    rate_normalize: bool = False    # shifted-exponent rate table + log-space
                                    # waiting times: REQUIRED on TPU for
                                    # high-bias/large devices (this runtime's
                                    # emulated f64 has the f32 exponent range
                                    # — PERF_NOTES round 2); off by default
                                    # for bit-parity with the reference
    pair_table_budget: float = 8e9  # bytes: build the static (NP, N)
                                    # pairwise interaction table when it fits
                                    # (5 nm: 6.0 GB; crossbar scales exceed
                                    # it and fall back to the tiled or
                                    # on-the-fly path). 0 disables.
    pair_cand_cap: Optional[int] = None  # tiled path: static per-tile
                                    # charged-candidate cap; None = sized
                                    # from the initial charged population
                                    # with 1.5x headroom; doubled +
                                    # re-jitted on overflow (diag slot 7)
    pair_tiling_min_n: int = 100_000  # build the tiling when the table
                                    # does not fit and N is at least this
    event_select_incremental: bool = False  # carry the event-selection
                                    # block sums, refreshing only touched
                                    # blocks per event (same event sequence
                                    # and elements exactly; waiting times
                                    # to 1 ulp — the two variants compile
                                    # to different XLA reduction trees.
                                    # Ablation flag — PERF_NOTES round 3)
    dia_stacked: bool = False       # DIA CG matvec as stacked (D, N)
                                    # planes: ~5x fewer HLO ops/iteration,
                                    # last-ulp reassociation (production
                                    # flag — solvers/dia.py)
    dia_pallas: bool = False        # DIA CG matvec as ONE Pallas kernel
                                    # (two-f32 exact-sum chains, offset
                                    # clustering — ops/pallas_dia.py).
                                    # Production flag; precedence over
                                    # dia_stacked. ~dd-f64 accuracy class
                                    # (tests/test_pallas_dia.py)
    pair_f32: bool = False          # tiled-pairwise plane in f32
                                    # (production crossbar option; the
                                    # f64 path is the default and the
                                    # oracle — ops/pairwise.py docstring
                                    # for the error model)
    wkb_f32: bool = False           # evaluate the W_tt/W_ct/W_cc WKB
                                    # transmission planes in f32 (native
                                    # VPU exp instead of the emulated
                                    # dd-f64 chain — the dominant
                                    # full-physics build cost; ~1e-7
                                    # relative coefficient error, Kahan-
                                    # compensated integral; f64 stays the
                                    # default and the oracle path)
    power_rtol_scale: float = 1.0   # default multiplier on the power-CG
                                    # relative tolerance. I_macro is an
                                    # extraction-rail cancellation: where
                                    # it sits below kappa*rtol resolution
                                    # (sub-nA low-bias points) the solve
                                    # must run tighter to make the I-V
                                    # operator-invariant (probe_lowbias_iv;
                                    # reference pins the same points with
                                    # an absolute residual,
                                    # current_solver_gpu.cu:1455-1456).
                                    # Passed TRACED per dispatch, so the
                                    # driver's auto policy changes it
                                    # without recompiling.
    k_carry_residual: bool = False  # batched path: rebase the warm K
                                    # solve's initial residual from the
                                    # previous superstep's final residual
                                    # + exact ΔA·x0 terms (band static) —
                                    # a converged warm start then runs
                                    # ZERO band matvecs. Fresh re-sync on
                                    # every batch entry. Banded operator
                                    # only; trajectory equality with the
                                    # fresh path is asserted per-deck
                                    # (test_superstep_toy, golden gate)

    tables: StaticTables = field(init=False)

    def __post_init__(self):
        p, lat = self.params, self.lat
        f64 = jnp.float64

        # AKMC_INIT_TIMING=1: stderr phase report of the constructor —
        # the [model] phase was 649 s at the 2.41M-site crossbar
        # (probe_crossbar_timing r03) and needs attribution, not guesses
        import os as _os
        import sys as _sys
        import time as _time_mod

        _marks = [_time_mod.perf_counter()]

        def _mark(name):
            if _os.environ.get("AKMC_INIT_TIMING"):
                now = _time_mod.perf_counter()
                print(f"[init] {name}: {now - _marks[0]:.1f}s",
                      file=_sys.stderr)
                _marks[0] = now

        pos_np = np.stack([lat.x, lat.y, lat.z], axis=1)

        is_metal_np = metal_mask(lat.element0, p.metals)
        jc = np.clip(lat.neigh_idx, 0, None)
        kjc = np.clip(lat.k_neigh_idx, 0, None)

        # adaptive static caps: sized from the initial defect population with
        # headroom; the superstep doubles them (one recompile) on overflow
        n_v = int((lat.element0 == int(ELEM.VACANCY)).sum())
        n_od = int((lat.element0 == int(ELEM.OXYGEN_DEFECT)).sum())
        if self.qmax is None:
            self.qmax = _round_up(max(256, int(1.5 * (n_v + n_od))), 256)
        if self.vmax is None:
            self.vmax = _round_up(max(256, int(1.5 * n_v) + 1), 256)

        # static active-row compaction for the event tables: the species set
        # {DEFECT, O, VACANCY, OXYGEN_DEFECT} is invariant under every event
        # type (execute_event, kmc_events.cu:292-331), so rows outside it
        # carry exactly-zero rates forever and can be dropped up front.
        active_np = np.isin(
            lat.element0,
            [int(ELEM.DEFECT), int(ELEM.O), int(ELEM.VACANCY), int(ELEM.OXYGEN_DEFECT)],
        )
        act = np.nonzero(active_np)[0].astype(np.int32)

        # neighbor distances for event self-interaction terms: non-PBC
        # Euclidean, in meters (kmc_events.cu:154-155); padded slots -> 1.0.
        # Positions are static, so the screened-Coulomb self-interaction
        # kernel v_solve(d, 2) is precomputed once (no runtime erfc) — and
        # ONLY on the active rows: the full-N (N, NN, 3) broadcast measured
        # 85 s of host time at the 1.08M-slot crossbar (AKMC_INIT_TIMING),
        # and nothing reads the full-N table at runtime (the event engine
        # consumes the act-compacted act_self2).
        from scipy.special import erfc as _erfc

        jc_act = jc[act]
        d = np.sqrt(
            ((pos_np[act][:, None, :] - pos_np[jc_act]) ** 2).sum(-1)
        ) * 1e-10
        d[lat.neigh_idx[act] < 0] = 1.0
        # the shipped 5nm structure contains coincident sites (5759/5760 at
        # identical coordinates): d=0 between metal sites. The reference
        # would produce inf there but never reads it (metals host no events);
        # zero it to keep NaNs out of masked arithmetic.
        coincident = d == 0.0
        d[coincident] = 1.0
        q_e = 1.60217663e-19
        self2_act = 2.0 * _erfc(d / (p.sigma * np.sqrt(2.0))) * p.k * q_e / d
        self2_act[coincident] = 0.0

        _mark("self2 nn kernel (act rows)")
        na_pad = _round_up(len(act) + 1, self.act_pad)   # >= 1 all-zero pad row
        act_idx_np = np.full(na_pad, -1, np.int32)
        act_idx_np[: len(act)] = act
        abs2act_np = np.full(lat.N, na_pad - 1, np.int32)
        abs2act_np[act] = np.arange(len(act), dtype=np.int32)

        # COLUMN compaction on top of the row compaction: only active-active
        # pairs can ever carry a nonzero rate (event types pair {d,O,V,Od}
    # species only, kmc_events.cu:160-218), so inactive-neighbor slots
        # are dropped (stable order). Removed slots held EXACT zeros, so
        # row sums, within-row cumsums and therefore the selected event
        # sequence are bit-identical; only the gather volume shrinks
        # (5 nm: (19969, 52) -> (19969, 40), ~33% less rate-build traffic).
        nbr_act_rows = lat.neigh_idx[act]
        keep = (nbr_act_rows >= 0) & active_np[np.clip(nbr_act_rows, 0, None)]
        nn_act = max(8, int(keep.sum(axis=1).max()))
        order_cols = np.argsort(~keep, axis=1, kind="stable")[:, :nn_act]
        act_neigh_np = np.full((na_pad, nn_act), -1, np.int32)
        act_neigh_np[: len(act)] = np.where(
            np.take_along_axis(keep, order_cols, axis=1),
            np.take_along_axis(nbr_act_rows, order_cols, axis=1),
            -1,
        )
        act_self2_np = np.zeros((na_pad, nn_act), self2_act.dtype)
        act_self2_np[: len(act)] = np.take_along_axis(self2_act, order_cols, axis=1)
        act_layer_np = np.zeros((na_pad, nn_act), np.int32)
        act_layer_np[: len(act)] = np.take_along_axis(
            lat.site_layer[jc_act], order_cols, axis=1
        )
        act_zero_np = np.concatenate(
            [
                np.arange(na_pad, dtype=np.int32)[:, None],
                abs2act_np[np.clip(act_neigh_np, 0, None)],
            ],
            axis=1,
        ).astype(np.int32)

        _mark("active-row/column compaction")
        self.tables = StaticTables(
            pos=jnp.asarray(pos_np, f64),
            neigh_idx=jnp.asarray(lat.neigh_idx, jnp.int32),
            k_neigh_idx=jnp.asarray(lat.k_neigh_idx, jnp.int32),
            any_metal_nbr=jnp.asarray(
                (is_metal_np[jc] & (lat.neigh_idx >= 0)).any(axis=1)
            ),
            metal_edge=jnp.asarray(
                is_metal_np[:, None] & is_metal_np[kjc] & (lat.k_neigh_idx >= 0)
            ),
            metal_or_edge=jnp.asarray(
                (is_metal_np[:, None] | is_metal_np[kjc]) & (lat.k_neigh_idx >= 0)
            ),
            is_metal=jnp.asarray(is_metal_np),
            E_gen=jnp.asarray([l.E_gen_0 for l in p.layers], f64),
            E_rec=jnp.asarray([l.E_rec_1 for l in p.layers], f64),
            E_Vdiff=jnp.asarray([l.E_diff_2 for l in p.layers], f64),
            E_Odiff=jnp.asarray([l.E_diff_3 for l in p.layers], f64),
            act_idx=jnp.asarray(act_idx_np),
            abs2act=jnp.asarray(abs2act_np),
            act_neigh=jnp.asarray(act_neigh_np),
            act_self2=jnp.asarray(act_self2_np, f64),
            act_layer=jnp.asarray(act_layer_np),
            act_zero_rows=jnp.asarray(act_zero_np),
        )

        _mark("StaticTables device puts")
        # static pairwise interaction table (charged sites are always drawn
        # from the active class, so its rows cover every possible source);
        # abs2act doubles as the site -> table-row map. On the dd-emulated
        # TPU runtime the table is stored as hi/lo f32 planes: an f64
        # parameter of that size costs 2x extra in-program copies from the
        # X64-rewrite pass (measured OOM, PERF_NOTES).
        if 0 < len(act) * lat.N * 8 <= self.pair_table_budget:
            from akmc_tpu.ops.pairwise import build_pair_table

            self.tables = self.tables._replace(
                pair_gT=build_pair_table(
                    self.tables.pos, jnp.asarray(act), p.cutoff_radius,
                    p.sigma, p.k,
                    split_f32=jax.default_backend()
                    not in ("cpu", "gpu", "cuda", "rocm"),
                )
            )
        self._pair_r_tile = None
        if self.tables.pair_gT is None and lat.N >= self.pair_tiling_min_n:
            from akmc_tpu.ops.pairwise import build_pair_tiling

            # tile edge = cutoff/2: measured sweep at 1.08M slots — plane
            # 0.52G pairs vs 0.95G at edge=cutoff, with a (T, qmax) top_k
            # still small (52M)
            tiling, r_tile = build_pair_tiling(
                pos_np, p.cutoff_radius, tile_edge=p.cutoff_radius / 2.0
            )
            self.tables = self.tables._replace(pair_tiling=tiling)
            self._pair_r_tile = r_tile
            if self.pair_cand_cap is None:
                # size the per-tile candidate cap from the initial charged
                # population (superset: every V/Od before charge rules)
                q0 = np.isin(
                    lat.element0,
                    [int(ELEM.VACANCY), int(ELEM.OXYGEN_DEFECT)],
                )
                cen = np.asarray(tiling.tile_center)
                reach = p.cutoff_radius + r_tile
                if q0.any():
                    # The exact (T, Q) distance count is O(T*Q) — ~3.5e10
                    # scalar ops (~25 min) on the 1-core host at the 2.41M-
                    # site crossbar (measured: the [build]->[dia] gap of
                    # BENCH_crossbar_full40nm_r03). Instead: an O(T + Q)
                    # coarse-grid 27-cell count upper-bounds every tile's
                    # in-reach population, and the exact count runs only on
                    # the densest tiles. Chunked (not one broadcast): the
                    # full (T, Q, 3) f64 transient is tens of GB of host
                    # RAM (round-2 advisor). A pathological under-estimate
                    # is caught by the runtime c-cap overflow growth path.
                    pos_q = pos_np[q0]
                    mx = _max_in_reach_count(cen, pos_q, reach)
                else:
                    mx = 0
                self.pair_cand_cap = _round_up(max(64, int(1.5 * mx)), 64)
        if self.pair_cand_cap is None:
            self.pair_cand_cap = 256

        _mark("pair table/tiling + cand-cap sizer")
        self.dia: Optional[DiaK] = None
        self.dia_meta = None
        self.banded: Optional[BandedK] = None
        self.band_meta: Optional[BandMeta] = None
        if self.use_dia_k:
            if getattr(lat, "grid", None) is not None and not lat.pbc:
                # analytic, bit-identical to build_dia_k on grid-native
                # structures (equality-pinned); skips the (N, KNN)
                # edge-list scan — 57 s at the 4.5M-slot crossbar
                from akmc_tpu.models.crossbar import grid_dia_k

                n_yz_g, nx_g, a_g = lat.grid
                built = grid_dia_k(
                    n_yz_g, nx_g, a_g, p.nn_dist, is_metal_np,
                    p.num_atoms_first_layer, p.high_G, p.low_G, pos_np,
                    null_mask=lat.element0 == int(ELEM.NULL_ELEMENT),
                )
            else:
                built = build_dia_k(
                    pos_np, lat.k_neigh_idx, is_metal_np,
                    p.num_atoms_first_layer, p.high_G, p.low_G,
                )
            if built is not None:
                self.dia, self.dia_meta = built
        self.dia_plan = None
        if self.dia is not None and self.dia_pallas:
            from akmc_tpu.ops.pallas_dia import plan_dia_pallas

            self.dia_plan = plan_dia_pallas(
                self.dia_meta.offsets, int(self.dia.diags.shape[1]),
                interpret=jax.default_backend() == "cpu",
            )
            if self.dia_plan is None:
                import warnings

                warnings.warn(
                    "dia_pallas: offset geometry unsuitable (too many "
                    "groups) — falling back to the XLA matvec"
                )
        if self.dia is None and self.use_banded_k:
            built = build_banded_k(
                pos_np, lat.k_neigh_idx, is_metal_np, lat.element0,
                p.num_atoms_first_layer, p.high_G, p.low_G,
            )
            if built is not None:
                self.banded, self.band_meta = built
        _mark("K operator build (DIA/banded)")

        self._fields_jit = jax.jit(self._fields)
        self._events_jit = jax.jit(self._events)
        self._step_jit = jax.jit(self._step_fused)
        self._cb_jit = jax.jit(self._cb)
        self._power_jit = None          # built lazily (full-physics mode)
        self._step_full_jit = None      # fused full-physics superstep
        self._multi_jits = {}
        self._current_tables = None
        self._power_band = None         # static atom band for solve_power
        self._power_band_meta = None
        self._power_band_built = False
        self._local_heat = None
        self.mesh = None                # set by parallel.mesh.shard_model

    # ------------------------------------------------------------------
    def _build_rates(self, t: StaticTables, element, charge, pot_sum, T_bg):
        """(P, etype, ln_S) — ln_S is None in bit-parity mode. One home for
        the rate_normalize dispatch (was copy-pasted across three paths)."""
        p = self.params
        if self.rate_normalize:
            return build_event_table(
                element, charge, pot_sum, T_bg,
                t.act_neigh, t.act_self2, t.act_layer,
                t.E_gen, t.E_rec, t.E_Vdiff, t.E_Odiff,
                p.freq, p.sigma, p.k, rows=t.act_idx, normalize=True,
            )
        P, etype = build_event_table(
            element, charge, pot_sum, T_bg,
            t.act_neigh, t.act_self2, t.act_layer,
            t.E_gen, t.E_rec, t.E_Vdiff, t.E_Odiff,
            p.freq, p.sigma, p.k, rows=t.act_idx,
        )
        return P, etype, None

    def _solve_boundary(self, kop, t, element, charge, pb_prev, Vd):
        """K-system solve through whichever operator the structure supports:
        DIA (gather-free offset diagonals, grid-native structures), banded
        MXU blocks (narrow-band disordered structures like the 5 nm device),
        or the matrix-free ELL gather fallback. The operator object is a jit
        ARGUMENT (pytree), so dispatch here is trace-time static."""
        p = self.params
        if isinstance(kop, DiaK):
            return solve_potential_boundary_dia(
                kop, self.dia_meta, element, charge, pb_prev, Vd,
                p.high_G, p.low_G, p.num_atoms_first_layer, p.nn_dist,
                jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), self.vmax,
                stacked=self.dia_stacked,
                pallas_plan=self.dia_plan,
            )
        if isinstance(kop, BandedK):
            return solve_potential_boundary_banded(
                kop, self.band_meta, element, charge, pb_prev, Vd,
                p.high_G, p.low_G, p.num_atoms_first_layer, p.nn_dist,
                jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), self.vmax,
            )
        return solve_potential_boundary(
            element, charge, pb_prev, t.k_neigh_idx, t.metal_edge, Vd,
            p.high_G, p.low_G, p.num_atoms_first_layer,
        )

    def _fields(self, t: StaticTables, kop, element, charge,
                potential_boundary_prev, T_bg, Vd, k_carry=None):
        p = self.params
        # every vmax-capped compaction (charge update, cvac correction,
        # current-solver tunnel block) silently truncates via
        # jnp.nonzero(size=vmax); vacancy generation grows the population, so
        # detect overflow here and let the host grow vmax + re-trace (the
        # cvac/tunnel subsets are subsets of the vacancy set, so one flag
        # covers all three)
        v_overflow = jnp.sum(element == int(ELEM.VACANCY)) > self.vmax
        charge = update_charge_compact(
            element, charge, t.neigh_idx, t.any_metal_nbr, self.vmax
        )

        # k_carry: None = plain solve; "init" = carry solver, fresh entry
        # matvec (batch start); KCarry = incremental rebase. Trace-time
        # dispatch — a runtime lax.cond lowered to executing BOTH branches
        # inside the scan (measured slower than no carry at all).
        k_carry_new = None
        if k_carry is not None and isinstance(kop, BandedK):
            pot_boundary, cg, k_carry_new = solve_potential_boundary_banded_carry(
                kop, self.band_meta, element, charge,
                potential_boundary_prev, Vd,
                p.high_G, p.low_G, p.num_atoms_first_layer, p.nn_dist,
                jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), self.vmax,
                carry=None if k_carry == "init" else k_carry,
            )
        else:
            pot_boundary, cg = self._solve_boundary(
                kop, t, element, charge, potential_boundary_prev, Vd
            )

        c_overflow = jnp.asarray(False)
        if t.pair_gT is not None:
            pot_pair, q_overflow = pairwise_potential_table(
                t.pair_gT, t.abs2act, charge, self.qmax
            )
        elif t.pair_tiling is not None:
            pot_pair, q_overflow, c_overflow = pairwise_potential_tiled(
                t.pair_tiling, self._pair_r_tile, t.pos, charge,
                p.cutoff_radius, p.sigma, p.k, qmax=self.qmax,
                cand_cap=self.pair_cand_cap, plane_f32=self.pair_f32,
            )
        else:
            pot_pair, q_overflow = pairwise_potential(
                t.pos, charge, p.cutoff_radius, p.sigma, p.k, qmax=self.qmax
            )
        pot_sum = pot_pair + pot_boundary   # sum_AB_into_A (psg.cu:1130-1151)

        P, etype, ln_S = self._build_rates(t, element, charge, pot_sum, T_bg)
        return FieldsResult(
            charge=charge,
            potential_boundary=pot_boundary,
            potential_sum=pot_sum,
            P=P,
            etype=etype,
            cg_iterations=cg.iterations,
            q_overflow=q_overflow,
            v_overflow=v_overflow,
            ln_S=ln_S,
            c_overflow=c_overflow,
            k_carry=k_carry_new,
        )

    @staticmethod
    def _pack_diag(fr, res):
        # ONE scalar-diagnostics vector: each separate host pull costs a
        # full dispatch round trip on tunneled runtimes
        c_ovf = (
            jnp.asarray(0.0)
            if fr.c_overflow is None
            else fr.c_overflow.astype(jnp.float64)
        )
        return jnp.stack([
            res.n_events.astype(jnp.float64),
            res.draws_used.astype(jnp.float64),
            res.event_time,
            res.done.astype(jnp.float64),
            fr.cg_iterations.astype(jnp.float64),
            fr.q_overflow.astype(jnp.float64),
            fr.v_overflow.astype(jnp.float64),
            c_ovf,
        ])

    def _loop_arrays(self, t: StaticTables, P, etype):
        """Event-loop inputs, replicated under a mesh: the residence-time
        loop is serial and replicated-redundant (the reference equivalent:
        every rank applies the Bcast'd event, kmc_events.cu:494-504), so the
        rate table is all-gathered ONCE here instead of per loop iteration
        (GSPMD would otherwise gather the full table at every dynamic row
        access inside the while body — measured in round 2's collective
        inspection)."""
        if self.mesh is None:
            return P, etype, t.act_neigh, t.act_zero_rows
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())

        def c(a):
            return jax.lax.with_sharding_constraint(a, rep)

        return c(P), c(etype), c(t.act_neigh), c(t.act_zero_rows)

    def _step_fused(self, t: StaticTables, kop, element, charge, pb_prev,
                    T_bg, Vd, rand_buf):
        """fields + event loop in ONE executable (one dispatch per superstep)."""
        fr = self._fields(t, kop, element, charge, pb_prev, T_bg, Vd)
        P, etype, neigh, zrows = self._loop_arrays(t, fr.P, fr.etype)
        res = run_event_loop(
            element, fr.charge, P, etype, neigh, rand_buf,
            self.params.freq, act_idx=t.act_idx, abs2act=t.abs2act,
            ln_S=fr.ln_S,
            incremental_select=self.event_select_incremental,
            zero_rows=zrows,
        )
        return fr, res, self._pack_diag(fr, res)

    @property
    def kop(self):
        """The active K operator (DIA > banded > ELL fallback)."""
        return self.dia if self.dia is not None else self.banded

    def _invalidate_jits(self):
        """Rebuild EVERY executable that baked qmax/vmax (or, after
        shard_model, the mesh) in at trace time. Must cover the batched
        (`_multi_jits`), native-RNG, events-only and module-timed caches too:
        a stale entry would re-detect overflow forever (round-1 advisor
        finding) or keep pre-mesh shardings."""
        self._fields_jit = jax.jit(self._fields)
        self._step_jit = jax.jit(self._step_fused)
        self._events_jit = jax.jit(self._events)
        self._multi_jits = {}
        for attr in ("_step_native_jit", "_events_only_jit", "_timed_jits",
                     "_step_batched_jits"):
            if hasattr(self, attr):
                delattr(self, attr)
        self._power_jit = None       # build_power_system bakes vmax in too
        self._step_full_jit = None

    def _run_step(self, state: DeviceState, Vd, rand_buf):
        return self._step_jit(
            self.tables, self.kop, state.element, state.charge,
            state.potential_boundary, state.T_bg, Vd, rand_buf,
        )

    def _run_fields(self, state: DeviceState, Vd):
        return self._fields_jit(
            self.tables, self.kop, state.element, state.charge,
            state.potential_boundary, state.T_bg, Vd,
        )

    def _events(self, t: StaticTables, element, charge, P, etype, rand_buf,
                event_time_in, ln_S=None):
        P, etype, neigh, zrows = self._loop_arrays(t, P, etype)
        return run_event_loop(
            element,
            charge,
            P,
            etype,
            neigh,
            rand_buf,
            self.params.freq,
            event_time_in=event_time_in,
            act_idx=t.act_idx,
            abs2act=t.abs2act,
            ln_S=ln_S,
            incremental_select=self.event_select_incremental,
            zero_rows=zrows,
        )

    def _cb(self, t: StaticTables, element, charge, cb_prev, Vd):
        p = self.params
        return solve_cb_edge(
            element,
            charge,
            cb_prev,
            t.k_neigh_idx,
            t.metal_or_edge,
            Vd,
            p.high_G * 100000,
            p.low_G,
            p.num_atoms_first_layer,
        )

    # ------------------------------------------------------------------
    def superstep(
        self,
        state: DeviceState,
        Vd: float,
        stream,
        rand_chunk: int = 8192,
    ) -> Tuple[DeviceState, dict]:
        """One full KMC superstep. Returns the new state and a stats dict.

        The field solves + rate build run as one jitted graph; the event loop
        runs as a second jitted while_loop, re-entered only if the
        (host-precomputed, replicated-stream) rand buffer runs out.
        ``stream`` is a ``rng.BufferedStream`` over the KMC mt19937 stream.
        """
        p = self.params
        rand_buf = jnp.asarray(stream.peek(rand_chunk))
        fr, res, diag = self._run_step(state, Vd, rand_buf)
        d = np.asarray(diag)

        while d[5] != 0.0 or d[6] != 0.0 or d[7] != 0.0:
            # grow the exceeded cap(s) and re-trace (rare: the defect
            # population roughly doubled since model construction)
            if d[5] != 0.0:
                self.qmax *= 2
            if d[6] != 0.0:
                self.vmax *= 2
            if d[7] != 0.0:                 # tiled-pairwise candidate cap
                self.pair_cand_cap *= 2
            self._invalidate_jits()
            fr, res, diag = self._run_step(state, Vd, rand_buf)
            d = np.asarray(diag)

        element, charge, P = res.element, res.charge, res.P
        n_events = int(d[0])
        ev_time = res.event_time
        done = bool(d[3] != 0.0)
        cg_iters = int(d[4])
        ev_time_f = float(d[2])
        stream.advance(int(d[1]))
        while not done:
            # rare: the rand buffer ran out mid-superstep — continue with
            # events-only chunks
            rand_buf = jnp.asarray(stream.peek(rand_chunk))
            res = self._events_jit(
                self.tables, element, charge, P, fr.etype, rand_buf, ev_time,
                fr.ln_S,
            )
            element, charge, P = res.element, res.charge, res.P
            n_events += int(res.n_events)
            ev_time = res.event_time
            ev_time_f = float(res.event_time)
            done = bool(res.done)
            stream.advance(int(res.draws_used))

        new_state = state._replace(
            element=element,
            charge=charge,
            potential_boundary=fr.potential_boundary,
            potential_charge=fr.potential_sum,
            kmc_time=state.kmc_time + ev_time,
        )
        stats = {
            "n_events": n_events,
            "event_time": ev_time_f,   # already pulled in the diag batch
            "cg_iterations": cg_iters,
        }
        return new_state, stats

    # ------------------------------------------------------------------
    # multi-superstep batching: k supersteps per dispatch
    # ------------------------------------------------------------------
    def _step_multi(self, t: StaticTables, bk, element, charge, pb_prev,
                    T_bg, Vd, rand_buf, k: int, chunk: int):
        """k supersteps in ONE executable (lax.scan over the fused step).

        Each superstep's rand window starts exactly where the previous
        superstep stopped consuming (a running cursor into one shared
        buffer), so the executed trajectory is IDENTICAL to k sequential
        ``superstep`` calls with ``rand_chunk=chunk``. Amortizes the
        per-dispatch overhead of tunneled/remote runtimes over k steps.
        """
        from jax import lax

        # carried-residual warm K solve (banded operator only): the FIRST
        # step runs unrolled with a fresh entry matvec (re-sync); steps
        # 2..k scan with the incremental rebase unconditionally. A runtime
        # lax.cond inside the scan lowered to executing BOTH branches on
        # this TPU compiler (measured 21.6 -> 23.1 ms — worse than no
        # carry), so the dispatch is trace-time.
        use_kc = self.k_carry_residual and isinstance(bk, BandedK)

        def step_once(element, charge, pb, cursor, kc_mode):
            window = lax.dynamic_slice(rand_buf, (cursor,), (chunk,))
            fr = self._fields(t, bk, element, charge, pb, T_bg, Vd,
                              k_carry=kc_mode)
            P, etype, neigh, zrows = self._loop_arrays(t, fr.P, fr.etype)
            res = run_event_loop(
                element, fr.charge, P, etype, neigh, window,
                self.params.freq, act_idx=t.act_idx, abs2act=t.abs2act,
                ln_S=fr.ln_S,
                incremental_select=self.event_select_incremental,
                zero_rows=zrows,
            )
            return fr, res

        if not use_kc:
            def body(carry, _):
                element, charge, pb, pc, cursor = carry
                fr, res = step_once(element, charge, pb, cursor, None)
                carry = (
                    res.element, res.charge, fr.potential_boundary,
                    fr.potential_sum, cursor + res.draws_used,
                )
                return carry, self._pack_diag(fr, res)

            init = (element, charge, pb_prev,
                    jnp.zeros_like(pb_prev), jnp.asarray(0, jnp.int32))
            (element, charge, pb, pc, cursor), diag = lax.scan(
                body, init, None, length=k
            )
            return element, charge, pb, pc, diag

        fr, res = step_once(element, charge, pb_prev,
                            jnp.asarray(0, jnp.int32), "init")
        diag0 = self._pack_diag(fr, res)

        def body(carry, _):
            element, charge, pb, pc, cursor, kc = carry
            fr, res = step_once(element, charge, pb, cursor, kc)
            carry = (
                res.element, res.charge, fr.potential_boundary,
                fr.potential_sum, cursor + res.draws_used, fr.k_carry,
            )
            return carry, self._pack_diag(fr, res)

        init = (res.element, res.charge, fr.potential_boundary,
                fr.potential_sum, res.draws_used, fr.k_carry)
        out, diag = lax.scan(body, init, None, length=k - 1)
        element, charge, pb, pc = out[0], out[1], out[2], out[3]
        diag = jnp.concatenate([diag0[None], diag], axis=0)
        return element, charge, pb, pc, diag

    def superstep_multi(
        self, state: DeviceState, Vd: float, stream, k: int,
        rand_chunk: int = 2048,
    ) -> Tuple[DeviceState, list]:
        """Run k supersteps in one dispatch. Equals k sequential
        ``superstep(..., rand_chunk=rand_chunk)`` calls event-for-event.

        Fallback: if any step exhausted its rand window or overflowed the
        charged-site cap (both rare), the whole batch is DISCARDED (the
        stream was only peeked, states are immutable) and replayed through
        the single-step path.
        """
        key = (k, rand_chunk)
        if key not in self._multi_jits:
            # on TPU the f64 cumsum inside the scan body lowers to a u32
            # reduce-window whose scoped allocation exceeds the default
            # 16M vmem budget — raise it for this executable only (the
            # flag is TPU-compiler-specific; CPU/GPU reject it)
            opts = (
                {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
                if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
                else {}
            )
            self._multi_jits[key] = jax.jit(
                self._step_multi, static_argnums=(8, 9), **opts
            )
        rand_buf = jnp.asarray(stream.peek(k * rand_chunk))
        element, charge, pb, pc, diag = self._multi_jits[key](
            self.tables, self.kop, state.element, state.charge,
            state.potential_boundary, state.T_bg, Vd, rand_buf, k, rand_chunk,
        )
        d = np.asarray(diag)                     # (k, 8) one batched pull
        if (
            (d[:, 3] == 0.0).any()
            or (d[:, 5] != 0.0).any()
            or (d[:, 6] != 0.0).any()
            or (d[:, 7] != 0.0).any()
        ):
            # exhaustion/overflow inside the batch: replay sequentially (the
            # single-step path grows the caps and invalidates this cache)
            stats_list = []
            for _ in range(k):
                state, stats = self.superstep(state, Vd, stream, rand_chunk)
                stats_list.append(stats)
            return state, stats_list
        stream.advance(int(d[:, 1].sum()))
        new_state = state._replace(
            element=element,
            charge=charge,
            potential_boundary=pb,
            potential_charge=pc,
            kmc_time=state.kmc_time + d[:, 2].sum(),
        )
        stats_list = [
            {
                "n_events": int(d[i, 0]),
                "event_time": float(d[i, 2]),
                "cg_iterations": int(d[i, 4]),
            }
            for i in range(k)
        ]
        return new_state, stats_list

    # ------------------------------------------------------------------
    # module-timed superstep: separate dispatches per physics module so the
    # reference's per-module timing lines (MPI_Wtime brackets,
    # kmc_main.cpp:452-530) carry MEASURED values instead of the fused
    # superstep total. Identical math and order to the fused path; slower
    # (one dispatch per module) — opt in via driver --module-timing.
    # ------------------------------------------------------------------
    def superstep_timed(
        self, state: DeviceState, Vd: float, stream, rand_chunk: int = 8192
    ) -> Tuple[DeviceState, dict]:
        import time as _time

        p = self.params
        if not hasattr(self, "_timed_jits"):
            def _phase_charge(t, element, charge):
                v_ovf = jnp.sum(element == int(ELEM.VACANCY)) > self.vmax
                return (
                    update_charge_compact(
                        element, charge, t.neigh_idx, t.any_metal_nbr, self.vmax
                    ),
                    v_ovf,
                )

            def _phase_boundary(t, kop, element, charge, pb_prev, Vd):
                pot, cg = self._solve_boundary(kop, t, element, charge, pb_prev, Vd)
                return pot, cg.iterations

            def _phase_pair(t, charge):
                c_ovf = jnp.asarray(False)
                if t.pair_gT is not None:
                    pot_pair, q_ovf = pairwise_potential_table(
                        t.pair_gT, t.abs2act, charge, self.qmax
                    )
                elif t.pair_tiling is not None:
                    pot_pair, q_ovf, c_ovf = pairwise_potential_tiled(
                        t.pair_tiling, self._pair_r_tile, t.pos, charge,
                        p.cutoff_radius, p.sigma, p.k, qmax=self.qmax,
                        cand_cap=self.pair_cand_cap, plane_f32=self.pair_f32,
                    )
                else:
                    pot_pair, q_ovf = pairwise_potential(
                        t.pos, charge, p.cutoff_radius, p.sigma, p.k,
                        qmax=self.qmax,
                    )
                return pot_pair, q_ovf, c_ovf

            def _phase_rates(t, element, charge, pot_pair, pot_b, T_bg):
                pot_sum = pot_pair + pot_b
                P, etype, ln_S = self._build_rates(
                    t, element, charge, pot_sum, T_bg
                )
                return pot_sum, P, etype, ln_S

            self._timed_jits = {
                "charge": jax.jit(_phase_charge),
                "boundary": jax.jit(_phase_boundary),
                "pair": jax.jit(_phase_pair),
                "rates": jax.jit(_phase_rates),
            }

        from akmc_tpu.runtime.profiling import pull_sync

        def timed(fn, *args):
            # pull_sync: block_until_ready returns early on remote buffers,
            # which would leak each phase's tail into the next phase's time
            t0 = _time.perf_counter()
            out = pull_sync(fn(*args))
            return out, _time.perf_counter() - t0

        t = self.tables
        (charge, v_ovf), dt_charge = timed(
            self._timed_jits["charge"], t, state.element, state.charge
        )
        if bool(np.asarray(v_ovf)):
            self.vmax *= 2
            self._invalidate_jits()        # also drops _timed_jits
            return self.superstep_timed(state, Vd, stream, rand_chunk)
        (pot_b, cg_iters), dt_boundary = timed(
            self._timed_jits["boundary"], t, self.kop, state.element,
            charge, state.potential_boundary, Vd,
        )
        (pot_pair, q_ovf, c_ovf), dt_pair = timed(
            self._timed_jits["pair"], t, charge
        )
        (pot_sum, P, etype, ln_S), dt_rates = timed(
            self._timed_jits["rates"], t, state.element, charge, pot_pair,
            pot_b, state.T_bg,
        )
        if bool(np.asarray(q_ovf)) or bool(np.asarray(c_ovf)):
            if bool(np.asarray(q_ovf)):
                self.qmax *= 2
            if bool(np.asarray(c_ovf)):
                self.pair_cand_cap *= 2
            self._invalidate_jits()        # also drops _timed_jits
            return self.superstep_timed(state, Vd, stream, rand_chunk)

        t0 = _time.perf_counter()
        rand_buf = jnp.asarray(stream.peek(rand_chunk))
        res = self._events_jit(
            t, state.element, charge, P, etype, rand_buf,
            jnp.asarray(0.0, jnp.float64), ln_S,
        )
        element, charge2, Pm = res.element, res.charge, res.P
        n_events = int(res.n_events)
        ev_time = res.event_time
        stream.advance(int(res.draws_used))
        while not bool(res.done):
            rand_buf = jnp.asarray(stream.peek(rand_chunk))
            res = self._events_jit(
                t, element, charge2, Pm, etype, rand_buf, ev_time, ln_S
            )
            element, charge2, Pm = res.element, res.charge, res.P
            n_events += int(res.n_events)
            ev_time = res.event_time
            stream.advance(int(res.draws_used))
        jax.block_until_ready(element)
        dt_events = _time.perf_counter() - t0

        new_state = state._replace(
            element=element, charge=charge2,
            potential_boundary=pot_b, potential_charge=pot_sum,
            kmc_time=state.kmc_time + ev_time,
        )
        stats = {
            "n_events": n_events,
            "event_time": float(ev_time),
            "cg_iterations": int(cg_iters),
            "t_charge": dt_charge,
            "t_boundary": dt_boundary,
            "t_pairwise": dt_pair,
            "t_rates": dt_rates,
            "t_events": dt_events,
        }
        return new_state, stats

    def superstep_native(
        self, state: DeviceState, Vd: float, key
    ) -> Tuple[DeviceState, dict, jax.Array]:
        """Production-mode superstep: on-device threefry draws (no host RNG
        buffers, not reference-stream parity). Returns (state, stats, key')."""
        if not hasattr(self, "_step_native_jit"):
            def _step_native(t, bk, element, charge, pb_prev, T_bg, Vd, key):
                fr = self._fields(t, bk, element, charge, pb_prev, T_bg, Vd)
                key, sub = jax.random.split(key)
                P, etype, neigh, zrows = self._loop_arrays(t, fr.P, fr.etype)
                res = run_event_loop_native(
                    element, fr.charge, P, etype, neigh, sub,
                    self.params.freq, act_idx=t.act_idx, abs2act=t.abs2act,
                    ln_S=fr.ln_S,
                )
                diag = self._pack_diag(fr, res)
                return fr, res, diag, key

            self._step_native_jit = jax.jit(_step_native, static_argnums=())
        key_in = key
        fr, res, diag, key = self._step_native_jit(
            self.tables, self.kop, state.element, state.charge,
            state.potential_boundary, state.T_bg, Vd, key,
        )
        d = np.asarray(diag)
        if d[5] != 0.0 or d[6] != 0.0 or d[7] != 0.0:
            # grow cap(s) + re-trace; the input key deterministically
            # reproduces the same draws on replay
            if d[5] != 0.0:
                self.qmax *= 2
            if d[6] != 0.0:
                self.vmax *= 2
            if d[7] != 0.0:
                self.pair_cand_cap *= 2
            self._invalidate_jits()
            return self.superstep_native(state, Vd, key_in)
        new_state = state._replace(
            element=res.element,
            charge=res.charge,
            potential_boundary=fr.potential_boundary,
            potential_charge=fr.potential_sum,
            kmc_time=state.kmc_time + res.event_time,
        )
        stats = {
            "n_events": int(d[0]),
            "event_time": float(d[2]),
            "cg_iterations": int(d[4]),
        }
        return new_state, stats, key

    def superstep_native_batched(
        self, state: DeviceState, Vd: float, key, batch: int = 64,
        mass_eps: float = 1e-3, clock_f32: bool = False,
        pb_prev2=None, k_extrap: float = 0.0,
    ) -> Tuple[DeviceState, dict, jax.Array]:
        """Production superstep with the multi-event batched loop
        (ops/events.py::run_event_loop_batched): per-batch exponential-race
        candidate selection + exact prefix-conflict cutting replaces the
        serial one-event-per-iteration while loop — the crossbar-scale
        event-throughput path (the serial loop's ~0.39 ms/event op-count
        overhead dominated the full-40nm superstep, PERF_NOTES round 3).
        Own threefry stream (not reference-stream parity).

        ``mass_eps`` (the killed-mass staleness bound — the one knob that
        trades gap-law exactness for batch amortization) is a TRACED
        argument: changing it reuses the compiled executable.

        ``pb_prev2``/``k_extrap``: optional linear-extrapolation warm start
        for the K solve — x0 = pb + k_extrap*(pb - pb_prev2). The CG
        stopping rule is RELATIVE TO ||b|| (jacobi_cg), so a closer x0
        directly cuts iterations when the boundary potential drifts
        smoothly across supersteps (filament forming/dissolving); the
        converged tolerance — hence the physics — is unchanged. Both are
        traced (k_extrap=0.0 reproduces the plain warm start bit-exactly
        with the same executable). Callers carry pb_prev2 = the PREVIOUS
        superstep's potential_boundary."""
        key_in = key
        pb2 = (state.potential_boundary if pb_prev2 is None else pb_prev2)
        fr, res, diag, key = self._get_batched_jit(batch, clock_f32)(
            self.tables, self.kop, state.element, state.charge,
            state.potential_boundary, pb2, state.T_bg, Vd,
            float(mass_eps), float(k_extrap), key,
        )
        d = np.asarray(diag)
        if d[5] != 0.0 or d[6] != 0.0 or d[7] != 0.0:
            if d[5] != 0.0:
                self.qmax *= 2
            if d[6] != 0.0:
                self.vmax *= 2
            if d[7] != 0.0:
                self.pair_cand_cap *= 2
            self._invalidate_jits()
            return self.superstep_native_batched(
                state, Vd, key_in, batch, mass_eps, clock_f32,
                pb_prev2=pb_prev2, k_extrap=k_extrap,
            )
        new_state = state._replace(
            element=res.element,
            charge=res.charge,
            potential_boundary=fr.potential_boundary,
            potential_charge=fr.potential_sum,
            kmc_time=state.kmc_time + res.event_time,
        )
        stats = {
            "n_events": int(d[0]),
            "n_batches": int(d[1]),
            "event_time": float(d[2]),
            "cg_iterations": int(d[4]),
            "n_cut_conflict": int(d[8]),
            "n_cut_mass": int(d[9]),
        }
        return new_state, stats, key

    def _get_batched_jit(self, batch: int, clock_f32: bool = False):
        """Build (and cache) the batched-loop executable for a batch size —
        shared by superstep_native_batched and warmup so the AOT warmup
        compiles the SAME executable the run uses. mass_eps is a traced
        argument, not part of the key."""
        from akmc_tpu.ops.events import run_event_loop_batched

        if not hasattr(self, "_step_batched_jits"):
            self._step_batched_jits = {}
        bkey = (batch, clock_f32)
        if bkey not in self._step_batched_jits:
            def _step_b(t, bk, element, charge, pb_prev, pb_prev2, T_bg, Vd,
                        mass_eps, k_extrap, key):
                # linear-extrapolation warm start for the K solve (see
                # superstep_native_batched docstring); k_extrap=0.0 is the
                # plain warm start, bit-exactly (pb + 0*delta == pb)
                pb_ws = pb_prev + k_extrap * (pb_prev - pb_prev2)
                fr = self._fields(t, bk, element, charge, pb_ws, T_bg, Vd)
                key, sub = jax.random.split(key)
                P, etype, neigh, zrows = self._loop_arrays(t, fr.P, fr.etype)
                res = run_event_loop_batched(
                    element, fr.charge, P, etype, neigh, sub,
                    self.params.freq, batch=batch, act_idx=t.act_idx,
                    abs2act=t.abs2act, ln_S=fr.ln_S, mass_eps=mass_eps,
                    clock_f32=clock_f32,
                )
                c_ovf = (
                    jnp.asarray(0.0)
                    if fr.c_overflow is None
                    else fr.c_overflow.astype(jnp.float64)
                )
                diag = jnp.stack([
                    res.n_events.astype(jnp.float64),
                    res.n_batches.astype(jnp.float64),
                    res.event_time,
                    res.done.astype(jnp.float64),
                    fr.cg_iterations.astype(jnp.float64),
                    fr.q_overflow.astype(jnp.float64),
                    fr.v_overflow.astype(jnp.float64),
                    c_ovf,
                    res.n_cut_conflict.astype(jnp.float64),
                    res.n_cut_mass.astype(jnp.float64),
                ])
                return fr, res, diag, key

            self._step_batched_jits[bkey] = jax.jit(_step_b)
        return self._step_batched_jits[bkey]

    def warmup(
        self, state: DeviceState, Vd: float, rand_chunk: int = 8192,
        steps_per_dispatch: Optional[int] = None,
        multi_rand_chunk: int = 2048,
        full_physics: bool = False,
        batched: int = 0,
        batched_mass_eps: float = 1e-3,
        batched_clock_f32: bool = False,
    ) -> dict:
        """AOT-compile every executable the run will need BEFORE the first
        superstep (jit.lower().compile()), so the first superstep pays only
        the cold zero-guess CG — not the 3-16 min remote compile — and the
        event-loop re-entry executable (historically a SECOND surprise
        compile at crossbar step 0, BENCH_crossbar_full40nm_r02) is built
        up front. The persistent compilation cache
        (jax_compilation_cache_dir) stores the artifacts, so later
        processes at the same scale skip compilation entirely.

        Argument avals must match the real call sites exactly (python
        float Vd = weak-typed scalar; ln_S None vs array changes the
        trace), or the warmup compiles a different executable.
        Returns per-executable compile seconds."""
        import time as _time

        t = self.tables
        rb = jnp.zeros(rand_chunk, jnp.float64)
        out = {}

        def _c(name, lowerable):
            t0 = _time.perf_counter()
            lowerable.compile()
            out[name] = _time.perf_counter() - t0

        _c("fused_step", self._step_jit.lower(
            t, self.kop, state.element, state.charge,
            state.potential_boundary, state.T_bg, float(Vd), rb,
        ))
        na, nn = t.act_neigh.shape
        P = jnp.zeros((na, nn), jnp.float64)
        ety = jnp.zeros((na, nn), jnp.int32)
        ln_S = jnp.asarray(0.0, jnp.float64) if self.rate_normalize else None
        _c("events_resume", self._events_jit.lower(
            t, state.element, state.charge, P, ety, rb,
            jnp.asarray(0.0, jnp.float64), ln_S,
        ))
        if steps_per_dispatch and steps_per_dispatch > 1:
            key = (steps_per_dispatch, multi_rand_chunk)
            if key not in self._multi_jits:
                opts = (
                    {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
                    if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
                    else {}
                )
                self._multi_jits[key] = jax.jit(
                    self._step_multi, static_argnums=(8, 9), **opts
                )
            _c(f"multi_k{steps_per_dispatch}", self._multi_jits[key].lower(
                t, self.kop, state.element, state.charge,
                state.potential_boundary, state.T_bg, float(Vd),
                jnp.zeros(steps_per_dispatch * multi_rand_chunk, jnp.float64),
                steps_per_dispatch, multi_rand_chunk,
            ))
        if batched:
            _c(f"batched_B{batched}", self._get_batched_jit(
                batched, batched_clock_f32).lower(
                t, self.kop, state.element, state.charge,
                state.potential_boundary, state.potential_boundary,
                state.T_bg, float(Vd),
                float(batched_mass_eps), 0.0, jax.random.PRNGKey(0),
            ))
        if full_physics:
            if self._step_full_jit is None:
                self._step_full_jit = jax.jit(self._step_full)
            ct = self.current_tables
            lh = self.local_heat if self.params.solve_heating_local else None
            m_prev = jnp.zeros(self.n_atom + 2, jnp.float64)
            _c("full_step", self._step_full_jit.lower(
                t, self.kop, ct, self.power_band, lh, state.element,
                state.charge, state.potential_boundary, state.cb_edge,
                state.temperature, state.T_bg, m_prev, float(Vd), rb,
                jnp.asarray(self.power_rtol_scale, jnp.float64),
            ))
            _c("cb_edge", self._cb_jit.lower(
                t, state.element, state.charge, state.cb_edge, float(Vd)
            ))
        return out

    def update_cb_edge(self, state: DeviceState, Vd: float) -> DeviceState:
        cb, _ = self._cb_jit(self.tables, state.element, state.charge, state.cb_edge, Vd)
        return state._replace(cb_edge=cb)

    # ------------------------------------------------------------------
    # full-physics current/power/heating (dead code in the committed
    # reference — comm_T nulled, KMC_comm.h:243; dense spec:
    # update_power_gpu, current_solver_gpu.cu:2382-2573)
    # ------------------------------------------------------------------
    @property
    def current_tables(self) -> CurrentTables:
        if self._current_tables is None:
            p, lat = self.params, self.lat
            pos = np.stack([lat.x, lat.y, lat.z], axis=1)
            # rail-tie counts are ATOM counts (create_X indexes the atom
            # array, current_solver_gpu.cu:2296-2306). On reference
            # structures the first/last layer contains only metal atoms, so
            # the slot count equals the atom count; grid-native crossbar
            # slices interleave NULL placeholder slots — count the physical
            # atoms in the first/last slot slice instead.
            L = p.num_atoms_first_layer
            not_atom = (int(ELEM.DEFECT), int(ELEM.OXYGEN_DEFECT),
                        int(ELEM.NULL_ELEMENT))
            n_inj = int((~np.isin(lat.element0[:L], not_atom)).sum())
            n_ext = int((~np.isin(lat.element0[-L:], not_atom)).sum())
            self._current_tables = build_current_tables(
                lat.element0, pos, np.asarray(p.lattice), bool(p.pbc),
                p.nn_dist, p.metals, n_inj,
                n_ext, p.num_layers_contact,
                max_num_neighbors=p.max_num_neighbors,
            )
        return self._current_tables

    @property
    def n_atom(self) -> int:
        return int(self.current_tables.atom_ind.shape[0])

    @property
    def power_band(self):
        """Static int8 band over the atom adjacency for solve_power's
        neighbor part (build_power_band; None -> gather fallback). The
        band is a jit ARGUMENT everywhere (closed-over arrays bake in as
        constants — ~600x slower per call through the tunnel)."""
        if not self._power_band_built:
            p = self.params
            ct = self.current_tables
            built = build_power_band(
                ct,
                np.asarray(self.lat.element0)[np.asarray(ct.atom_ind)],
                p.high_G * 100000, p.low_G,
            )
            if built is not None:
                self._power_band, self._power_band_meta = built
            self._power_band_built = True
        return self._power_band

    def _shard_power_system(self, ps):
        """Row-shard the tunnel blocks + neighbor plane over the mesh: the
        TPU-native equivalent of the reference's row-distributed sparse T
        submatrix (assemble_sparse_T_submatrix, initialize_sparsity_T.cu:
        707-946 — distributed "over rows, NOT over blocks"). The per-pair
        WKB evaluation (incl. the energy-integration loop, the dominant
        full-physics cost) shards with the constrained outputs; the CG
        matvec reduces row-local products, dots psum over ICI."""
        if self.mesh is None:
            return ps
        from jax.sharding import NamedSharding, PartitionSpec

        row = NamedSharding(self.mesh, PartitionSpec("sites"))

        def c(a):
            return jax.lax.with_sharding_constraint(a, row)

        return ps._replace(
            G_nbr=c(ps.G_nbr), W_tt=c(ps.W_tt), W_ct=c(ps.W_ct),
            W_cc=c(ps.W_cc),
        )

    def _power(self, ct, pband, element, charge, cb_edge, m_prev, Vd,
               rtol_scale=1.0):
        p = self.params
        high_G = p.high_G * 100000          # kmc_main.cpp:294-302 constants
        loop_G = p.high_G * 10000000
        G0 = 2 * 3.8612e-5 * 1e-5
        tol = p.q * 0.01
        alpha = 1.0                          # kmc_main.cpp:302 (p.alpha unused)

        atom_elem = element[ct.atom_ind]
        atom_charge = charge[ct.atom_ind]
        atom_cb = cb_edge[ct.atom_ind]
        ps = build_power_system(
            ct, atom_elem, atom_charge, atom_cb,
            jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), p.nn_dist,
            high_G, p.low_G, loop_G, tol, p.m_e, p.V0,
            vmax=self.vmax, ne_max=self.ne_max, wkb_f32=self.wkb_f32,
        )
        ps = self._shard_power_system(ps)
        cvac = (atom_elem == int(ELEM.VACANCY)) & (atom_charge == 0)
        I_macro, atom_power, m, iters = solve_power(
            ct, ps, Vd, high_G, loop_G, G0, alpha, m_prev, atom_elem,
            band=pband,
            band_meta=self._power_band_meta if pband is not None else None,
            cvac=cvac, nn_dist=p.nn_dist,
            lattice=jnp.asarray(np.asarray(p.lattice)), pbc=bool(p.pbc),
            rtol_scale=rtol_scale,
        )
        n = element.shape[0]
        site_power = jnp.zeros(n, atom_power.dtype).at[ct.atom_ind].set(atom_power)
        v_overflow = jnp.sum(atom_elem == int(ELEM.VACANCY)) > self.vmax
        return I_macro, site_power, m, iters, v_overflow

    def update_power(self, state: DeviceState, Vd: float, m_prev=None,
                     rtol_scale=None):
        """Current + dissipated power (+ returns I_macro [A])."""
        ct = self.current_tables
        if self._power_jit is None:
            self._power_jit = jax.jit(self._power)
        if m_prev is None:
            m_prev = jnp.zeros(self.n_atom + 2, jnp.float64)
        if rtol_scale is None:
            rtol_scale = self.power_rtol_scale
        I_macro, site_power, m, iters, ovf = self._power_jit(
            ct, self.power_band, state.element, state.charge, state.cb_edge,
            m_prev, Vd, jnp.asarray(rtol_scale, jnp.float64),
        )
        if bool(ovf):
            self.vmax *= 2
            self._invalidate_jits()
            return self.update_power(state, Vd, m_prev, rtol_scale)
        return state._replace(power=site_power), float(I_macro), m, int(iters)

    def update_temperature(self, state: DeviceState, event_time: float) -> DeviceState:
        """Heat update (Device::updateTemperature, heat_solver.cpp:55-97):
        global capacitative model if ``solve_heating_global``, else the local
        Laplacian model if ``solve_heating_local`` (steady-state/transient
        dispatch per the reference's rule), applied over ``event_time``."""
        p = self.params
        if p.solve_heating_global:
            T_new = update_temperature_global(
                state.T_bg, state.power, event_time, p.dissipation_constant,
                p.background_temp, p.t_ox, p.A, p.c_p,
            )
            return state._replace(T_bg=T_new)
        if p.solve_heating_local:
            temp = update_temperature_local_ref(
                self.local_heat, state.temperature, state.power, state.element,
                jnp.asarray(event_time, jnp.float64), p.delta_t, p.tau,
                p.background_temp, p.nn_dist * 1e-10,
                p.k_th_interface, p.k_th_vacancies,
            )
            return state._replace(temperature=temp)
        return state

    @property
    def local_heat(self):
        if getattr(self, "_local_heat", None) is None:
            self._local_heat = build_local_heat(
                self.lat.neigh_idx, self.lat.N, self.params.num_atoms_contact
            )
        return self._local_heat

    # ------------------------------------------------------------------
    # deck-flag variants: fields-only (perturb_structure=0) and events-only
    # (solve_potential=0) supersteps — kmc_main.cpp gates each module
    # ------------------------------------------------------------------
    def fields_only(self, state: DeviceState, Vd: float) -> Tuple[DeviceState, dict]:
        """Charge + potentials without the KMC event step
        (perturb_structure=0: "turn off to only calculate fields",
        kmc_main.cpp:484 / parameters.txt comment)."""
        fr = self._run_fields(state, Vd)
        c_ovf = fr.c_overflow is not None and bool(np.asarray(fr.c_overflow))
        if bool(np.asarray(fr.q_overflow)) or bool(np.asarray(fr.v_overflow)) or c_ovf:
            if bool(np.asarray(fr.q_overflow)):
                self.qmax *= 2
            if bool(np.asarray(fr.v_overflow)):
                self.vmax *= 2
            if c_ovf:
                self.pair_cand_cap *= 2
            self._invalidate_jits()
            return self.fields_only(state, Vd)
        new_state = state._replace(
            charge=fr.charge,
            potential_boundary=fr.potential_boundary,
            potential_charge=fr.potential_sum,
        )
        return new_state, {"cg_iterations": int(fr.cg_iterations)}

    def superstep_events_only(
        self, state: DeviceState, stream, rand_chunk: int = 8192
    ) -> Tuple[DeviceState, dict]:
        """KMC events on the CURRENT (stale) potential and charge
        (solve_potential=0 decks: the reference's event step reads whatever
        site_potential_charge holds, kmc_main.cpp:491)."""
        p = self.params
        if not hasattr(self, "_events_only_jit"):
            def _ev(t, element, charge, potential, T_bg, rand_buf):
                P, etype, ln_S = self._build_rates(
                    t, element, charge, potential, T_bg
                )
                P, etype, neigh, zrows = self._loop_arrays(t, P, etype)
                res = run_event_loop(
                    element, charge, P, etype, neigh, rand_buf,
                    p.freq, act_idx=t.act_idx, abs2act=t.abs2act, ln_S=ln_S,
                    incremental_select=self.event_select_incremental,
                    zero_rows=zrows,
                )
                return res, etype, ln_S

            self._events_only_jit = jax.jit(_ev)
        rand_buf = jnp.asarray(stream.peek(rand_chunk))
        res, etype, ln_S = self._events_only_jit(
            self.tables, state.element, state.charge, state.potential_charge,
            state.T_bg, rand_buf,
        )
        n_events = int(res.n_events)
        ev_time = res.event_time
        stream.advance(int(res.draws_used))
        element, charge, P = res.element, res.charge, res.P
        while not bool(res.done):
            rand_buf = jnp.asarray(stream.peek(rand_chunk))
            res = self._events_jit(
                self.tables, element, charge, P, etype, rand_buf, ev_time, ln_S
            )
            element, charge, P = res.element, res.charge, res.P
            n_events += int(res.n_events)
            ev_time = res.event_time
            stream.advance(int(res.draws_used))
        new_state = state._replace(
            element=element, charge=charge,
            kmc_time=state.kmc_time + ev_time,
        )
        return new_state, {
            "n_events": n_events,
            "event_time": float(ev_time),
            "cg_iterations": 0,
        }

    # ------------------------------------------------------------------
    # fused full-physics superstep: charge -> K potential -> pairwise ->
    # sum -> CURRENT/POWER -> events -> heat, ONE executable.
    #
    # Module order matches the reference superstep (kmc_main.cpp:334-508):
    # the power solve runs AFTER the potential updates and BEFORE events, so
    # it sees THIS superstep's charge and potentials; the heat update needs
    # this superstep's event time, so it closes the step (the committed
    # reference never calls Device::updateTemperature — comm_T nulled — its
    # signature updateTemperature(..., step_time), Device.h:198, fixes the
    # post-events position).
    # ------------------------------------------------------------------
    def _pack_diag_full(self, fr, res, pw_ovf, I_macro, T_new, pow_iters, P_tot):
        c_ovf = (
            jnp.asarray(0.0)
            if fr.c_overflow is None
            else fr.c_overflow.astype(jnp.float64)
        )
        return jnp.concatenate([
            self._pack_diag(fr, res)[:6],
            jnp.stack([
                (fr.v_overflow | pw_ovf).astype(jnp.float64),
                I_macro,
                T_new,
                pow_iters.astype(jnp.float64),
                P_tot,
                c_ovf,
            ]),
        ])

    def _step_full(self, t: StaticTables, bk, ct, pband, lh, element, charge,
                   pb_prev, cb_edge, temperature, T_bg, m_prev, Vd, rand_buf,
                   rtol_scale=1.0):
        # lh: LocalHeat tables as a jit ARGUMENT (closed-over arrays bake in
        # as constants — ~600x slower per call through the tunnel,
        # PERF_NOTES); None when solve_heating_local is off
        p = self.params
        fr = self._fields(t, bk, element, charge, pb_prev, T_bg, Vd)

        # current + dissipated power on THIS superstep's charge
        I_macro, site_power, m_new, pow_iters, pw_ovf = self._power(
            ct, pband, element, fr.charge, cb_edge, m_prev, Vd, rtol_scale
        )

        P_rep, etype_rep, neigh_rep, zrows_rep = self._loop_arrays(t, fr.P, fr.etype)
        res = run_event_loop(
            element, fr.charge, P_rep, etype_rep, neigh_rep, rand_buf,
            p.freq, act_idx=t.act_idx, abs2act=t.abs2act, ln_S=fr.ln_S,
            incremental_select=self.event_select_incremental,
            zero_rows=zrows_rep,
        )

        T_new = T_bg
        temp_new = temperature
        if p.solve_heating_global:
            T_new = update_temperature_global(
                T_bg, site_power, res.event_time, p.dissipation_constant,
                p.background_temp, p.t_ox, p.A, p.c_p,
            )
        elif p.solve_heating_local:
            temp_new = update_temperature_local_ref(
                lh, temperature, site_power, res.element,
                res.event_time, p.delta_t, p.tau, p.background_temp,
                p.nn_dist * 1e-10, p.k_th_interface, p.k_th_vacancies,
            )
        P_tot = jnp.sum(site_power)
        diag = self._pack_diag_full(
            fr, res, pw_ovf, I_macro, T_new, pow_iters, P_tot
        )
        return fr, res, site_power, m_new, T_new, temp_new, diag

    def superstep_full(
        self, state: DeviceState, Vd: float, stream, m_prev=None,
        rand_chunk: int = 8192, rtol_scale=None,
    ) -> Tuple[DeviceState, dict, jax.Array]:
        """Full-physics superstep in one dispatch. Returns
        (state', stats, m_warm) where m_warm warm-starts the next power
        solve (virtual potentials, unscaled). ``rtol_scale`` (traced;
        default ``self.power_rtol_scale``) tightens the power CG where
        I_macro is below kappa*rtol resolution."""
        if self._step_full_jit is None:
            self._step_full_jit = jax.jit(self._step_full)
        if m_prev is None:
            m_prev = jnp.zeros(self.n_atom + 2, jnp.float64)
        if rtol_scale is None:
            rtol_scale = self.power_rtol_scale
        rand_buf = jnp.asarray(stream.peek(rand_chunk))
        ct = self.current_tables
        lh = self.local_heat if self.params.solve_heating_local else None
        fr, res, site_power, m_new, T_new, temp_new, diag = self._step_full_jit(
            self.tables, self.kop, ct, self.power_band, lh, state.element,
            state.charge, state.potential_boundary, state.cb_edge,
            state.temperature, state.T_bg, m_prev, Vd, rand_buf,
            jnp.asarray(rtol_scale, jnp.float64),
        )
        d = np.asarray(diag)
        if d[5] != 0.0 or d[6] != 0.0 or d[11] != 0.0:
            if d[5] != 0.0:
                self.qmax *= 2
            if d[6] != 0.0:
                self.vmax *= 2
            if d[11] != 0.0:
                self.pair_cand_cap *= 2
            self._invalidate_jits()
            return self.superstep_full(state, Vd, stream, m_prev, rand_chunk,
                                       rtol_scale)
        if d[3] == 0.0:
            # rand buffer exhausted mid-events: the fused step already folded
            # heat over a partial event time — discard (stream was peeked
            # only) and replay with a larger buffer
            return self.superstep_full(state, Vd, stream, m_prev,
                                       rand_chunk * 4, rtol_scale)
        stream.advance(int(d[1]))
        new_state = state._replace(
            element=res.element,
            charge=res.charge,
            potential_boundary=fr.potential_boundary,
            potential_charge=fr.potential_sum,
            power=site_power,
            temperature=temp_new,
            T_bg=T_new,
            kmc_time=state.kmc_time + res.event_time,
        )
        stats = {
            "n_events": int(d[0]),
            "event_time": float(d[2]),
            "cg_iterations": int(d[4]),
            "I_macro": float(d[7]),
            "T_bg": float(d[8]),
            "power_cg_iterations": int(d[9]),
            "P_tot": float(d[10]),
        }
        return new_state, stats, m_new

    def superstep_full_multi(
        self, state: DeviceState, Vd: float, stream, k: int, m_prev=None,
        rand_chunk: int = 2048, rtol_scale=None,
    ):
        """k full-physics supersteps per dispatch (lax.scan over _step_full,
        shared rand cursor — same batching contract as superstep_multi)."""
        from jax import lax

        if m_prev is None:
            m_prev = jnp.zeros(self.n_atom + 2, jnp.float64)
        if rtol_scale is None:
            rtol_scale = self.power_rtol_scale
        key = ("full", k, rand_chunk)
        if key not in self._multi_jits:
            def _multi(t, bk, ct, pband, lh, element, charge, pb, cb, temp,
                       T_bg, m, Vd, rand_buf, rtol_scale):
                def body(carry, _):
                    element, charge, pb, pc, temp, T_bg, m, cursor = carry
                    window = lax.dynamic_slice(rand_buf, (cursor,), (rand_chunk,))
                    fr, res, site_power, m, T_bg, temp, diag = self._step_full(
                        t, bk, ct, pband, lh, element, charge, pb, cb, temp,
                        T_bg, m, Vd, window, rtol_scale,
                    )
                    carry = (
                        res.element, res.charge, fr.potential_boundary,
                        fr.potential_sum, temp, T_bg, m,
                        cursor + res.draws_used,
                    )
                    return carry, (diag, site_power)

                init = (element, charge, pb, jnp.zeros_like(pb), temp, T_bg,
                        m, jnp.asarray(0, jnp.int32))
                (element, charge, pb, pc, temp, T_bg, m, cursor), (
                    diag, powers) = lax.scan(body, init, None, length=k)
                return element, charge, pb, pc, temp, T_bg, m, diag, powers[-1]

            opts = (
                {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 27648}}
                if jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
                else {}
            )
            self._multi_jits[key] = jax.jit(_multi, **opts)
        rand_buf = jnp.asarray(stream.peek(k * rand_chunk))
        ct = self.current_tables
        lh = self.local_heat if self.params.solve_heating_local else None
        element, charge, pb, pc, temp, T_bg, m, diag, power = self._multi_jits[key](
            self.tables, self.kop, ct, self.power_band, lh, state.element,
            state.charge, state.potential_boundary, state.cb_edge,
            state.temperature, state.T_bg, m_prev, Vd, rand_buf,
            jnp.asarray(rtol_scale, jnp.float64),
        )
        d = np.asarray(diag)                     # (k, 12)
        if (
            (d[:, 3] == 0.0).any()
            or (d[:, 5] != 0.0).any()
            or (d[:, 6] != 0.0).any()
            or (d[:, 11] != 0.0).any()
        ):
            stats_list = []
            for _ in range(k):
                state, stats, m_prev = self.superstep_full(
                    state, Vd, stream, m_prev, rand_chunk, rtol_scale
                )
                stats_list.append(stats)
            return state, stats_list, m_prev
        stream.advance(int(d[:, 1].sum()))
        new_state = state._replace(
            element=element, charge=charge, potential_boundary=pb,
            potential_charge=pc, power=power, temperature=temp, T_bg=T_bg,
            kmc_time=state.kmc_time + d[:, 2].sum(),
        )
        stats_list = [
            {
                "n_events": int(d[i, 0]),
                "event_time": float(d[i, 2]),
                "cg_iterations": int(d[i, 4]),
                "I_macro": float(d[i, 7]),
                "T_bg": float(d[i, 8]),
                "power_cg_iterations": int(d[i, 9]),
                "P_tot": float(d[i, 10]),
            }
            for i in range(k)
        ]
        return new_state, stats_list, m


def _next_pow2(v: int) -> int:
    n = 1
    while n < v:
        n *= 2
    return n


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _max_in_reach_count(
    cen: np.ndarray, pos_q: np.ndarray, reach: float, budget: int = 1024
) -> int:
    """max over tile centers of |{q : |q - center| < reach}| without the
    O(T*Q) all-pairs count (~25 min on the 1-core host at crossbar scale).

    Branch and bound: bucket the Q points on a grid of cell edge reach/2
    (every in-reach point of a center lies in the center's 5^3-cell
    window, so the window count upper-bounds the tile's), then count
    exactly in DESCENDING upper-bound order, stopping as soon as the best
    exact count meets the next tile's bound — exact when it stops, and an
    underestimate only if the ``budget`` backstop trips first. The
    backstop case is a near-uniform charged field, where tile maxima are
    near-ties and the top-``budget`` sample tracks the global max
    closely; the 1.5x sizing margin plus the runtime candidate-cap
    overflow growth cover the residual. Counting runs in f32 above 1e7
    pair evaluations (a +-1 count at the fp boundary is irrelevant to a
    cap)."""
    cen = np.asarray(cen)
    h = reach / 2.0
    lo = pos_q.min(axis=0)
    ci = np.floor((pos_q - lo) / h).astype(np.int64)
    dims = ci.max(axis=0) + 1
    order = None
    ub = None
    if int(np.prod(dims + 4)) <= int(1e8):
        grid = np.zeros(tuple(dims), np.int64)
        np.add.at(grid, tuple(ci.T), 1)
        pad = np.pad(grid, 2)
        nb = np.zeros_like(grid)
        for dx in range(5):
            for dy in range(5):
                for dz in range(5):
                    nb += pad[dx:dx + dims[0], dy:dy + dims[1],
                              dz:dz + dims[2]]
        # a center outside the charged bbox clips to a border cell whose
        # window contains every point within reach of it (all points live
        # inside the bbox), so the bound stays valid
        tcell = np.clip(
            np.floor((cen - lo) / h).astype(np.int64), 0, dims - 1
        )
        ub = nb[tuple(tcell.T)]
        order = np.argsort(-ub)
    else:                                    # degenerate tiny-reach case
        order = np.arange(cen.shape[0])
    mx = 0
    chunk = max(1, min(256, int(2e8 // max(1, pos_q.shape[0]))))
    dt = np.float32 if chunk * pos_q.shape[0] > int(1e7) else np.float64
    pq = pos_q.astype(dt)
    cen_d = cen.astype(dt)
    qq2 = (pq * pq).sum(axis=1)
    qT = pq.T.copy()
    for s in range(0, order.shape[0], chunk):
        if ub is not None and s > 0 and mx >= int(ub[order[s]]):
            break                            # proven exact
        if ub is not None and s >= budget:
            break                            # approximate: growth path
        idx = order[s:s + chunk]
        cc = cen_d[idx]
        # |c-q|^2 = |c|^2 + |q|^2 - 2 c.q as a BLAS gemm — the broadcast
        # subtract form moves 3x the bytes and ran minutes at this scale
        d2q = (cc * cc).sum(axis=1)[:, None] + qq2[None, :] - 2.0 * (cc @ qT)
        mx = max(mx, int((d2q < dt(reach * reach)).sum(axis=1).max()))
    return mx
