"""Simulation driver: bias-point sweep + superstep loop + logging.

Reference: kmc_main.cpp:56-603. Reproduces the reference's output-file
format exactly (the Python scrapers in the reference's postprocessing/
directory regex-match these strings — plot_IV.py:26-38, extract_data.py:17-31)
and additionally writes structured JSONL metrics.

Usage:
    python -m akmc_tpu.runtime.driver <parameters.txt> [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from akmc_tpu.config import KMCParameters
from akmc_tpu.lattice import build_lattice, read_xyz, write_xyz_snapshot
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


class OutputLog:
    """Buffered text log matching the reference's outputBuffer/outputFile
    behavior (kmc_main.cpp:118-121, 520-527)."""

    def __init__(self, path: str, append: bool = False):
        # on resume, append: truncating would destroy the pre-interruption
        # log the reference scrapers read (round-1 advisor finding)
        if not append and os.path.exists(path):
            os.remove(path)
        self._f = open(path, "a")
        self._buf: list[str] = []

    def write(self, s: str) -> None:
        self._buf.append(s)

    def flush(self) -> None:
        self._f.write("".join(self._buf))
        self._f.flush()
        self._buf.clear()

    def close(self) -> None:
        self.flush()
        self._f.close()


def load_structure(p: KMCParameters, base_dir: str = "."):
    """Read the initial structure (restart or atoms+interstitials files),
    reference: kmc_main.cpp:127-148 + Device ctor."""
    files = []
    if p.restart:
        files.append(os.path.join(base_dir, p.restart_xyz_file))
    else:
        files.append(os.path.join(base_dir, p.atom_xyz_file))
        files.append(os.path.join(base_dir, p.interstitial_xyz_file))
    elems, xs, ys, zs = [], [], [], []
    for fpath in files:
        e, x, y, z = read_xyz(fpath)
        elems.append(e)
        xs.append(x)
        ys.append(y)
        zs.append(z)
    e = np.concatenate(elems)
    x, y, z = np.concatenate(xs), np.concatenate(ys), np.concatenate(zs)
    if p.shift:
        # translate the cell across the periodic boundary at load
        # (Device ctor, Device.cpp:44-45)
        from akmc_tpu.lattice import translate_cell

        x, y, z = translate_cell(x, y, z, p.lattice, p.shifts)
    return e, x, y, z


def run(
    param_file: str,
    workdir: str = ".",
    max_supersteps: Optional[int] = None,
    cache_dir: Optional[str] = None,
    log: bool = True,
    committed_parity: bool = True,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
    steps_per_dispatch: int = 1,
    module_timing: bool = False,
    synthesize_crossbar: Optional[int] = None,
    rate_normalize: Optional[bool] = None,
    concern_split: Optional[tuple] = None,
    batched_events: int = 0,
    batched_mass_eps: float = 1e-3,
    batched_clock_f32: bool = False,
    batched_k_extrap: float = 0.0,
    pair_f32: bool = False,
    dia_stacked: bool = False,
    dia_pallas: bool = False,
    wkb_f32: bool = False,
    warmup: bool = False,
    devices: int = 0,
    power_rtol_scale="auto",
) -> dict:
    """Run the full bias sweep. Returns summary metrics.

    committed_parity=True reproduces the reference binary's committed state,
    in which the whole current/heat branch is dead code (comm_T is
    unconditionally nulled, KMC_comm.h:243, killing setLaplacePotential,
    initialize_sparsity_T and update_power_* at kmc_main.cpp:222, 270, 463).
    Set False for the full intended physics (CB edge + current + power +
    heating)."""
    p = KMCParameters.from_file(param_file)
    base_dir = os.path.dirname(os.path.abspath(param_file))

    if cache_dir:
        # persistent compile cache (remote TPU compiles take minutes); must
        # go through jax.config — the env var binds before user code runs
        # when a sitecustomize imports jax at interpreter startup
        jcache = os.path.join(os.path.abspath(cache_dir), "jaxcache")
        os.makedirs(jcache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", jcache)

    os.makedirs(workdir, exist_ok=True)
    out = OutputLog(
        os.path.join(workdir, "output1_0.txt"), append=bool(resume_from)
    )
    metrics = open(
        os.path.join(workdir, "metrics.jsonl"), "a" if resume_from else "w"
    )

    if synthesize_crossbar:
        # the reference ships the 40 nm crossbar DECK but strips its
        # structure files (.MISSING_LARGE_BLOBS) — synthesize a grid-native
        # stand-in honoring every deck parameter (models/crossbar.py)
        from akmc_tpu.models.crossbar import synthesize_deck_structure

        p, element, x, y, z = synthesize_deck_structure(p, synthesize_crossbar)
        out.write(
            f"Synthesized crossbar structure: {len(element)} slots "
            f"(n_yz={synthesize_crossbar}; deck structure files are stripped "
            "from the reference snapshot)\n"
        )
    else:
        element, x, y, z = load_structure(p, base_dir)
        if p.restart:
            out.write(f"Restarting from {p.restart_xyz_file}\n")

    if p.pristine:
        element = make_substoichiometric(
            element, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed)
        )

    lat = build_lattice(element, x, y, z, p, cache_dir=cache_dir)
    if synthesize_crossbar:
        from akmc_tpu.models.crossbar import mask_null_slots

        mask_null_slots(lat)

    # --devices N: run the deck sharded over an N-device 1-D `sites` mesh
    # (the reference binary is born distributed — `mpirun runKMC`, MPI init
    # + per-rank device select, kmc_main.cpp:56-101, KMC_comm :165-171).
    # Pair/event tables row-shard, field vectors replicate, CG dots psum
    # over ICI (parallel/mesh.py). Pads the site axis with inert sites when
    # N %% devices != 0 (none needed for the shipped decks on 2/3/5/6-way
    # meshes: 37,650 = 2*3*5^2*251).
    n_real = lat.N
    if devices and devices > 1:
        if concern_split is not None:
            raise ValueError("--devices and --concern-split are exclusive")
        from akmc_tpu.parallel.mesh import pad_lattice

        if lat.N % devices:
            lat, n_real = pad_lattice(lat, devices)
            out.write(
                f"Mesh padding: {lat.N - n_real} inert site(s) appended "
                f"(site axis {lat.N} over {devices} devices)\n"
            )
    if rate_normalize is None:
        # the emulated f64 on this TPU runtime carries only the f32 exponent
        # range; absolute rates freq*exp(-EA/kT) overflow it at high bias
        # (PERF_NOTES round 2) — auto-select the shifted-exponent rate path.
        # The parity default (False) is kept for low-bias decks like the
        # golden 5 nm (Vd=5).
        rate_normalize = bool(p.V_switch) and max(abs(v) for v in p.V_switch) >= 8.0
    model = VCMModel(
        p, lat, rate_normalize=rate_normalize, pair_f32=pair_f32,
        dia_stacked=dia_stacked, dia_pallas=dia_pallas, wkb_f32=wkb_f32,
        act_pad=256 * (devices if devices and devices > 1 else 1),
    )
    state = make_device_state(lat, p.background_temp)
    if devices and devices > 1:
        from akmc_tpu.parallel.mesh import (
            make_mesh,
            replicate_state,
            shard_model,
        )

        mesh = make_mesh(devices)
        shard_model(model, mesh)
        state = replicate_state(state, mesh)
        out.write(
            f"Device mesh: {devices} device(s) over the `sites` axis "
            f"(N={lat.N}, row-sharded tables, replicated fields)\n"
        )
    kmc_stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    batch_key = jax.random.PRNGKey(p.rnd_seed_kmc) if batched_events else None
    batched_pb_prev2 = None   # previous superstep's K solution (extrapolated
    #                           warm start; see superstep_native_batched)

    if warmup and p.V_switch and p.perturb_structure and p.solve_potential:
        # AOT-compile the run's executables before the first superstep
        # (jit.lower().compile() + the persistent cache): a NEW scale
        # otherwise pays its 3-16 min remote compile INSIDE superstep 0
        # (BENCH_crossbar_full40nm_r02 measured 822.7 s there; with
        # warmup + cache the r03 first superstep is 24.9 s)
        t0 = time.perf_counter()
        compile_s = model.warmup(
            state, float(p.V_switch[0]),
            steps_per_dispatch=(
                steps_per_dispatch if steps_per_dispatch > 1 else None
            ),
            full_physics=p.solve_current and not committed_parity,
            batched=batched_events,
            batched_mass_eps=batched_mass_eps,
            batched_clock_f32=batched_clock_f32,
        )
        out.write(
            f"AOT warmup: {time.perf_counter() - t0:.1f} s ("
            + ", ".join(f"{k} {v:.0f}s" for k, v in compile_s.items())
            + ")\n"
        )

    groups = None
    if concern_split is not None:
        # P7 split=true: run the K solve and the pairwise solve as
        # concurrent dispatches on disjoint device groups (reference
        # KMC_comm.h:132-223, default ratio {8,24}); needs >= 2 devices
        from akmc_tpu.parallel.mesh import ConcernGroups

        groups = ConcernGroups(model, ratio=concern_split)
        out.write(
            f"Concern groups: {groups.mesh_k.size} K-solve device(s) + "
            f"{groups.mesh_pair.size} pairwise device(s)\n"
        )

    # snapshots carry physical sites only: the grid-native crossbar layout
    # keeps NULL placeholder slots for enumeration regularity (no edges,
    # no charge, no events) — they are not atoms and don't belong in xyz
    from akmc_tpu.lattice import ELEM as _ELEM

    snap_sel = np.asarray(lat.element0) != int(_ELEM.NULL_ELEMENT)
    snap_sel[n_real:] = False   # mesh-padding sites are not atoms either
    if snap_sel.all():
        snap_sel = slice(None)

    full_physics = p.solve_current and not committed_parity
    m_warm = None   # virtual-potential warm start across supersteps
    # power-CG tolerance policy: I_macro is an extraction-rail cancellation,
    # so sub-nA bias points need a tighter solve to be operator-invariant
    # (probe_lowbias_iv table in PERF_NOTES; the reference pins the same
    # points with an absolute 1e-30*N_atom residual,
    # current_solver_gpu.cu:1455-1456). "auto" tightens 100x whenever the
    # previous superstep's |I_macro| sat below 1 nA; a float fixes the scale.
    rtol_auto = power_rtol_scale == "auto"
    rtol_fixed = 1.0 if rtol_auto else float(power_rtol_scale)
    last_I_macro = None

    resume_vt = 0
    resume_steps = 0
    if resume_from:
        from akmc_tpu.runtime.checkpoint import load_checkpoint

        state, kmc_stream, resume_vt, resume_steps, _ = load_checkpoint(resume_from)
        out.write(f"Resumed from checkpoint {resume_from}\n")

    total_steps = 0
    t_code_start = time.perf_counter()
    visited_biases = set()

    for vt_counter, Vd in enumerate(p.V_switch):
        if vt_counter < resume_vt:
            continue
        t_bias = p.t_switch[vt_counter]
        out.write("--------------------------------\n")
        out.write(f"Applied Voltage = {_g(Vd)} V\n")
        out.write("--------------------------------\n")

        if p.solve_current and not committed_parity:
            state = model.update_cb_edge(state, Vd)

        folder = os.path.join(workdir, f"Results_{Vd:.6f}")
        # hysteresis sweeps revisit bias values (e.g. an up/down staircase);
        # the reference's by-value naming would overwrite the earlier
        # branch's snapshots (its shipped decks are monotone so it never
        # hits this) — suffix repeat visits with the bias-point index
        if Vd in visited_biases:
            folder = os.path.join(workdir, f"Results_{Vd:.6f}_{vt_counter}")
        visited_biases.add(Vd)
        os.makedirs(folder, exist_ok=True)
        # reference logs the RELATIVE folder name (kmc_main.cpp writes the
        # bare "Results_<V>"); keep the line byte-compatible for scrapers
        out.write(f"Created folder: {os.path.basename(folder)}\n")
        write_xyz_snapshot(
            os.path.join(folder, "snapshot_init.xyz"),
            np.asarray(state.element)[snap_sel], lat.x[snap_sel],
            lat.y[snap_sel], lat.z[snap_sel],
            np.asarray(state.potential_charge)[snap_sel],
            np.asarray(state.power)[snap_sel],
        )

        if vt_counter == resume_vt and resume_steps:
            kmc_time = float(state.kmc_time)
            kmc_step_count = resume_steps
        else:
            kmc_time = 0.0
            kmc_step_count = 0
            state = state._replace(kmc_time=state.kmc_time * 0.0)

        spd = steps_per_dispatch

        while kmc_time < t_bias:
            t0 = time.perf_counter()
            if not p.perturb_structure:
                # fields-only mode ("turn off to only calculate fields",
                # parameters.txt; kmc_main.cpp:506-511): the field solvers run
                # each iteration, no events; once kmc_step_count > 0 the clock
                # jumps to t (so exactly two field passes are logged)
                if p.solve_potential:
                    state, stats = model.fields_only(state, Vd)
                else:
                    stats = {"cg_iterations": 0}
                stats = {**stats, "n_events": 0, "event_time": 0.0}
                stats_list = [stats]
                if kmc_step_count > 0:
                    kmc_time = t_bias
            elif full_physics:
                # fused full-physics superstep: charge -> potentials -> power
                # -> events -> heat, one executable (module order of
                # kmc_main.cpp:334-508; power sees THIS superstep's charge)
                rscale = rtol_fixed
                if (rtol_auto and last_I_macro is not None
                        and abs(last_I_macro) < 1e-9):
                    rscale = 1e-2
                if spd > 1:
                    state, stats_list, m_warm = model.superstep_full_multi(
                        state, Vd, kmc_stream, k=spd, m_prev=m_warm,
                        rtol_scale=rscale,
                    )
                else:
                    state, stats, m_warm = model.superstep_full(
                        state, Vd, kmc_stream, m_prev=m_warm,
                        rtol_scale=rscale,
                    )
                    stats_list = [stats]
                last_I_macro = stats_list[-1].get("I_macro", last_I_macro)
                for st in stats_list:
                    st["power_rtol_scale"] = rscale   # -> metrics.jsonl
            elif not p.solve_potential:
                # events on the stale potential (kmc_main.cpp gates every
                # field module on solve_potential, the event step only on
                # perturb_structure)
                state, stats = model.superstep_events_only(state, kmc_stream)
                stats_list = [stats]
            elif module_timing:
                state, stats = model.superstep_timed(state, Vd, kmc_stream)
                stats_list = [stats]
            elif batched_events:
                # production throughput mode: multi-event batched
                # residence-time loop (threefry stream, not reference-stream
                # parity; waiting-time staleness bounded by batched_mass_eps
                # per batch — ops/events.py::run_event_loop_batched)
                pb_before = state.potential_boundary
                state, stats, batch_key = model.superstep_native_batched(
                    state, Vd, batch_key, batch=batched_events,
                    mass_eps=batched_mass_eps, clock_f32=batched_clock_f32,
                    pb_prev2=batched_pb_prev2, k_extrap=batched_k_extrap,
                )
                batched_pb_prev2 = pb_before
                stats_list = [stats]
            elif spd > 1:
                state, stats_list = model.superstep_multi(
                    state, Vd, kmc_stream, k=spd
                )
            elif groups is not None:
                state, stats = groups.superstep(state, Vd, kmc_stream)
                stats_list = [stats]
            else:
                state, stats = model.superstep(state, Vd, kmc_stream)
                stats_list = [stats]
            t1 = time.perf_counter()
            dt = (t1 - t0) / len(stats_list)

            for stats in stats_list:
                # track the clock on host (device pulls cost a dispatch RTT
                # on tunneled runtimes); state.kmc_time stays authoritative
                # for checkpoints
                kmc_time += stats["event_time"]

                # per-module timing lines (labels from kmc_main.cpp:452-530):
                # measured per module under --module-timing; otherwise the
                # fused one-executable design makes module boundaries
                # invisible to wall-clocks and each line carries the
                # superstep total
                if p.solve_potential:
                    out.write(
                        "Z - calculation time - charge [s]"
                        f"{_g(stats.get('t_charge', dt))}\n"
                    )
                    out.write(
                        "Z - calculation time - potential from boundaries [s]"
                        f"{_g(stats.get('t_boundary', dt))}\n"
                    )
                    out.write(
                        "Z - calculation time - potential from charges [s]"
                        f"{_g(stats.get('t_pairwise', dt))}\n"
                    )
                if p.perturb_structure:
                    out.write(
                        "Z - calculation time - kmc events [s]"
                        f"{_g(stats.get('t_events', dt))}\n"
                    )
                I_macro = stats.get("I_macro")
                if I_macro is not None:
                    # scraper schema (postprocessing/plot_IV.py:33,
                    # plot_conductance.py:34, plot_power.py:37; strings from
                    # current_solver.cpp:277-278, 375)
                    out.write(f"Current [uA]: {_g(I_macro * 1e6)}\n")
                    out.write(f"Conductance [uS]: {_g(abs(I_macro / Vd) * 1e6)}\n")
                    if p.solve_heating_global or p.solve_heating_local:
                        out.write(
                            "Total dissipated power [mW]: "
                            f"{_g(stats['P_tot'] * 1e3)}\n"
                        )
                if full_physics and p.solve_heating_global:
                    out.write(f"Global temperature [K]: {stats['T_bg']:.16f}\n")
                out.write(f"KMC time is: {_g(kmc_time)}\n")

                if kmc_step_count % p.output_freq == 0:
                    out.flush()
                kmc_step_count += 1
                total_steps += 1

                out.write(f"Z - calculation time - KMC superstep [s]: {_g(dt)}\n")
                out.write("--------------------------------------\n")

                metrics.write(
                    json.dumps(
                        {
                            "bias": Vd,
                            "step": kmc_step_count,
                            "kmc_time": kmc_time,
                            "superstep_s": dt,
                            **stats,
                        }
                    )
                    + "\n"
                )
                if log:
                    print(
                        f"[Vd={Vd}] step {kmc_step_count}: kmc_time={kmc_time:.5e} "
                        f"events={stats['n_events']} cg={stats['cg_iterations']} "
                        f"wall={dt:.3f}s"
                    )

            # checkpoints land on batch boundaries (state+stream consistent)
            if checkpoint_every and (
                kmc_step_count % checkpoint_every < len(stats_list)
            ):
                from akmc_tpu.runtime.checkpoint import save_checkpoint

                save_checkpoint(
                    os.path.join(workdir, "checkpoint.npz"),
                    state, kmc_stream,
                    vt_counter=vt_counter, kmc_step_count=kmc_step_count,
                    extra={"Vd": Vd},
                )

            if max_supersteps and total_steps >= max_supersteps:
                break

        write_xyz_snapshot(
            os.path.join(folder, f"snapshot_{kmc_step_count}.xyz"),
            np.asarray(state.element)[snap_sel], lat.x[snap_sel],
            lat.y[snap_sel], lat.z[snap_sel],
            np.asarray(state.potential_charge)[snap_sel],
            np.asarray(state.power)[snap_sel],
        )
        if max_supersteps and total_steps >= max_supersteps:
            break

    total_time = time.perf_counter() - t_code_start
    out.close()
    metrics.close()
    return {
        "total_steps": total_steps,
        "total_time_s": total_time,
        "final_kmc_time": float(state.kmc_time),
    }


def _g(v: float) -> str:
    """C++ default ostream double formatting (6 significant digits)."""
    return f"{float(v):.6g}"


def main():
    ap = argparse.ArgumentParser(description="akmc_tpu KMC driver (runKMC equivalent)")
    ap.add_argument("parameters", help="path to parameters.txt")
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--max-supersteps", type=int, default=None)
    ap.add_argument("--cache-dir", default=".cache")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save a full checkpoint every N supersteps")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="batch k supersteps into one device dispatch "
                         "(committed-parity path only; the bias loop may "
                         "overshoot t_switch by up to k-1 supersteps)")
    ap.add_argument("--resume-from", default=None,
                    help="resume from a checkpoint.npz (bit-identical)")
    ap.add_argument("--module-timing", action="store_true",
                    help="run each physics module as its own dispatch so the "
                         "per-module 'Z - calculation time' lines carry "
                         "measured values (slower than the fused superstep)")
    ap.add_argument(
        "--synthesize-crossbar", type=int, default=None, metavar="N_YZ",
        help="synthesize a grid-native crossbar structure for this deck "
             "instead of reading its (upstream-stripped) xyz files; N_YZ "
             "sets the y/z cross-section (the 40 nm deck's full 409.6 A "
             "corresponds to N_YZ=192)",
    )
    ap.add_argument(
        "--full-physics", action="store_true",
        help="enable the current/power/heating branch the committed "
             "reference dead-codes (comm_T nulled)",
    )
    ap.add_argument(
        "--batched-events", type=int, default=0, metavar="B",
        help="production throughput mode: multi-event batched residence-"
             "time loop with B-candidate exponential-race batches (threefry "
             "stream, NOT reference-stream parity; ~10x event throughput at "
             "crossbar scale, BENCH_crossbar_full40nm_r03)",
    )
    ap.add_argument(
        "--clock-f32", action="store_true",
        help="batched loop: draw/transform the per-row race clocks in f32 "
             "(native VPU log instead of the dd-f64 chain over every row — "
             "41%% of the measured per-batch cost at the 4.6M crossbar; "
             "exact-in-law up to ~1e-6 relative gap rounding, far below "
             "--mass-eps)",
    )
    ap.add_argument(
        "--mass-eps", type=float, default=1e-3,
        help="batched loop's killed-mass staleness bound: relative waiting-"
             "time distortion per batch (looser = more events/batch; "
             "measured scan in PERF_NOTES round 3)",
    )
    ap.add_argument(
        "--k-extrap", type=float, default=0.0, metavar="C",
        help="batched loop: K-solve warm start extrapolation coefficient "
             "x0 = pb + C*(pb - pb_prev) (CG stops relative to ||b||, so a "
             "closer x0 cuts iterations; converged physics unchanged; "
             "0 = plain warm start)",
    )
    ap.add_argument(
        "--warmup", action="store_true",
        help="AOT-compile all run executables before the first superstep "
             "(new-scale cold-start bound; persistent-cached afterwards)",
    )
    ap.add_argument(
        "--pair-f32", action="store_true",
        help="evaluate the tiled-pairwise kernel plane in f32 (production "
             "crossbar option; bounded ~1e-6 relative potential error — "
             "ops/pairwise.py docstring). The f64 plane stays the default "
             "and the parity/oracle path.",
    )
    ap.add_argument(
        "--dia-stacked", action="store_true",
        help="DIA K matvec as one stacked (D, N) decode/multiply/reduce "
             "instead of the per-diagonal op loop (bit-identical result — "
             "tests/test_dia.py; grid-native crossbar structures only)",
    )
    ap.add_argument(
        "--dia-pallas", action="store_true",
        help="DIA K matvec as one fused Pallas kernel (two-f32 exact-sum "
             "chains, offset clustering — ops/pallas_dia.py; dd-f64 "
             "accuracy class; production flag, grid-native structures)",
    )
    ap.add_argument(
        "--wkb-f32", action="store_true",
        help="full-physics production lever: evaluate the WKB transmission "
             "planes (W_tt/W_ct/W_cc) in f32 — native VPU exp instead of "
             "the emulated dd-f64 chain (~1e-7 relative coefficient error; "
             "f64 stays the default/oracle path)",
    )
    ap.add_argument(
        "--power-rtol-scale", default="auto", metavar="S",
        help="full-physics power-CG tolerance multiplier: 'auto' (default) "
             "tightens 100x whenever the previous superstep's |I_macro| was "
             "sub-nA — making the low-bias I-V operator-invariant "
             "(PERF_NOTES round-5 table; reference semantics "
             "current_solver_gpu.cu:1455-1456) — or a fixed float "
             "(1.0 = the pre-r05 behavior)",
    )
    ap.add_argument(
        "--devices", type=int, default=0, metavar="N",
        help="run the deck sharded over an N-device 1-D `sites` mesh "
             "(row-sharded pair/event tables, replicated field vectors, "
             "psum CG dots — the reference's `mpirun runKMC` row "
             "decomposition, kmc_main.cpp:56-101). Pads the site axis "
             "with inert sites when N_sites %% N != 0.",
    )
    ap.add_argument(
        "--concern-split", default=None, metavar="K:P",
        help="task-split the K and pairwise solves over disjoint device "
             "groups in ratio K:P (reference split=true, KMC_comm.h:132-223; "
             "their default 8:24). Needs >= 2 devices; standard superstep "
             "path only.",
    )
    args = ap.parse_args()
    concern_split = None
    if args.concern_split:
        a, b = args.concern_split.split(":")
        concern_split = (int(a), int(b))
    summary = run(
        args.parameters,
        workdir=args.workdir,
        max_supersteps=args.max_supersteps,
        cache_dir=args.cache_dir,
        committed_parity=not args.full_physics,
        checkpoint_every=args.checkpoint_every,
        resume_from=args.resume_from,
        steps_per_dispatch=args.steps_per_dispatch,
        module_timing=args.module_timing,
        synthesize_crossbar=args.synthesize_crossbar,
        concern_split=concern_split,
        batched_events=args.batched_events,
        batched_mass_eps=args.mass_eps,
        batched_clock_f32=args.clock_f32,
        batched_k_extrap=args.k_extrap,
        pair_f32=args.pair_f32,
        dia_stacked=args.dia_stacked,
        dia_pallas=args.dia_pallas,
        wkb_f32=args.wkb_f32,
        warmup=args.warmup,
        devices=args.devices,
        power_rtol_scale=args.power_rtol_scale,
    )
    print(f"Total code execution time: {summary['total_time_s']:.6g} s")


if __name__ == "__main__":
    main()
