"""Headline benchmark: steady-state KMC superstep wall-clock on the 5 nm
device (N = 37,650 sites), single TPU chip.

Baseline: the reference's shipped timing on one LUMI-G MI250X GCD —
0.0115928 s/superstep (structures/5nm_device/expected_output/output1_0.txt:18;
BASELINE.md). ``vs_baseline`` is baseline/ours (>1 = faster than reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Outage resilience (round-3 postmortem: the tunnel died mid-round and the
headline artifact was an rc=1 traceback): the TPU backend is probed in a
bounded subprocess with retry+backoff BEFORE the real bench, a successful
run writes ``artifacts/bench_last_good.json``, and every failure path still
emits one parseable JSON line — with the last-good value (flagged via an
``"error"`` key) or, lacking one, a CPU-smoke measurement whose unit makes
the substitution explicit. Exit code is 0 in all cases so the driver's
record always parses.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_SUPERSTEP_S = 0.0115928
REF_5NM = "/root/reference/structures/5nm_device"
HERE = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(HERE, "artifacts", "bench_last_good.json")

PROBE_SRC = "import jax; jax.config.update('jax_enable_x64', True); print(len(jax.devices()))"


def probe_backend(timeout_s: float = 300.0) -> bool:
    """True iff the (sitecustomize-forced) TPU backend initializes.

    Runs in a subprocess because a dead tunnel HANGS backend init rather
    than raising — only a hard kill bounds it.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and r.stdout.strip().isdigit()


def run_bench():
    """The real benchmark. Returns median warm superstep seconds (TPU)."""
    cache = os.path.join(HERE, ".cache", "jaxcache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    # seed from committed executables (compiles through the remote runtime
    # take 3-16 min; the committed entries make the bench warm-start)
    seed = os.path.join(HERE, ".cache", "jaxcache_commit")
    if os.path.isdir(seed):
        os.makedirs(cache, exist_ok=True)
        import shutil

        for f in os.listdir(seed):
            dst = os.path.join(cache, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(seed, f), dst)
    import jax

    jax.config.update("jax_enable_x64", True)
    # set via config, not env: a sitecustomize imports jax at interpreter
    # startup, so jax_compilation_cache_dir already bound (empty) from the
    # environment before this process's env tweaks take effect
    jax.config.update("jax_compilation_cache_dir", cache)
    import numpy as np

    sys.path.insert(0, HERE)
    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    cache = os.path.join(HERE, ".cache")
    lat = build_lattice(e, x, y, z, p, cache_dir=cache)
    # k_carry_residual: the batched path rebases each warm K solve's
    # initial residual from the previous superstep's final residual +
    # exact ΔA·x0 terms (the band is static), so converged warm starts run
    # ZERO band matvecs — measured 11.06 ms of the 12.16 ms fields path
    # was the K solve (tools/probe_ablate_5nm.py, round 3). Trajectory
    # equality with the fresh path is asserted on this same workload by
    # tests/test_superstep_toy.py and the round-3 5nm equality check.
    model = VCMModel(p, lat, k_carry_residual=True)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = p.V_switch[0]

    # production execution mode: K supersteps per device dispatch
    # (lax.scan batching; trajectory identical to K sequential supersteps —
    # tests/test_superstep_toy.py::test_superstep_multi_matches_sequential).
    # warm-up batch pays the compile + the expensive first zero-guess CG.
    K = 64
    state, _ = model.superstep_multi(state, Vd, stream, k=K, rand_chunk=2048)

    times = []
    n_batches = 5   # median of 5: tunnel congestion only ever ADDS time,
    # and 3 batches let one congested batch drag the median (~0.8 ms
    # run-to-run swings measured around the 11.6 ms baseline bar)
    for _ in range(n_batches):
        t0 = time.perf_counter()
        state, stats_list = model.superstep_multi(
            state, Vd, stream, k=K, rand_chunk=2048
        )
        times.append((time.perf_counter() - t0) / K)
        # liveness on EVERY batch: a mid-bench rate collapse would otherwise
        # measure an empty event loop
        assert all(s["n_events"] >= 1 for s in stats_list), "rates died mid-bench"

    return float(np.median(times))


def run_cpu_smoke():
    """Fallback measurement when no TPU and no last-good record exist: the
    same 5 nm superstep on the host CPU backend. Clearly NOT the headline
    number — the unit says so."""
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "bench_cpu_smoke.py")],
        timeout=3600,
        capture_output=True,
        text=True,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["value"])
        except (ValueError, KeyError):
            continue
    raise RuntimeError(f"cpu smoke failed: rc={r.returncode} {r.stderr[-400:]}")


def emit(value, error=None, last_good=None, unit="s"):
    rec = {
        "metric": "5nm_superstep_wall_clock",
        "value": value,
        "unit": unit,
        "vs_baseline": (BASELINE_SUPERSTEP_S / value) if unit == "s" and value else 0.0,
    }
    if error is not None:
        rec["error"] = error
    if last_good is not None:
        rec["last_good"] = last_good
    print(json.dumps(rec))


def main():
    last_good = None
    if os.path.exists(LAST_GOOD):
        try:
            with open(LAST_GOOD) as f:
                last_good = json.load(f)
        except (json.JSONDecodeError, OSError):
            last_good = None

    errors = []
    for attempt, delay in enumerate((0, 30, 90)):
        if delay:
            time.sleep(delay)
        if not probe_backend():
            errors.append(f"attempt {attempt}: backend unavailable (probe timeout/err)")
            continue
        try:
            val = run_bench()
        except Exception as exc:  # noqa: BLE001 — fail-soft by contract
            # an init/compile outage mid-bench retries; anything else is a
            # real regression and is surfaced (with last_good for context)
            msg = f"{type(exc).__name__}: {exc}"
            errors.append(f"attempt {attempt}: {msg[:300]}")
            retriable = any(
                s in msg for s in ("UNAVAILABLE", "Unavailable", "DEADLINE", "Socket", "connect")
            )
            if retriable:
                continue
            emit(
                last_good["value"] if last_good else None,
                error=f"bench raised (regression?): {msg[:300]}",
                last_good=last_good,
            )
            return
        os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
        with open(LAST_GOOD, "w") as f:
            json.dump({"value": val, "unit": "s", "ts": time.time()}, f)
        emit(val)
        return

    # all attempts failed — fail-soft: last-good if we have one, else CPU smoke
    if last_good:
        emit(
            last_good["value"],
            error="backend unavailable; reporting last-good value",
            last_good=last_good,
        )
        return
    try:
        smoke = run_cpu_smoke()
        emit(smoke, error="; ".join(errors)[:500], unit="s_cpu_smoke")
    except Exception as exc:  # noqa: BLE001
        emit(None, error=("; ".join(errors) + f"; smoke: {exc}")[:600])


if __name__ == "__main__":
    main()
