"""Headline benchmark: steady-state KMC superstep wall-clock on the 5 nm
device (N = 37,650 sites), single TPU chip.

Baseline: the reference's shipped timing on one LUMI-G MI250X GCD —
0.0115928 s/superstep (structures/5nm_device/expected_output/output1_0.txt:18;
BASELINE.md). ``vs_baseline`` is baseline/ours (>1 = faster than reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_SUPERSTEP_S = 0.0115928
REF_5NM = "/root/reference/structures/5nm_device"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, ".cache", "jaxcache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    # seed from committed executables (compiles through the remote runtime
    # take 3-16 min; the committed entries make the bench warm-start)
    seed = os.path.join(here, ".cache", "jaxcache_commit")
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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
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

    val = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "5nm_superstep_wall_clock",
                "value": val,
                "unit": "s",
                "vs_baseline": BASELINE_SUPERSTEP_S / val,
            }
        )
    )


if __name__ == "__main__":
    main()
