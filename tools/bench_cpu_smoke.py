"""CPU-smoke fallback for bench.py: the same 5 nm steady-state superstep,
on the host CPU backend. Emits one JSON line {"value": seconds}.

Used ONLY when the TPU tunnel is unreachable and no last-good record
exists — the value is a liveness signal, not the headline number (bench.py
reports it with unit "s_cpu_smoke").
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_5NM = "/root/reference/structures/5nm_device"


def main():
    import jax

    # BEFORE backend init: a sitecustomize force-selects the axon platform
    # in every python process (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, HERE)
    from akmc_tpu.config import KMCParameters
    from akmc_tpu.lattice import build_lattice, read_xyz
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric

    p = KMCParameters.from_file(os.path.join(REF_5NM, "parameters.txt"))
    e, x, y, z = read_xyz(os.path.join(REF_5NM, "reordered_device_5.xyz"))
    e = make_substoichiometric(e, p.initial_vacancy_concentration, ReferenceRNG(p.rnd_seed))
    lat = build_lattice(e, x, y, z, p, cache_dir=os.path.join(HERE, ".cache"))
    model = VCMModel(p, lat, k_carry_residual=True)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(p.rnd_seed_kmc))
    Vd = p.V_switch[0]

    K = 8
    state, _ = model.superstep_multi(state, Vd, stream, k=K, rand_chunk=2048)
    t0 = time.perf_counter()
    state, stats = model.superstep_multi(state, Vd, stream, k=K, rand_chunk=2048)
    dt = (time.perf_counter() - t0) / K
    assert all(s["n_events"] >= 1 for s in stats)
    print(json.dumps({"value": dt}))


if __name__ == "__main__":
    main()
