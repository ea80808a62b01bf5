"""Residence-time loop semantics vs a step-by-step numpy oracle of
execute_kmc_step_mpi (kmc_events.cu:430-528): same selection, same
mutations, same zero-out set, same clock, same draw accounting."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM, EVENT
from akmc_tpu.rng import ReferenceRNG


def _loop_oracle(element, charge, P, etype, neigh_idx, rands, freq):
    """Flat-scan residence-time loop (the reference algorithm verbatim)."""
    element = element.copy()
    charge = charge.copy()
    P = P.copy()
    n, nn = P.shape
    ev_time = 0.0
    cnt = 0
    n_ev = 0
    while ev_time < 1.0 / freq and cnt + 2 <= len(rands):
        flat = P.reshape(-1)
        cum = np.cumsum(flat)
        total = cum[-1]
        target = rands[cnt] * total
        idx = np.searchsorted(cum, target, side="right")
        idx = min(idx, n * nn - 1)
        i = idx // nn
        j = int(neigh_idx[i, idx % nn])
        ty = int(etype[i, idx % nn])
        # execute (execute_event, kmc_events.cu:292-331)
        if ty == int(EVENT.VACANCY_GENERATION):
            element[i], element[j] = int(ELEM.OXYGEN_DEFECT), int(ELEM.VACANCY)
            charge[i], charge[j] = -2, 2
        elif ty == int(EVENT.VACANCY_RECOMBINATION):
            element[i], element[j] = int(ELEM.DEFECT), int(ELEM.O)
            charge[i], charge[j] = 0, 0
        else:
            element[i], element[j] = element[j], element[i]
            charge[i], charge[j] = charge[j], charge[i]
        # zero-out (zero_out_events_split, kmc_events.cu:247-266)
        for r in range(n):
            for s in range(nn):
                jj = neigh_idx[r, s]
                if jj >= 0 and (r == i or r == j or jj == i or jj == j):
                    P[r, s] = 0.0
        ev_time = -np.log(rands[cnt + 1]) / total
        cnt += 2
        n_ev += 1
    return element, charge, P, ev_time, n_ev, cnt


@pytest.fixture(scope="module")
def crafted():
    """Small synthetic system with hand-planted event pairs."""
    rng = np.random.RandomState(3)
    n, nn = 64, 6
    neigh_idx = np.full((n, nn), -1, np.int32)
    for i in range(n):
        nbrs = [(i + d) % n for d in (-2, -1, 1, 2)]
        neigh_idx[i, : len(nbrs)] = sorted(nbrs)
    element = rng.choice(
        [int(ELEM.DEFECT), int(ELEM.O), int(ELEM.VACANCY), int(ELEM.OXYGEN_DEFECT)],
        n,
    ).astype(np.int32)
    charge = np.where(element == int(ELEM.VACANCY), 2,
                      np.where(element == int(ELEM.OXYGEN_DEFECT), -2, 0)).astype(np.int32)
    # crafted rates: positive where the element pair matches an event class
    P = np.zeros((n, nn))
    etype = np.full((n, nn), int(EVENT.NULL_EVENT), np.int32)
    pairs = {
        (int(ELEM.DEFECT), int(ELEM.O)): int(EVENT.VACANCY_GENERATION),
        (int(ELEM.OXYGEN_DEFECT), int(ELEM.VACANCY)): int(EVENT.VACANCY_RECOMBINATION),
        (int(ELEM.VACANCY), int(ELEM.O)): int(EVENT.VACANCY_DIFFUSION),
        (int(ELEM.OXYGEN_DEFECT), int(ELEM.DEFECT)): int(EVENT.ION_DIFFUSION),
    }
    for i in range(n):
        for s in range(nn):
            j = neigh_idx[i, s]
            if j < 0:
                continue
            ty = pairs.get((int(element[i]), int(element[j])))
            if ty is not None:
                P[i, s] = 10 ** rng.uniform(10, 14)
                etype[i, s] = ty
    return element, charge, P, etype, neigh_idx


def test_event_loop_vs_oracle(crafted):
    import jax.numpy as jnp

    from akmc_tpu.ops.events import run_event_loop

    element, charge, P, etype, neigh_idx = crafted
    freq = 1e14
    rands = ReferenceRNG(1).uniform(64)

    res = run_event_loop(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P),
        jnp.asarray(etype), jnp.asarray(neigh_idx), jnp.asarray(rands), freq,
    )
    el_o, q_o, P_o, t_o, nev_o, cnt_o = _loop_oracle(
        element, charge, P, etype, neigh_idx, rands, freq
    )
    assert int(res.n_events) == nev_o
    assert int(res.draws_used) == cnt_o
    np.testing.assert_array_equal(np.asarray(res.element), el_o)
    np.testing.assert_array_equal(np.asarray(res.charge), q_o)
    np.testing.assert_array_equal(np.asarray(res.P), P_o)
    np.testing.assert_allclose(float(res.event_time), t_o, rtol=1e-12)
    assert nev_o >= 2  # the crafted system must actually exercise the loop


def test_event_loop_buffer_exhaustion_resume(crafted):
    """Splitting the rand stream across two chunk calls must equal one call."""
    import jax.numpy as jnp

    from akmc_tpu.ops.events import run_event_loop

    element, charge, P, etype, neigh_idx = crafted
    freq = 1e14
    rands = ReferenceRNG(1).uniform(64)

    full = run_event_loop(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P),
        jnp.asarray(etype), jnp.asarray(neigh_idx), jnp.asarray(rands), freq,
    )
    # tiny buffer: force an exhaustion + resume
    r1 = run_event_loop(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P),
        jnp.asarray(etype), jnp.asarray(neigh_idx), jnp.asarray(rands[:4]), freq,
    )
    assert not bool(r1.done)
    used = int(r1.draws_used)
    r2 = run_event_loop(
        r1.element, r1.charge, r1.P, jnp.asarray(etype),
        jnp.asarray(neigh_idx), jnp.asarray(rands[used:]), freq,
        event_time_in=r1.event_time,
    )
    assert bool(r2.done)
    assert int(r1.n_events) + int(r2.n_events) == int(full.n_events)
    np.testing.assert_array_equal(np.asarray(r2.element), np.asarray(full.element))
    np.testing.assert_allclose(float(r2.event_time), float(full.event_time))


def test_native_rng_loop_invariants(crafted):
    """On-device threefry variant: same termination semantics and mutation
    invariants (different stream by design)."""
    import jax
    import jax.numpy as jnp

    from akmc_tpu.ops.events import run_event_loop_native

    element, charge, P, etype, neigh_idx = crafted
    res = run_event_loop_native(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P),
        jnp.asarray(etype), jnp.asarray(neigh_idx),
        jax.random.PRNGKey(0), 1e14,
    )
    assert bool(res.done)
    assert int(res.n_events) >= 1
    el = np.asarray(res.element)
    # V - Od count invariant
    dv = (el == int(ELEM.VACANCY)).sum() - (el == int(ELEM.OXYGEN_DEFECT)).sum()
    dv0 = (element == int(ELEM.VACANCY)).sum() - (element == int(ELEM.OXYGEN_DEFECT)).sum()
    assert dv == dv0
    assert float(res.event_time) >= 1.0 / 1e14


def test_compacted_loop_matches_full(crafted):
    """Row-compacted layout (act_idx/abs2act) must produce the IDENTICAL
    event sequence: excluded rows carry exactly-zero rates, so cumulative
    sums and selection boundaries are bit-equal."""
    import jax.numpy as jnp

    from akmc_tpu.ops.events import run_event_loop

    element, charge, P, etype, neigh_idx = crafted
    n, nn = P.shape
    # deactivate a third of the rows (pretend they're metal): zero their
    # rates, exactly like contacts in a real device
    element = element.copy()
    P = P.copy()
    etype = etype.copy()
    inactive = np.arange(0, n, 3)
    element[inactive] = int(ELEM.Ti)
    P[inactive] = 0.0
    etype[inactive] = int(EVENT.NULL_EVENT)
    # null any event whose PARTNER became inactive too (element pair broken)
    for i in range(n):
        for s in range(nn):
            j = neigh_idx[i, s]
            if j >= 0 and j in inactive:
                P[i, s] = 0.0
                etype[i, s] = int(EVENT.NULL_EVENT)

    freq = 1e14
    rands = ReferenceRNG(1).uniform(64)

    full = run_event_loop(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P),
        jnp.asarray(etype), jnp.asarray(neigh_idx), jnp.asarray(rands), freq,
    )

    act = np.setdiff1d(np.arange(n), inactive).astype(np.int32)
    na_pad = len(act) + 3   # a few all-zero pad rows
    act_idx = np.full(na_pad, -1, np.int32)
    act_idx[: len(act)] = act
    abs2act = np.full(n, na_pad - 1, np.int32)
    abs2act[act] = np.arange(len(act), dtype=np.int32)
    P_c = np.zeros((na_pad, nn))
    P_c[: len(act)] = P[act]
    etype_c = np.full((na_pad, nn), int(EVENT.NULL_EVENT), np.int32)
    etype_c[: len(act)] = etype[act]
    neigh_c = np.full((na_pad, nn), -1, np.int32)
    neigh_c[: len(act)] = neigh_idx[act]

    comp = run_event_loop(
        jnp.asarray(element), jnp.asarray(charge), jnp.asarray(P_c),
        jnp.asarray(etype_c), jnp.asarray(neigh_c), jnp.asarray(rands), freq,
        act_idx=jnp.asarray(act_idx), abs2act=jnp.asarray(abs2act),
    )

    assert int(comp.n_events) == int(full.n_events) >= 2
    assert int(comp.draws_used) == int(full.draws_used)
    np.testing.assert_array_equal(np.asarray(comp.element), np.asarray(full.element))
    np.testing.assert_array_equal(np.asarray(comp.charge), np.asarray(full.charge))
    # mutated rate tables agree row-for-row on the active subset
    np.testing.assert_array_equal(np.asarray(comp.P)[: len(act)], np.asarray(full.P)[act])
    assert float(comp.event_time) == float(full.event_time)


def test_normalized_rates_match_absolute():
    """Shifted-exponent rate mode (rate_normalize=True): same event sequence
    and waiting times as the absolute-rate parity path when both are in
    range (on TPU the emulated f64's f32 exponent range makes the absolute
    path overflow at high bias — the normalized path is the production mode
    there)."""
    import numpy as np
    import pytest

    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric
    from tests.util_toy import toy_device

    p, lat = toy_device()
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))

    def run(**kw):
        model = VCMModel(p, lat, **kw)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        ev, times = [], []
        for _ in range(3):
            state, stats = model.superstep(state, 2.0, stream)
            ev.append(stats["n_events"])
            times.append(stats["event_time"])
        return state, ev, times

    s_a, ev_a, t_a = run()
    s_n, ev_n, t_n = run(rate_normalize=True)
    assert ev_n == ev_a
    np.testing.assert_array_equal(np.asarray(s_n.element), np.asarray(s_a.element))
    np.testing.assert_allclose(t_n, t_a, rtol=1e-9)


def test_normalized_rates_resume_chunk_exhaustion():
    """rate_normalize + a rand buffer that runs out mid-superstep: the
    events-only resume chunks must carry the log rate scale ln_S (review
    finding: the resume path dropped it, inflating waiting times ~S-fold
    and truncating the superstep)."""
    import numpy as np

    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric
    from tests.util_toy import toy_device

    p, lat = toy_device()
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))

    def run(chunk):
        model = VCMModel(p, lat, rate_normalize=True)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        ev, times = [], []
        for _ in range(3):
            state, stats = model.superstep(state, 2.0, stream, rand_chunk=chunk)
            ev.append(stats["n_events"])
            times.append(stats["event_time"])
        return state, ev, times

    s_big, ev_big, t_big = run(8192)       # no exhaustion
    s_sm, ev_sm, t_sm = run(6)             # forces events-only resume chunks
    assert sum(ev_big) > 3                 # the resume path actually runs
    assert ev_sm == ev_big
    np.testing.assert_array_equal(np.asarray(s_sm.element), np.asarray(s_big.element))
    np.testing.assert_allclose(t_sm, t_big, rtol=1e-12)
    np.testing.assert_allclose(float(s_sm.kmc_time), float(s_big.kmc_time), rtol=1e-12)


def test_incremental_select_is_bit_identical():
    """Carried-block-sum selection (event_select_incremental=True) must
    reproduce the per-event fresh reduce: same event sequence and
    elements EXACTLY. Waiting times are compared to 1 ulp, not bit-equal:
    the two variants compile to different programs and XLA's reduction
    tree for the block sums shifts with unrelated surrounding code
    (measured round 3: the same two code paths were bit-equal or one ulp
    apart depending on which commit they were compiled under)."""
    import numpy as np

    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.rng import BufferedStream, ReferenceRNG
    from akmc_tpu.state import make_device_state, make_substoichiometric
    from tests.util_toy import toy_device

    p, lat = toy_device()
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))

    def run(**kw):
        model = VCMModel(p, lat, **kw)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        ev, times = [], []
        for _ in range(4):
            state, stats = model.superstep(state, 2.0, stream)
            ev.append(stats["n_events"])
            times.append(stats["event_time"])
        return state, ev, times

    s_a, ev_a, t_a = run()
    s_i, ev_i, t_i = run(event_select_incremental=True)
    assert ev_i == ev_a
    np.testing.assert_array_equal(np.asarray(s_i.element), np.asarray(s_a.element))
    np.testing.assert_allclose(t_i, t_a, rtol=1e-15, atol=0.0)
    np.testing.assert_allclose(
        float(s_i.kmc_time), float(s_a.kmc_time), rtol=1e-14, atol=0.0
    )
