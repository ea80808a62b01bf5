"""Physics-level (distributional) validation of the multi-event batched loop.

The batched loop's exactness argument (ops/events.py::run_event_loop_batched
docstring) bounds the waiting-time distortion by ``mass_eps`` relative per
batch. This file MEASURES that claim rather than arguing it: vmapped
replicate supersteps from one frozen fields state give i.i.d. samples of the
loop's two observables — the terminating waiting time (the committed
semantics' event_time, kmc_events.cu:448-516) and the executed event count —
and a two-sample Kolmogorov-Smirnov test compares the batched sampler
against the serial production loop (run_event_loop_native: the exact
residence-time law, same threefry family).

At mass_eps in {1e-3 (the production default), 3e-2 (the bench setting)}
the distributions must be statistically indistinguishable at the sample
sizes used; 3e-1 is measured by tools/validate_batched.py (artifact) rather
than asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ks_2samp

from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.ops.events import run_event_loop_batched, run_event_loop_native
from akmc_tpu.rng import ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric

N_REP = 512
# two-sample KS critical D at alpha = 1e-3 with n = m = N_REP:
# c(alpha) * sqrt(2/n), c(1e-3) = sqrt(-ln(alpha/2)/2) = 1.949
KS_CRIT = 1.949 * float(np.sqrt(2.0 / N_REP))


@pytest.fixture(scope="module")
def frozen_tables():
    """One fields pass on the toy device -> frozen (P, etype, ...) tables;
    the event loop is then sampled in isolation (the fields are
    deterministic, so replicating them would add nothing but wall-clock)."""
    from tests.util_toy import toy_device

    p, lat = toy_device()
    e2 = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
    lat.element0[:] = e2
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    t = model.tables
    fr = jax.jit(model._fields)(
        t, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg, 2.0,
    )
    P, etype, neigh, _zrows = model._loop_arrays(t, fr.P, fr.etype)
    assert float(jnp.sum(P)) > 0.0
    return model, state, fr, P, etype, neigh


def _sample(frozen, kind, mass_eps=1e-3, n_rep=N_REP, seed=0,
            clock_f32=False):
    model, state, fr, P, etype, neigh = frozen
    t = model.tables
    freq = model.params.freq

    if kind == "serial":
        def one(key):
            res = run_event_loop_native(
                state.element, fr.charge, P, etype, neigh, key, freq,
                act_idx=t.act_idx, abs2act=t.abs2act, ln_S=fr.ln_S,
            )
            return res.event_time, res.n_events
    else:
        def one(key):
            res = run_event_loop_batched(
                state.element, fr.charge, P, etype, neigh, key, freq,
                batch=16, act_idx=t.act_idx, abs2act=t.abs2act,
                ln_S=fr.ln_S, mass_eps=mass_eps, clock_f32=clock_f32,
            )
            return res.event_time, res.n_events

    keys = jax.random.split(jax.random.PRNGKey(seed), n_rep)
    times, counts = jax.jit(jax.vmap(one))(keys)
    times = np.asarray(times)
    counts = np.asarray(counts)
    assert np.isfinite(times).all(), "rate table died mid-superstep"
    return times, counts


def test_waiting_time_ks_default_eps(frozen_tables):
    """Production default mass_eps=1e-3: the batched terminating-gap law is
    indistinguishable from the serial law (KS at alpha=1e-3)."""
    t_ser, c_ser = _sample(frozen_tables, "serial", seed=1)
    t_bat, c_bat = _sample(frozen_tables, "batched", mass_eps=1e-3, seed=2)
    d_time = ks_2samp(t_ser, t_bat).statistic
    assert d_time < KS_CRIT, f"waiting-time KS D={d_time:.4f} >= {KS_CRIT:.4f}"
    # event counts: KS is conservative on discrete data (ties shrink D)
    d_cnt = ks_2samp(c_ser, c_bat).statistic
    assert d_cnt < KS_CRIT, f"event-count KS D={d_cnt:.4f} >= {KS_CRIT:.4f}"
    # and the means agree to sampling error (4 sigma)
    se = np.hypot(c_ser.std() / np.sqrt(len(c_ser)), c_bat.std() / np.sqrt(len(c_bat)))
    assert abs(c_ser.mean() - c_bat.mean()) < 4.0 * se + 1e-12


def test_waiting_time_ks_bench_eps(frozen_tables):
    """The bench setting mass_eps=3e-2 (a 3%-per-batch distortion BOUND)
    stays statistically invisible at N=512 — the bound is a worst case,
    not the typical distortion."""
    t_ser, _ = _sample(frozen_tables, "serial", seed=3)
    t_bat, _ = _sample(frozen_tables, "batched", mass_eps=3e-2, seed=4)
    d = ks_2samp(t_ser, t_bat).statistic
    assert d < KS_CRIT, f"waiting-time KS D={d:.4f} >= {KS_CRIT:.4f}"


def test_batched_self_consistency_across_batch_size(frozen_tables):
    """B=4 and B=16 batched samplers draw from the same law (the batch size
    is an amortization knob, not a physics knob)."""
    model, state, fr, P, etype, neigh = frozen_tables
    t = model.tables
    freq = model.params.freq

    def one(batch, key):
        res = run_event_loop_batched(
            state.element, fr.charge, P, etype, neigh, key, freq,
            batch=batch, act_idx=t.act_idx, abs2act=t.abs2act,
            ln_S=fr.ln_S, mass_eps=1e-3,
        )
        return res.event_time

    k1 = jax.random.split(jax.random.PRNGKey(5), N_REP)
    k2 = jax.random.split(jax.random.PRNGKey(6), N_REP)
    t4 = np.asarray(jax.jit(jax.vmap(lambda k: one(4, k)))(k1))
    t16 = np.asarray(jax.jit(jax.vmap(lambda k: one(16, k)))(k2))
    d = ks_2samp(t4, t16).statistic
    assert d < KS_CRIT, f"B=4 vs B=16 KS D={d:.4f} >= {KS_CRIT:.4f}"


def test_waiting_time_ks_clock_f32(frozen_tables):
    """clock_f32 (the production lever killing the full-N dd-f64 log —
    41% of the per-batch cost at the 4.6M crossbar): the race is
    exact-in-law up to f32 rounding, so both observables must remain
    indistinguishable from the serial f64 law."""
    t_ser, c_ser = _sample(frozen_tables, "serial", seed=11)
    t_bat, c_bat = _sample(
        frozen_tables, "batched", mass_eps=1e-3, seed=12, clock_f32=True
    )
    d_time = ks_2samp(t_ser, t_bat).statistic
    assert d_time < KS_CRIT, f"waiting-time KS D={d_time:.4f} >= {KS_CRIT:.4f}"
    d_cnt = ks_2samp(c_ser, c_bat).statistic
    assert d_cnt < KS_CRIT, f"event-count KS D={d_cnt:.4f} >= {KS_CRIT:.4f}"
    se = np.hypot(
        c_ser.std() / np.sqrt(len(c_ser)), c_bat.std() / np.sqrt(len(c_bat))
    )
    assert abs(c_ser.mean() - c_bat.mean()) < 4.0 * se + 1e-12
