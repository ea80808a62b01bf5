"""Full-physics superstep on the toy device: CB edge -> current/power ->
global heating -> events, end to end (the branch the committed reference
dead-codes)."""

import numpy as np
import pytest

from akmc_tpu.lattice import ELEM
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


def test_full_physics_cycle():
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=10, ny=3, nz=3, contact_layers=3)
    lat.element0[:] = make_substoichiometric(lat.element0, 0.3, ReferenceRNG(9))
    p = p.replace(
        solve_current=True,
        solve_heating_global=True,
        dissipation_constant=1e-13,
        t_ox=5e-9,
        A=(12 * 2.0e-10) ** 2,
        c_p=1.92,
    )
    model = VCMModel(p, lat, vmax=64, ne_max=512)
    state = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))
    Vd = 2.0

    state = model.update_cb_edge(state, Vd)
    cb = np.asarray(state.cb_edge)
    # boundary values fixed to +-Vd/2 in J (potential_solver_gpu.cu:746-752)
    q = 1.60217663e-19
    L = p.num_atoms_first_layer
    np.testing.assert_allclose(cb[:L], Vd / 2 * q)
    np.testing.assert_allclose(cb[-L:], -Vd / 2 * q)
    assert (np.abs(cb) <= Vd / 2 * q * (1 + 1e-9)).all()

    state, I_macro, m, iters = model.update_power(state, Vd)
    assert np.isfinite(I_macro) and I_macro != 0.0
    pw = np.asarray(state.power)
    assert np.isfinite(pw).all()
    # only non-metal atom sites carry power
    is_metal = np.isin(np.asarray(state.element), [int(ELEM.Ti), int(ELEM.N)])
    assert (pw[is_metal] == 0).all()

    T0 = float(state.T_bg)
    state = model.update_temperature(state, 1e-9)
    assert np.isfinite(float(state.T_bg))

    state, stats = model.superstep(state, Vd, stream)
    assert stats["n_events"] >= 1


def _full_setup(heating="global"):
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=10, ny=3, nz=3, contact_layers=3)
    lat.element0[:] = make_substoichiometric(lat.element0, 0.3, ReferenceRNG(9))
    p = p.replace(
        solve_current=True,
        solve_heating_global=heating == "global",
        solve_heating_local=heating == "local",
        dissipation_constant=1e-13,
        t_ox=5e-9,
        A=(12 * 2.0e-10) ** 2,
        c_p=1.92,
        delta_t=1e-13,
        L_char=3.5e-10,
        k_th_non_vacancy=0.5,
        k_th_vacancies=5.0,
        num_atoms_contact=p.num_atoms_first_layer * p.num_layers_contact,
    )
    return p, lat


def test_fused_full_physics_order():
    """The fused superstep solves power AFTER the potential/charge updates
    and BEFORE events (kmc_main.cpp:334-508 module order): its I_macro must
    equal update_power evaluated on THIS superstep's charge — and must NOT
    equal the stale-charge value."""
    p, lat = _full_setup()
    model = VCMModel(p, lat, vmax=64, ne_max=512)
    state = make_device_state(lat, p.background_temp)
    Vd = 2.0
    state = model.update_cb_edge(state, Vd)

    # expected: power on the charge the fields pass computes this superstep
    fr = model._run_fields(state, Vd)
    state_updated = state._replace(charge=fr.charge)
    _, I_this, _, _ = model.update_power(state_updated, Vd)
    _, I_stale, _, _ = model.update_power(state, Vd)
    assert I_this != I_stale, "toy setup too symmetric to distinguish order"

    stream = BufferedStream(ReferenceRNG(1))
    state2, stats, m = model.superstep_full(state, Vd, stream)
    np.testing.assert_allclose(stats["I_macro"], I_this, rtol=1e-12)
    assert abs(stats["I_macro"] - I_stale) > abs(I_this) * 1e-6
    # heat folded in: T_bg advanced over this superstep's event time
    assert stats["T_bg"] != 300.0
    assert float(state2.T_bg) == stats["T_bg"]
    assert stats["n_events"] >= 1
    assert stats["P_tot"] != 0.0


def test_full_multi_matches_sequential():
    """k fused full-physics supersteps per dispatch == k sequential calls
    (same contract as superstep_multi, incl. the m warm-start threading)."""
    p, lat = _full_setup()
    model = VCMModel(p, lat, vmax=64, ne_max=512)
    Vd = 2.0

    def init():
        s = make_device_state(lat, p.background_temp)
        return model.update_cb_edge(s, Vd)

    k = 3
    sa = init()
    stream_a = BufferedStream(ReferenceRNG(1))
    m = None
    stats_a = []
    for _ in range(k):
        sa, st, m = model.superstep_full(sa, Vd, stream_a, m_prev=m, rand_chunk=2048)
        stats_a.append(st)

    sb = init()
    stream_b = BufferedStream(ReferenceRNG(1))
    sb, stats_b, mb = model.superstep_full_multi(sb, Vd, stream_b, k=k, rand_chunk=2048)

    assert [s["n_events"] for s in stats_b] == [s["n_events"] for s in stats_a]
    for key in ("event_time", "I_macro", "T_bg"):
        np.testing.assert_allclose(
            [s[key] for s in stats_b], [s[key] for s in stats_a], rtol=1e-12
        )
    np.testing.assert_array_equal(np.asarray(sb.element), np.asarray(sa.element))
    np.testing.assert_allclose(np.asarray(mb), np.asarray(m))
    assert float(stream_a.peek(1)[0]) == float(stream_b.peek(1)[0])


def test_fused_local_heating():
    p, lat = _full_setup(heating="local")
    model = VCMModel(p, lat, vmax=64, ne_max=512)
    state = make_device_state(lat, p.background_temp)
    state = model.update_cb_edge(state, 2.0)
    stream = BufferedStream(ReferenceRNG(1))
    state, stats, _ = model.superstep_full(state, 2.0, stream)
    assert float(state.T_bg) == 300.0
    temp = np.asarray(state.temperature)
    assert np.isfinite(temp).all()
    assert (temp != 300.0).any()


def test_heat_global_analytic_limits():
    """T -> T_amb + P/k in steady state; T -> T0 at dt=0."""
    import jax.numpy as jnp

    from akmc_tpu.solvers.heat import update_temperature_global

    power = jnp.zeros(10).at[0].set(1e-6)
    kwargs = dict(
        dissipation_constant=1e-13, background_temp=300.0,
        t_ox=5e-9, A=2.6e-17, c_p=1.92,
    )
    T0 = jnp.asarray(350.0)
    t_inf = update_temperature_global(T0, power, 1e3, **kwargs)
    # steady state: c/a = T_bg(NOTE: reference uses current T in c) + P/kappa
    expect = 350.0 + 1e-6 / 1e-13
    np.testing.assert_allclose(float(t_inf), expect, rtol=1e-6)
    t_zero = update_temperature_global(T0, power, 0.0, **kwargs)
    np.testing.assert_allclose(float(t_zero), 350.0, rtol=1e-12)


def test_power_rtol_scale_threading():
    """rtol_scale tightens the power CG (more iterations, I pinned) and
    threads TRACED through update_power / superstep_full — the low-bias
    operator-invariance lever (PERF_NOTES round 5; reference tolerance
    semantics current_solver_gpu.cu:1455-1456)."""
    p, lat = _full_setup()
    model = VCMModel(p, lat, vmax=64, ne_max=512)
    state = make_device_state(lat, p.background_temp)
    Vd = 2.0
    state = model.update_cb_edge(state, Vd)

    _, I_loose, _, it_loose = model.update_power(state, Vd)
    _, I_tight, _, it_tight = model.update_power(state, Vd, rtol_scale=1e-4)
    _, I_tight2, _, _ = model.update_power(state, Vd, rtol_scale=1e-6)
    assert it_tight > it_loose
    # tightened solves agree with each other far better than with the loose
    # one is NOT guaranteed on a well-conditioned toy — but they must agree
    # to the tolerance they were asked for
    np.testing.assert_allclose(I_tight, I_tight2, rtol=1e-6)
    np.testing.assert_allclose(I_loose, I_tight, rtol=1e-3)

    # model default: power_rtol_scale attribute is picked up when the call
    # site passes nothing
    model.power_rtol_scale = 1e-4
    _, I_attr, _, it_attr = model.update_power(state, Vd)
    assert it_attr == it_tight and I_attr == I_tight

    # traced through the fused superstep (same jit executable for both
    # scales — the arg is traced, not baked)
    stream = BufferedStream(ReferenceRNG(1))
    s1, st1, _ = model.superstep_full(state, Vd, stream, rtol_scale=1.0)
    stream = BufferedStream(ReferenceRNG(1))
    s2, st2, _ = model.superstep_full(state, Vd, stream, rtol_scale=1e-4)
    assert st2["power_cg_iterations"] > st1["power_cg_iterations"]
    np.testing.assert_allclose(st1["I_macro"], st2["I_macro"], rtol=1e-3)
    # identical event trajectory: the power tolerance does not feed back
    # into rates on this deck (heating-global toy uses power only for T_bg)
    assert st1["n_events"] == st2["n_events"]
