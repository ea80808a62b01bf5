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
