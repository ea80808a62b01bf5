"""Temperature solvers.

Reference: heat_solver.cpp / heat_solver_gpu.cu.

Global (capacitative, analytic — updateTemperatureGlobal, heat_solver.cpp:106-140):
    C_th = A * t_ox * c_p * 1e6                      [J/K]
    a = kappa_diss / C_th
    c = a*T_bg + P_tot / C_th
    T_bg <- c/a + (T_bg - c/a) * exp(-a * dt)

Local (Laplacian site-temperature model — updateLocalTemperature,
heat_solver.cpp:144-303): a dense Laplacian transient / steady-state update
over interface sites with vacancy-dependent thermal transfer coefficients.
The snapshot declares but does not ship `constructLaplacian` (Device.h:195);
the operator here is the standard graph Laplacian of the neighbor network
weighted by 1/nn_dist, which reproduces the published model's structure.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from akmc_tpu.lattice import ELEM


def update_temperature_global(
    T_bg: jnp.ndarray,
    site_power: jnp.ndarray,
    event_time,
    dissipation_constant: float,
    background_temp: float,
    t_ox: float,
    A: float,
    c_p: float,
) -> jnp.ndarray:
    """Analytic capacitative global heat balance (heat_solver.cpp:106-140).

    Note the reference uses the *current* T_bg both as the initial condition
    and inside the steady-state coefficient c (c = a*T_bg + P/C) — preserved.
    """
    C_th = A * t_ox * c_p * 1e6
    P_tot = jnp.sum(site_power)
    a = dissipation_constant / C_th
    c = a * T_bg + P_tot / C_th
    return c / a + (T_bg - c / a) * jnp.exp(-a * event_time)


def update_temperature_global_discrete(
    T_bg: jnp.ndarray,
    site_power: jnp.ndarray,
    event_time,
    small_step: float,
    dissipation_constant: float,
    background_temp: float,
    t_ox: float,
    A: float,
    c_p: float,
) -> jnp.ndarray:
    """Geometric-series discretization (update_temp_global,
    heat_solver_gpu.cu:43-70): T <- c*(1-a^n)/(1-a) + a^n*T with
    a = 1 - k/C*dt, c = k/C*dt*T_amb + P/C*dt, n = event_time/small_step."""
    C_th = A * t_ox * c_p * 1e6
    P_tot = jnp.sum(site_power)
    n_steps = jnp.floor(event_time / small_step)
    a = -dissipation_constant / C_th * small_step + 1.0
    b = dissipation_constant / C_th * small_step * background_temp
    c = b + P_tot / C_th * small_step
    an = a**n_steps
    return c * (1.0 - an) / (1.0 - a) + an * T_bg


class LocalHeatTables(NamedTuple):
    """Static pieces of the local Laplacian model over interface sites."""

    interface_mask: jnp.ndarray   # (N,) sites with a temperature DOF
    inv_L: jnp.ndarray            # (N_if, N_if) inverse Laplacian (dense)
    inv_L_ss: jnp.ndarray         # steady-state kernel: L^-1
    if_idx: jnp.ndarray           # (N_if,) site index per DOF


def build_local_heat_tables(
    neigh_idx, site_layer, n_contact_layers_mask, nn_dist: float, k_th: float
):
    raise NotImplementedError(
        "local Laplacian heat model lands with the dense-operator pass; the "
        "reference snapshot itself ships without constructLaplacian"
    )


def update_temperature_local(
    temperature: jnp.ndarray,      # (N,) [K]
    site_power: jnp.ndarray,
    element: jnp.ndarray,
    laplacian: jnp.ndarray,        # (N_if, N_if) dense transient kernel
    if_idx: jnp.ndarray,           # (N_if,) site indices of DOFs
    step_time,
    tau: float,
    background_temp: float,
    T_1: float,
    nn_dist_m: float,
    k_th_interface: float,
    k_th_vacancies: float,
) -> jnp.ndarray:
    """One transient step of the local site-temperature model
    (updateLocalTemperature, heat_solver.cpp:144-231):

        T_norm = (T - T0)/(T1 - T0)
        T_norm' = L @ T_norm + L @ (p_transfer(elem) * P * dt)
        T <- T_norm' * (T1 - T0) + T0
    """
    T0 = background_temp
    p_vac = 1.0 / ((nn_dist_m * k_th_interface) * (T_1 - T0))
    p_non = 1.0 / ((nn_dist_m * k_th_vacancies) * (T_1 - T0))

    t_vec = (temperature[if_idx] - T0) / (T_1 - T0)
    is_vac = element[if_idx] == int(ELEM.VACANCY)
    p_coef = jnp.where(is_vac, p_vac, p_non)
    src = site_power[if_idx] * p_coef * step_time * tau

    t_new = laplacian @ (t_vec + src)
    return temperature.at[if_idx].set(t_new * (T_1 - T0) + T0)
