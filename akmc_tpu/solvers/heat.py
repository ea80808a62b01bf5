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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


class LocalHeat(NamedTuple):
    """Static pieces of the local Laplacian site-temperature model.

    The reference's updateLocalTemperature / updateLocalTemperatureSteadyState
    (heat_solver.cpp:144-303) apply dense kernels `laplacian` / `laplacian_ss`
    built by a constructLaplacian that is DECLARED but absent from the
    snapshot (Device.h:195). The discretization here is therefore this
    framework's own, stated explicitly: the graph Laplacian of the neighbor
    network over interface sites with Dirichlet (T = T_bg) contacts,

        (Lap T)_i = sum_j (T_j - T_i)   over nn neighbors j,

    applied matrix-free (no dense N_if^2 kernels — TPU-native and scales to
    crossbars): transient explicit steps T += dt_eff * (Lap T + s), and the
    steady state solved with Jacobi-CG on -Lap T = s.
    """

    if_mask: jnp.ndarray          # (N,) interface-site mask (temperature DOFs)
    neigh_idx: jnp.ndarray        # (N, NN)
    deg: jnp.ndarray              # (N,) interface-neighbor counts
    n_if: int


def build_local_heat(neigh_idx, n: int, num_atoms_contact: int) -> LocalHeat:
    import numpy as np

    if_mask = np.zeros(n, bool)
    if_mask[num_atoms_contact : n - num_atoms_contact] = True
    valid = neigh_idx >= 0
    nbr_if = if_mask[np.clip(neigh_idx, 0, None)] & valid
    deg = nbr_if.sum(1)
    return LocalHeat(
        if_mask=jnp.asarray(if_mask),
        neigh_idx=jnp.asarray(neigh_idx),
        deg=jnp.asarray(deg.astype(np.float64)),
        n_if=int(if_mask.sum()),
    )


def _lap(lh: LocalHeat, t: jnp.ndarray) -> jnp.ndarray:
    """Graph Laplacian action over interface DOFs; contacts enter as
    Dirichlet values of t."""
    valid = lh.neigh_idx >= 0
    tj = jnp.where(valid, t[lh.neigh_idx.clip(0)], 0.0)
    nbr_sum = jnp.sum(tj, axis=1)
    degree = jnp.sum(valid, axis=1).astype(t.dtype)
    return jnp.where(lh.if_mask, nbr_sum - degree * t, 0.0)


def update_temperature_local_ref(
    lh: LocalHeat,
    temperature: jnp.ndarray,
    site_power: jnp.ndarray,
    element: jnp.ndarray,
    step_time,                     # [s] this superstep's event time (dynamic)
    delta_t: float,
    tau: float,
    background_temp: float,
    nn_dist_m: float,
    k_th_interface: float,
    k_th_vacancies: float,
) -> jnp.ndarray:
    """The reference's Device::updateTemperature LOCAL dispatch
    (heat_solver.cpp:75-97), jit-safe:

      * ``step_time > 1e3 * delta_t``  -> steady-state solve;
      * otherwise                      -> ``int(step_time/delta_t) + 1``
        transient explicit steps of duration ``delta_t`` each
        (the reference's per-delta_t loop, heat_solver.cpp:89-95).

    The transient count is data-dependent but bounded by 1001 (the
    steady-state branch takes over beyond 1e3 steps) — a ``while_loop``
    inside ``lax.cond``.
    """
    T0 = background_temp
    T_1 = T0 + 1000.0
    p_vac = 1.0 / ((nn_dist_m * k_th_interface) * (T_1 - T0))
    p_non = 1.0 / ((nn_dist_m * k_th_vacancies) * (T_1 - T0))
    is_vac = element == int(ELEM.VACANCY)
    src = jnp.where(lh.if_mask, site_power * jnp.where(is_vac, p_vac, p_non), 0.0)

    def transient(t):
        n_steps = jnp.floor(step_time / delta_t).astype(jnp.int32) + 1
        dt_eff = jnp.minimum(delta_t * tau, 0.2)   # explicit-step stability

        def cond(c):
            return c[1] < n_steps

        def body(c):
            t, i = c
            return (t + dt_eff * (_lap(lh, t) + src * (T_1 - T0)), i + 1)

        t, _ = jax.lax.while_loop(cond, body, (t, jnp.asarray(0, jnp.int32)))
        return jnp.where(lh.if_mask, t, temperature)

    def steady(t):
        return update_temperature_local_steady(
            lh, temperature, site_power, element, background_temp,
            nn_dist_m, k_th_interface, k_th_vacancies,
        )

    return jax.lax.cond(step_time > 1e3 * delta_t, steady, transient, temperature)


def update_temperature_local(
    lh: LocalHeat,
    temperature: jnp.ndarray,      # (N,) [K]
    site_power: jnp.ndarray,       # (N,) [W]
    element: jnp.ndarray,
    step_time,                     # [s] superstep duration
    delta_t: float,                # [s] sub-step (p.delta_t)
    tau: float,                    # thermal rate constant [1/s] (p.tau)
    background_temp: float,
    nn_dist_m: float,
    k_th_interface: float,
    k_th_vacancies: float,
    n_substeps: int = 16,
) -> jnp.ndarray:
    """Transient local model: fixed number of explicit diffusion substeps
    covering `step_time` with vacancy-dependent power-injection coefficients
    (the reference's per-delta_t loop, heat_solver.cpp:87-95, with its
    p_transfer source scaling, 158-161)."""
    T0 = background_temp
    T_1 = T0 + 1000.0           # temperature scale (normalization constant)
    p_vac = 1.0 / ((nn_dist_m * k_th_interface) * (T_1 - T0))
    p_non = 1.0 / ((nn_dist_m * k_th_vacancies) * (T_1 - T0))
    is_vac = element == int(ELEM.VACANCY)
    p_coef = jnp.where(is_vac, p_vac, p_non)

    dt_eff = (step_time * tau) / n_substeps
    # explicit-step stability: scale into the graph-Laplacian spectral bound
    dt_eff = jnp.minimum(dt_eff, 0.2)
    src = jnp.where(lh.if_mask, site_power * p_coef, 0.0)

    t = temperature

    def body(_, t):
        return t + dt_eff * (_lap(lh, t) + src * (T_1 - T0))

    t = jax.lax.fori_loop(0, n_substeps, body, t)
    return jnp.where(lh.if_mask, t, temperature)


def update_temperature_local_steady(
    lh: LocalHeat,
    temperature: jnp.ndarray,
    site_power: jnp.ndarray,
    element: jnp.ndarray,
    background_temp: float,
    nn_dist_m: float,
    k_th_interface: float,
    k_th_vacancies: float,
    tol: float = 1e-10,
) -> jnp.ndarray:
    """Steady-state local model: solve -Lap T' = src with Dirichlet contacts
    at T_bg (reference: updateLocalTemperatureSteadyState,
    heat_solver.cpp:235-303, with the dense laplacian_ss replaced by CG)."""
    from akmc_tpu.solvers.cg import jacobi_cg

    T0 = background_temp
    T_1 = T0 + 1000.0
    p_vac = 1.0 / ((nn_dist_m * k_th_interface) * (T_1 - T0))
    p_non = 1.0 / ((nn_dist_m * k_th_vacancies) * (T_1 - T0))
    is_vac = element == int(ELEM.VACANCY)
    src = jnp.where(lh.if_mask, site_power * jnp.where(is_vac, p_vac, p_non), 0.0)

    valid = lh.neigh_idx >= 0
    degree = jnp.sum(valid, axis=1).astype(temperature.dtype)

    def A(u):
        # -Lap with Dirichlet-zero contacts, identity on contact rows
        uz = jnp.where(lh.if_mask, u, 0.0)
        tj = jnp.where(valid, uz[lh.neigh_idx.clip(0)], 0.0)
        y = degree * uz - jnp.sum(tj, axis=1)
        return jnp.where(lh.if_mask, y, u)

    b = src * (T_1 - T0)
    inv_diag = jnp.where(lh.if_mask, 1.0 / jnp.maximum(degree, 1.0), 1.0)
    res = jacobi_cg(A, b, jnp.zeros_like(b), inv_diag, tol, 20000)
    return jnp.where(lh.if_mask, T0 + res.x, temperature)
