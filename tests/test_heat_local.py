"""Local Laplacian heat model: physical invariants (diffusion smooths,
sources heat, contacts pin to T_bg; steady state solves -Lap T = s)."""

import jax.numpy as jnp
import numpy as np

from akmc_tpu.lattice import ELEM
from akmc_tpu.solvers.heat import (
    build_local_heat,
    update_temperature_local,
    update_temperature_local_steady,
)


def _chain(n=32):
    # 1-D chain with 4 contact sites on each side
    neigh = np.full((n, 2), -1, np.int32)
    neigh[1:, 0] = np.arange(n - 1)
    neigh[:-1, 1] = np.arange(1, n)
    return build_local_heat(neigh, n, num_atoms_contact=4)


def test_transient_diffusion_smooths_and_heats():
    n = 32
    lh = _chain(n)
    elem = np.full(n, int(ELEM.O), np.int32)
    elem[16] = int(ELEM.VACANCY)
    power = np.zeros(n)
    power[16] = 1e-6

    T0 = 300.0
    t = jnp.full(n, T0)
    t2 = update_temperature_local(
        lh, t, jnp.asarray(power), jnp.asarray(elem),
        step_time=1e-9, delta_t=1e-13, tau=1e9,
        background_temp=T0, nn_dist_m=3.5e-10,
        k_th_interface=1.0, k_th_vacancies=5.0,
    )
    t2 = np.asarray(t2)
    # contacts pinned
    np.testing.assert_allclose(t2[:4], T0)
    np.testing.assert_allclose(t2[-4:], T0)
    # heated at the source, decaying away from it
    assert t2[16] > T0
    assert t2[16] >= t2[14] >= t2[12]
    assert np.isfinite(t2).all()


def test_steady_state_matches_dense_solve():
    n = 32
    lh = _chain(n)
    elem = np.full(n, int(ELEM.O), np.int32)
    power = np.zeros(n)
    power[10] = 2e-6
    power[20] = 1e-6
    T0 = 300.0

    t = update_temperature_local_steady(
        lh, jnp.full(n, T0), jnp.asarray(power), jnp.asarray(elem),
        background_temp=T0, nn_dist_m=3.5e-10,
        k_th_interface=1.0, k_th_vacancies=5.0,
    )
    t = np.asarray(t)

    # dense oracle: -Lap u = b on interface DOFs (Dirichlet-0 contacts)
    if_idx = np.arange(4, n - 4)
    m = len(if_idx)
    A = np.zeros((m, m))
    for a, i in enumerate(if_idx):
        A[a, a] = 2.0
        for j in (i - 1, i + 1):
            if j in if_idx:
                A[a, np.where(if_idx == j)[0][0]] -= 1.0
    T1 = T0 + 1000.0
    p_non = 1.0 / ((3.5e-10 * 5.0) * (T1 - T0))
    b = power[if_idx] * p_non * (T1 - T0)
    u = np.linalg.solve(A, b)
    np.testing.assert_allclose(t[if_idx], T0 + u, rtol=1e-7)
    np.testing.assert_allclose(t[:4], T0)
