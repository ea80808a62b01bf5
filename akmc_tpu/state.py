"""Mutable simulation state as a single JAX pytree.

The reference splits state across a host SoA (Device.h:85-107) and a device
SoA (gpu_buffers.h:12-162) with explicit sync calls. Here there is ONE pytree
of device arrays; the host only touches it at superstep boundaries for I/O.

f64 is used for all field vectors (the CG tolerances of 1e-14·N demand it,
potential_solver_gpu.cu:885), int32 for discrete per-site attributes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from akmc_tpu.lattice import ELEM, Lattice
from akmc_tpu.rng import ReferenceRNG


class DeviceState(NamedTuple):
    """Per-site dynamic state (reference: Device.h:85-107 field vectors)."""

    element: jax.Array              # (N,) int32 element codes
    charge: jax.Array               # (N,) int32 site charges
    potential_boundary: jax.Array   # (N,) f64 [V] solution of the K system
    potential_charge: jax.Array     # (N,) f64 [V] pairwise + summed potential
    power: jax.Array                # (N,) f64 [W] dissipated power
    temperature: jax.Array          # (N,) f64 [K]
    cb_edge: jax.Array              # (N,) f64 [J] conduction-band edge
    T_bg: jax.Array                 # ()  f64 [K] global background temperature
    kmc_time: jax.Array             # ()  f64 [s] elapsed time at this bias point


def make_device_state(
    lat: Lattice, background_temp: float, dtype=jnp.float64
) -> DeviceState:
    n = lat.N
    z = jnp.zeros(n, dtype)
    return DeviceState(
        element=jnp.asarray(lat.element0, jnp.int32),
        charge=jnp.zeros(n, jnp.int32),
        potential_boundary=z,
        potential_charge=z,
        power=z,
        temperature=jnp.full(n, background_temp, dtype),
        cb_edge=z,
        T_bg=jnp.asarray(background_temp, dtype),
        kmc_time=jnp.asarray(0.0, dtype),
    )


def make_substoichiometric(
    element: np.ndarray,
    vacancy_concentration: float,
    rng: ReferenceRNG,
) -> np.ndarray:
    """Convert an initial fraction of O atoms to vacancies using the Device
    RNG stream — draw-for-draw identical to the reference
    (Device.cpp:180-211): draws index into the *atom* (non-defect) list and
    retries until enough O sites were hit."""
    element = element.copy()
    atom_ind = np.nonzero(
        (element != int(ELEM.DEFECT)) & (element != int(ELEM.OXYGEN_DEFECT))
    )[0]
    n_atom = len(atom_ind)
    atom_element = element[atom_ind].copy()
    num_o = int((element == int(ELEM.O)).sum())
    num_v_add = int(vacancy_concentration * num_o)
    while num_v_add > 0:
        loc = int(rng.one() * n_atom)
        if atom_element[loc] == int(ELEM.O):
            atom_element[loc] = int(ELEM.VACANCY)
            element[atom_ind[loc]] = int(ELEM.VACANCY)
            num_v_add -= 1
    return element
