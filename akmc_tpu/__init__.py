"""akmc_tpu — TPU-native kinetic Monte Carlo simulation of resistive-memory arrays.

A from-scratch JAX/XLA/Pallas framework with the capabilities of DeviceKMC
(manasakani/Accelerated-Kinetic-Monte-Carlo-simulations-of-atomistically-resolved-
resistive-memory-arrays): atomistically-resolved valence-change-memory (VCM) RRAM
filament dynamics coupling charge assignment, Poisson/Kirchhoff potential solves,
quantum-tunneling current/power, Joule heating, and rejection-free KMC events.

Design (TPU-first, not a port):
  * one jitted superstep over static-shape arrays (no host round-trips per event),
  * matrix-free ELL operators + Jacobi-CG in ``lax.while_loop`` instead of
    CSR assembly + hipSPARSE,
  * the KMC residence-time loop fused on device,
  * scaling via ``jax.sharding.Mesh`` + collectives over ICI instead of MPI.

Reference parity citations use `file:line` into the upstream C++/HIP sources.
"""

from akmc_tpu.config import KMCParameters, Layer, default_layers
from akmc_tpu.lattice import (
    ELEM,
    ELEMENT_NAMES,
    Lattice,
    read_xyz,
    write_xyz_snapshot,
)
from akmc_tpu.state import DeviceState, make_device_state
from akmc_tpu.rng import ReferenceRNG

__version__ = "0.1.0"

__all__ = [
    "KMCParameters",
    "Layer",
    "default_layers",
    "ELEM",
    "ELEMENT_NAMES",
    "Lattice",
    "read_xyz",
    "write_xyz_snapshot",
    "DeviceState",
    "make_device_state",
    "ReferenceRNG",
    "__version__",
]
