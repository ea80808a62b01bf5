"""Conjugate-gradient solvers as jitted ``lax.while_loop``s.

TPU-native replacement for the reference's distributed CG library
(dist_iterative/dist_conjugate_gradient.cpp): the SpMV is a matrix-free
closure over padded ELL gathers (no CSR assembly, no halo machinery — under
a sharded mesh XLA turns the row-sharded gather of the replicated vector into
the same all-gather/psum pattern the reference hand-codes with MPI).

Semantics (kept bit-compatible for parity):
  * ``jacobi_cg`` mirrors ``conjugate_gradient_jacobi``
    (dist_conjugate_gradient.cpp:149-276): preconditioned dot r.z against
    ||b||^2, squared-tolerance test ``r.z / b.b > rtol^2``, warm start.
  * ``symscaled_cg`` mirrors ``solve_sparse_CG_Jacobi``
    (iterative_solvers_gpu.cu:716-887): symmetric Jacobi scaling
    D^-1/2 A D^-1/2 + plain CG with ||r||^2 <= tol^2 in the scaled space.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax

Operator = Callable[[jnp.ndarray], jnp.ndarray]


def f64_matvec(M: jnp.ndarray, v: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Dense f64 matvec as broadcast-multiply + reduce.

    On this TPU runtime f64 ``dot_general`` (einsum/@/jnp.dot on matrices)
    lowers pathologically: a (74,512,4818) band matvec measured ~125 ms
    device vs ~10 ms for the identical mul+reduce (values agree to 1e-14 —
    fp reassociation only). Plain f64 elementwise/reduce ops are fast, so
    every dense matvec in a hot path goes through this helper. ``axis=1``
    computes M @ v; ``axis=0`` computes M.T @ v without materializing M.T.
    """
    if axis == 1:
        return jnp.sum(M * v[None, :], axis=1)
    return jnp.sum(M * v[:, None], axis=0)


def f64_vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f64 VECTOR dot as mul+reduce.

    On this runtime ``jnp.dot(v, w)`` on f64 vectors is pathological at
    multi-million n: measured 50.7 ms vs 1.05 ms for the identical
    ``jnp.sum(v * w)`` at n = 4.62M (tools/probe_vec_ops.py) — 48x. With
    two dots per CG iteration that was 101 of the 138 ms/iteration of the
    crossbar K solve (tools/probe_cg_phase.py). The reduction ORDER differs
    from dot's, so results shift in the last ulps: production (non-parity)
    solves only — the golden 5 nm path keeps ``jnp.dot``.
    """
    return jnp.sum(a * b)


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray      # int32
    residual_sq: jnp.ndarray     # final r.z (jacobi) or r.r (symscaled)
    r: Optional[jnp.ndarray] = None   # final (recurrence) residual vector —
    #                                   carried by warm-start paths so the
    #                                   next solve's r0 = r + exact ΔA·x0
    #                                   terms instead of a fresh matvec


def jacobi_cg(
    A: Operator,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    inv_diag: jnp.ndarray,
    relative_tolerance: float | jnp.ndarray,
    max_iterations: int,
    r0: Optional[jnp.ndarray] = None,
    dot_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = jnp.dot,
) -> CGResult:
    """Jacobi-preconditioned CG, reference semantics
    (dist_conjugate_gradient.cpp:149-276).

    Stops when r.z / b.b <= rtol^2 or k > max_iterations. All dot products
    are global sums — under sharding they lower to psum over the mesh
    (replacing hipblasDdot + MPI_Allreduce).

    ``r0``: optional precomputed initial residual b - A(x0) (e.g. carried
    incrementally across warm-started solves); when given, the entry
    matvec is skipped — on a converged warm start the whole solve then
    runs zero operator applications.

    ``dot_fn``: the vector dot. Default ``jnp.dot`` (parity fp order);
    production paths pass ``f64_vdot`` (48x faster at multi-M n on this
    runtime, reassociated reduction).
    """
    norm2_rhs = dot_fn(b, b)

    r0_vec = (b - A(x0)) if r0 is None else r0
    z0 = r0_vec * inv_diag
    rz0 = dot_fn(r0_vec, z0)

    def cond(c):
        x, r, z, p, rz, k = c
        return (rz / norm2_rhs > relative_tolerance**2) & (k <= max_iterations)

    def body(c):
        x, r, z, p, rz, k = c
        # p_{k+1} = z + beta p  (first iteration: p = z, handled via beta=0)
        Ap = A(p)
        pAp = dot_fn(p, Ap)
        a = rz / pAp
        x = x + a * p
        r = r - a * Ap
        z_new = r * inv_diag
        rz_new = dot_fn(r, z_new)
        beta = rz_new / rz
        p = z_new + beta * p
        return (x, r, z_new, p, rz_new, k + 1)

    init = (x0, r0_vec, z0, z0, rz0, jnp.asarray(1, jnp.int32))
    x, r, z, p, rz, k = lax.while_loop(cond, body, init)
    return CGResult(x=x, iterations=k, residual_sq=rz, r=r)


def symscaled_cg(
    A: Operator,
    diag: jnp.ndarray,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: float = 1e-14,
    max_iterations: int = 100000,
    dot_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = jnp.dot,
) -> CGResult:
    """CG on the symmetrically-scaled system (D^-1/2 A D^-1/2) y = D^-1/2 b,
    y = D^1/2 x. Reference: solve_sparse_CG_Jacobi
    (iterative_solvers_gpu.cu:716-887); loop test ||r||^2 > tol^2.
    ``dot_fn``: see jacobi_cg."""
    inv_sqrt_d = 1.0 / jnp.sqrt(diag)

    def As(y):
        return inv_sqrt_d * A(inv_sqrt_d * y)

    bs = b * inv_sqrt_d
    y0 = x0 / inv_sqrt_d      # 'unprecondition' of the warm start

    r0_vec = As(y0) - bs
    p0 = -r0_vec
    norm0 = dot_fn(r0_vec, r0_vec)

    def cond(c):
        y, r, p, k = c
        return (dot_fn(r, r) > tol * tol) & (k < max_iterations)

    def body(c):
        y, r, p, k = c
        t = dot_fn(r, r)
        Ap = As(p)
        alpha = t / dot_fn(p, Ap)
        y = y + alpha * p
        r = r + alpha * Ap
        beta = dot_fn(r, r) / t
        p = beta * p - r
        return (y, r, p, k + 1)

    y, r, p, k = lax.while_loop(cond, body, (y0, r0_vec, p0, jnp.asarray(0, jnp.int32)))
    return CGResult(x=y * inv_sqrt_d, iterations=k, residual_sq=dot_fn(r, r))
