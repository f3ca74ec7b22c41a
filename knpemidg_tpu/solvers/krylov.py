"""Jitted Krylov solvers: preconditioned CG and restarted GMRES.

Replace PETSc KSP (SURVEY.md N3): CG for the (singular, symmetric) EMI
system with explicit constant-nullspace projection standing in for
``setNearNullSpace`` (solver.py:465-490), GMRES for the nonsymmetric
(upwinded) KNP systems (solver.py:683-701).

Convergence test: ||r||_2 <= max(rtol * ||b||_2, atol), true residual.
All reductions are plain jnp dots, which lower to psum when the operand
arrays are sharded over the device mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray        # int32
    resnorm: jnp.ndarray
    converged: jnp.ndarray    # bool


def _dot(a, b):
    return jnp.vdot(a.ravel(), b.ravel())


def _project_constant(x):
    """Remove the constant-vector component (EMI nullspace)."""
    return x - jnp.mean(x)


def pcg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    precond: Callable,
    rtol: float,
    atol: float,
    max_it: int,
    project_nullspace: bool = False,
    b_ref: Optional[jnp.ndarray] = None,
) -> KrylovResult:
    """Preconditioned conjugate gradients.

    ``b_ref``: optional vector whose (preconditioned) norm anchors the
    relative tolerance instead of ``b`` -- used by the increment-form solves
    where ``b`` is the initial residual but the tolerance must stay relative
    to the full right-hand side (PETSc semantics with nonzero guess).

    Convergence is tested in the *preconditioned* residual norm
    ``||M^-1 r||_2`` relative to ``||M^-1 b||_2`` -- the PETSc KSPCG default
    (KSP_NORM_PRECONDITIONED) the reference relies on (solver.py:425-436).
    This matters enormously for the EMI system: the per-compartment membrane
    jump modes have eigenvalues orders of magnitude below the bulk modes, so
    the plain (or natural sqrt(r.z)) residual norm is nearly blind to
    exactly the error that carries the physics; ||M^-1 r|| weights those
    modes by 1/lambda (the two-level M resolves them) and controls the
    solution error directly.
    """
    proj = _project_constant if project_nullspace else (lambda v: v)

    b = proj(b)
    x0 = proj(x0)
    r = proj(b - matvec(x0))
    z = precond(r)
    p = z
    rz = _dot(r, z)
    bz = precond(b if b_ref is None else b_ref)
    bnorm = jnp.sqrt(_dot(bz, bz))
    tol = jnp.maximum(rtol * bnorm, atol)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.sqrt(_dot(z, z)) > tol) & (k < max_it)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / _dot(p, Ap)
        x = proj(x + alpha * p)
        r = proj(r - alpha * Ap)
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, (x0, r, z, p, rz, jnp.int32(0)))
    rn = jnp.sqrt(_dot(z, z))
    return KrylovResult(x=x, iters=k, resnorm=rn, converged=rn <= tol)


def gmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    precond: Callable,
    rtol: float,
    atol: float,
    max_it: int,
    restart: int = 20,
    matvec_hi: Optional[Callable] = None,
    b_ref: Optional[jnp.ndarray] = None,
) -> KrylovResult:
    """Right-preconditioned restarted GMRES(m) with modified Gram-Schmidt.

    Solves A M^-1 u = b, x = M^-1 u; the reported residual is the true
    residual of A x = b.  Each restart cycle runs the full `restart` Arnoldi
    steps (converged systems are detected between cycles), which keeps the
    loop structure static for XLA/vmap.

    `matvec_hi`: optional higher-precision matvec used only for the
    once-per-cycle residual computation (mixed-precision iterative
    refinement) -- in f32 the computed residual floors at ~eps * ||A|| *
    ||x|| just above the production rtol; one f64 residual per restart
    breaks through that floor while all Krylov work stays f32.
    """
    shape = b.shape
    n = b.size
    bv = b.ravel()

    def Aop(v):
        return matvec(precond(v.reshape(shape))).ravel()

    if matvec_hi is None:
        res_hi = lambda x: bv - matvec(x.reshape(shape)).ravel()
    else:
        def res_hi(x):
            r = matvec_hi(x.reshape(shape))
            return (bv.astype(r.dtype) - r.ravel()).astype(b.dtype)

    bref = bv if b_ref is None else b_ref.ravel()
    bnorm = jnp.sqrt(_dot(bref, bref))
    tol = jnp.maximum(rtol * bnorm, atol)
    max_cycles = -(-max_it // restart)
    m = restart

    def cycle(x):
        r = res_hi(x)
        beta = jnp.sqrt(_dot(r, r))
        safe = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n), dtype=b.dtype).at[0].set(r / safe)
        H = jnp.zeros((m + 1, m), dtype=b.dtype)

        def arnoldi(j, VH):
            V, H = VH
            w = Aop(V[j])
            # classical Gram-Schmidt with reorthogonalization (CGS2):
            # two skinny GEMV pairs over the whole basis (rows > j are zero)
            # -- MXU-friendly, unlike a sequential modified-GS loop
            h1 = V @ w
            w = w - h1 @ V
            h2 = V @ w
            w = w - h2 @ V
            hcol = h1 + h2
            hj1 = jnp.sqrt(_dot(w, w))
            hcol = hcol.at[j + 1].set(hj1)
            vnext = jnp.where(hj1 > 1e-300, w / jnp.where(hj1 > 0, hj1, 1.0), 0.0)
            V = V.at[j + 1].set(vnext)
            H = H.at[:, j].set(hcol)
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
        e1 = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        u = V[:m].T @ y
        return x + precond(u.reshape(shape)).ravel()

    def cond(state):
        x, k = state
        r = res_hi(x)
        return (jnp.sqrt(_dot(r, r)) > tol) & (k < max_cycles)

    def body(state):
        x, k = state
        return (cycle(x), k + 1)

    x, k = jax.lax.while_loop(cond, body, (x0.ravel(), jnp.int32(0)))
    r = res_hi(x)
    rn = jnp.sqrt(_dot(r, r))
    return KrylovResult(
        x=x.reshape(shape), iters=k * m, resnorm=rn, converged=rn <= tol
    )
