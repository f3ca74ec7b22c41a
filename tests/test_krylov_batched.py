"""Batched Krylov machinery: gmres_batched vs gmres, fan/multi matvecs."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from knpemidg_tpu.ops.spmv import (bell_matvec, bell_matvec_fan,
                                   bell_matvec_multi)
from knpemidg_tpu.solvers.krylov import gmres, gmres_batched


def _system(rng, nc=150, nd=3, K=4, m=2, dom=3.0):
    nbr = np.vstack([np.arange(nc),
                     rng.integers(0, nc, size=(K - 1, nc))]).astype(np.int32)
    blocks = rng.normal(size=(m, K, nd, nd, nc)).astype(np.float32) * 0.05
    for s in range(m):
        for i in range(nd):
            blocks[s, 0, i, i, :] += dom
    return jnp.asarray(blocks), jnp.asarray(nbr)


def test_matvec_fan_and_multi():
    rng = np.random.default_rng(0)
    blocks, nbr = _system(rng, m=3)
    x = jnp.asarray(rng.normal(size=(3, 3, 150)).astype(np.float32))
    ref = jnp.stack([bell_matvec(blocks[s], nbr, x[s]) for s in range(3)])
    np.testing.assert_allclose(np.asarray(bell_matvec_multi(blocks, nbr, x)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
    # fan: one operator applied to all vectors
    fan = bell_matvec_fan(blocks[0], nbr, x)
    ref_fan = jnp.stack([bell_matvec(blocks[0], nbr, x[s]) for s in range(3)])
    np.testing.assert_allclose(np.asarray(fan), np.asarray(ref_fan),
                               rtol=1e-5, atol=1e-6)


def test_gmres_batched_matches_single():
    """Per-system results and iteration counts match independent gmres."""
    rng = np.random.default_rng(1)
    blocks, nbr = _system(rng, m=2)
    b = jnp.asarray(rng.normal(size=(2, 3, 150)).astype(np.float32))
    mv = lambda V: bell_matvec_multi(blocks, nbr, V)
    res = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                        rtol=1e-6, atol=0.0, max_it=200, restart=25)
    assert bool(res.converged.all())
    for s in range(2):
        r1 = gmres(lambda v: bell_matvec(blocks[s], nbr, v), b[s],
                   jnp.zeros_like(b[s]), lambda r: r,
                   rtol=1e-6, atol=0.0, max_it=200, restart=25)
        assert int(r1.iters) == int(res.iters[s])
        rr = float(jnp.linalg.norm(b[s] - bell_matvec(blocks[s], nbr,
                                                      res.x[s]))
                   / jnp.linalg.norm(b[s]))
        assert rr < 1e-5


def test_gmres_batched_uneven_convergence():
    """One easy + one hard system: the easy one's iters stay small and its
    solution is unperturbed by the shared extra steps."""
    rng = np.random.default_rng(2)
    blocks_np = np.asarray(_system(rng, m=2)[0]).copy()
    blocks_np[0, 0] *= 30.0                      # system 0: very dominant
    blocks_np[1, 1:] *= 8.0                      # system 1: weakly dominant
    nbr = _system(np.random.default_rng(2))[1]
    blocks = jnp.asarray(blocks_np)
    b = jnp.asarray(rng.normal(size=(2, 3, 150)).astype(np.float32))
    mv = lambda V: bell_matvec_multi(blocks, nbr, V)
    res = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                        rtol=1e-7, atol=0.0, max_it=300, restart=20)
    assert bool(res.converged.all())
    assert int(res.iters[0]) < int(res.iters[1])
    for s in range(2):
        rr = float(jnp.linalg.norm(b[s] - bell_matvec(blocks[s], nbr,
                                                      res.x[s]))
                   / jnp.linalg.norm(b[s]))
        assert rr < 1e-6


def test_gmres_batched_cgs1_matches_cgs2():
    """Single-pass classical Gram-Schmidt (the halved-basis-traffic
    production option) converges to the same solution as CGS2."""
    from knpemidg_tpu.solvers.krylov import gmres_batched

    rng = np.random.default_rng(5)
    m, n = 2, 120
    A = np.stack([np.eye(n) * 3.0 + rng.normal(size=(n, n)) / np.sqrt(n)
                  for _ in range(m)])
    b = rng.normal(size=(m, n))
    mv = lambda V: jnp.einsum("sij,sj->si", jnp.asarray(A), V)
    D = jnp.asarray(1.0 / np.einsum("sii->si", A))
    pc = lambda r: D * r
    x0 = jnp.zeros((m, n))
    r1 = gmres_batched(mv, jnp.asarray(b), x0, pc, rtol=1e-11, atol=0.0,
                       max_it=600, restart=30, orth="cgs2")
    r2 = gmres_batched(mv, jnp.asarray(b), x0, pc, rtol=1e-11, atol=0.0,
                       max_it=600, restart=30, orth="cgs1")
    assert bool(np.all(np.asarray(r1.converged)))
    assert bool(np.all(np.asarray(r2.converged)))
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-8)


def test_bicgstab_batched_matches_gmres():
    """bicgstab_batched solves the same batched nonsymmetric systems as
    gmres_batched to the same preconditioned tolerance."""
    from knpemidg_tpu.solvers.krylov import bicgstab_batched, gmres_batched

    rng = np.random.default_rng(11)
    m, n = 3, 80
    A = np.stack([np.eye(n) * (2.0 + i) + 0.3 * rng.normal(size=(n, n)) / np.sqrt(n)
                  for i in range(m)])
    b = rng.normal(size=(m, n))
    mv = lambda V: jnp.einsum("sij,sj->si", jnp.asarray(A), V)
    D = jnp.asarray(1.0 / np.einsum("sii->si", A))
    pc = lambda r: D * r
    x0 = jnp.zeros((m, n))
    r1 = gmres_batched(mv, jnp.asarray(b), x0, pc, rtol=1e-10, atol=0.0,
                       max_it=500, restart=30)
    r2 = bicgstab_batched(mv, jnp.asarray(b), x0, pc, rtol=1e-10, atol=0.0,
                          max_it=500)
    assert bool(np.all(np.asarray(r1.converged)))
    assert bool(np.all(np.asarray(r2.converged)))
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-7)
    # direct check
    x2 = np.asarray(r2.x)
    for s in range(m):
        assert np.linalg.norm(A[s] @ x2[s] - b[s]) < 1e-7 * np.linalg.norm(b[s])


def test_gmres_batched_cgs2c_matches_cgs2():
    """Chunked CGS2 ('cgs2c') performs the same projections as full-basis
    CGS2 (basis rows > j are zero) -- solutions agree to solver tolerance
    and iteration counts stay within one step of each other."""
    rng = np.random.default_rng(3)
    blocks, nbr = _system(rng, m=2, dom=2.0)
    b = jnp.asarray(rng.normal(size=(2, 3, 150)).astype(np.float32))
    mv = lambda V: bell_matvec_multi(blocks, nbr, V)
    kw = dict(rtol=1e-7, atol=0.0, max_it=300)
    # restart 30 exercises the Mrows=32 padded capacity; restart 7 the
    # CH-interior case; restart 8 the exact-multiple boundary (Mrows=16)
    for restart in (30, 7, 8):
        r_full = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                               restart=restart, orth="cgs2", **kw)
        r_chnk = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                               restart=restart, orth="cgs2c", **kw)
        assert bool(r_chnk.converged.all())
        np.testing.assert_array_less(
            np.abs(np.asarray(r_chnk.iters) - np.asarray(r_full.iters)), 2)
        for s in range(2):
            rr = float(jnp.linalg.norm(
                b[s] - bell_matvec(blocks[s], nbr, r_chnk.x[s]))
                / jnp.linalg.norm(b[s]))
            assert rr < 1e-6


def test_gmres_batched_rot_carry_matches_replay():
    """The carried rotation product Q applied as one GEMV is the same
    linear map as replaying the stored 2x2 Givens rotations."""
    rng = np.random.default_rng(4)
    blocks, nbr = _system(rng, m=2, dom=2.0)
    b = jnp.asarray(rng.normal(size=(2, 3, 150)).astype(np.float32))
    mv = lambda V: bell_matvec_multi(blocks, nbr, V)
    kw = dict(rtol=1e-7, atol=0.0, max_it=300, restart=12)
    r_rep = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                          rot="replay", **kw)
    r_car = gmres_batched(mv, b, jnp.zeros_like(b), lambda r: r,
                          rot="carry", **kw)
    assert bool(r_car.converged.all())
    np.testing.assert_array_less(
        np.abs(np.asarray(r_car.iters) - np.asarray(r_rep.iters)), 2)
    for s in range(2):
        rr = float(jnp.linalg.norm(b[s] - bell_matvec(blocks[s], nbr,
                                                      r_car.x[s]))
                   / jnp.linalg.norm(b[s]))
        assert rr < 1e-6
