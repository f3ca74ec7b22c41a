"""KNP preconditioner variants must agree: additive two-level (default)
and the symmetric V-cycle ('two_level_mult').  A preconditioner cannot
change the converged answer, only the iteration count -- so all variants
must converge and land on the same state at solver tolerance.  (A
zero-matvec 'coarse-residual' multiplicative variant was tried in round 4
and removed: algebraically vacuous, diverges on EMIx -- see
solvers/twolevel.two_level_apply_batched docstring.)"""
import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


@pytest.mark.parametrize("kind", ["two_level_mult"])
def test_knp_precond_variants_agree(kind):
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    import dataclasses

    sp0 = SolverParams(direct_emi=False, direct_knp=False,
                       rtol_emi=1e-8, rtol_knp=1e-8,
                       max_it_emi=300, max_it_knp=150, gmres_restart=10)

    S = build_solver(resolution=0)
    out0, st0 = S.fused_step(sp0)(S.attach_pc(S._initial_state(0.0), sp0))
    assert bool(np.all(np.asarray(st0["knp_converged"])))

    S2 = build_solver(resolution=0)
    sp = dataclasses.replace(sp0, precond_knp=kind)
    out, st = S2.fused_step(sp)(S2.attach_pc(S2._initial_state(0.0), sp))
    assert bool(np.all(np.asarray(st["knp_converged"]))), kind
    assert bool(np.all(np.asarray(st["emi_converged"]))), kind

    # agreement is at solver-tolerance level, not bitwise: GMRES here is
    # LEFT-preconditioned (krylov.py gmres_batched), so the stopping test
    # lives in the pc norm and different preconditioners stop at slightly
    # different true residuals (measured max rel 5.7e-5 for mult_approx on
    # this problem at rtol 1e-8)
    np.testing.assert_allclose(
        np.asarray(out0["c"]), np.asarray(out["c"]), rtol=2e-4, atol=2e-6,
        err_msg=kind,
    )
    np.testing.assert_allclose(
        np.asarray(out0["phi_M"]), np.asarray(out["phi_M"]),
        rtol=1e-3, atol=1e-6, err_msg=kind,
    )


def test_emi_ritz_deflation_agrees_and_refresh_reuses_harvest():
    """emi_ritz (default 24 since round 4) is a preconditioner enrichment:
    the converged state must match emi_ritz=0 at solver tolerance, and a
    pc refresh must keep the t=0 harvest (re-harvesting mid-run is
    measured harmful, tools/exp_ritz_ab.py)."""
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    import dataclasses

    sp_off = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-8, rtol_knp=1e-8,
                          max_it_emi=300, max_it_knp=150, gmres_restart=10,
                          emi_ritz=0)
    sp_on = dataclasses.replace(sp_off, emi_ritz=8)

    S0 = build_solver(resolution=0)
    out0, st0 = S0.fused_step(sp_off)(S0.attach_pc(S0._initial_state(0.0),
                                                   sp_off))

    S1 = build_solver(resolution=0)
    state = S1.attach_pc(S1._initial_state(0.0), sp_on)
    assert "ritz_W" in state["pc"]["emi"]
    W0 = np.asarray(state["pc"]["emi"]["ritz_W"])
    out1, st1 = S1.fused_step(sp_on)(state)
    assert bool(np.all(np.asarray(st1["emi_converged"])))
    np.testing.assert_allclose(
        np.asarray(out0["c"]), np.asarray(out1["c"]), rtol=5e-6, atol=1e-9)

    # refresh keeps the harvest bit-identically
    refreshed = S1._refresh_pc(out1, sp_on)
    np.testing.assert_array_equal(
        W0, np.asarray(refreshed["pc"]["emi"]["ritz_W"]))


def test_two_level_equilibration_f32_dead_chunks_finite():
    """f32 regression (round-4 sharded-pair dryrun failure): the coarse
    equilibration floor must not underflow.  Dead padded pair chunks give
    EXACTLY-ZERO coarse diagonal rows, and with KNP-sized magnitudes
    (diag ~ vol/dt ~ 1e-11 cgs) the old ``1e-30 * max(d)`` floor is 0.0f
    -> rsqrt(0) = inf -> the whole coarse inverse NaN-poisons through
    0*inf, and the sharded pair KNP GMRES exits at 0 iterations
    unconverged.  Runs in float32 DTYPE regardless of the x64 test config."""
    import jax.numpy as jnp

    from knpemidg_tpu.solvers.twolevel import build_two_level

    agg = 4
    nc = 16                                  # 4 chunks; last chunk dead
    live = 12
    rng = np.random.default_rng(0)
    # 1-ring neighbor structure on a path graph, self at slot 0; inert pad
    # cells are topologically isolated (live cells never neighbor them),
    # exactly like the sharded pair layout's padding
    nbr = np.stack([np.arange(nc),
                    np.maximum(np.arange(nc) - 1, 0),
                    np.minimum(np.arange(nc) + 1, nc - 1)])
    nbr[2, live - 1] = live - 1                # last live cell: self edge
    nbr[:, live:] = np.arange(live, nc)[None]  # pads only self-reference
    # off-diagonal value sums (negative, Laplacian-like), zero on dead slots
    v = np.zeros((3, nc), dtype=np.float32)
    v[1:, :live] = -1e-11 * (1.0 + rng.random((2, live), dtype=np.float32))
    v[:, live:] = 0.0
    mass = np.zeros(nc, dtype=np.float32)
    mass[:live] = 1e-11
    data = build_two_level(None, jnp.asarray(nbr), agg, sym=False,
                           mass_diag=jnp.asarray(mass),
                           v=jnp.asarray(v))
    s = np.asarray(data["s"])
    inv = np.asarray(data["inv"])
    assert np.isfinite(s).all(), "equilibration scale overflowed (inf)"
    assert np.isfinite(inv).all(), "coarse inverse NaN-poisoned"


def test_three_level_coarse_parity():
    """build_two_level(max_dense=k) three-level hierarchy: same converged
    solution as the dense two-level, sane iteration count.  (The three-level
    engages automatically when nc/agg_size exceeds max_dense -- the ~1M-cell
    regime where a dense level-1 coarse would OOM; here max_dense is forced
    tiny so a small problem exercises the same code path.)"""
    import jax.numpy as jnp

    from knpemidg_tpu.ops.spmv import bell_matvec
    from knpemidg_tpu.solvers.krylov import pcg
    from knpemidg_tpu.solvers.twolevel import (build_two_level,
                                               two_level_apply_fn)

    nc, agg = 512, 8
    rng = np.random.default_rng(1)
    nbr = np.stack([np.arange(nc),
                    np.maximum(np.arange(nc) - 1, 0),
                    np.minimum(np.arange(nc) + 1, nc - 1)])
    off = -(0.5 + rng.random((2, nc)))
    mass = 0.05 * (1.0 + rng.random(nc))
    # symmetrize the path-graph couplings: A[i,i-1] must equal A[i-1,i]
    off[0, 1:] = off[1, :-1]
    off[0, 0] = 0.0
    off[1, -1] = 0.0
    diag = mass - off.sum(axis=0)
    blocks = jnp.asarray(
        np.stack([diag, off[0], off[1]])[:, None, None, :])  # (3,1,1,nc)
    nbrj = jnp.asarray(nbr)
    P_diag = blocks[0]
    b = jnp.asarray(rng.random((1, nc)))
    mv = lambda x: bell_matvec(blocks, nbrj, x)

    sols = {}
    for name, md in [("two", None), ("three", 8)]:
        data = build_two_level(blocks, nbrj, agg, sym=False,
                               mass_diag=jnp.asarray(mass), max_dense=md)
        assert ("d1inv" in data) == (name == "three")
        pc = two_level_apply_fn(data, P_diag, agg)
        res = pcg(mv, b, jnp.zeros_like(b), pc,
                  rtol=1e-10, atol=0.0, max_it=400)
        assert bool(res.converged), name
        assert int(res.iters) < 200, (name, int(res.iters))
        sols[name] = np.asarray(res.x)
    np.testing.assert_allclose(sols["three"], sols["two"],
                               rtol=1e-7, atol=1e-10)


def test_emi_ritz_host_harvest_agrees():
    """emi_ritz_host=True (deterministic f64 host Lanczos) is a pc
    enrichment like the device harvest: converged state matches
    emi_ritz=0 at solver tolerance, in both operator layouts."""
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    import dataclasses

    sp_off = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-8, rtol_knp=1e-8,
                          max_it_emi=300, max_it_knp=150, gmres_restart=10,
                          emi_ritz=0)
    sp_on = dataclasses.replace(sp_off, emi_ritz=8, emi_ritz_host=True)

    S0 = build_solver(resolution=0)
    out0, st0 = S0.fused_step(sp_off)(S0.attach_pc(S0._initial_state(0.0),
                                                   sp_off))

    for pair in (False, True):
        S1 = build_solver(resolution=0)
        if pair:
            S1.enable_pair_layout()
        state = S1.attach_pc(S1._initial_state(0.0), sp_on)
        assert "ritz_W" in state["pc"]["emi"], pair
        out1, st1 = S1.fused_step(sp_on)(state)
        if pair:
            from knpemidg_tpu.parallel.sharding import unpad_state

            out1 = unpad_state(S1, out1)
        assert bool(np.all(np.asarray(st1["emi_converged"]))), pair
        assert bool(np.all(np.asarray(st1["knp_converged"]))), pair
        np.testing.assert_allclose(
            np.asarray(out0["c"]), np.asarray(out1["c"]),
            rtol=2e-5, atol=1e-9, err_msg=f"pair={pair}")


def test_coarse_ridge_nan_fallback_ladder():
    """f32 regression (round-5 995k scale study): a sub-default
    ``coarse_ridge`` must never silently zero the preconditioner.  At 995k
    tets ridge 1e-7/1e-8 NaN-poisoned the coarse Cholesky and EMI PCG
    "converged" in 0 iterations every step; build_two_level now refactors
    at the safe 1e-5 and selects by isfinite whenever ridge < 1e-5.

    Construction: symmetric path-graph Laplacian coarse (singular Neumann
    constant mode) made slightly INDEFINITE via a -1e-4 extra_diag bump on
    one cell -- small enough that the 1e-5 shift restores positive
    definiteness, large enough that a 1e-7 shift leaves a negative pivot
    (NaN) in float32.  The ladder must (a) return a finite inverse and
    (b) return the 1e-5-fallback inverse, not the poisoned one.
    """
    import jax.numpy as jnp

    from knpemidg_tpu.solvers.twolevel import build_two_level

    nc, agg = 64, 4
    rng = np.random.default_rng(1)
    w = (1.0 + rng.random(nc - 1)).astype(np.float32)   # edge (c, c+1)
    nbr = np.stack([np.arange(nc),
                    np.maximum(np.arange(nc) - 1, 0),
                    np.minimum(np.arange(nc) + 1, nc - 1)])
    v = np.zeros((3, nc), np.float32)
    v[1, 1:] = -w
    v[2, :-1] = -w
    mass = np.zeros(nc, np.float32)
    ed = np.zeros((1, 1, nc), np.float32)
    ed[0, 0, 0] = -1e-4
    kw = dict(sym=False, mass_diag=jnp.asarray(mass), v=jnp.asarray(v),
              extra_diag=jnp.asarray(ed))
    ref = build_two_level(None, jnp.asarray(nbr), agg, ridge=1e-5, **kw)
    lad = build_two_level(None, jnp.asarray(nbr), agg, ridge=1e-7, **kw)
    inv_ref = np.asarray(ref["inv"], dtype=np.float64)
    inv_lad = np.asarray(lad["inv"], dtype=np.float64)
    assert np.isfinite(inv_ref).all(), "safe-ridge inverse must be finite"
    assert np.isfinite(inv_lad).all(), "ladder failed to rescue NaN coarse"
    # the selected inverse is the 1e-5 fallback (shift 1e-5 - 1e-7), not a
    # surviving low-ridge factorization (which would be ~100x larger here)
    np.testing.assert_allclose(inv_lad, inv_ref, rtol=2e-2)


def test_axial_moment_fields_and_solve():
    """emi_moment_axial: elongated compartments get Chebyshev T_j of the
    scaled dominant-axis coordinate for j = order+1..axial_order; round
    compartments get none; the enriched pc still converges to the same
    state (a deflation space change cannot move the answer)."""
    from knpemidg_tpu.solvers.twolevel import moment_vectors

    rng = np.random.default_rng(0)
    nc, nd = 40, 4
    coords = np.zeros((nc, nd, 3))
    # comp 0: elongated 20:1 along y; comp 1: round
    coords[:20, :, 0] = rng.uniform(0, 1, (20, nd))
    coords[:20, :, 1] = rng.uniform(0, 20, (20, nd))
    coords[:20, :, 2] = rng.uniform(0, 1, (20, nd))
    coords[20:] = rng.uniform(0, 1, (20, nd, 3))
    comp = np.repeat([0, 1], 20)

    base = moment_vectors(coords, comp, order=2, host=True)
    ax = moment_vectors(coords, comp, order=2, host=True, axial_order=6)
    # only the elongated compartment gains rows: T_3..T_6 = 4 rows
    assert ax.shape[0] == base.shape[0] + 4
    # the new rows are T_j(loc_y) on comp 0: check T_3 = 4x^3 - 3x against
    # the compartment's own scaled coordinate, zero on comp 1
    sel = coords[:20]
    ctr = sel.mean(axis=(0, 1))
    L = np.abs(sel - ctr).max(axis=(0, 1))
    x = ((coords - ctr) / L)[:, :, 1]
    t3 = ax[9]      # comp 0: 9 tensor rows, then T_3 as first axial row
    np.testing.assert_allclose(t3[:, :20], (4 * x**3 - 3 * x).T[:, :20],
                               rtol=1e-12, atol=1e-12)
    assert np.all(t3[:, 20:] == 0.0)

    # end-to-end: enriched pc converges and agrees at solver tolerance
    import dataclasses

    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    sp_off = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-8, rtol_knp=1e-8,
                          max_it_emi=300, max_it_knp=150, gmres_restart=10)
    sp_on = dataclasses.replace(sp_off, emi_moment_axial=6,
                                emi_moment_host=True)
    S0 = build_solver(resolution=0)
    out0, _ = S0.fused_step(sp_off)(S0.attach_pc(S0._initial_state(0.0),
                                                 sp_off))
    S1 = build_solver(resolution=0)
    st = S1.attach_pc(S1._initial_state(0.0), sp_on)
    out1, st1 = S1.fused_step(sp_on)(st)
    assert bool(np.all(np.asarray(st1["emi_converged"])))
    assert bool(np.all(np.asarray(st1["knp_converged"])))
    np.testing.assert_allclose(np.asarray(out0["c"]), np.asarray(out1["c"]),
                               rtol=2e-5, atol=1e-9)
