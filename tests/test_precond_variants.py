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
