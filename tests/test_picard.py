"""Picard mode: inner iterations must converge and agree with the plain
splitting step to the Picard tolerance (solver.py:850-927)."""
import numpy as np
import pytest

from knpemidg_tpu.config import SolverParams




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
