"""Blocked (lax.scan) time loop matches the per-step loop."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams


@pytest.mark.slow
def test_scan_blocks_match_stepwise():
    from run_2D import build_solver

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)

    S1 = build_solver(resolution=0)
    s1 = S1.solve_system_active(6 * S1.params.dt, 0.0, sp)

    S2 = build_solver(resolution=0)
    s2 = S2.solve_system_active(6 * S2.params.dt, 0.0, sp, scan_steps=3)

    np.testing.assert_allclose(np.asarray(s1["c"]), np.asarray(s2["c"]),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1["phi_M"]), np.asarray(s2["phi_M"]),
                               rtol=1e-4, atol=1e-7)
    assert len(S2.stats.emi_niters) == 6
