"""Active-membrane integration test: the 2D HH application end-to-end
(examples/run_2D.py, the reference's first production scenario).

Physics gates: membrane potential stays in the physiological range, the
stimulated membrane depolarizes, concentrations stay positive, and total
ion content drifts only slightly over a short run."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams
from knpemidg_tpu.fem.norms import integral


@pytest.mark.slow
def test_run_2d_short():
    from run_2D import build_solver

    S = build_solver(resolution=0)
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40, rtol_knp=1e-7, atol_knp=1e-40,
    )
    n_steps = 10
    state0 = None
    state = S.solve_system_active(n_steps * S.params.dt, 0.0, sp)

    phi_M = np.asarray(state["phi_M"])
    c = np.asarray(state["c"])
    c_elim = np.asarray(state["c_elim"])

    # potentials physiological (V): resting ~ -75 mV, AP peak < +60 mV
    assert np.all(phi_M > -0.2) and np.all(phi_M < 0.1), (phi_M.min(), phi_M.max())
    # stimulated region (x < 20 um) depolarized relative to rest
    mids = S.tables.midpoints
    stim = mids[:, 0] < 20e-6
    v_rest = -0.07438609374462003
    assert phi_M[stim].max() > v_rest + 2e-3, phi_M[stim].max()
    # concentrations positive and bounded
    assert np.all(c > 0.0) and np.all(c_elim > 0.0)
    assert c.max() < 300.0
    # Krylov solves converged within the iteration cap at production
    # tolerances (warm starts)
    assert all(n < 1000 for n in S.stats.emi_niters)
    # mass conservation: total K content drift is small over 1 ms
    total_K = integral(S.mesh, np.asarray(state["c"][0]).T)
    S2 = build_solver(resolution=0)
    total_K0 = integral(S2.mesh, np.asarray(S2.c_init[0]).T)
    assert abs(total_K - total_K0) / abs(total_K0) < 5e-2
