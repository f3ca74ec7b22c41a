"""Long-horizon trajectory trust at f32 production tolerances (VERDICT r4
item 6): a 100-step 3D axon-bundle run at f32/production tolerances must
reproduce the f64/tight-tolerance trajectory on the observables the
splitting paper's claims rest on (Ellingsrud et al. SISC 2025, SURVEY.md
section 0) -- AP count and timing, peak phi_M, per-ion mass conservation.

Measured (tools/exp_f32_trust.py, round 5, 100 steps / 10 ms, one AP):
  t_ap   f32 1.20825 ms vs f64 1.16606 ms  -> |diff| = 0.42 dt
  peak   f32 45.35 mV  vs f64 46.21 mV     -> |diff| = 0.86 mV
  mass   f32 K 2.4e-3 / Cl 4.8e-5 / Na 2.6e-4;  f64 K 1.8e-5 / 4e-7 / 1.9e-6
The gates below leave ~3x headroom on each.  The 5.4e-3 end-state field
deviation between operator layouts (ROADMAP item 10) is the same
knife-edge trajectory spread seen here as the 0.4-dt AP shift -- bounded
on the physical observables, not unbounded error growth.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams

N_STEPS = 100


def _run(dtype):
    import jax.numpy as jnp

    from knpemidg_tpu.utils.trust import trajectory_metrics
    from run_3D import build_solver

    if dtype == "f64":
        S = build_solver(resolution=0, length_factor=1, dtype=jnp.float64)
        sp = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-9, atol_emi=1e-40,
                          rtol_knp=1e-10, atol_knp=1e-40,
                          max_it_emi=2000, max_it_knp=2000,
                          gmres_restart=30)
    else:
        S = build_solver(resolution=0, length_factor=1, dtype=jnp.float32)
        sp = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-5, atol_emi=1e-40,
                          rtol_knp=1e-7, atol_knp=2e-40,
                          max_it_emi=1000, max_it_knp=1000,
                          gmres_restart=30)
    return trajectory_metrics(S, sp, N_STEPS)


@pytest.mark.nightly
def test_f32_production_trajectory_trust():
    a = _run("f32")
    b = _run("f64")
    dt = a["dt"]

    # the AP fires, the same number of times, in both trajectories
    assert a["n_ap_near"] >= 1 and a["n_ap_near"] == b["n_ap_near"], (a, b)
    assert a["n_ap_far"] == b["n_ap_far"], (a, b)
    # AP timing within 1.5 dt (measured 0.42 dt)
    assert abs(a["t_ap_near"] - b["t_ap_near"]) < 1.5 * dt, (a, b)
    assert abs(a["t_ap_far"] - b["t_ap_far"]) < 1.5 * dt, (a, b)
    # peak overshoot within 3 mV (measured 0.86 mV)
    assert abs(a["peak_phi_M"] - b["peak_phi_M"]) < 3e-3, (a, b)
    # per-ion total-mass conservation: the DG membrane coupling is
    # antisymmetric, so drift measures solver + float error only
    assert max(b["mass_drift"].values()) < 1e-4, b["mass_drift"]
    assert max(a["mass_drift"].values()) < 1e-2, a["mass_drift"]
