"""Calibration steady-state parity.

The reference integrates the coupled neuron/glia/bath ODE system 100,000 x
0.1 ms with LSODA and hand-copies the steady state into the PDE initial
conditions (run_calibration.py:50-90 <-> run_EMIx_simulation.py:74-87).
Our jitted scan must land on the same steady state."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

# reference steady state (run_EMIx_simulation.py:74-87)
EMIX_TARGETS = {
    "K_e": 3.3236967382613933, "K_n": 124.15397583492471,
    "K_g": 102.75563828644862, "Na_e": 100.71925900028181,
    "Na_n": 12.838513108606818, "Na_g": 12.39731187972181,
    "V_n": -74.3848784437955, "V_g": -83.08511451850003,
}


@pytest.mark.slow
def test_emix_calibration_steady_state():
    from run_calibration import calibrate

    s = calibrate(n_steps=20000)   # 2 s of model time
    for k, ref in EMIX_TARGETS.items():
        rel = abs(s[k] - ref) / max(abs(ref), 1.0)
        assert rel < 5e-4, (k, s[k], ref)


@pytest.mark.slow
def test_astro_calibration_holds_steady():
    """The astro calibration file ships already-calibrated initial values;
    integrating from them must stay put."""
    from run_calibration import calibrate
    from knpemidg_tpu.models.calibration import CalibrationAstro

    model = CalibrationAstro()
    s = calibrate(model=model, n_steps=5000)
    init = dict(zip(model.STATE_NAMES, model.STATE_INIT))
    for k in ("K_e", "Na_e", "Cl_e", "V_n", "V_g"):
        rel = abs(s[k] - init[k]) / max(abs(init[k]), 1.0)
        assert rel < 2e-2, (k, s[k], init[k])
