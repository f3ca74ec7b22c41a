#!/usr/bin/env python3
"""Calibration pipeline: integrate the coupled neuron/glia/bath ODE system
to steady state and print the initial conditions for the PDE runs
(reference: examples/emix-simulations/run_calibration.py:13-90).

The reference steps LSODA 100,000 x 0.1 ms on a dummy mesh; here the same
integration is one jitted lax.scan."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.membrane.engine import make_membrane, ode_run
from knpemidg_tpu.models.calibration import CalibrationAstro, CalibrationEMIx


def calibrate(model=None, n_steps=100_000, dt=0.1, n_sub=2):
    model = model or CalibrationEMIx()
    mm = make_membrane(model, np.zeros((1, 2)))
    mm = ode_run(mm, 0.0, dt, n_steps, n_sub=n_sub)
    return {name: float(mm.states[i, 0]) for name, i in model.STATES.items()}


def main(variant="emix"):
    model = CalibrationEMIx() if variant == "emix" else CalibrationAstro()
    steady = calibrate(model)
    print(f"# steady state after 10 s ({variant}):")
    for name, val in steady.items():
        print(f"{name}_init = {val!r}")
    return steady


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "emix")
