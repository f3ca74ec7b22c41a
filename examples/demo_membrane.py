#!/usr/bin/env python3
"""Standalone membrane-ODE demo (reference: membrane.py:188-232 __main__,
which steps a cardiac ODE on a unit square and plots the potential).

Here: step the SI Hodgkin-Huxley model on a grid of membrane points with a
spatially localized stimulus, plot the potential traces."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.membrane.engine import make_membrane, ode_step, set_param
from knpemidg_tpu.models.hh import HodgkinHuxleySI


def main(out="results/figures/demo_membrane.svg"):
    pts = np.stack(np.meshgrid(np.linspace(0, 60e-6, 10),
                               np.linspace(0, 4e-6, 3)), axis=-1).reshape(-1, 2)
    model = HodgkinHuxleySI()
    mm = make_membrane(model, pts)
    n = len(pts)
    for name, val in [("Cm", 0.02), ("E_Na", 0.0545), ("E_K", -0.0936),
                      ("K_e", 3.32), ("Na_i", 12.8)]:
        mm = set_param(mm, name, np.full(n, val))
    # stimulate the left third (the reference uses a locator lambda)
    amp = np.where(pts[:, 0] < 20e-6, 10.0, 0.0)
    mm = set_param(mm, "stim_amplitude", amp)

    dt, n_steps = 1e-4, 150
    hist = []
    t = 0.0
    for _ in range(n_steps):
        mm = ode_step(mm, t, dt, n_sub=25)
        hist.append(np.asarray(mm.get_state("V")))
        t += dt
    hist = np.array(hist)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    tgrid = np.arange(n_steps) * dt * 1e3
    ax.plot(tgrid, hist[:, 0] * 1e3, label="stimulated")
    ax.plot(tgrid, hist[:, -1] * 1e3, label="unstimulated")
    ax.set_xlabel("t (ms)")
    ax.set_ylabel("V (mV)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)
    print(f"V range: [{hist.min()*1e3:.1f}, {hist.max()*1e3:.1f}] mV -> {out}")


if __name__ == "__main__":
    main()
