#!/usr/bin/env python3
"""Figures for the calibration check (reference:
emix-simulations/make_figure_check_calibration.py): membrane potential and
concentration traces on both membranes over the zero-stimulus run -- the
state must stay flat at the calibrated values."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.postprocess import Results


def main(fname="results/data/check-calibration/",
         out="results/figures/check-calibration/"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out, exist_ok=True)
    res = Results(fname + "results.h5")

    # one probe per membrane tag (1 = neuron HH, 2 = glial)
    mids = res.mesh.vertices[res.mesh.if_verts].mean(axis=1)
    sel1 = res.mesh.if_tags == 1
    sel2 = res.mesh.if_tags == 2
    p1 = mids[sel1].mean(axis=0)
    p2 = mids[sel2].mean(axis=0)
    s_n = res.membrane_series(p1, tags=[1])
    s_g = res.membrane_series(p2, tags=[2])

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].plot(s_n["t"], s_n["phi_M"], label="neuron")
    axes[0].plot(s_g["t"], s_g["phi_M"], label="glial")
    axes[0].axhline(-74.38, ls=":", c="gray")
    axes[0].axhline(-83.08, ls=":", c="gray")
    axes[0].set_xlabel("t (ms)")
    axes[0].set_ylabel("$\\phi_M$ (mV)")
    axes[0].legend()

    axes[1].plot(s_n["t"], s_n["c_e"][:, 0], label="[K]$_e$")
    axes[1].plot(s_n["t"], s_n["c_i"][:, 0], label="[K]$_n$")
    axes[1].set_xlabel("t (ms)")
    axes[1].set_ylabel("c (mM)")
    axes[1].legend()

    axes[2].plot(s_n["t"], s_n["elim_e"], label="[Na]$_e$")
    axes[2].plot(s_n["t"], s_n["elim_i"], label="[Na]$_n$")
    axes[2].set_xlabel("t (ms)")
    axes[2].set_ylabel("c (mM)")
    axes[2].legend()
    fig.tight_layout()
    fig.savefig(out + "check_calibration.svg")
    res.close()
    print(f"figures written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
