#!/usr/bin/env python3
"""Figures for the 2D idealized run (reference: make_figures_2D.py).

Membrane point time series (phi_M, ECS/ICS concentration traces, Nernst
potentials) and spatial concentration profiles along the domain axis;
SVG outputs + a VTK snapshot for ParaView.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.postprocess import Results, write_vtu


def main(fname="results/data/2D/", out="results/figures/2D/"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out, exist_ok=True)
    res = Results(fname + "results.h5")

    # membrane point at x = 31 um (domain middle), like the reference's
    # marked facet (make_figures_2D.py:110-118)
    point = (31e-6, 1e-6)
    s = res.membrane_series(point)
    F, R, T = 96485.0, 8.314, 300.0

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    axes[0, 0].plot(s["t"] * 1e3, s["phi_M"] * 1e3)
    axes[0, 0].set_xlabel("t (ms)")
    axes[0, 0].set_ylabel("$\\phi_M$ (mV)")
    names = ["K", "Cl"]
    for k, name in enumerate(names):
        axes[0, 1].plot(s["t"] * 1e3, s["c_e"][:, k], label=f"{name}$_e$")
        axes[0, 1].plot(s["t"] * 1e3, s["c_i"][:, k], "--", label=f"{name}$_i$")
    axes[0, 1].plot(s["t"] * 1e3, s["elim_e"], label="Na$_e$")
    axes[0, 1].plot(s["t"] * 1e3, s["elim_i"], "--", label="Na$_i$")
    axes[0, 1].legend(fontsize=7)
    axes[0, 1].set_ylabel("c (mM)")

    # Nernst potentials (make_figures_2D.py:159-170)
    E_K = R * T / F * np.log(s["c_e"][:, 0] / s["c_i"][:, 0])
    E_Na = R * T / F * np.log(s["elim_e"] / s["elim_i"])
    axes[1, 0].plot(s["t"] * 1e3, E_K * 1e3, label="$E_K$")
    axes[1, 0].plot(s["t"] * 1e3, E_Na * 1e3, label="$E_{Na}$")
    axes[1, 0].legend()
    axes[1, 0].set_ylabel("E (mV)")
    axes[1, 0].set_xlabel("t (ms)")

    # final-frame concentration profile along the neuron axis
    fr = res.frame(res.n_frames - 1)
    pts, kvals = res.sample_line(fr["c"][0], (0.5e-6, 2e-6), (61.5e-6, 2e-6))
    axes[1, 1].plot(pts[:, 0] * 1e6, kvals)
    axes[1, 1].set_xlabel("x (um)")
    axes[1, 1].set_ylabel("[K] (mM)")

    fig.tight_layout()
    fig.savefig(out + "summary.svg")

    # reference-named 3x3 panel (make_figures_2D.py:180-264)
    from figutil import pot_con_grid

    pot_con_grid(res, point, ["K", "Cl"], "Na", out + "pot_con_2D.svg",
                 v_scale=1e3, t_scale=1e3)

    write_vtu(out + "final.vtk", res.mesh,
              {"phi": fr["phi"], "K": fr["c"][0], "Na": fr["c_elim"]})
    res.close()
    print(f"figures written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
