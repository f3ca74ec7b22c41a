#!/usr/bin/env python3
"""Figures for the 3D axon-bundle run (reference: make_figures_3D.py):
membrane time series on the stimulated and passive axons, AP conduction
velocity along axon 1, VTK export."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.postprocess import Results, export_pvd, write_vtu


def main(fname="results/data/3D/", out="results/figures/3D/"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out, exist_ok=True)
    res = Results(fname + "results.h5")

    # probes on axon 1 (stimulated, membrane tag 1) and axon 2 (tag 2)
    p_prox = (8e-6, 0.3e-6, 0.3e-6)
    p_dist = (24e-6, 0.3e-6, 0.3e-6)
    p_ax2 = (16e-6, 0.6e-6, 0.6e-6)
    avail = set(int(t) for t in res.mesh.if_tags[res.mesh.if_tags > 0])
    tag2 = [2] if 2 in avail else [1]      # passive axons (tag 2) if present
    s1 = res.membrane_series(p_prox, tags=[1])
    s2 = res.membrane_series(p_dist, tags=[1])
    s3 = res.membrane_series(p_ax2, tags=tag2)

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for s, lbl in ((s1, "axon1 prox"), (s2, "axon1 dist"), (s3, "axon2")):
        axes[0].plot(s["t"] * 1e3, s["phi_M"] * 1e3, label=lbl)
    axes[0].set_xlabel("t (ms)")
    axes[0].set_ylabel("$\\phi_M$ (mV)")
    axes[0].legend(fontsize=8)

    axes[1].plot(s1["t"] * 1e3, s1["c_e"][:, 0], label="K$_e$ prox")
    axes[1].plot(s2["t"] * 1e3, s2["c_e"][:, 0], label="K$_e$ dist")
    axes[1].set_xlabel("t (ms)")
    axes[1].set_ylabel("c (mM)")
    axes[1].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out + "membrane_series.svg")

    # reference-named 3x3 panel + raw series side files
    # (make_figures_3D.py:170-266)
    from figutil import pot_con_grid, write_series_txt

    s_grid = pot_con_grid(res, p_prox, ["K", "Cl"], "Na",
                          out + "pot_con_3D.svg", v_scale=1e3, t_scale=1e3,
                          tags=[1])
    write_series_txt(fname + "solver/phi_M_3D.txt", s_grid["phi_M"] * 1e3)
    write_series_txt(fname + "solver/K_ECS_3D.txt", s_grid["c_e"][:, 0])

    v = res.ap_velocity(p_prox, p_dist, threshold=0.0, tags=[1])
    print(f"AP conduction velocity axon 1: {v:.3g} m/s"
          if np.isfinite(v) else "no AP crossing detected")

    fr = res.frame(res.n_frames - 1)
    write_vtu(out + "final.vtk", res.mesh,
              {"phi": fr["phi"], "K": fr["c"][0], "Na": fr["c_elim"]})
    # ParaView time series (reference write_to_pvd: pot/K/Na/Cl XDMF series,
    # make_figures_rat_neuron.py:31-91)
    export_pvd(res, out + "timeseries.pvd")
    res.close()
    print(f"figures written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
