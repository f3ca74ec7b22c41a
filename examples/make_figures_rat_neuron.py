#!/usr/bin/env python3
"""Figures for the rat-neuron run (reference: make_figures_rat_neuron.py):
soma/dendrite membrane traces, **AP conduction velocity** from threshold
crossings at two membrane sites (:613-692), PVD/VTK export (:31)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.postprocess import (Results, export_membrane_pvd,
                                      export_pvd, write_vtu)


def main(fname="results/data/rat-neuron/", out="results/figures/rat-neuron/",
         p1=None, p2=None, threshold=0.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out, exist_ok=True)
    res = Results(fname + "results.h5")

    mids = res.mesh.vertices[res.mesh.if_verts].mean(axis=1)
    mem = res.mesh.if_tags > 0
    lo, hi = mids[mem].min(axis=0), mids[mem].max(axis=0)
    if p1 is None:
        p1 = lo + 0.25 * (hi - lo)
    if p2 is None:
        p2 = lo + 0.75 * (hi - lo)

    s1 = res.membrane_series(p1)
    s2 = res.membrane_series(p2)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(s1["t"] * 1e3, s1["phi_M"] * 1e3, label="site 1 (leak side)")
    ax.plot(s2["t"] * 1e3, s2["phi_M"] * 1e3, label="site 2 (HH side)")
    ax.set_xlabel("t (ms)")
    ax.set_ylabel("$\\phi_M$ (mV)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out + "membrane_series.svg")

    # reference-named 3x3 panel (make_figures_rat_neuron.py:318-414),
    # membrane surface maps over time (:423-610), and the membrane-sheet
    # ParaView series (DltWriter analog)
    from figutil import pot_con_grid, surface_time_montage

    pot_con_grid(res, p2, ["K", "Cl"], "Na", out + "pot_con_rat_3D.svg",
                 v_scale=1e3, t_scale=1e3)
    surface_time_montage(res, out + "surface_time.svg", field="phi_M",
                         v_scale=1e3)
    export_membrane_pvd(res, out + "membrane.pvd")

    v = res.ap_velocity(p1, p2, threshold=threshold)
    print(f"AP conduction velocity: {v:.4g} m/s"
          if np.isfinite(v) else "no AP crossing at both sites")

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
