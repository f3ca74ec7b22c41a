#!/usr/bin/env python3
"""Figures for the astrocyte-tortuosity run (reference: local-astrocyte-
depolarization/make_figures.py): ECS potassium spread around the ROI,
glial membrane depolarization, line profiles through the injection site,
the space-time K+ wave map (reference plot_surface_time), and a ParaView
time series (reference write_to_pvd)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.postprocess import (Results, export_membrane_pvd,
                                      export_pvd, write_vtu)


def main(fname="results/data/astro-tortuosity/",
         out="results/figures/astro-tortuosity/",
         roi_center=(2900e-7, 1900e-7, 2000e-7)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out, exist_ok=True)
    res = Results(fname + "results.h5")
    roi_center = np.asarray(roi_center)[: res.mesh.dim]

    # glial membrane tag 2 when present (the astro meshes); otherwise all
    # membranes (lets the script run on any saved KNP-EMI dataset)
    avail = set(int(t) for t in res.mesh.if_tags[res.mesh.if_tags > 0])
    gtags = [2] if 2 in avail else None

    # glial membrane facet nearest the ROI + a distant one
    s_near = res.membrane_series(roi_center, tags=gtags)
    ext = res.mesh.vertices.max(axis=0)
    s_far = res.membrane_series(ext * 0.1, tags=gtags)

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].plot(s_near["t"], s_near["phi_M"], label="glia near ROI")
    axes[0].plot(s_far["t"], s_far["phi_M"], label="glia far")
    axes[0].set_xlabel("t (ms)")
    axes[0].set_ylabel("$\\phi_M$ (mV)")
    axes[0].legend(fontsize=8)

    axes[1].plot(s_near["t"], s_near["c_e"][:, 0], label="[K]$_e$ near")
    axes[1].plot(s_far["t"], s_far["c_e"][:, 0], label="[K]$_e$ far")
    axes[1].set_xlabel("t (ms)")
    axes[1].set_ylabel("c (mM)")
    axes[1].legend(fontsize=8)

    # K profile through the ROI at the final frame
    fr = res.frame(res.n_frames - 1)
    lo = roi_center.copy()
    hi = roi_center.copy()
    lo[0], hi[0] = 0.0, res.mesh.vertices[:, 0].max()
    pts, kvals = res.sample_line(fr["c"][0], lo, hi)
    axes[2].plot(pts[:, 0] * 1e7, kvals)
    axes[2].set_xlabel("x (nm)")
    axes[2].set_ylabel("[K] (mM)")
    fig.tight_layout()
    fig.savefig(out + "summary.svg")

    # space-time K+ wave map: ECS [K] along the x-line through the ROI for
    # every stored frame (reference make_figures.py plot_surface_time --
    # the spatial-spread map of the K+ wave)
    nfr = res.n_frames
    waves = np.empty((nfr, 200))
    for i in range(nfr):
        _, waves[i] = res.sample_line(res.frame(i)["c"][0], lo, hi)
    fig2, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(
        waves, aspect="auto", origin="lower", cmap="magma",
        extent=[lo[0] * 1e7, hi[0] * 1e7, res.times[0], res.times[-1]],
    )
    ax.set_xlabel("x (nm)")
    ax.set_ylabel("t (ms)")
    fig2.colorbar(im, ax=ax, label="[K]$_e$ (mM)")
    fig2.tight_layout()
    fig2.savefig(out + "k_wave_spacetime.svg")

    # reference-named panels: the glial concentration grid ('plot.svg',
    # make_figures.py:390-483), the membrane surface maps over time
    # (plot_surface_time, :621-707) and the membrane-sheet ParaView series
    # (plot_surface / DltWriter, :523-620)
    from figutil import pot_con_grid, surface_time_montage

    ions = ["K", "Na"] if res.frame(0)["c"].shape[0] == 2 else ["K"]
    pot_con_grid(res, roi_center, ions, "Cl", out + "plot.svg", tags=gtags)
    surface_time_montage(res, out + "surface_time.svg", field="phi_M",
                         tags=gtags)
    surface_time_montage(res, out + "surface_time_K.svg", field="K_e",
                         tags=gtags, cmap="magma")
    export_membrane_pvd(res, out + "membrane.pvd", tags=gtags)

    write_vtu(out + "final.vtk", res.mesh,
              {"phi": fr["phi"], "K": fr["c"][0], "Na": fr["c"][1]})
    # ParaView time series of all fields (open out/timeseries.pvd)
    export_pvd(res, out + "timeseries.pvd", ion_names=("K", "Na"))
    res.close()
    print(f"figures written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
