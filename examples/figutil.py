"""Shared figure panels for the make_figures_* scripts.

The reference repeats a 3x3 "pot_con" grid (ECS / ICS concentrations of
every ion, membrane potential, reversal potentials) in each application's
figure suite (idealized-geometries/make_figures_2D.py:180-264,
make_figures_3D.py:170-253, rat-neuron/make_figures_rat_neuron.py:318-414,
local-astrocyte-depolarization/make_figures.py:390-483) plus membrane
surface maps over time (plot_surface_time).  These helpers produce the
same panels from a knpemidg_tpu Results reader.
"""
import numpy as np


def pot_con_grid(res, point, ion_names, elim_name, svg_path,
                 F=96485.0, R=8.314, T=300.0, v_scale=1.0, t_scale=1.0,
                 tags=None):
    """The reference 3x3 grid: per-ion ECS (row 1) and ICS (row 2)
    concentrations, phi_M and reversal potentials (row 3), at the membrane
    facet nearest ``point``.  Writes ``svg_path`` and returns the series."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = res.membrane_series(point, tags=tags)
    t = s["t"] * t_scale
    names = list(ion_names) + [elim_name]
    ecs = [s["c_e"][:, k] for k in range(len(ion_names))] + [s["elim_e"]]
    ics = [s["c_i"][:, k] for k in range(len(ion_names))] + [s["elim_i"]]

    fig = plt.figure(figsize=(12 * 0.9, 12 * 0.9))
    plt.gca().axis("off")
    n = len(names)
    for k, name in enumerate(names):
        ax = fig.add_subplot(3, 3, 1 + k)
        ax.set_title(f"{name} concentration (ECS)")
        ax.set_ylabel(f"[{name}]$_e$ (mM)")
        ax.plot(t, ecs[k], linewidth=3, color="b")
    for k, name in enumerate(names):
        ax = fig.add_subplot(3, 3, 4 + k)
        ax.set_title(f"{name} concentration (ICS)")
        ax.set_ylabel(f"[{name}]$_i$ (mM)")
        ax.plot(t, ics[k], linewidth=3, color="r")
    ax = fig.add_subplot(3, 3, 7)
    ax.set_title("Membrane potential")
    ax.set_ylabel(r"$\phi_M$ (mV)")
    ax.set_xlabel("time (ms)")
    ax.plot(t, s["phi_M"] * v_scale, linewidth=3)
    ax = fig.add_subplot(3, 3, 8)
    ax.set_title("Reversal potentials")
    ax.set_ylabel("E (mV)")
    ax.set_xlabel("time (ms)")
    for k, name in enumerate(names):
        z = -1.0 if name.lower().startswith("cl") else 1.0
        E = R * T / (F * z) * np.log(
            np.maximum(ecs[k], 1e-12) / np.maximum(ics[k], 1e-12))
        ax.plot(t, E * v_scale, linewidth=3, label=f"E_{name}")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(svg_path, format="svg")
    plt.close(fig)
    return s


def write_series_txt(path, values, fmt="%.10f \n"):
    """The reference's raw-series side files (make_figures_3D.py:255-266:
    phi_M_3D.txt / K_ECS_3D.txt)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in np.asarray(values).ravel():
            f.write(fmt % v)


def surface_time_montage(res, svg_path, field="phi_M", n_panels=4,
                         tags=None, v_scale=1.0, cmap="viridis"):
    """Membrane-surface maps at several times (reference plot_surface_time,
    make_figures.py:621-707 / make_figures_rat_neuron.py:520-610): facet
    midpoints scatter-colored by phi_M (or the ECS K trace) for
    ``n_panels`` evenly spaced frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mids = res.membrane_midpoints(tags)
    frames = np.linspace(0, res.n_frames - 1, n_panels).astype(int)
    vals = []
    for i in frames:
        fr = res.frame(i)
        if field == "phi_M":
            vals.append(res.membrane_potential_field(fr["phi"], tags) * v_scale)
        else:
            vals.append(res.membrane_trace_field(fr["c"][0], "p", tags))
    vmin = min(v.min() for v in vals)
    vmax = max(v.max() for v in vals)
    fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 4),
                             squeeze=False)
    for j, (i, v) in enumerate(zip(frames, vals)):
        ax = axes[0, j]
        sc = ax.scatter(mids[:, 0], mids[:, 1], c=v, s=4, cmap=cmap,
                        vmin=vmin, vmax=vmax)
        ax.set_title(f"t = {res.times[i]:.4g}")
        ax.set_aspect("equal")
    fig.colorbar(sc, ax=axes.ravel().tolist(), shrink=0.8,
                 label=field)
    fig.savefig(svg_path, format="svg")
    plt.close(fig)
