"""Long-horizon trajectory-trust metrics (VERDICT r4 item 6).

Runs a solver for ``n_steps`` with per-step H5 output and reduces the
trajectory to the observables the splitting paper's claims rest on
(Ellingsrud, Benedusi & Kuchta, SISC 2025; SURVEY.md section 0): action-
potential threshold-crossing times at two membrane sites, peak membrane
potential, and per-ion total-mass conservation.  Used by
tools/exp_f32_trust.py (f32-production vs f64-tight comparison) and the
nightly gate tests/test_trajectory_trust.py.
"""
from __future__ import annotations

import tempfile

import numpy as np


def total_mass(res, frame_i: int) -> dict:
    """Per-ion total amount sum_cells integral(c_k) at frame i.  For DG1 on
    simplices integral over a cell = vol * mean(nodal values); the membrane
    coupling is antisymmetric (what leaves ICS enters ECS), so with zero
    f_source and natural exterior conditions these must be constant in time
    up to solver tolerance."""
    vol = np.asarray(res.geom.vol)
    fr = res.frame(frame_i)
    out = {}
    for k, ck in enumerate(np.asarray(fr["c"])):
        out[f"ion{k}"] = float((vol * ck.mean(axis=0)).sum())
    out["elim"] = float((vol * np.asarray(fr["c_elim"]).mean(axis=0)).sum())
    return out


def ap_crossing_time(res, point, threshold=0.0, tags=None):
    """First threshold-crossing time of phi_M at the membrane facet nearest
    ``point`` (linearly interpolated), or None."""
    s = res.membrane_series(point, tags)["phi_M"]
    t = res.times
    above = s >= threshold
    idx = np.flatnonzero(above & ~np.roll(above, 1))
    if len(idx) == 0 or idx[0] == 0:
        return None
    i = idx[0]
    f = (threshold - s[i - 1]) / (s[i] - s[i - 1])
    return float(t[i - 1] + f * (t[i] - t[i - 1]))


def trajectory_metrics(S, sp, n_steps: int, sites=None, scan_steps: int = 0
                       ) -> dict:
    """Run ``n_steps`` active splitting steps with per-step H5 output and
    return the trust metrics.  ``sites``: two probe points on the
    STIMULATED axon's membrane (defaults fit the box_3d_axons bundle:
    near the stimulus end and far down the first axon)."""
    from ..postprocess import Results

    if sites is None:
        # axon 1 of box_3d_axons spans x in [0, L]; probe at 1/4 and 3/4
        ext = np.asarray(S.mesh.vertices).max(axis=0)
        lo = np.asarray(S.mesh.vertices).min(axis=0)
        mid_yz = 0.5 * (ext + lo)
        # axon 1 center in y: tables midpoints of tag 1
        mids = np.asarray(S.tables.midpoints)
        sel = slice(*S.tables.slices[1])
        ax_yz = mids[sel].mean(axis=0)
        sites = (
            (lo[0] + 0.25 * (ext[0] - lo[0]), ax_yz[1], ax_yz[2]),
            (lo[0] + 0.75 * (ext[0] - lo[0]), ax_yz[1], ax_yz[2]),
        )

    tmp = tempfile.mkdtemp(prefix="trust_") + "/"
    state = S.solve_system_active(n_steps * S.params.dt, 0.0, sp,
                                  filename=tmp, save_fields=True,
                                  scan_steps=scan_steps)
    phi_M = np.asarray(state["phi_M"])
    res = Results(tmp + "results.h5")
    m0 = total_mass(res, 0)
    mN = total_mass(res, res.n_frames - 1)
    drift = {k: abs(mN[k] - m0[k]) / abs(m0[k]) for k in m0}
    peak = max(float(np.asarray(res.membrane_series(p, tags=[1])["phi_M"])
                     .max()) for p in sites)
    out = {
        "dt": float(S.params.dt),
        "n_steps": int(n_steps),
        "t_ap_near": ap_crossing_time(res, sites[0], tags=[1]),
        "t_ap_far": ap_crossing_time(res, sites[1], tags=[1]),
        "peak_phi_M": peak,
        "peak_phi_M_global": float(phi_M.max()),
        "mass_drift": drift,
        "emi_iters_total": int(np.sum(S.stats.emi_niters)),
        "knp_iters_total": int(np.sum([np.sum(x) for x in S.stats.knp_niters])),
    }
    return out
