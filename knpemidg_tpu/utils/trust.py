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

    def cell_mean(f):
        # H5 frames store fields cells-FIRST (reference layout parity,
        # io/checkpoint.py); device-side arrays are cells-last
        f = np.asarray(f)
        return f.mean(axis=1) if f.shape[0] == vol.shape[0] else f.mean(axis=0)

    out = {}
    for k, ck in enumerate(np.asarray(fr["c"])):
        out[f"ion{k}"] = float((vol * cell_mean(ck)).sum())
    out["elim"] = float((vol * cell_mean(fr["c_elim"])).sum())
    return out


def ap_crossings(res, point, threshold=0.0, tags=None):
    """All upward threshold-crossing times of phi_M at the membrane facet
    nearest ``point`` (linearly interpolated); [] if none.  The count
    distinguishes a time-shifted AP train from a different one."""
    s = res.membrane_series(point, tags)["phi_M"]
    t = res.times
    above = s >= threshold
    above[0] = False      # frame 0 stores the pre-solve zero phi (jump 0)
    idx = np.flatnonzero(above & ~np.roll(above, 1))
    idx = idx[idx > 0]
    out = []
    for i in idx:
        f = (threshold - s[i - 1]) / (s[i] - s[i - 1])
        out.append(float(t[i - 1] + f * (t[i] - t[i - 1])))
    return out


def ap_crossing_time(res, point, threshold=0.0, tags=None):
    """First threshold-crossing time, or None."""
    c = ap_crossings(res, point, threshold, tags)
    return c[0] if c else None


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
    # skip frame 0: it stores the INITIAL phi field (zero before the first
    # EMI solve), whose jump is 0 and would masquerade as the peak
    peak = max(float(np.asarray(res.membrane_series(p, tags=[1])["phi_M"])
                     [1:].max()) for p in sites)
    near = ap_crossings(res, sites[0], tags=[1])
    far = ap_crossings(res, sites[1], tags=[1])
    out = {
        "dt": float(S.params.dt),
        "n_steps": int(n_steps),
        "t_ap_near": near[0] if near else None,
        "t_ap_far": far[0] if far else None,
        "n_ap_near": len(near),
        "n_ap_far": len(far),
        "peak_phi_M": peak,
        "peak_phi_M_global": float(phi_M.max()),
        "mass_drift": drift,
        "emi_iters_total": int(np.sum(S.stats.emi_niters)),
        "knp_iters_total": int(np.sum([np.sum(x) for x in S.stats.knp_niters])),
    }
    return out
