"""Post-processing: read results.h5 back, extract membrane time series,
compute AP conduction velocities, export VTK for ParaView.

Rebuild of the reference figure suite's data layer (C21 in SURVEY.md):
* membrane point series via nearest-facet trace averages -- the reference
  marks one facet with tag 10 and computes avg() surface integrals
  (make_figures_2D.py:93-177); here the facet trace machinery reads the
  value directly;
* Nernst potentials recomputed from the stored concentrations (:159-170);
* AP conduction velocity from threshold-crossing times at two membrane
  sites (make_figures_rat_neuron.py:613-692);
* legacy-VTK export (write_to_pvd, make_figures_rat_neuron.py:31).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .io.checkpoint import H5Reader
from .mesh.core import Mesh, build_mesh
from .fem.tabulation import build_geometry


class Results:
    """Reader + geometry for one results.h5 file."""

    def __init__(self, filename: str):
        self.r = H5Reader(filename)
        verts, cells, ctags = self.r.mesh_arrays()
        f = self.r.f
        if_verts = np.asarray(f["surfaces/interior_facet_vertices"])
        if_tags = np.asarray(f["surfaces/interior_values"])
        surface = {tuple(v): int(t) for v, t in zip(if_verts, if_tags) if t != 0}
        ef_verts = np.asarray(f["surfaces/exterior_facet_vertices"])
        ef_tags = np.asarray(f["surfaces/exterior_values"])
        surface.update({tuple(v): int(t) for v, t in zip(ef_verts, ef_tags) if t != 0})
        # cell order in the file is already the solver's (Morton) order
        self.mesh = build_mesh(verts, cells, ctags, surface_tags=surface,
                               reorder=None)
        self.geom = build_geometry(self.mesh, quad_degree_cell=2, quad_degree_facet=2)
        self.times = self.r.times

    @property
    def n_frames(self):
        return self.r.n_frames

    def frame(self, i):
        return self.r.frame(i)

    # -- membrane machinery --------------------------------------------------
    def membrane_facets(self, tags: Optional[Sequence[int]] = None):
        m = self.mesh
        sel = m.if_tags > 0 if tags is None else np.isin(m.if_tags, tags)
        return np.flatnonzero(sel)

    def nearest_membrane_facet(self, point, tags=None) -> int:
        fids = self.membrane_facets(tags)
        mids = self.mesh.vertices[self.mesh.if_verts[fids]].mean(axis=1)
        return int(fids[np.argmin(np.linalg.norm(mids - np.asarray(point), axis=1))])

    def _facet_avg(self, field, fid, side):
        """Facet-average trace of a DG1 field on one interior facet."""
        g = self.geom
        R = g.f_Rp[fid] if side == "p" else g.f_Rm[fid]
        c = g.f_cp[fid] if side == "p" else g.f_cm[fid]
        vals = R @ np.asarray(field)[c]
        return float(g.w_f @ vals)

    def membrane_series(self, point, tags=None) -> Dict[str, np.ndarray]:
        """Time series at the membrane facet nearest `point`: phi_M, and the
        ECS ('_e') / ICS ('_i') traces of every stored concentration."""
        fid = self.nearest_membrane_facet(point, tags)
        out = {"t": self.times, "phi_M": [], "c_e": [], "c_i": [],
               "elim_e": [], "elim_i": []}
        for i in range(self.n_frames):
            fr = self.frame(i)
            phi = fr["phi"]
            out["phi_M"].append(
                self._facet_avg(phi, fid, "m") - self._facet_avg(phi, fid, "p")
            )
            out["c_e"].append([self._facet_avg(ck, fid, "p") for ck in fr["c"]])
            out["c_i"].append([self._facet_avg(ck, fid, "m") for ck in fr["c"]])
            out["elim_e"].append(self._facet_avg(fr["c_elim"], fid, "p"))
            out["elim_i"].append(self._facet_avg(fr["c_elim"], fid, "m"))
        return {k: np.asarray(v) for k, v in out.items()}

    def nernst_series(self, series, z, F, R, T):
        """E = RT/(zF) ln(c_e/c_i) from a membrane_series result."""
        return R * T / (F * z) * np.log(series["c_e"] / series["c_i"])

    def ap_velocity(self, p1, p2, threshold=0.0, tags=None) -> float:
        """Conduction velocity from threshold crossings of phi_M at two
        membrane points (make_figures_rat_neuron.py:613-692)."""
        s1 = self.membrane_series(p1, tags)["phi_M"]
        s2 = self.membrane_series(p2, tags)["phi_M"]
        t = self.times

        def crossing(s):
            above = s >= threshold
            idx = np.flatnonzero(above & ~np.roll(above, 1))
            if len(idx) == 0 or idx[0] == 0:
                return None
            i = idx[0]
            # linear interpolation of the crossing time
            f = (threshold - s[i - 1]) / (s[i] - s[i - 1])
            return t[i - 1] + f * (t[i] - t[i - 1])

        t1, t2 = crossing(s1), crossing(s2)
        if t1 is None or t2 is None or t2 == t1:
            return float("nan")
        dist = np.linalg.norm(np.asarray(p2) - np.asarray(p1))
        return float(dist / abs(t2 - t1))

    # -- field sampling -------------------------------------------------------
    def sample_line(self, field, start, end, n=200):
        """Sample a DG1 field along a segment (nearest-cell evaluation)."""
        pts = np.linspace(np.asarray(start), np.asarray(end), n)
        mids = self.mesh.cell_midpoints()
        vals = np.empty(n)
        field = np.asarray(field)
        for i, x in enumerate(pts):
            c = int(np.argmin(np.linalg.norm(mids - x, axis=1)))
            # barycentric evaluation within the nearest cell
            V = self.mesh.vertices[self.mesh.cells[c]]
            A = np.vstack([V.T, np.ones(len(V))])
            lam = np.linalg.lstsq(A, np.append(x, 1.0), rcond=None)[0]
            vals[i] = lam @ field[c]
        return pts, vals

    def close(self):
        self.r.close()


def write_vtu(filename: str, mesh: Mesh, cell_fields: Dict[str, np.ndarray] = None,
              point_like_fields: Dict[str, np.ndarray] = None):
    """Legacy-VTK unstructured grid export for ParaView.

    DG1 fields (nc, nd) are written as cell data means plus, optionally,
    exploded point data is omitted for compactness."""
    cell_fields = cell_fields or {}
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    nv, d = mesh.vertices.shape
    nc, nd = mesh.cells.shape
    vtk_type = 5 if d == 2 else 10   # triangle / tetra
    with open(filename, "w") as f:
        f.write("# vtk DataFile Version 3.0\nknpemidg_tpu\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {nv} double\n")
        verts3 = np.hstack([mesh.vertices, np.zeros((nv, 3 - d))])
        np.savetxt(f, verts3, fmt="%.10g")
        f.write(f"CELLS {nc} {nc * (nd + 1)}\n")
        np.savetxt(f, np.hstack([np.full((nc, 1), nd), mesh.cells]), fmt="%d")
        f.write(f"CELL_TYPES {nc}\n")
        np.savetxt(f, np.full(nc, vtk_type), fmt="%d")
        f.write(f"CELL_DATA {nc}\n")
        f.write("SCALARS subdomain int 1\nLOOKUP_TABLE default\n")
        np.savetxt(f, mesh.cell_tags, fmt="%d")
        for name, arr in cell_fields.items():
            arr = np.asarray(arr)
            vals = arr.mean(axis=1) if arr.ndim == 2 else arr
            f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, vals, fmt="%.10g")
