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
        p = np.asarray(point)[: mids.shape[1]]     # tolerate 3D probes on 2D
        return int(fids[np.argmin(np.linalg.norm(mids - p, axis=1))])

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
        d = self.mesh.dim
        dist = np.linalg.norm(np.asarray(p2)[:d] - np.asarray(p1)[:d])
        return float(dist / abs(t2 - t1))

    # -- whole-membrane fields (reference plot_surface/plot_surface_time,
    # local-astrocyte-depolarization/make_figures.py:523-707) ----------------
    def membrane_midpoints(self, tags=None):
        fids = self.membrane_facets(tags)
        return self.mesh.vertices[self.mesh.if_verts[fids]].mean(axis=1)

    def membrane_trace_field(self, field, side="p", tags=None):
        """Facet-average trace of a DG field on EVERY membrane facet ->
        (n_mem_facets,).  side 'p' = ECS, 'm' = ICS."""
        fids = self.membrane_facets(tags)
        g = self.geom
        field = np.asarray(field)
        R = (g.f_Rp if side == "p" else g.f_Rm)[fids]      # (nm, nq, nd)
        c = (g.f_cp if side == "p" else g.f_cm)[fids]
        return np.einsum("q,fqi,fi->f", g.w_f, R, field[c])

    def membrane_potential_field(self, phi, tags=None):
        """phi_M = ICS - ECS trace on every membrane facet."""
        return (self.membrane_trace_field(phi, "m", tags)
                - self.membrane_trace_field(phi, "p", tags))

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


def vertex_average(mesh: Mesh, field: np.ndarray) -> np.ndarray:
    """Average a DG field (nc, nd) onto mesh vertices -> (nv,): the
    continuous visualization proxy ParaView expects as point data.
    Degree-2 fields carry edge dofs after the vertex dofs (fem/basis
    node ordering); only the vertex columns are scattered."""
    field = np.asarray(field)[:, : mesh.cells.shape[1]]
    nv = mesh.vertices.shape[0]
    acc = np.zeros(nv)
    cnt = np.zeros(nv)
    np.add.at(acc, mesh.cells.ravel(), field.ravel())
    np.add.at(cnt, mesh.cells.ravel(), 1.0)
    return acc / np.maximum(cnt, 1.0)


def write_vtu_xml(filename: str, mesh: Mesh,
                  cell_fields: Dict[str, np.ndarray] = None,
                  point_fields: Dict[str, np.ndarray] = None):
    """XML-format .vtu export (the piece format PVD collections reference).

    DG1 (nc, nd) fields are written twice: cell means as CellData and
    vertex averages as PointData; (nc,)/(nv,) arrays pass through."""
    cell_fields = cell_fields or {}
    point_fields = point_fields or {}
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    nv, d = mesh.vertices.shape
    nc, nd = mesh.cells.shape
    vtk_type = 5 if d == 2 else 10
    verts3 = np.hstack([mesh.vertices, np.zeros((nv, 3 - d))])

    def arr(f, a, name, typ, ncomp=1):
        f.write(f'<DataArray type="{typ}" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n')
        np.savetxt(f, np.asarray(a).reshape(-1, ncomp),
                   fmt="%d" if typ.startswith(("Int", "UInt")) else "%.9g")
        f.write("</DataArray>\n")

    with open(filename, "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n'
                f'<Piece NumberOfPoints="{nv}" NumberOfCells="{nc}">\n')
        f.write("<Points>\n")
        arr(f, verts3, "Points", "Float64", 3)
        f.write("</Points>\n<Cells>\n")
        arr(f, mesh.cells, "connectivity", "Int64")
        arr(f, (np.arange(nc) + 1) * nd, "offsets", "Int64")
        arr(f, np.full(nc, vtk_type), "types", "UInt8")
        f.write("</Cells>\n<CellData>\n")
        arr(f, mesh.cell_tags, "subdomain", "Int32")
        for name, a in cell_fields.items():
            a = np.asarray(a)
            arr(f, a.mean(axis=1) if a.ndim == 2 else a, name, "Float64")
        f.write("</CellData>\n<PointData>\n")
        for name, a in point_fields.items():
            a = np.asarray(a)
            arr(f, vertex_average(mesh, a) if a.ndim == 2 else a,
                name, "Float64")
        f.write("</PointData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


class PVDWriter:
    """ParaView time-series export: a .pvd collection of per-frame .vtu
    files (reference ``write_to_pvd``, rat-neuron make_figures:31-91 --
    there via FEniCS XDMF; the collection/piece structure is the same).

    >>> w = PVDWriter("out/run.pvd")
    >>> w.write(mesh, t, cell_fields={"phi": phi}, point_fields={"K": cK})
    >>> w.close()
    """

    def __init__(self, path: str):
        assert path.endswith(".pvd")
        self.path = path
        self.stem = os.path.splitext(os.path.basename(path))[0]
        self.dir = os.path.dirname(path) or "."
        os.makedirs(self.dir, exist_ok=True)
        self.entries = []

    def write(self, mesh: Mesh, time: float, cell_fields=None,
              point_fields=None):
        rel = f"{self.stem}_{len(self.entries):06d}.vtu"
        write_vtu_xml(os.path.join(self.dir, rel), mesh,
                      cell_fields=cell_fields, point_fields=point_fields)
        self.entries.append((float(time), rel))

    def close(self):
        with open(self.path, "w") as f:
            f.write('<?xml version="1.0"?>\n'
                    '<VTKFile type="Collection" version="0.1" '
                    'byte_order="LittleEndian">\n<Collection>\n')
            for t, rel in self.entries:
                f.write(f'<DataSet timestep="{t:.10g}" group="" part="0" '
                        f'file="{rel}"/>\n')
            f.write("</Collection>\n</VTKFile>\n")


def export_pvd(results: "Results", path: str, ion_names=None, frames=None):
    """Dump a results.h5 run as a ParaView time series: phi plus every
    stored concentration (plus the eliminated ion), vertex-averaged point
    data and cell-mean data per frame."""
    w = PVDWriter(path)
    frames = range(results.n_frames) if frames is None else frames
    for i in frames:
        fr = results.frame(i)
        fields = {"phi": fr["phi"], "c_elim": fr["c_elim"]}
        for k, ck in enumerate(fr["c"]):
            name = ion_names[k] if ion_names else f"c{k}"
            fields[name] = ck
        w.write(results.mesh, results.times[i], cell_fields=fields,
                point_fields=fields)
    w.close()
    return w.path


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


def write_surface_vtu(filename: str, mesh: Mesh, facet_ids: np.ndarray,
                      facet_fields: Dict[str, np.ndarray]):
    """XML .vtu of the membrane SURFACE mesh (facets as line/triangle
    elements) with per-facet cell data -- the analog of the reference's
    DltWriter 'bar' output (make_figures.py:598-600), viewable in ParaView
    as the membrane sheet colored by phi_M / trace concentrations."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fverts = mesh.if_verts[facet_ids]                   # (nm, d)
    used = np.unique(fverts)
    remap = np.full(mesh.vertices.shape[0], -1, dtype=np.int64)
    remap[used] = np.arange(used.size)
    conn = remap[fverts]
    nv, d = used.size, mesh.vertices.shape[1]
    nm, npf = conn.shape
    vtk_type = 3 if npf == 2 else 5                     # line / triangle
    verts3 = np.hstack([mesh.vertices[used],
                        np.zeros((nv, 3 - d))])

    def arr(f, a, name, typ, ncomp=1):
        f.write(f'<DataArray type="{typ}" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n')
        np.savetxt(f, np.asarray(a).reshape(-1, ncomp),
                   fmt="%d" if typ.startswith(("Int", "UInt")) else "%.9g")
        f.write("</DataArray>\n")

    with open(filename, "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n'
                f'<Piece NumberOfPoints="{nv}" NumberOfCells="{nm}">\n')
        f.write("<Points>\n")
        arr(f, verts3, "Points", "Float64", 3)
        f.write("</Points>\n<Cells>\n")
        arr(f, conn, "connectivity", "Int64")
        arr(f, (np.arange(nm) + 1) * npf, "offsets", "Int64")
        arr(f, np.full(nm, vtk_type), "types", "UInt8")
        f.write("</Cells>\n<CellData>\n")
        for name, a in facet_fields.items():
            arr(f, np.asarray(a), name, "Float64")
        f.write("</CellData>\n<PointData>\n</PointData>\n"
                "</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def export_membrane_pvd(results: "Results", path: str, tags=None,
                        frames=None):
    """Membrane-surface ParaView time series: phi_M + ECS potassium trace
    per facet per frame (reference plot_surface, make_figures.py:523-620)."""
    assert path.endswith(".pvd")
    stem = os.path.splitext(os.path.basename(path))[0]
    dirn = os.path.dirname(path) or "."
    os.makedirs(dirn, exist_ok=True)
    fids = results.membrane_facets(tags)
    entries = []
    frames = range(results.n_frames) if frames is None else frames
    for i in frames:
        fr = results.frame(i)
        fields = {
            "phi_M": results.membrane_potential_field(fr["phi"], tags),
            "K_e": results.membrane_trace_field(fr["c"][0], "p", tags),
        }
        rel = f"{stem}_{len(entries):06d}.vtu"
        write_surface_vtu(os.path.join(dirn, rel), results.mesh, fids, fields)
        entries.append((float(results.times[i]), rel))
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<VTKFile type="Collection" version="0.1" '
                'byte_order="LittleEndian">\n<Collection>\n')
        for t, rel in entries:
            f.write(f'<DataSet timestep="{t:.10g}" group="" part="0" '
                    f'file="{rel}"/>\n')
        f.write("</Collection>\n</VTKFile>\n")
    return path
