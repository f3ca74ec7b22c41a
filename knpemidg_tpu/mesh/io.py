"""Mesh ingest from the reference's file formats (SURVEY.md N8).

* :func:`load_emix_mesh` -- the emimesh-pipeline brain-tissue meshes used by
  examples/emix-simulations (mesh.xdmf/mesh.h5: geometry, tetrahedra, 6 cell
  labels).  The facet-tag file (tags.h5) is absent from the snapshot, so
  membrane facets are derived from cell-label adjacency -- the same
  construction the reference uses for the rat-neuron morphology
  (run_rat_neuron.py:192-201).  Cell labels are remapped
  {1 -> 0 ECS, 2,3 -> 2 neuron, 4,5,6 -> 1 glial} and facets between
  different subdomains get the ICS subdomain's membrane tag, matching the
  reference's facet remap {2,3 -> 2, 4,5,6 -> 1, >10 -> inert}
  (run_EMIx_simulation.py:172-218).  Coordinates are scaled nm -> cm (:222).
* :func:`load_xdmf_mesh` -- generic XDMF+HDF5 reader (rat-neuron morphology).
* :func:`load_dolfin_xml` -- legacy dolfin XML triples (MMS meshes).
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Callable, Optional

import numpy as np

from .core import Mesh, build_mesh


def load_emix_mesh(path: str, scale: float = 1e-7) -> Mesh:
    """Load an emimesh volume mesh directory (mesh.xdmf + mesh.h5)."""
    import h5py

    with h5py.File(os.path.join(path, "mesh.h5"), "r") as f:
        verts = np.asarray(f["data0"], dtype=np.float64)
        cells = np.asarray(f["data1"], dtype=np.int64)
        labels = np.asarray(f["data2"], dtype=np.int64)

    # remap cell labels -> {0: ECS, 1: glial, 2: neuron}
    cell_tags = np.zeros(len(cells), dtype=np.int32)
    cell_tags[(labels == 2) | (labels == 3)] = 2
    cell_tags[(labels >= 4) & (labels <= 6)] = 1

    def mem_tag(mids, lo, hi):
        # ECS(0)<->glial(1) -> 1; ECS(0)<->neuron(2) -> 2;
        # glial(1)<->neuron(2) contacts get the inert tag 10 (the reference
        # maps all cell-cell contact tags >10 to 10, which no membrane model
        # integrates -- an insulating internal interface).
        out = np.full(len(mids), 10, dtype=np.int32)
        out[(lo == 0) & (hi == 1)] = 1
        out[(lo == 0) & (hi == 2)] = 2
        return out

    m = build_mesh(verts, cells, cell_tags, membrane_tag_from_cells=mem_tag)
    m.vertices *= scale
    return m


def load_xdmf_mesh(
    xdmf_path: str,
    cell_attr: Optional[str] = None,
    scale: float = 1.0,
    membrane_tag_from_cells: Optional[Callable] = None,
) -> Mesh:
    """Minimal XDMF reader: geometry + topology (+ one cell attribute) from
    the referenced HDF5 file."""
    import h5py

    tree = ET.parse(xdmf_path)
    root = tree.getroot()
    base = os.path.dirname(xdmf_path)

    def read_item(item):
        text = item.text.strip()
        fname, dset = text.split(":")
        with h5py.File(os.path.join(base, fname), "r") as f:
            return np.asarray(f[dset])

    geom = topo = attr = None
    for elem in root.iter():
        tag = elem.tag.split("}")[-1]
        if tag == "Geometry":
            geom = read_item(elem.find(".//{*}DataItem") or elem.find("DataItem"))
        elif tag == "Topology":
            topo = read_item(elem.find(".//{*}DataItem") or elem.find("DataItem"))
        elif tag == "Attribute" and (cell_attr is None or elem.get("Name") == cell_attr):
            attr = read_item(elem.find(".//{*}DataItem") or elem.find("DataItem"))
    assert geom is not None and topo is not None
    cell_tags = (
        np.asarray(attr, dtype=np.int32).ravel()
        if attr is not None
        else np.zeros(len(topo), dtype=np.int32)
    )
    m = build_mesh(
        np.asarray(geom, dtype=np.float64),
        np.asarray(topo, dtype=np.int64),
        cell_tags,
        membrane_tag_from_cells=membrane_tag_from_cells,
    )
    m.vertices *= scale
    return m


def load_dolfin_xml(mesh_xml: str, subdomains_xml: Optional[str] = None,
                    surfaces_xml: Optional[str] = None) -> Mesh:
    """Legacy dolfin XML mesh triple (tests/meshes/MMS/*.xml format)."""
    root = ET.parse(mesh_xml).getroot()
    mesh_el = root.find("mesh")
    verts_el = mesh_el.find("vertices")
    cells_el = mesh_el.find("cells")
    dim = 3 if verts_el.find("vertex").get("z") is not None else 2
    nv = int(verts_el.get("size"))
    verts = np.zeros((nv, dim))
    for v in verts_el:
        i = int(v.get("index"))
        verts[i, 0] = float(v.get("x"))
        verts[i, 1] = float(v.get("y"))
        if dim == 3:
            verts[i, 2] = float(v.get("z"))
    ctag = "tetrahedron" if dim == 3 else "triangle"
    ncell = int(cells_el.get("size"))
    cells = np.zeros((ncell, dim + 1), dtype=np.int64)
    for c in cells_el:
        i = int(c.get("index"))
        for j in range(dim + 1):
            cells[i, j] = int(c.get(f"v{j}"))

    def read_meshfunc(path):
        r = ET.parse(path).getroot()
        mf = r.find(".//mesh_value_collection") or r.find(".//mesh_function")
        vals = {}
        if mf.tag == "mesh_function":
            arr = np.zeros(int(mf.get("size")), dtype=np.int64)
            for e in mf:
                arr[int(e.get("index"))] = int(e.get("value"))
            return ("entity", arr)
        for e in mf:
            vals[(int(e.get("cell_index")), int(e.get("local_entity")))] = int(
                e.get("value")
            )
        return ("collection", vals)

    cell_tags = np.zeros(ncell, dtype=np.int32)
    if subdomains_xml:
        kind, data = read_meshfunc(subdomains_xml)
        if kind == "entity":
            cell_tags = data.astype(np.int32)
        else:
            for (ci, _), v in data.items():
                cell_tags[ci] = v

    surface_dict = None
    if surfaces_xml:
        kind, data = read_meshfunc(surfaces_xml)
        surface_dict = {}
        loc = np.array(
            [[j for j in range(dim + 1) if j != i] for i in range(dim + 1)]
        )
        if kind == "collection":
            for (ci, le), v in data.items():
                key = tuple(sorted(cells[ci][loc[le]]))
                surface_dict[key] = v
        else:
            raise NotImplementedError("facet mesh_function by entity index")

    return build_mesh(verts, cells, cell_tags, surface_tags=surface_dict)
