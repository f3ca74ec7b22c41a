"""Structured mesh generators (numpy ports of the reference generators).

* :func:`mms_square`    -- tests/make_mesh_MMS.py:43-117 (unit square, inner
  box [0.25,0.75]^2, interface walls tagged 1-4, exterior sides 5-8)
* :func:`box_2d_neuron` -- examples/idealized-geometries/make_mesh_2D.py
  (62x4 um box, embedded rectangle neuron, crossed triangulation)
* :func:`box_3d_axons`  -- examples/idealized-geometries/make_mesh_3D.py
  (32x0.9x0.9 um box with 4 axons; membrane tags 1/2)
* :func:`rectangle_mesh` / :func:`box_mesh` -- dolfin RectangleMesh/BoxMesh
  equivalents.
"""
from __future__ import annotations

import numpy as np

from .core import Mesh, build_mesh


def rectangle_mesh(p0, p1, nx, ny, diagonal: str = "right"):
    """Triangulated rectangle. Returns (vertices (nv,2), cells (nc,3))."""
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    if diagonal == "crossed":
        # grid vertices + cell-center vertices, 4 triangles per square
        X, Y = np.meshgrid(x, y, indexing="ij")
        grid = np.stack([X.ravel(), Y.ravel()], axis=1)
        cx = 0.5 * (x[:-1] + x[1:])
        cy = 0.5 * (y[:-1] + y[1:])
        CX, CY = np.meshgrid(cx, cy, indexing="ij")
        centers = np.stack([CX.ravel(), CY.ravel()], axis=1)
        verts = np.vstack([grid, centers])
        ngy = ny + 1
        i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        i, j = i.ravel(), j.ravel()
        v00 = i * ngy + j
        v10 = (i + 1) * ngy + j
        v01 = i * ngy + (j + 1)
        v11 = (i + 1) * ngy + (j + 1)
        vc = grid.shape[0] + i * ny + j
        cells = np.concatenate(
            [
                np.stack([v00, v10, vc], axis=1),
                np.stack([v10, v11, vc], axis=1),
                np.stack([v11, v01, vc], axis=1),
                np.stack([v01, v00, vc], axis=1),
            ]
        )
        return verts, cells
    X, Y = np.meshgrid(x, y, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel()], axis=1)
    ngy = ny + 1
    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    i, j = i.ravel(), j.ravel()
    v00 = i * ngy + j
    v10 = (i + 1) * ngy + j
    v01 = i * ngy + (j + 1)
    v11 = (i + 1) * ngy + (j + 1)
    if diagonal == "right":
        t1 = np.stack([v00, v10, v11], axis=1)
        t2 = np.stack([v00, v11, v01], axis=1)
    else:  # 'left'
        t1 = np.stack([v00, v10, v01], axis=1)
        t2 = np.stack([v10, v11, v01], axis=1)
    return verts, np.concatenate([t1, t2])


_KUHN_TETS = [
    (0b000, 0b100, 0b110, 0b111),
    (0b000, 0b100, 0b101, 0b111),
    (0b000, 0b010, 0b110, 0b111),
    (0b000, 0b010, 0b011, 0b111),
    (0b000, 0b001, 0b101, 0b111),
    (0b000, 0b001, 0b011, 0b111),
]


def box_mesh(p0, p1, nx, ny, nz):
    """Tetrahedralized box, 6 tets/hex (Kuhn). Returns (verts, cells)."""
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    z = np.linspace(p0[2], p1[2], nz + 1)
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    sy, sz = (ny + 1) * (nz + 1), nz + 1
    i, j, k = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()

    def vid(di, dj, dk):
        return (i + di) * sy + (j + dj) * sz + (k + dk)

    corner = {b: vid(b >> 2 & 1, b >> 1 & 1, b & 1) for b in range(8)}
    cells = np.concatenate(
        [np.stack([corner[a] for a in tet], axis=1) for tet in _KUHN_TETS]
    )
    return verts, cells


def _near(a, b, tol=1e-9):
    return np.abs(a - b) < tol


def mms_square(resolution_factor: int, diagonal: str = "right") -> Mesh:
    """Unit-square MMS mesh (tests/make_mesh_MMS.py:43-117)."""
    n = 2**resolution_factor
    verts, cells = rectangle_mesh((0, 0), (1, 1), n, n, diagonal=diagonal)
    a, b = (0.25, 0.25), (0.75, 0.75)
    mids = verts[cells].mean(axis=1)
    inside = (
        (mids[:, 0] >= a[0]) & (mids[:, 0] <= b[0])
        & (mids[:, 1] >= a[1]) & (mids[:, 1] <= b[1])
    )
    cell_tags = inside.astype(np.int32)

    def marker(x):
        tags = np.zeros(len(x), dtype=np.int32)
        iny = (x[:, 1] >= a[1]) & (x[:, 1] <= b[1])
        inx = (x[:, 0] >= a[0]) & (x[:, 0] <= b[0])
        tags[_near(x[:, 0], a[0]) & iny] = 1
        tags[_near(x[:, 1], a[1]) & inx] = 2
        tags[_near(x[:, 0], b[0]) & iny] = 3
        tags[_near(x[:, 1], b[1]) & inx] = 4
        tags[_near(x[:, 0], 0.0)] = 5
        tags[_near(x[:, 1], 0.0)] = 6
        tags[_near(x[:, 0], 1.0)] = 7
        tags[_near(x[:, 1], 1.0)] = 8
        return tags

    return build_mesh(verts, cells, cell_tags, surface_tags=marker)


def box_2d_neuron(resolution_factor: int) -> Mesh:
    """62x4 um box with embedded rectangular 'neuron'
    (examples/idealized-geometries/make_mesh_2D.py:53-106), coordinates in
    meters (generator scales um -> m at the end, :92)."""
    nx, ny = 31 * 2**resolution_factor, 2 * 2**resolution_factor
    verts, cells = rectangle_mesh((0, 0), (62, 4), nx, ny, diagonal="crossed")
    a, b = (1.0, 1.0), (61.0, 3.0)
    mids = verts[cells].mean(axis=1)
    inside = (
        (mids[:, 0] >= a[0]) & (mids[:, 0] <= b[0])
        & (mids[:, 1] >= a[1]) & (mids[:, 1] <= b[1])
    )
    cell_tags = inside.astype(np.int32)

    def marker(x):
        # exterior boundary tag 5; membrane facets tagged via cell adjacency
        tags = np.zeros(len(x), dtype=np.int32)
        on_bdry = (
            _near(x[:, 0], 0) | _near(x[:, 0], 62) | _near(x[:, 1], 0) | _near(x[:, 1], 4)
        )
        tags[on_bdry] = 5
        return tags

    m = build_mesh(
        verts, cells, cell_tags, surface_tags=marker,
        membrane_tag_from_cells=lambda mids, lo, hi: np.ones(len(mids), dtype=np.int32),
    )
    m.vertices *= 1e-6
    return m


def box_3d_axons(resolution_factor: int, length_factor: int = 2) -> Mesh:
    """Box with four axons (examples/idealized-geometries/make_mesh_3D.py:59-138).

    Axon 1 gets membrane tag 1 (stimulated HH), axons 2-4 membrane tag 2
    (HH without stimulus); all axon *cells* are tagged 1 (:85-105).
    Coordinates in meters.
    """
    l = length_factor
    nx = l * 16 * 2**resolution_factor
    ny = nz = 9 * 2**resolution_factor
    verts, cells = box_mesh((0, 0, 0), (l * 16, 0.9, 0.9), nx, ny, nz)
    axons = [
        ((5, 0.2, 0.2), (l * 16 - 5, 0.4, 0.4), 1),
        ((5, 0.5, 0.5), (l * 16 - 5, 0.7, 0.7), 2),
        ((5, 0.5, 0.2), (l * 16 - 5, 0.7, 0.4), 2),
        ((5, 0.2, 0.5), (l * 16 - 5, 0.4, 0.7), 2),
    ]
    mids = verts[cells].mean(axis=1)
    cell_tags = np.zeros(len(cells), dtype=np.int32)
    for a, b, _tag in axons:
        inside = np.all((mids >= np.array(a)) & (mids <= np.array(b)), axis=1)
        cell_tags[inside] = 1

    def marker(x):
        tags = np.zeros(len(x), dtype=np.int32)
        hi = np.array([l * 16, 0.9, 0.9])
        on_bdry = np.any(_near(x, 0.0) | _near(x, hi), axis=1)
        tags[on_bdry] = 5
        return tags

    # membrane tag = membrane tag of the axon whose (slightly inflated) box
    # contains the facet midpoint; tol covers jagged structured boundaries
    tol = 0.5 / (9 * 2**resolution_factor)

    def mem_tag(mids, lo, hi_tags):
        tags = np.zeros(len(mids), dtype=np.int32)
        for a, b, tag in axons:
            a = np.array(a) - tol
            b = np.array(b) + tol
            inside = np.all((mids >= a) & (mids <= b), axis=1)
            tags[inside] = tag
        assert (tags > 0).all(), "membrane facet outside every axon box"
        return tags

    m = build_mesh(
        verts, cells, cell_tags, surface_tags=marker, membrane_tag_from_cells=mem_tag
    )
    m.vertices *= 1e-6
    return m


def bifurcating_neuron(resolution_factor: int = 0,
                       length: float = 108.0) -> Mesh:
    """Procedural bifurcating neuron: soma + vertical trunk + two diagonal
    descending branches, embedded in ECS (synthetic stand-in for the
    228-16MG.CNG morphology of examples/rat-neuron/run_rat_neuron.py, whose
    h5 blob is absent from the reference snapshot).

    Mirrors the real run's structure (run_rat_neuron.py:192-201, :238):
    membrane facets from cell-tag disagreement, split by the y coordinate
    into soma/proximal (tag 2, y >= length/3 -- Hodgkin-Huxley) vs distal
    processes (tag 1 -- passive leak carrying the synaptic stimulus), on
    genuinely non-convex branched geometry: an AP initiated at the distal
    tips must cross the bifurcation point to reach soma.

    `length` is the domain's y extent in um (default ~108, matching the
    hundreds-of-um scale of the real morphology: a few-um neuron is
    electrotonically compact, i.e. the AP fires simultaneously everywhere
    and conduction velocity is unmeasurable).  Cells stay ISOTROPIC
    (h = 0.3 um in x/y, 0.2 in z): stretching cells instead was measured
    to stall the EMI PCG (block-Jacobi + deflation degrade with cell
    aspect ratio).  Coordinates in meters (domain 3.0 x length x 0.6 um).
    """
    rf = 2**resolution_factor
    nx, ny, nz = 10 * rf, int(round(length / 0.3)) * rf, 3 * rf
    L = np.array([3.0, float(length), 0.6])
    verts, cells = box_mesh((0, 0, 0), tuple(L), nx, ny, nz)
    mids = verts[cells].mean(axis=1)

    w = 0.25                        # process half-width (x-y plane)
    cx = 1.5                        # trunk / soma center line
    yb = 0.42 * length              # bifurcation point

    def seg_dist(p, a, b):
        """2D (x-y) distance from points p to segment a-b."""
        a, b = np.asarray(a, float), np.asarray(b, float)
        ab = b - a
        t = np.clip(((p[:, :2] - a) @ ab) / (ab @ ab), 0.0, 1.0)
        proj = a + t[:, None] * ab
        return np.linalg.norm(p[:, :2] - proj, axis=1)

    zband = np.abs(mids[:, 2] - 0.3) <= 0.1 + 1e-9      # middle z layer
    soma = ((np.abs(mids[:, 0] - cx) <= 0.45)
            & (mids[:, 1] >= 0.75 * length) & (mids[:, 1] <= 0.92 * length))
    trunk = seg_dist(mids, (cx, yb), (cx, 0.75 * length)) <= w
    bl = seg_dist(mids, (cx, yb), (0.45, 0.08 * length)) <= w
    br = seg_dist(mids, (cx, yb), (2.55, 0.08 * length)) <= w
    cell_tags = (zband & (soma | trunk | bl | br)).astype(np.int32)

    def marker(x):
        tags = np.zeros(len(x), dtype=np.int32)
        on_bdry = np.any(_near(x, 0.0) | _near(x, L), axis=1)
        tags[on_bdry] = 5
        return tags

    def mem_tag(fmids, lo, hi):
        # reference split: y >= threshold -> soma/proximal HH (tag 2),
        # below -> distal leak (tag 1) (run_rat_neuron.py:199-201)
        return np.where(fmids[:, 1] >= length / 3.0, 2, 1).astype(np.int32)

    m = build_mesh(verts, cells, cell_tags, surface_tags=marker,
                   membrane_tag_from_cells=mem_tag)
    m.vertices *= 1e-6
    return m
