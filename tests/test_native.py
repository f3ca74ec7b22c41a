"""Native C++ meshkit vs numpy fallback: byte-identical topology."""
import os

import numpy as np
import pytest

import knpemidg_tpu.native as native
from knpemidg_tpu.mesh.generators import box_mesh, rectangle_mesh


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("dim", [2, 3])
def test_native_facets_match_numpy(dim, monkeypatch):
    from knpemidg_tpu.mesh import core

    if dim == 2:
        v, c = rectangle_mesh((0, 0), (1, 1), 9, 7)
    else:
        v, c = box_mesh((0, 0, 0), (1, 1, 1), 4, 3, 5)
    tags = (np.arange(len(c)) % 2).astype(np.int32)

    m_native = core.build_mesh(v, c, tags)
    monkeypatch.setenv("KNPEMIDG_NATIVE", "0")
    # force the numpy fallback by resetting the loader cache
    native._tried = False
    native._lib = None
    try:
        m_np = core.build_mesh(v, c, tags)
    finally:
        native._tried = False
        native._lib = None
        monkeypatch.delenv("KNPEMIDG_NATIVE")

    for attr in ("cells", "cell_tags", "if_verts", "if_cells", "if_tags",
                 "ef_verts", "ef_cells", "ef_tags", "cf_idx", "cf_is_plus"):
        assert np.array_equal(getattr(m_native, attr), getattr(m_np, attr)), attr


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_morton_matches_numpy():
    from knpemidg_tpu.mesh.core import morton_order

    rng = np.random.default_rng(3)
    pts = rng.random((5000, 3))
    codes = native.morton_codes(pts, bits=10)
    order_native = np.argsort(codes, kind="stable")
    order_np = morton_order(pts)
    assert np.array_equal(order_native, order_np)
