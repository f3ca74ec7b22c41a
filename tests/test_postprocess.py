"""Post-processing: h5 round-trip, membrane series, AP velocity, VTK."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams
from knpemidg_tpu.postprocess import (Results, export_pvd, vertex_average,
                                      write_vtu)


@pytest.mark.slow
def test_h5_roundtrip_and_series(tmp_path):
    from run_2D import build_solver

    S = build_solver(resolution=0)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=1e-40)
    fname = str(tmp_path) + "/"
    S.solve_system_active(5 * S.params.dt, 0.0, sp, filename=fname,
                          save_fields=True, save_solver_stats=True)

    res = Results(fname + "results.h5")
    assert res.n_frames == 6           # initial + 5 steps
    assert res.mesh.num_cells == S.mesh.num_cells
    s = res.membrane_series((10e-6, 1e-6))
    # frame 0 stores the pre-solve phi=0; from frame 1 on, the stimulated
    # membrane (x < 20um) is physiological and depolarizes over the run
    assert s["phi_M"][-1] > s["phi_M"][1]
    assert -0.09 < s["phi_M"][1] < 0.0
    assert s["c_e"].shape == (6, 2)
    # Nernst from traces is physiological
    E_K = 8.314 * 300 / 96485 * np.log(s["c_e"][:, 0] / s["c_i"][:, 0])
    assert -0.12 < E_K[0] < -0.06

    # AP velocity machinery returns a finite number once both sites cross;
    # with this short run it may be nan -- only exercise the code path
    v = res.ap_velocity((5e-6, 1e-6), (40e-6, 1e-6), threshold=-0.05)
    assert np.isnan(v) or v > 0

    fr = res.frame(res.n_frames - 1)
    write_vtu(str(tmp_path / "f.vtk"), res.mesh, {"phi": fr["phi"]})
    assert (tmp_path / "f.vtk").stat().st_size > 1000

    # ParaView time series: a .pvd collection + one .vtu per frame, each
    # parseable XML with cell and point data (reference write_to_pvd)
    pvd = export_pvd(res, str(tmp_path / "pvd" / "run.pvd"),
                     ion_names=("K", "Na"))
    import xml.etree.ElementTree as ET

    root = ET.parse(pvd).getroot()
    frames = root.findall(".//DataSet")
    assert len(frames) == res.n_frames
    vtu = os.path.join(os.path.dirname(pvd), frames[-1].get("file"))
    piece = ET.parse(vtu).getroot().find(".//Piece")
    assert int(piece.get("NumberOfCells")) == res.mesh.num_cells
    names = {a.get("Name") for a in piece.find("PointData")}
    assert {"phi", "K", "Na", "c_elim"} <= names
    # vertex averaging preserves a constant field exactly, and accepts
    # degree-2 fields (edge dofs after the vertex dofs are ignored)
    const = np.full((res.mesh.num_cells, res.mesh.cells.shape[1]), 3.25)
    np.testing.assert_allclose(vertex_average(res.mesh, const), 3.25)
    import math
    nd2 = math.comb(res.mesh.dim + 2, 2)
    const2 = np.full((res.mesh.num_cells, nd2), 2.5)
    np.testing.assert_allclose(vertex_average(res.mesh, const2), 2.5)

    # solver stats files written (reference layout, solver.py:1146-1198)
    stats_files = os.listdir(fname + "solver/")
    assert any(f.startswith("emi_niter") for f in stats_files)
    assert any(f.startswith("knp_solve") for f in stats_files)
    res.close()


@pytest.mark.slow
def test_figure_scripts_reference_outputs(tmp_path):
    """Figure parity (VERDICT r2 item 7): every make_figures_* script runs
    headless against a saved small run and produces its reference-named
    outputs (pot_con_2D.svg / pot_con_3D.svg + txt series /
    pot_con_rat_3D.svg + surface_time.svg + membrane.pvd / plot.svg)."""
    from run_2D import build_solver

    S = build_solver(resolution=0)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=1e-40)
    fname = str(tmp_path / "run") + "/"
    os.makedirs(fname, exist_ok=True)
    S.solve_system_active(4 * S.params.dt, 0.0, sp, filename=fname,
                          save_fields=True)

    import make_figures_2D
    out2d = str(tmp_path / "fig2d") + "/"
    make_figures_2D.main(fname, out2d)
    assert os.path.exists(out2d + "pot_con_2D.svg")
    assert os.path.exists(out2d + "summary.svg")

    import make_figures_3D
    out3d = str(tmp_path / "fig3d") + "/"
    make_figures_3D.main(fname, out3d)
    assert os.path.exists(out3d + "pot_con_3D.svg")
    assert os.path.exists(fname + "solver/phi_M_3D.txt")
    assert len(open(fname + "solver/phi_M_3D.txt").readlines()) == 5

    import make_figures_rat_neuron
    outrn = str(tmp_path / "figrn") + "/"
    make_figures_rat_neuron.main(fname, outrn)
    assert os.path.exists(outrn + "pot_con_rat_3D.svg")
    assert os.path.exists(outrn + "surface_time.svg")
    assert os.path.exists(outrn + "membrane.pvd")

    import make_figures_astro
    outas = str(tmp_path / "figas") + "/"
    make_figures_astro.main(fname, outas, roi_center=(31e-6, 2e-6))
    assert os.path.exists(outas + "plot.svg")
    assert os.path.exists(outas + "surface_time.svg")
    assert os.path.exists(outas + "membrane.pvd")
