#!/usr/bin/env python3
"""Calibration check: run the full KNP-EMI system from the ODE-calibrated
initial state with zero stimulus -- the state must stay (approximately)
steady (examples/emix-simulations/run_check_calibration.py:19-22).

Uses a two-axon box mesh like the reference (:36-120): axon 1 carries the
glial membrane (tag 1), axon 2 the HH neuron membrane (tag 2), mm/cm units.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.mesh.core import build_mesh
from knpemidg_tpu.mesh.generators import box_mesh
from knpemidg_tpu.models.glial import GlialKir
from knpemidg_tpu.models.hh import HodgkinHuxleyMV
from knpemidg_tpu.solver import StandardSolver


def two_axon_mesh(resolution=0, scale=1e-4):
    """Box with two axons in *separate subdomains* (1 neuron, 2 glial),
    membrane tag = ICS subdomain tag (reference mesh 3D_two_tags,
    run_check_calibration.py:164-204); um -> cm."""
    l = 16
    nx, ny, nz = l * 2**resolution, 9 * 2**resolution, 9 * 2**resolution
    verts, cells = box_mesh((0, 0, 0), (l, 0.9, 0.9), nx, ny, nz)
    mids = verts[cells].mean(axis=1)
    axons = [((2, 0.2, 0.2), (l - 2, 0.4, 0.4), 1),
             ((2, 0.5, 0.5), (l - 2, 0.7, 0.7), 2)]
    tags = np.zeros(len(cells), dtype=np.int32)
    for a, b, tg in axons:
        tags[np.all((mids >= np.array(a)) & (mids <= np.array(b)), axis=1)] = tg

    def mem_tag(fmids, lo, hi):
        return hi.astype(np.int32)     # membrane tag = ICS subdomain tag

    m = build_mesh(verts, cells, tags, membrane_tag_from_cells=mem_tag)
    m.vertices *= scale
    return m


def build_solver(resolution=0, dt=0.1, dtype=None):
    params = PhysicalParams(
        dt=dt, n_steps_ODE=25, C_M=2.0, temperature=300e3,
        F=96485e3, R=8.314e3,
        phi_M_init=0.0, phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0, 2: 0.0},
    )
    # calibrated values (run_check_calibration.py:82-119): subdomain 1 is
    # the neuron axon, 2 the glial axon
    K_e, K_n, K_g = 3.3236967382613933, 124.15397583492471, 102.75563828644862
    Na_e, Na_n, Na_g = 100.71925900028181, 12.838513108606818, 12.39731187972181
    Cl_e, Cl_n, Cl_g = Na_e + K_e, Na_n + K_n, Na_g + K_g
    D_Na, D_K, D_Cl = 1.33e-8, 1.96e-8, 2.03e-8
    ion_list = [
        Ion(name="K", z=1.0, D_sub={0: D_K, 1: D_K, 2: D_K},
            c_init_sub={0: K_e, 1: K_n, 2: K_g}),
        Ion(name="Cl", z=-1.0, D_sub={0: D_Cl, 1: D_Cl, 2: D_Cl},
            c_init_sub={0: Cl_e, 1: Cl_n, 2: Cl_g}),
        Ion(name="Na", z=1.0, D_sub={0: D_Na, 1: D_Na, 2: D_Na},
            c_init_sub={0: Na_e, 1: Na_n, 2: Na_g}),
    ]
    stim_params = StimParams(stimulus={"stim_amplitude": 0.0},
                             stimulus_locator=lambda x: False)
    S = StandardSolver(params, ion_list, dtype=dtype)
    S.setup_domain(two_axon_mesh(resolution), quad_degree=2)
    S.setup_parameters()
    S.setup_FEM_spaces()
    # reference: ode_models = {1: mm_hh, 2: mm_glial} (:204)
    S.setup_membrane_model(stim_params, {1: HodgkinHuxleyMV(stimulus=False), 2: GlialKir()})
    return S


def main(Tstop=1.0, fname=None):
    S = build_solver()
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=1e-40, verbose=True)
    state = S.solve_system_active(Tstop, 0.0, sp, filename=fname,
                                  save_fields=fname is not None)
    phi_M = np.asarray(state["phi_M"])
    print("phi_M range (mV):", phi_M.min(), phi_M.max())
    return S, state


if __name__ == "__main__":
    main()
