#!/usr/bin/env python3
"""Idealized 3D axon bundle (examples/idealized-geometries/run_3D.py).

A 32 x 0.9 x 0.9 um box with 4 axons (all subdomain tag 1): axon 1 carries a
stimulated HH membrane (tag 1), axons 2-4 HH without stimulus (tag 2); SI
units, same physics as the 2D app.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.mesh.generators import box_3d_axons
from knpemidg_tpu.models.hh import HodgkinHuxleySI
from knpemidg_tpu.solver import StandardSolver


def build_solver(resolution=0, dt=1.0e-4, length_factor=2, dtype=None):
    params = PhysicalParams(
        dt=dt, n_steps_ODE=25, C_M=0.02, temperature=300.0,
        F=96485.0, R=8.314,
        phi_M_init=-0.07438609374462003, phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0, 2: 0.0},
    )
    Na_i, Na_e = 12.838513108648856, 100.71925900027354
    K_i, K_e = 124.15397583491901, 3.3236967382705265
    D_Na, D_K, D_Cl = 1.33e-9, 1.96e-9, 2.03e-9
    ion_list = [
        Ion(name="K", z=1.0, D_sub={0: D_K, 1: D_K},
            c_init_sub={0: K_e, 1: K_i}),
        Ion(name="Cl", z=-1.0, D_sub={0: D_Cl, 1: D_Cl},
            c_init_sub={0: Na_e + K_e, 1: Na_i + K_i}),
        Ion(name="Na", z=1.0, D_sub={0: D_Na, 1: D_Na},
            c_init_sub={0: Na_e, 1: Na_i}),
    ]
    g_syn_bar = 10.0
    stim_params = StimParams(
        stimulus={"stim_amplitude": g_syn_bar},
        stimulus_locator=lambda x: x[0] < 10e-6,
        g_syn_bar=g_syn_bar,
    )
    mesh = box_3d_axons(resolution, length_factor=length_factor)
    S = StandardSolver(params, ion_list, dtype=dtype)
    S.setup_domain(mesh, quad_degree=2)
    S.setup_parameters()
    S.setup_FEM_spaces()
    S.setup_membrane_model(stim_params, {
        1: HodgkinHuxleySI(stimulus=True),
        2: HodgkinHuxleySI(stimulus=False),
    })
    return S


def main(resolution=0, Tstop=2.0e-2, fname="results/data/3D/", save=True):
    S = build_solver(resolution)
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40, threshold_emi=0.9,
        rtol_knp=1e-7, atol_knp=1e-40, threshold_knp=0.75,
        pc_refresh_every=50, resolution=resolution, verbose=True,
    )
    state = S.solve_system_active(Tstop, 0.0, sp, filename=fname,
                                  save_fields=save, save_solver_stats=save)
    return S, state


if __name__ == "__main__":
    main()
