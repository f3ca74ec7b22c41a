#!/usr/bin/env python3
"""Idealized 2D geometry with a Hodgkin-Huxley membrane.

TPU-native port of examples/idealized-geometries/run_2D.py: a 62 x 4 um box
with one embedded rectangular "neuron" (cells tagged 1), SI units, three ion
species (K, Cl, Na; Na eliminated), HH membrane on facet tag 1 with an
exponentially decaying periodic synaptic stimulus on x < 20 um.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.mesh.generators import box_2d_neuron
from knpemidg_tpu.models.hh import HodgkinHuxleySI
from knpemidg_tpu.solver import StandardSolver


def build_solver(resolution=0, dt=1.0e-4, dtype=None):
    # --- physical parameters (SI; run_2D.py:60-98) -------------------------
    params = PhysicalParams(
        dt=dt,
        n_steps_ODE=25,
        C_M=0.02,                  # F/m^2
        temperature=300.0,         # K
        F=96485.0,                 # C/mol
        R=8.314,                   # J/(K mol)
        phi_M_init=-0.07438609374462003,   # V
        phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0},
    )

    # --- initial concentrations (mol/m^3 = mM; run_2D.py:81-87) ------------
    Na_i, Na_e = 12.838513108648856, 100.71925900027354
    K_i, K_e = 124.15397583491901, 3.3236967382705265
    Cl_i, Cl_e = Na_i + K_i, Na_e + K_e

    D_Na, D_K, D_Cl = 1.33e-9, 1.96e-9, 2.03e-9       # m^2/s

    # NB: ion order [K, Cl, Na] -- Na eliminated (run_2D.py:142)
    ion_list = [
        Ion(name="K", z=1.0, D_sub={0: D_K, 1: D_K},
            c_init_sub={0: K_e, 1: K_i}, c_init_sub_type="constant"),
        Ion(name="Cl", z=-1.0, D_sub={0: D_Cl, 1: D_Cl},
            c_init_sub={0: Cl_e, 1: Cl_i}, c_init_sub_type="constant"),
        Ion(name="Na", z=1.0, D_sub={0: D_Na, 1: D_Na},
            c_init_sub={0: Na_e, 1: Na_i}, c_init_sub_type="constant"),
    ]

    # --- stimulus (run_2D.py:145-154) ---------------------------------------
    g_syn_bar = 10.0
    stim_params = StimParams(
        stimulus={"stim_amplitude": g_syn_bar},
        stimulus_locator=lambda x: x[0] < 20e-6,
        g_syn_bar=g_syn_bar,
    )

    mesh = box_2d_neuron(resolution)
    S = StandardSolver(params, ion_list, dtype=dtype)
    S.setup_domain(mesh)
    S.setup_parameters()
    S.setup_FEM_spaces()
    S.setup_membrane_model(stim_params, {1: HodgkinHuxleySI(stimulus=True)})
    return S


def main(resolution=0, Tstop=2.0e-2, fname="results/data/2D/", save=True):
    S = build_solver(resolution)
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40,
        rtol_knp=1e-7, atol_knp=1e-40,
        resolution=resolution, verbose=True,
    )
    state = S.solve_system_active(
        Tstop, 0.0, sp, filename=fname, save_fields=save, save_solver_stats=save
    )
    return S, state


if __name__ == "__main__":
    main()
