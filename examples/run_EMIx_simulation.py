#!/usr/bin/env python3
"""EMIx realistic brain-tissue simulation (north-star workload).

TPU-native port of examples/emix-simulations/run_EMIx_simulation.py: the
121,617-tet emimesh volume (22,419 vertices, 246,206 facets) with glial Kir
membranes (tag 1) and HH neuron membranes (tag 2); mm/cm units
(mC, mK, cm^2/ms); dt = 0.1 ms, Tstop = 1 ms.  Cell labels remapped
{1->0 ECS, 2,3->2 neuron, 4,5,6->1 glial}; membrane facets derived from
cell-label adjacency (the snapshot lacks tags.h5; see mesh/io.py).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.mesh.io import load_emix_mesh
from knpemidg_tpu.models.glial import GlialKir
from knpemidg_tpu.models.hh import HodgkinHuxleyMV
from knpemidg_tpu.solver import StandardSolver

DEFAULT_MESH = (
    "/root/reference/examples/emix-simulations/meshes/emix_meshes/"
    "volume_ncells_5_size_5000"
)


def build_solver(mesh_path=DEFAULT_MESH, dt=0.1, dtype=None, mesh=None):
    # physical parameters, emix m-units (run_EMIx_simulation.py:56-99)
    params = PhysicalParams(
        dt=dt,                      # ms
        n_steps_ODE=25,
        C_M=2.0,                    # uF/cm^2
        temperature=300e3,          # mK
        F=96485e3,                  # mC/mol
        R=8.314e3,                  # mJ/(K mol)
        phi_M_init=0.0,             # taken from the ODE initial states
        phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0, 2: 0.0},
    )

    # calibrated initial concentrations (run_EMIx_simulation.py:74-92)
    K_e, K_n, K_g = 3.3236967382613933, 124.15397583492471, 102.75563828644862
    Na_e, Na_n, Na_g = 100.71925900028181, 12.838513108606818, 12.39731187972181
    Cl_e, Cl_n, Cl_g = Na_e + K_e, Na_n + K_n, Na_g + K_g

    D_Na, D_K, D_Cl = 1.33e-8, 1.96e-8, 2.03e-8     # cm^2/ms

    ion_list = [
        Ion(name="K", z=1.0, D_sub={0: D_K, 1: D_K, 2: D_K},
            c_init_sub={0: K_e, 1: K_g, 2: K_n}),
        Ion(name="Cl", z=-1.0, D_sub={0: D_Cl, 1: D_Cl, 2: D_Cl},
            c_init_sub={0: Cl_e, 1: Cl_g, 2: Cl_n}),
        Ion(name="Na", z=1.0, D_sub={0: D_Na, 1: D_Na, 2: D_Na},
            c_init_sub={0: Na_e, 1: Na_g, 2: Na_n}),
    ]

    g_syn_bar = 5.0                 # mS/cm^2
    stim_params = StimParams(
        stimulus={"stim_amplitude": g_syn_bar},
        stimulus_locator=lambda x: x[0] < 3.0e-4,   # cm
        g_syn_bar=g_syn_bar,
    )

    if mesh is None:
        mesh = load_emix_mesh(mesh_path)
    S = StandardSolver(params, ion_list, dtype=dtype)
    S.setup_domain(mesh, quad_degree=2)
    S.setup_parameters()
    S.setup_FEM_spaces()
    # the initial phi_M comes from each membrane model's resting state
    S.setup_membrane_model(
        stim_params, {1: GlialKir(), 2: HodgkinHuxleyMV(stimulus=True)}
    )
    return S


def solver_params(resolution=0):
    # run_EMIx_simulation.py:224-234
    return SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40, threshold_emi=0.9,
        rtol_knp=1e-7, atol_knp=2e-40, threshold_knp=0.75,
        gmres_restart=30, agg_size=64, pc_refresh_every=50,
        resolution=resolution, verbose=True,
    )


def main(Tstop=1.0, fname="results/data/EMIx/", save=True):
    S = build_solver()
    state = S.solve_system_active(
        Tstop, 0.0, solver_params(), filename=fname,
        save_fields=save, save_solver_stats=save,
    )
    return S, state


if __name__ == "__main__":
    main()
