#!/usr/bin/env python3
"""Rat neuron morphology simulation (examples/rat-neuron/run_rat_neuron.py).

Real 228-16MG.CNG morphology when the XDMF/H5 blob is available (the h5 is
absent from the reference snapshot, .MISSING_LARGE_BLOBS); otherwise a
procedural ~108-um bifurcating neuron (soma + trunk + two branches,
mesh/generators.bifurcating_neuron) exercising the same structure on
non-convex branched geometry:

* membrane facets derived from cell-tag disagreement between neighbor cells
  (run_rat_neuron.py:192-201),
* membrane split by position into soma/dendrite (tag 2, Hodgkin-Huxley)
  vs distal processes (tag 1, passive leak) (:199-201, :238),
* synaptic stimulus g_syn = 200 S/m^2 on the distal dendrites (:143-147).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.models.hh import HodgkinHuxleySI
from knpemidg_tpu.models.leak import LeakSI
from knpemidg_tpu.solver import StandardSolver

RAT_XDMF = "/root/reference/examples/rat-neuron/meshes/rat_neuron/228-16MG.CNG.xdmf"


def load_rat_mesh():
    """Real morphology: labels {1 -> 0 ECS, 2 -> 1 neuron}; membrane facets
    from tag disagreement, split at y = -5 um (pre-scaling) into tag 1
    (distal, leak) / tag 2 (soma+dendrites, HH); um -> m."""
    from knpemidg_tpu.mesh.io import load_xdmf_mesh

    def mem_tag(mids, lo, hi):
        return np.where(mids[:, 1] >= -5.0, 2, 1).astype(np.int32)

    m = load_xdmf_mesh(RAT_XDMF, cell_attr="label", membrane_tag_from_cells=mem_tag)
    m.cell_tags = np.where(m.cell_tags == 2, 1, 0).astype(np.int32)
    m.vertices *= 1e-6
    return m


def synthetic_neuron_mesh(resolution=0):
    """Fallback morphology: a procedural bifurcating neuron (soma + trunk +
    two descending branches) with the real run's y-split membrane tagging
    (leak tag 1 distal / HH tag 2 proximal) on non-convex branched geometry
    (VERDICT r3 item 8; mesh/generators.bifurcating_neuron)."""
    from knpemidg_tpu.mesh.generators import bifurcating_neuron

    # ~108 um neuron: long enough that AP conduction resolves across
    # time steps (the real morphology spans ~300 um)
    return bifurcating_neuron(resolution)


def build_solver(resolution=0, dt=1.0e-4, dtype=None, g_syn=200.0):
    params = PhysicalParams(
        dt=dt, n_steps_ODE=25, C_M=0.02, temperature=300.0,
        F=96485.0, R=8.314,
        phi_M_init=-0.07438609374462003, phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0},
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
    have_real = os.path.exists(RAT_XDMF.replace(".xdmf", ".h5"))
    if have_real:
        mesh = load_rat_mesh()
        # distal dendrite stimulus regions (run_rat_neuron.py:143-147)
        locator = lambda x: (x[1] < -80e-6) or (x[0] < -125e-6) or (x[0] > 140e-6)
    else:
        mesh = synthetic_neuron_mesh(resolution)
        # synaptic input at the distal branch tips (cf. the real run's
        # distal-dendrite locator above; 0.14 * length)
        locator = lambda x: x[1] < 15.0e-6
    stim_params = StimParams(
        stimulus={"stim_amplitude": g_syn},
        stimulus_locator=locator, g_syn_bar=g_syn,
    )
    S = StandardSolver(params, ion_list, dtype=dtype)
    S.setup_domain(mesh, quad_degree=2)
    S.setup_parameters()
    S.setup_FEM_spaces()
    S.setup_membrane_model(stim_params, {
        1: LeakSI(),
        2: HodgkinHuxleySI(stimulus=False),
    })
    return S


def main(Tstop=1.0e-2, fname="results/data/rat-neuron/", save=True):
    S = build_solver()
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40, rtol_knp=1e-7, atol_knp=1e-40,
        verbose=True,
    )
    state = S.solve_system_active(Tstop, 0.0, sp, filename=fname,
                                  save_fields=save, save_solver_stats=save)
    return S, state


if __name__ == "__main__":
    main()
