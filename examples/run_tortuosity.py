#!/usr/bin/env python3
"""Local astrocyte depolarization with tortuosity
(examples/local-astrocyte-depolarization/run_tortuosity.py).

Features exercised:
* per-subdomain diffusion scaled by tortuosity 1/lambda^2 (:154-156),
* immobile background charge rho per subdomain from the calibrated
  electroneutrality defect (:117-122),
* volumetric ion source/sink: a space-time indicator injecting K+ and
  removing Na+ inside an ROI box during [0.2, t_syn] ms (:180-200; consumed
  into dx(0) at solver.py:599),
* astro membrane models (HH without stimulus + glial with Cl leak and
  Michaelis pump), ion order [K, Na, Cl] so Na_i is taken from component 1
  (:44-49, :229).

The 100-cell MICrONS synapse mesh is not in the snapshot (only its
emimesh config, meshes/synapse.yml); by default the EMIx volume mesh is
used with the same subdomain semantics (0 ECS, 1 neuron, 2 glial).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams, StimParams
from knpemidg_tpu.models.glial import GlialKirAstro
from knpemidg_tpu.models.hh import HodgkinHuxleyAstro
from knpemidg_tpu.solver import Solver, Traces

EMIX_MESH = (
    "/root/reference/examples/emix-simulations/meshes/emix_meshes/"
    "volume_ncells_5_size_5000"
)


class AstroSolver(Solver):
    """K_e from the ECS trace; Na_i from solved component 1 (ion order is
    [K, Na, Cl], run_tortuosity.py:44-49)."""

    def update_ode(self, tag, traces: Traces):
        return {"K_e": traces.plus(0), "Na_i": traces.minus(1)}


def load_astro_mesh():
    """Relabel the EMIx volume to the astro convention: 1=neuron, 2=glial;
    membranes: ECS-neuron -> 1 (HH), ECS-glial -> 2 (glial), 3 reserved."""
    import h5py

    from knpemidg_tpu.mesh.core import build_mesh

    with h5py.File(os.path.join(EMIX_MESH, "mesh.h5"), "r") as f:
        verts = np.asarray(f["data0"], dtype=np.float64)
        cells = np.asarray(f["data1"], dtype=np.int64)
        labels = np.asarray(f["data2"], dtype=np.int64)
    tags = np.zeros(len(cells), dtype=np.int32)
    tags[(labels == 2) | (labels == 3)] = 1          # neuron
    tags[(labels >= 4) & (labels <= 6)] = 2          # glial

    def mem_tag(mids, lo, hi):
        out = np.full(len(mids), 10, dtype=np.int32)
        out[(lo == 0) & (hi == 1)] = 1
        out[(lo == 0) & (hi == 2)] = 2
        return out

    m = build_mesh(verts, cells, tags, membrane_tag_from_cells=mem_tag)
    m.vertices *= 1e-7                                # nm -> cm
    return m


def roi_source(g_syn, t_syn, sign, roi):
    """Space-time indicator source (run_tortuosity.py:180-200)."""
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = roi

    def f(x, t):
        # x is (nq, d, nc): coordinate components on axis -2
        inside = (
            (x[..., 0, :] >= xmin) & (x[..., 0, :] <= xmax)
            & (x[..., 1, :] >= ymin) & (x[..., 1, :] <= ymax)
            & (x[..., 2, :] >= zmin) & (x[..., 2, :] <= zmax)
        )
        active = (t >= 0.2) & (t <= t_syn)
        return sign * g_syn * inside * active

    return f


def build_solver(dt=0.05, lambda_i=3.2 * 4, lambda_e=1.6 * 4, g_syn=26.0,
                 t_syn=1.2, mesh=None, roi=None, dtype=None):
    # calibrated initial values (run_tortuosity.py:103-121)
    K_e, K_g, K_n = 3.092970607490389, 99.3100014897692, 124.13988964240784
    Na_e, Na_g, Na_n = 144.60625137617149, 15.775818906083778, 12.850454639128186
    Cl_e, Cl_g, Cl_n = 133.62525154406637, 5.203660274163705, 5.0

    # immobile background charge = electroneutrality defect per subdomain
    rho = {
        0: -(Na_e + K_e - Cl_e),
        1: -(Na_n + K_n - Cl_n),
        2: -(Na_g + K_g - Cl_g),
    }
    params = PhysicalParams(
        dt=dt, n_steps_ODE=25, C_M=1.0, temperature=307e3,
        F=96500e3, R=8.315e3,
        phi_M_init=0.0, phi_M_init_type="constant", rho_sub=rho,
    )
    D_Na, D_K, D_Cl = 1.33e-8, 1.96e-8, 2.03e-8     # cm^2/ms
    le2, li2 = lambda_e**2, lambda_i**2

    if roi is None:
        roi = ((2700e-7, 3100e-7), (1700e-7, 2100e-7), (1800e-7, 2200e-7))
    f_K = roi_source(g_syn, t_syn, +1.0, roi)
    f_Na = roi_source(g_syn, t_syn, -1.0, roi)

    # NB ion order [K, Na, Cl]: Cl eliminated (run_tortuosity.py:229)
    ion_list = [
        Ion(name="K", z=1.0,
            D_sub={0: D_K / le2, 1: D_K / li2, 2: D_K / li2},
            c_init_sub={0: K_e, 1: K_n, 2: K_g}, f_source=f_K),
        Ion(name="Na", z=1.0,
            D_sub={0: D_Na / le2, 1: D_Na / li2, 2: D_Na / li2},
            c_init_sub={0: Na_e, 1: Na_n, 2: Na_g}, f_source=f_Na),
        Ion(name="Cl", z=-1.0,
            D_sub={0: D_Cl / le2, 1: D_Cl / li2, 2: D_Cl / li2},
            c_init_sub={0: Cl_e, 1: Cl_n, 2: Cl_g}),
    ]
    stim_params = StimParams(stimulus={"stim_amplitude": 0.0},
                             stimulus_locator=lambda x: True, g_syn_bar=0.0)

    if mesh is None:
        mesh = load_astro_mesh()
    S = AstroSolver(params, ion_list, dtype=dtype)
    S.setup_domain(mesh, quad_degree=2)
    S.setup_parameters()
    S.setup_FEM_spaces()
    tags = set(np.unique(mesh.if_tags)) - {0, 10}
    models = {1: HodgkinHuxleyAstro(), 2: GlialKirAstro(), 3: HodgkinHuxleyAstro()}
    S.setup_membrane_model(stim_params, {t: models[t] for t in sorted(tags)})
    return S


def main(Tstop=2.0, fname="results/data/astro-tortuosity/", save=True):
    S = build_solver()
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40, threshold_emi=0.9,
        rtol_knp=1e-7, atol_knp=1e-40, threshold_knp=0.75, verbose=True,
        pc_refresh_every=50,
    )
    state = S.solve_system_active(Tstop, 0.0, sp, filename=fname,
                                  save_fields=save, save_solver_stats=save)
    return S, state


if __name__ == "__main__":
    main()
