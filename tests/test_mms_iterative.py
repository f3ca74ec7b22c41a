"""Iterative (jitted CG/GMRES) path must reproduce the direct-solve MMS
solution -- validates the production TPU solve path end-to-end, including
the constant-nullspace handling of the singular EMI system at the extreme
C_phi = 1/dt = 1e10 coupling of the MMS setup."""
import numpy as np
import pytest

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams
from knpemidg_tpu.mesh.generators import mms_square
from knpemidg_tpu.mms.problems import setup_mms_space
from knpemidg_tpu.solver import Solver

from test_mms_space import D_SUB, C_SUB, Z


def run(resolution, sp, dt=1e-10, n_steps=2):
    C_phi = 1.0 / dt
    mms = setup_mms_space({
        "F": 1.0, "R": 1.0, "temperature": 1.0, "C_phi": C_phi,
        "z": [Z[n] for n in "abc"],
        "D": [D_SUB[n] for n in "abc"],
        "C": [C_SUB[n] for n in "abc"],
    })
    params = PhysicalParams(
        dt=dt, F=1.0, R=1.0, temperature=1.0, C_M=1.0, C_phi=C_phi,
        phi_M_init=0.0, phi_M_init_type="constant", rho_sub={0: 0.0, 1: 0.0},
    )
    ion_list = [
        Ion(name=n, z=Z[n], D_sub=D_SUB[n],
            c_init_sub={s: mms.init_c[k][s] for s in (0, 1)},
            c_init_sub_type="expression", C_sub=C_SUB[n])
        for k, n in enumerate("abc")
    ]
    S = Solver(params, ion_list, mms=mms)
    S.setup_domain(mesh := mms_square(resolution))
    S.setup_parameters()
    S.setup_FEM_spaces()
    state = S.solve_system_passive(n_steps * dt, 0.0, sp)
    return S, state


@pytest.mark.slow
def test_iterative_matches_direct():
    direct = SolverParams(direct_emi=True, direct_knp=True)
    # NB: the MMS coupling C_phi = 1/dt = 1e10 amplifies EMI solve error into
    # the concentrations roughly one-to-one with the phi-jump error, so the
    # EMI rtol must be very tight here (production runs have C_phi ~ 200).
    iterative = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-13, atol_emi=0.0, rtol_knp=1e-12, atol_knp=0.0,
        max_it_emi=50000, max_it_knp=5000, gmres_restart=40,
    )
    S1, st1 = run(3, direct)
    S2, st2 = run(3, iterative)
    # concentrations must agree to solver tolerance
    assert np.allclose(np.asarray(st1["c"]), np.asarray(st2["c"]), atol=1e-8), \
        np.abs(np.asarray(st1["c"]) - np.asarray(st2["c"])).max()
    # potential agrees up to the nullspace constant
    p1, p2 = np.asarray(st1["phi"]), np.asarray(st2["phi"])
    diff = (p1 - p1.mean()) - (p2 - p2.mean())
    assert np.abs(diff).max() < 1e-4, np.abs(diff).max()
    # iteration counts were recorded (later steps may warm-start to 0 iters)
    assert S2.stats.emi_niters[0] > 0
    assert np.sum(S2.stats.knp_niters[0]) > 0
