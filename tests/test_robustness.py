"""Round-2 robustness fixes: fail-loud non-convergence (reference
ksp_error_if_not_converged, solver.py:428), exact-Tstop blocked loops,
numeric f_source integration, cache invalidation on re-setup, and honest
per-phase solver stats."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams


def _solver(**kw):
    from run_2D import build_solver

    return build_solver(resolution=0, **kw)


def test_nonconvergence_raises():
    """A deliberately under-iterated EMI solve must raise, not proceed with
    a bad solution."""
    S = _solver()
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-12, atol_emi=0.0, max_it_emi=2,
                      rtol_knp=1e-6, atol_knp=1e-40)
    with pytest.raises(RuntimeError, match="EMI.*did not converge"):
        S.solve_system_active(S.params.dt, 0.0, sp)


def test_nonconvergence_opt_out():
    """error_if_not_converged=False preserves the old proceed-anyway
    behavior (for experimentation)."""
    S = _solver()
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-12, atol_emi=0.0, max_it_emi=2,
                      rtol_knp=1e-6, atol_knp=1e-40,
                      error_if_not_converged=False)
    state = S.solve_system_active(S.params.dt, 0.0, sp)
    assert np.isfinite(np.asarray(state["phi_M"])).all()


def test_scan_blocks_exact_tstop():
    """Tstop not a multiple of scan_steps: the blocked loop must stop at
    exactly Tstop (ADVICE r1: ceil-overshoot)."""
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)
    S = _solver()
    n_steps = 5                      # 5 % 3 != 0
    state = S.solve_system_active(n_steps * S.params.dt, 0.0, sp,
                                  scan_steps=3)
    assert float(state["t"]) == pytest.approx(n_steps * S.params.dt)
    assert len(S.stats.emi_niters) == n_steps


def test_numeric_f_source_integrated():
    """A nonzero float f_source must enter the KNP rhs (config.py documents
    float sources; the reference integrates constants over dx(0))."""
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)
    S0 = _solver()
    s0 = S0.solve_system_active(2 * S0.params.dt, 0.0, sp)

    S1 = _solver()
    rate = 1.0e-2                     # mol/(m^3 s) into the ECS
    S1.ion_list[0].f_source = rate
    s1 = S1.solve_system_active(2 * S1.params.dt, 0.0, sp)

    ecs = np.asarray(S1.mesh.cell_tags) == 0
    dK = (np.asarray(s1["c"][0])[:, ecs] - np.asarray(s0["c"][0])[:, ecs]).mean()
    expect = rate * 2 * S1.params.dt
    assert dK == pytest.approx(expect, rel=0.2), (dK, expect)


def test_setup_invalidates_caches():
    """Re-running setup_domain/setup_parameters must not reuse traces or
    static blocks from the old mesh (ADVICE r1)."""
    from knpemidg_tpu.mesh.generators import box_2d_neuron

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)
    S = _solver()
    S.solve_system_active(S.params.dt, 0.0, sp)
    assert S._jit_cache
    # re-setup on a finer mesh: caches cleared, solve still works
    S.setup_domain(box_2d_neuron(1))
    assert not S._jit_cache and not hasattr(S, "_knp_static_blocks")
    S.setup_parameters()
    S.setup_FEM_spaces()
    S.setup_membrane_model(S.stim_params, {1: S.mem_models[1].model})
    state = S.solve_system_active(S.params.dt, 0.0, sp)
    assert np.isfinite(np.asarray(state["phi_M"])).all()


def test_phased_stats_files(tmp_path):
    """save_solver_stats runs the phase-split step: separate, non-duplicated
    EMI/KNP assembly+solve times per step in the reference file protocol."""
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)
    S = _solver()
    base = str(tmp_path) + os.sep
    S.solve_system_active(2 * S.params.dt, 0.0, sp, filename=base,
                          save_solver_stats=True)
    rec = S.stats.phase_records
    assert len(rec) == 2
    for ph in rec:
        assert set(ph) == {"emi_assem", "emi_solve", "knp_assem", "knp_solve"}
        assert all(v > 0 for v in ph.values())
    sol = open(os.path.join(base, "solver", "emi_solve_0.txt")).read()
    asmf = open(os.path.join(base, "solver", "knp_assem_0.txt")).read()
    assert sol.count("solve_time:") == 2
    assert asmf.count("assembly_time:") == 2
    # phase walls are real measurements, not one duplicated number
    emi = [ph["emi_solve"] for ph in rec]
    knp = [ph["knp_solve"] for ph in rec]
    assert emi != knp


def test_pc_refresh_path():
    """pc_refresh_every rebuilds the frozen preconditioner mid-run (both
    loop modes) and the run still converges."""
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40,
                      pc_refresh_every=2)
    S = _solver()
    state = S.solve_system_active(4 * S.params.dt, 0.0, sp)
    assert np.isfinite(np.asarray(state["c"])).all()
    S2 = _solver()
    state2 = S2.solve_system_active(4 * S2.params.dt, 0.0, sp, scan_steps=2)
    np.testing.assert_allclose(np.asarray(state["c"]), np.asarray(state2["c"]),
                               rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_emi_ritz_option_runs():
    """Experimental emi_ritz deflation: must produce the same physics (it
    only changes the preconditioner) and never poison the tolerance
    tests (finite guard in _build_pc)."""
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "examples"))
    from run_2D import build_solver
    import numpy as np

    S0 = build_solver(resolution=0)
    sp0 = SolverParams(direct_emi=False, direct_knp=False,
                       rtol_emi=1e-8, rtol_knp=1e-8)
    st0 = S0.solve_system_active(4 * S0.params.dt, 0.0, sp0)

    S1 = build_solver(resolution=0)
    sp1 = SolverParams(direct_emi=False, direct_knp=False,
                       rtol_emi=1e-8, rtol_knp=1e-8, emi_ritz=4)
    st1 = S1.solve_system_active(4 * S1.params.dt, 0.0, sp1)
    assert all(n > 0 for n in S1.stats.emi_niters)   # not NaN-silenced
    np.testing.assert_allclose(np.asarray(st0["phi_M"]),
                               np.asarray(st1["phi_M"]),
                               rtol=1e-5, atol=1e-8)
