"""Full checkpoint/resume round-trip (an improvement over the reference,
which only checkpoints output fields -- SURVEY.md section 5)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.config import SolverParams
from knpemidg_tpu.io.checkpoint import load_checkpoint, save_checkpoint


@pytest.mark.slow
def test_checkpoint_resume_exact(tmp_path):
    from run_2D import build_solver

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=1e-40)

    # reference run: 6 steps straight
    S = build_solver(resolution=0)
    state6 = S.solve_system_active(6 * S.params.dt, 0.0, sp)

    # checkpointed run: 3 steps, save, restore into a fresh solver, 3 more
    S1 = build_solver(resolution=0)
    state3 = S1.solve_system_active(3 * S1.params.dt, 0.0, sp)
    ckpt = str(tmp_path / "ckpt.h5")
    save_checkpoint(ckpt, state3)

    S2 = build_solver(resolution=0)
    restored = load_checkpoint(ckpt, S2)
    assert float(restored["t"]) == pytest.approx(3 * S2.params.dt)
    import jax

    step = S2._jit(("resume", True, sp), lambda s: S2._pde_step(s, sp))
    ode = S2._jit(("resume_ode",), lambda s: S2._ode_step(s, first_step=False))
    # the checkpoint carries the frozen preconditioner the straight run
    # attached at t=0 (state-dependent: Ritz harvest + coarse data from the
    # attach-time operator), so attach_pc is a no-op and the resumed Krylov
    # trajectories are IDENTICAL -- rebuilding the pc from the 3-step state
    # instead gives solver-tolerance-level spread (~1e-5 rel on phi_M)
    assert "pc" in restored
    state = S2.attach_pc(restored, sp)
    for _ in range(3):
        state = ode(state)
        state, _ = step(state)

    np.testing.assert_allclose(
        np.asarray(state["c"]), np.asarray(state6["c"]), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(state["phi_M"]), np.asarray(state6["phi_M"]),
        rtol=1e-8, atol=1e-12,
    )
