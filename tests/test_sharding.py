"""Multi-device sharding: the fused active step must compile and run with
cell-axis NamedSharding over virtual CPU devices (the driver's
dryrun_multichip contract)."""
import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
@pytest.mark.parametrize("n", [4, 8])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_shard_solver_consistency():
    """Sharded and unsharded steps produce the same state."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import __graft_entry__ as ge
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import (device_mesh, shard_solver,
                                                unpad_state)

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=200, max_it_knp=100, gmres_restart=10)

    # small 2D problem built twice
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_2D import build_solver

    S_ref = build_solver(resolution=0)
    state_ref = S_ref._initial_state(0.0)
    step_ref = S_ref.fused_step(sp)
    out_ref, _ = step_ref(state_ref)

    S_sh = build_solver(resolution=0)
    mesh = device_mesh(4)
    shard_state = shard_solver(S_sh, mesh)       # pads + installs halo mv
    state_sh = shard_state(S_sh._initial_state(0.0))
    step_sh = S_sh.fused_step(sp)
    out_sh, _ = step_sh(state_sh)
    out_sh = unpad_state(S_sh, out_sh)

    # rtol: the shard renumbering changes reduction order and the padded
    # rhs slightly re-anchors the relative tolerances, so agreement is at
    # solver-tolerance level, not bitwise
    np.testing.assert_allclose(
        np.asarray(out_ref["c"]), np.asarray(out_sh["c"]), rtol=5e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["phi_M"]), np.asarray(out_sh["phi_M"]),
        rtol=1e-4, atol=1e-7,
    )
