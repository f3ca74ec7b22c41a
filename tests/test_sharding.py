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


@pytest.mark.slow
def test_sharded_driver_multistep_refresh_h5(tmp_path):
    """5-step sharded run THROUGH the production driver
    (solve_system_active), including a frozen-preconditioner refresh and
    H5 field output under sharding -- VERDICT r2 item 3b.  Must match the
    unsharded driver run at solver tolerance."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import device_mesh, shard_solver, unpad_state
    from knpemidg_tpu.io.checkpoint import H5Reader

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=500, max_it_knp=100, gmres_restart=10,
                      pc_refresh_every=2)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_2D import build_solver

    n_steps = 5
    S_ref = build_solver(resolution=0)
    out_ref = S_ref.solve_system_active(n_steps * S_ref.params.dt, 0.0, sp)

    S_sh = build_solver(resolution=0)
    shard_solver(S_sh, device_mesh(4))
    fname = str(tmp_path) + "/"
    out_sh = S_sh.solve_system_active(n_steps * S_sh.params.dt, 0.0, sp,
                                      filename=fname, save_fields=True)
    out_sh = unpad_state(S_sh, out_sh)

    np.testing.assert_allclose(
        np.asarray(out_ref["c"]), np.asarray(out_sh["c"]), rtol=5e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["phi_M"]), np.asarray(out_sh["phi_M"]),
        rtol=1e-4, atol=1e-7,
    )
    # iteration counts recorded for every step; H5 has initial + 5 frames
    assert len(S_sh.stats.emi_niters) == n_steps
    r = H5Reader(fname + "results.h5")
    assert r.n_frames == n_steps + 1
    # stored fields are unpadded, original numbering
    c_last = r.frame(n_steps)["c"]
    assert c_last.shape[1] == S_ref.n_cells
    np.testing.assert_allclose(
        c_last, np.asarray(out_sh["c"]).transpose(0, 2, 1), rtol=1e-6)


@pytest.mark.nightly
def test_sharded_emix_mesh_one_step():
    """The REAL 121,617-tet EMIx mesh sharded 8-way on virtual devices:
    one full active step vs the single-device result (VERDICT r2 item 3a,
    promoted from tools/scaling_study.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import (device_mesh, shard_solver,
                                                unpad_state)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh

    if not os.path.exists(DEFAULT_MESH):
        pytest.skip("EMIx mesh asset not present")
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-6, atol_emi=1e-40,
                      rtol_knp=1e-8, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=30,
                      agg_size=64)

    S_ref = build_solver(mesh=load_emix_mesh(DEFAULT_MESH))
    state_ref = S_ref.attach_pc(S_ref._initial_state(0.0), sp)
    out_ref, st_ref = S_ref.fused_step(sp)(state_ref)

    S_sh = build_solver(mesh=load_emix_mesh(DEFAULT_MESH))
    shard_solver(S_sh, device_mesh(8))
    state_sh = S_sh.attach_pc(S_sh._maybe_shard(S_sh._initial_state(0.0)), sp)
    out_sh, st_sh = S_sh.fused_step(sp)(state_sh)
    out_sh = unpad_state(S_sh, out_sh)

    assert bool(np.all(np.asarray(st_sh["emi_converged"])))
    assert bool(np.all(np.asarray(st_sh["knp_converged"])))

    # Per-field gate (VERDICT r3 item 6): one blanket rtol could hide a
    # genuine sharding bug in a single field behind the loosest field's
    # reduction-order spread.  All spreads are computed BEFORE any assert
    # so a failure still reports every field.  Bounds are ~3x the measured
    # max relative deviation (8 virtual devices, ritz16 defaults,
    # 2026-08-17: c_K 1.6e-4, c_Na/c_elim/phi_M <=3e-5, phi 9.7e-5 -- the
    # K spread is the largest because [K] has the smallest extracellular
    # magnitude, 3.32 mM, so reduction-order noise is relatively largest);
    # every bound still sits orders below any physics scale (mM / mV).
    def rel_spread(a, b, atol):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b) - atol
        return float(np.max(np.maximum(d, 0.0) / np.maximum(np.abs(b), 1e-300)))

    # phi: EMI potential, defined up to the projected-out constant; compare
    # mean-shifted (same convention as the MMS gates)
    phi_r = np.asarray(out_ref["phi"], np.float64)
    phi_s = np.asarray(out_sh["phi"], np.float64)
    phi_r -= phi_r.mean()
    phi_s -= phi_s.mean()

    ion_names = [i.name for i in S_ref.ion_list[:-1]]
    fields = {}                       # name -> (sharded, ref, rtol, atol)
    for j, name in enumerate(ion_names):          # each solved ion separately
        fields[f"c_{name}"] = (out_sh["c"][j], out_ref["c"][j], 5e-4, 1e-7)
    fields["c_elim"] = (out_sh["c_elim"], out_ref["c_elim"], 1e-4, 1e-7)
    fields["phi"] = (phi_s, phi_r, 3e-4, 1e-8)
    fields["phi_M"] = (out_sh["phi_M"], out_ref["phi_M"], 1e-4, 2e-6)

    spreads = {k: rel_spread(a, b, atol)
               for k, (a, b, _, atol) in fields.items()}
    print("sharded-EMIx per-field max rel spreads:",
          {k: f"{v:.2e}" for k, v in spreads.items()})
    for name, (a, b, rtol, atol) in fields.items():
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol, err_msg=name)


def _build_mixed(degree_emi=1, degree_knp=2):
    """Active-HH 2D solver with degree_emi != degree_knp (the mixed-space
    setup of tests/test_mms_space.test_mixed_degrees_active_membrane)."""
    from knpemidg_tpu.config import Ion, PhysicalParams, StimParams
    from knpemidg_tpu.mesh.generators import box_2d_neuron
    from knpemidg_tpu.models.hh import HodgkinHuxleySI
    from knpemidg_tpu.solver import StandardSolver

    params = PhysicalParams(
        dt=1.0e-4, n_steps_ODE=25, C_M=0.02, temperature=300.0,
        F=96485.0, R=8.314,
        phi_M_init=-0.07438609374462003, phi_M_init_type="constant",
        rho_sub={0: 0.0, 1: 0.0},
    )
    Na_i, Na_e = 12.838513108648856, 100.71925900027354
    K_i, K_e = 124.15397583491901, 3.3236967382705265
    ions = [
        Ion(name="K", z=1.0, D_sub={0: 1.96e-9, 1: 1.96e-9},
            c_init_sub={0: K_e, 1: K_i}),
        Ion(name="Cl", z=-1.0, D_sub={0: 2.03e-9, 1: 2.03e-9},
            c_init_sub={0: Na_e + K_e, 1: Na_i + K_i}),
        Ion(name="Na", z=1.0, D_sub={0: 1.33e-9, 1: 1.33e-9},
            c_init_sub={0: Na_e, 1: Na_i}),
    ]
    stim = StimParams(stimulus={"stim_amplitude": 10.0},
                      stimulus_locator=lambda x: x[0] < 20e-6)
    S = StandardSolver(params, ions, degree_emi=degree_emi,
                       degree_knp=degree_knp)
    S.setup_domain(box_2d_neuron(0))
    S.setup_parameters()
    S.setup_FEM_spaces()
    S.setup_membrane_model(stim, {1: HodgkinHuxleySI(stimulus=True)})
    return S


def test_shard_solver_mixed_degrees():
    """degree_emi=1 / degree_knp=2 under 4-way sharding must match the
    single-device step (VERDICT r3 item 9: shard_solver used to raise on
    mixed degrees; now both geometry dicts are permuted/padded/placed)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import (device_mesh, shard_solver,
                                                unpad_state)

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=300, max_it_knp=150, gmres_restart=10)

    S_ref = _build_mixed()
    out_ref, _ = S_ref.fused_step(sp)(S_ref._initial_state(0.0))

    S_sh = _build_mixed()
    shard_state = shard_solver(S_sh, device_mesh(4))
    out_sh, st_sh = S_sh.fused_step(sp)(shard_state(S_sh._initial_state(0.0)))
    out_sh = unpad_state(S_sh, out_sh)

    assert bool(np.all(np.asarray(st_sh["emi_converged"])))
    assert bool(np.all(np.asarray(st_sh["knp_converged"])))
    assert np.asarray(out_sh["c"]).shape[1] == 6      # knp space stays P2
    np.testing.assert_allclose(
        np.asarray(out_ref["c"]), np.asarray(out_sh["c"]), rtol=5e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["phi_M"]), np.asarray(out_sh["phi_M"]),
        rtol=1e-4, atol=1e-7,
    )


def test_shard_solver_pair_consistency():
    """Sharded PAIR-layout step (per-shard matching + interleave + pair
    halo exchange) matches the unsharded cell-layout step to solver
    tolerance."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import (device_mesh, shard_solver,
                                                unpad_state)

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=400, max_it_knp=200, gmres_restart=20)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from run_2D import build_solver

    S_ref = build_solver(resolution=0)
    out_ref, _ = S_ref.fused_step(sp)(S_ref._initial_state(0.0))

    S_sh = build_solver(resolution=0)
    mesh = device_mesh(4)
    shard_state = shard_solver(S_sh, mesh, pair=True)
    assert S_sh.pair_layout and "live0" in S_sh.pairs
    state_sh = S_sh.attach_pc(shard_state(S_sh._initial_state(0.0)), sp)
    # pair pc data shaped over the padded pair axis
    npair_t = int(S_sh.pairs["int_f"].shape[0])
    assert npair_t % 4 == 0
    out_sh, stats = S_sh.fused_step(sp)(state_sh)
    assert bool(np.all(np.asarray(stats["emi_converged"])))
    assert bool(np.all(np.asarray(stats["knp_converged"])))
    out_sh = unpad_state(S_sh, out_sh)

    np.testing.assert_allclose(
        np.asarray(out_ref["c"]), np.asarray(out_sh["c"]), rtol=5e-5,
        atol=1e-8
    )
    phi0 = np.asarray(out_ref["phi"], np.float64)
    phi1 = np.asarray(out_sh["phi"], np.float64)
    np.testing.assert_allclose(phi0 - phi0.mean(), phi1 - phi1.mean(),
                               rtol=0, atol=5e-5 * np.abs(phi0).max())
    np.testing.assert_allclose(np.asarray(out_ref["phi_M"]),
                               np.asarray(out_sh["phi_M"]),
                               rtol=1e-4, atol=1e-8)
