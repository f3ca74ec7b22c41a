"""Moment-deflation variants: host-f64 Galerkin and per-compartment order.

The host path (emi_moment_host) must be a pure pc enrichment -- converged
state matches the device path at solver tolerance in both operator layouts
-- and `emi_moment_order_ics` must add rows ONLY on ICS compartments
(nonzero subdomain tag).  The host path keeps W in numpy end-to-end (the
995k-tet order-3 device-residency OOM fix, ROADMAP r5 item 2).
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _monomials(d, order):
    """#monomials of exact total degree `order` in d vars (with repetition)."""
    from math import comb

    return comb(d + order - 1, order)


def test_moment_host_parity_and_ics_order():
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    sp_dev = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-8, rtol_knp=1e-8,
                          max_it_emi=300, max_it_knp=150, gmres_restart=10,
                          emi_ritz=0)
    sp_host = dataclasses.replace(sp_dev, emi_moment_host=True,
                                  emi_moment_order_ics=3)

    S0 = build_solver(resolution=0)
    out0, st0 = S0.fused_step(sp_dev)(S0.attach_pc(S0._initial_state(0.0),
                                                   sp_dev))
    assert bool(np.all(np.asarray(st0["emi_converged"])))

    # --- W row accounting: order-3 rows appear only on ICS compartments
    comp = S0._comp_np
    tags = np.asarray(S0.mesh.cell_tags)
    n_comp = int(comp.max()) + 1
    d = 2
    n_ics = sum(1 for p in range(n_comp)
                if (tags[comp[: tags.shape[0]] == p] != 0).any())
    W2 = np.asarray(S0._emi_moment_W(sp_dev))
    W3 = S0._emi_moment_W(sp_host, host=True)
    assert isinstance(W3, np.ndarray) and W3.dtype == np.float64
    per_comp_o2 = _monomials(d, 1) + _monomials(d, 2)
    assert W2.shape[0] == n_comp * per_comp_o2
    assert W3.shape[0] == W2.shape[0] + n_ics * _monomials(d, 3)
    assert n_ics >= 1                     # the 2D neuron has an ICS body

    # order-2 rows of ICS compartments match the flat-order fields exactly
    # (same centering/scaling); ECS rows are a subset of W2's rows
    # --- converged-state parity, both layouts
    for pair in (False, True):
        S1 = build_solver(resolution=0)
        if pair:
            S1.enable_pair_layout()
        state = S1.attach_pc(S1._initial_state(0.0), sp_host)
        assert "mom_W" in state["pc"]["emi"]
        out1, st1 = S1.fused_step(sp_host)(state)
        if pair:
            from knpemidg_tpu.parallel.sharding import unpad_state

            out1 = unpad_state(S1, out1)
        assert bool(np.all(np.asarray(st1["emi_converged"]))), pair
        assert bool(np.all(np.asarray(st1["knp_converged"]))), pair
        np.testing.assert_allclose(
            np.asarray(out0["c"]), np.asarray(out1["c"]),
            rtol=2e-5, atol=1e-9, err_msg=f"pair={pair}")


def _moment_blocks_setup(sizes, order=1, seed=0, agg=32):
    """Synthetic multi-compartment W + minimal two-level data for apply
    parity: random coords per compartment, moment fields via
    moment_vectors(return_comp=True), fabricated SPD coarse/Galerkin."""
    import jax.numpy as jnp

    from knpemidg_tpu.solvers.twolevel import moment_vectors

    rng = np.random.default_rng(seed)
    nc, nd = int(np.sum(sizes)), 4
    comp = np.repeat(np.arange(len(sizes)), sizes)
    coords = rng.uniform(-1.0, 1.0, (nc, nd, 3))
    coords[:, :, 0] += 3.0 * comp[:, None]          # separate the bodies
    W, row_comp = moment_vectors(coords, comp, order=order, host=True,
                                 return_comp=True)
    nw = W.shape[0]
    n_agg = -(-nc // agg)
    A = rng.standard_normal((n_agg, n_agg))
    base = {"inv": np.linalg.inv(A @ A.T + n_agg * np.eye(n_agg)),
            "s": rng.uniform(0.5, 2.0, n_agg)}
    B = rng.standard_normal((nw, nw))
    inv_m = np.linalg.inv(B @ B.T + nw * np.eye(nw))
    s_m = rng.uniform(0.5, 2.0, nw)
    Bp = rng.standard_normal((nd, nd, nc))
    Pd = np.einsum("ikc,jkc->ijc", Bp, Bp) + nd * np.eye(nd)[:, :, None]
    r = rng.standard_normal((nd, nc))
    return comp, W, row_comp, base, inv_m, s_m, Pd, r, agg


def test_block_moment_rows_roundtrip():
    """block_moment_rows is a pure re-layout: scattering the blocked rows
    back over their compartments' cell lists reconstructs W[perm]."""
    from knpemidg_tpu.solvers.twolevel import block_moment_rows

    comp, W, row_comp, *_ = _moment_blocks_setup([160, 64, 32])
    perm, Wd, blk = block_moment_rows(W, row_comp, comp)
    nw, nd, nc = W.shape
    assert sorted(perm.tolist()) == list(range(nw))
    R = np.zeros((nw, nd, nc))
    R[: Wd.shape[0]] = Wd
    for gi in range(blk["W"].shape[0]):
        for si in range(blk["W"].shape[1]):
            rw = int(blk["rowid"][gi, si])
            if rw == nw:
                assert np.all(blk["W"][gi, si] == 0.0)
                continue
            np.add.at(R[rw], (slice(None), blk["idx"][gi]),
                      blk["W"][gi, si])
    np.testing.assert_allclose(R, W[perm], rtol=0, atol=0)
    # the big compartment (160/256 > 25%) stays dense
    assert Wd.shape[0] == int(np.sum(row_comp == 0))


def test_blocked_moment_apply_parity():
    """two_level_apply_fn with momb_* (compartment-blocked moment rows)
    matches the dense mom_W apply bit-for-bit in f64 (numpy mirror) and to
    f32 reassociation tolerance on device, with and without dense rows."""
    import jax.numpy as jnp

    from knpemidg_tpu.solvers.twolevel import (block_moment_rows,
                                               np_two_level_apply,
                                               two_level_apply_fn)

    for sizes in ([160, 64, 32], [64, 64, 64, 64]):   # with/without dense
        comp, W, row_comp, base, inv_m, s_m, Pd, r, agg = \
            _moment_blocks_setup(sizes)
        perm, Wd, blk = _ = block_moment_rows(W, row_comp, comp)
        assert blk is not None
        data_d = dict(base, mom_W=W, mom_inv=inv_m, mom_s=s_m)
        data_b = dict(base, mom_inv=inv_m[perm][:, perm], mom_s=s_m[perm],
                      momb_W=blk["W"], momb_idx=blk["idx"],
                      momb_rowid=blk["rowid"])
        if Wd.shape[0]:
            data_b["mom_W"] = Wd
        else:
            assert sizes == [64, 64, 64, 64]
        # f64 numpy mirror: exact parity
        out_np_d = np_two_level_apply(data_d, Pd, agg)(r)
        out_np_b = np_two_level_apply(data_b, Pd, agg)(r)
        np.testing.assert_allclose(out_np_b, out_np_d, rtol=1e-12,
                                   atol=1e-12)
        # jitted f32 apply: reassociation tolerance
        f32 = lambda t: {
            k: (jnp.asarray(np.asarray(v))
                if np.issubdtype(np.asarray(v).dtype, np.integer)
                else jnp.asarray(np.asarray(v), jnp.float32))
            for k, v in t.items()}
        Pd32 = jnp.asarray(Pd, jnp.float32)
        r32 = jnp.asarray(r, jnp.float32)
        out_d = np.asarray(two_level_apply_fn(f32(data_d), Pd32, agg)(r32))
        out_b = np.asarray(two_level_apply_fn(f32(data_b), Pd32, agg)(r32))
        scale = np.abs(out_d).max()
        np.testing.assert_allclose(out_b, out_d, rtol=2e-5,
                                   atol=2e-5 * scale)
        np.testing.assert_allclose(out_np_d, out_d, rtol=2e-3,
                                   atol=2e-3 * scale)


def test_moment_blocked_end_to_end():
    """emi_moment_blocked: the pc carries momb_* fields (the 2D neuron ICS
    body is <25% of the cells), the step converges, and the state matches
    the dense host path at solver tolerance (same math, row permutation
    only)."""
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    sp_host = SolverParams(direct_emi=False, direct_knp=False,
                           rtol_emi=1e-8, rtol_knp=1e-8,
                           max_it_emi=300, max_it_knp=150, gmres_restart=10,
                           emi_ritz=0, emi_moment_host=True)
    sp_blk = dataclasses.replace(sp_host, emi_moment_blocked=True)

    S0 = build_solver(resolution=0)
    out0, st0 = S0.fused_step(sp_host)(S0.attach_pc(S0._initial_state(0.0),
                                                    sp_host))
    assert bool(np.all(np.asarray(st0["emi_converged"])))

    S1 = build_solver(resolution=0)
    state = S1.attach_pc(S1._initial_state(0.0), sp_blk)
    assert "momb_W" in state["pc"]["emi"]
    out1, st1 = S1.fused_step(sp_blk)(state)
    assert bool(np.all(np.asarray(st1["emi_converged"])))
    assert bool(np.all(np.asarray(st1["knp_converged"])))
    np.testing.assert_allclose(np.asarray(out0["c"]), np.asarray(out1["c"]),
                               rtol=2e-5, atol=1e-9)
