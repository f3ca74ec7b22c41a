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
