"""Pair-block operator layout (ops/pairs.py): structural invariants and
exact parity against the cell block-ELL emitter/matvec.

The pair layout is a pure re-blocking of the same operator -- every test
here asserts EXACT (f64) agreement, not tolerance agreement (the
end-to-end solver test allows solver-tolerance differences: the pair
block-Jacobi smoother is genuinely stronger, so iteration PATHS differ)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from knpemidg_tpu.mesh.core import build_mesh
from knpemidg_tpu.mesh.generators import mms_square, box_3d_axons
from knpemidg_tpu.fem.tabulation import build_geometry
from knpemidg_tpu.ops import pairs as P
from knpemidg_tpu.ops.assembly import gather_blocks
from knpemidg_tpu.ops.spmv import bell_matvec
from knpemidg_tpu.parallel.sharding import unpad_state


def _setups():
    out = []
    m2 = mms_square(8)
    out.append(("2d", m2, build_geometry(m2)))
    m3 = box_3d_axons(0)
    out.append(("3d", m3, build_geometry(m3)))
    return out


SETUPS = _setups()


def _rand_blocks(geom, rng, m=None):
    nd = geom.nd
    nf1 = geom.f_cp.shape[0]
    nc = geom.vol.shape[0]
    shape_f = (nd, nd, nf1) if m is None else (m, nd, nd, nf1)
    shape_c = (nd, nd, nc) if m is None else (m, nd, nd, nc)
    Ms = []
    for _ in range(4):
        M = rng.standard_normal(shape_f)
        M[..., -1] = 0.0                    # dummy facet row must be zero
        Ms.append(jnp.asarray(M))
    A_cell = jnp.asarray(rng.standard_normal(shape_c))
    return A_cell, Ms


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_pair_map_invariants(name, mesh, geom):
    pm = P.build_pair_maps(geom)
    nc = geom.vol.shape[0]
    nf = geom.f_cp.shape[0] - 1
    npair = pm["cop"].shape[1]
    c0, c1 = pm["cop"]

    # pid/pos are a bijection onto live pair halves
    assert np.array_equal(pm["cop"][pm["pos"], pm["pid"]], np.arange(nc))
    # matched pairs share a compartment tag
    tags = np.asarray(geom.cell_tag)
    live = pm["live1"]
    assert np.array_equal(tags[c0[live]], tags[c1[live]])
    # matched pairs are face-adjacent via their internal facet
    f_cp, f_cm = np.asarray(geom.f_cp), np.asarray(geom.f_cm)
    ia, ib = f_cp[pm["int_f"][live]], f_cm[pm["int_f"][live]]
    assert np.array_equal(np.sort(np.stack([ia, ib]), axis=0),
                          np.sort(np.stack([c0[live], c1[live]]), axis=0))
    assert np.all(pm["int_f"][~live] == nf)
    # every interior facet's two cell-sides are accounted for exactly once:
    # internal facets cover both sides, external slots cover one each
    n_int = int(live.sum())
    n_ext = int((pm["ext_f"] != nf).sum())
    assert 2 * n_int + n_ext == 2 * nf
    # a healthy matching rate (Morton-greedy: >90% on these meshes)
    assert live.mean() > 0.75, f"match rate {live.mean():.2f}"
    # ext gather columns are in range and dummies point at the own pair
    assert pm["ext_col"].max() < 2 * npair
    dummy = pm["ext_f"] == nf
    assert np.array_equal(pm["ext_col"][dummy] % npair,
                          np.broadcast_to(np.arange(npair), dummy.shape)[dummy])


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_conversion_roundtrip(name, mesh, geom):
    pm = P.pair_maps_to_device(P.build_pair_maps(geom))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((geom.nd, geom.vol.shape[0])))
    xp = P.to_pair(pm, x)
    assert xp.shape == (2 * geom.nd, pm["int_f"].shape[0])
    np.testing.assert_array_equal(np.asarray(P.from_pair(pm, xp)),
                                  np.asarray(x))
    # dead halves are zero
    dead = ~np.asarray(pm["live1"])
    assert np.all(np.asarray(xp)[geom.nd:, dead] == 0.0)


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_pair_matvec_parity(name, mesh, geom):
    pmh = P.build_pair_maps(geom)
    pm = P.pair_maps_to_device(pmh)
    rng = np.random.default_rng(1)
    A_cell, (Mpp, Mmm, Mpm, Mmp) = _rand_blocks(geom, rng)
    g = geom.to_device()

    blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)
    x = jnp.asarray(rng.standard_normal((geom.nd, geom.vol.shape[0])))
    y_ref = bell_matvec(blocks, g["nbr"], x)

    pd, pe = P.gather_blocks_pair(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm)
    yp = P.pair_matvec(pd, pe, pm, P.to_pair(pm, x))
    y = P.from_pair(pm, yp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-12)
    # dead halves of the OUTPUT stay dead-identity * 0 = 0
    dead = ~np.asarray(pm["live1"])
    assert np.allclose(np.asarray(yp)[geom.nd:, dead], 0.0)


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_pair_matvec_multi_and_fan_parity(name, mesh, geom):
    pmh = P.build_pair_maps(geom)
    pm = P.pair_maps_to_device(pmh)
    rng = np.random.default_rng(2)
    m = 3
    A_cell, (Mpp, Mmm, Mpm, Mmp) = _rand_blocks(geom, rng, m=m)
    g = geom.to_device()

    pd, pe = P.gather_blocks_pair_multi(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm)
    X = jnp.asarray(rng.standard_normal((m, geom.nd, geom.vol.shape[0])))
    Xp = P.to_pair(pm, X)
    Yp = P.pair_matvec_multi(pd, pe, pm, Xp)
    for k in range(m):
        blocks_k = gather_blocks(g, A_cell[k], Mpp[k], Mpm[k], Mmp[k],
                                 Mmm[k])
        y_ref = bell_matvec(blocks_k, g["nbr"], X[k])
        np.testing.assert_allclose(np.asarray(P.from_pair(pm, Yp[k])),
                                   np.asarray(y_ref), rtol=1e-12, atol=1e-12)
        # fan: one operator (k=0) applied to all vectors
        pd0, pe0 = P.gather_blocks_pair(g, pm, A_cell[0], Mpp[0], Mpm[0],
                                        Mmp[0], Mmm[0])
        Yf = P.pair_matvec_fan(pd0, pe0, pm, Xp)
        blocks_0 = gather_blocks(g, A_cell[0], Mpp[0], Mpm[0], Mmp[0], Mmm[0])
        np.testing.assert_allclose(
            np.asarray(P.from_pair(pm, Yf[k])),
            np.asarray(bell_matvec(blocks_0, g["nbr"], X[k])),
            rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_block_diag_embed_and_vsums(name, mesh, geom):
    pmh = P.build_pair_maps(geom)
    pm = P.pair_maps_to_device(pmh)
    rng = np.random.default_rng(3)
    nd, nc = geom.nd, geom.vol.shape[0]
    D = jnp.asarray(rng.standard_normal((nd, nd, nc)))
    pdD = P.pair_block_diag_embed(pm, D)
    x = jnp.asarray(rng.standard_normal((nd, nc)))
    y = P.from_pair(pm, jnp.einsum("ijp,jp->ip", pdD, P.to_pair(pm, x)))
    y_ref = jnp.einsum("ijc,jc->ic", D, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-12)

    # value sums match the cell operator's total (dead identity excluded)
    A_cell, (Mpp, Mmm, Mpm, Mmp) = _rand_blocks(geom, rng)
    g = geom.to_device()
    pd, pe = P.gather_blocks_pair(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm,
                                  dead_identity=0.0)
    blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)
    v_pair = P.pair_v_sums(pd, pe)
    np.testing.assert_allclose(float(v_pair.sum()),
                               float(blocks.sum()), rtol=1e-10)
    nb = P.pair_nbr(pm)
    assert nb.shape == (1 + pm["ext_f"].shape[0], pm["int_f"].shape[0])


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_cell_bell_to_pair_matches_pair_emitter(name, mesh, geom):
    """The one-time cell-ELL converter (for the cached static KNP operator)
    must produce the exact arrays the direct pair emitter produces."""
    pm = P.pair_maps_to_device(P.build_pair_maps(geom))
    rng = np.random.default_rng(4)
    A_cell, (Mpp, Mmm, Mpm, Mmp) = _rand_blocks(geom, rng)
    g = geom.to_device()
    blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)
    pd_ref, pe_ref = P.gather_blocks_pair(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm,
                                          dead_identity=0.5)
    pd, pe = P.cell_bell_to_pair(pm, blocks, dead_identity=0.5)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(pd_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(pe_ref),
                               rtol=1e-12, atol=1e-12)
    # batched leading axis broadcast
    pdm, pem = P.cell_bell_to_pair(pm, jnp.stack([blocks, 2.0 * blocks]),
                                   dead_identity=0.5)
    np.testing.assert_allclose(np.asarray(pdm[1] - pd) ,
                               np.asarray(pd) - np.asarray(
                                   P.pair_block_diag_embed(
                                       pm, jnp.zeros_like(A_cell),
                                       dead_identity=0.5)),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("name,mesh,geom", SETUPS, ids=[s[0] for s in SETUPS])
def test_interleave_maps(name, mesh, geom):
    """Interleaved maps (cells renumbered to (pair, half) order): the
    reshape conversions and the matvec must agree exactly with the
    gather-map layout on the permuted operator."""
    pm0 = P.build_pair_maps(geom)
    nc = geom.vol.shape[0]
    npair = pm0["cop"].shape[1]
    pmi, perm = P.interleave_pair_maps(pm0, nc)
    # perm is a bijection of the padded slot range; even slots are live
    assert np.array_equal(np.sort(perm), np.arange(2 * npair))
    assert np.all(perm[0::2] < nc)
    assert np.array_equal(perm[1::2] >= nc, ~pm0["live1"])
    assert "cell_col" not in pmi

    pmd = P.pair_maps_to_device(pmi)
    rng = np.random.default_rng(5)
    nd = geom.nd
    x_old = rng.standard_normal((nd, nc))
    x_new = np.zeros((nd, 2 * npair))
    x_new[:, perm < nc] = x_old[:, perm[perm < nc]]
    xp = P.to_pair(pmd, jnp.asarray(x_new))
    # half h of pair p is slot 2p+h; dead halves zeroed
    ref0 = P.to_pair(P.pair_maps_to_device(pm0), jnp.asarray(x_old))
    np.testing.assert_allclose(np.asarray(xp), np.asarray(ref0),
                               rtol=0, atol=0)
    # roundtrip through the reshapes
    back = np.asarray(P.from_pair(pmd, xp))
    np.testing.assert_array_equal(back[:, perm < nc], x_old[:, perm[perm < nc]])

    # matvec parity: permuted random operator, dead halves inert
    A_cell, (Mpp, Mmm, Mpm, Mmp) = _rand_blocks(geom, rng)
    g = geom.to_device()
    blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)
    y_ref = bell_matvec(blocks, g["nbr"], jnp.asarray(x_old))
    # pad + permute the per-cell factor the pair emitter reads
    A_pad = np.zeros((nd, nd, 2 * npair))
    A_pad[:, :, perm < nc] = np.asarray(A_cell)[:, :, perm[perm < nc]]
    gi = dict(g)
    pd, pe = P.gather_blocks_pair(gi, pmd, jnp.asarray(A_pad),
                                  Mpp, Mpm, Mmp, Mmm)
    yp = P.pair_matvec(pd, pe, pmd, xp)
    y = np.asarray(P.from_pair(pmd, yp))
    np.testing.assert_allclose(y[:, perm < nc],
                               np.asarray(y_ref)[:, perm[perm < nc]],
                               rtol=1e-12, atol=1e-12)


def test_pair_layout_full_step_parity_2d():
    """One fused active step on the 2D app with and without the pair
    layout: same physics to solver tolerance, preconditioner data in pair
    shapes, converged."""
    from knpemidg_tpu.config import SolverParams
    from run_2D import build_solver

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=400, max_it_knp=200, gmres_restart=20)

    S0 = build_solver(resolution=0)
    st0 = S0.attach_pc(S0._initial_state(0.0), sp)
    out0, stats0 = S0.fused_step(sp)(st0)

    S1 = build_solver(resolution=0).enable_pair_layout()
    st1 = S1.attach_pc(S1._initial_state(0.0), sp)
    # pc data must be pair-shaped: mom_W over (2nd, npair)
    npair = int(S1.pairs["int_f"].shape[0])
    assert st1["pc"]["emi"]["mom_W"].shape[-2:] == (2 * S1.nd, npair)
    out1, stats1 = S1.fused_step(sp)(st1)
    out1 = unpad_state(S1, out1)      # interleaved: padded + permuted cells

    assert bool(np.all(np.asarray(stats1["emi_converged"])))
    assert bool(np.all(np.asarray(stats1["knp_converged"])))
    np.testing.assert_allclose(np.asarray(out0["c"]), np.asarray(out1["c"]),
                               rtol=5e-6, atol=1e-9)
    phi0 = np.asarray(out0["phi"], np.float64)
    phi1 = np.asarray(out1["phi"], np.float64)
    np.testing.assert_allclose(phi0 - phi0.mean(), phi1 - phi1.mean(),
                               rtol=0, atol=5e-6 * np.abs(phi0).max())
    np.testing.assert_allclose(np.asarray(out0["phi_M"]),
                               np.asarray(out1["phi_M"]),
                               rtol=1e-5, atol=1e-8)


def test_pair_layout_driver_io(tmp_path):
    """The production driver (solve_system_active + H5 output) under the
    interleaved pair layout: output fields come back in the ORIGINAL cell
    numbering (unpad_state through _io_step) and match the cell-layout run
    to solver tolerance."""
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.io.checkpoint import H5Reader
    from run_2D import build_solver

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=400, max_it_knp=200, gmres_restart=20)

    S0 = build_solver(resolution=0)
    st0 = S0.solve_system_active(2 * S0.params.dt, 0.0, sp)

    S1 = build_solver(resolution=0).enable_pair_layout()
    f1 = str(tmp_path / "pair")
    st1 = S1.solve_system_active(2 * S1.params.dt, 0.0, sp,
                                 filename=f1, save_fields=True)
    r = H5Reader(f1 + "results.h5")
    fr = r.frame(r.n_frames - 1)
    r.close()
    nc = S0.n_cells
    assert fr["phi"].shape[0] == nc          # original numbering, unpadded
    np.testing.assert_allclose(fr["c"].transpose(0, 2, 1),
                               np.asarray(st0["c"]), rtol=2e-5, atol=1e-8)


def test_pair_layout_multistep_3d_with_ritz():
    """3D axon bundle, 3 fused steps with the production deflation stack
    (moments + Ritz) under the pair layout vs the cell layout."""
    import dataclasses

    import __graft_entry__ as ge
    from knpemidg_tpu.config import SolverParams

    # tight tolerances so the two layouts' different iteration paths (the
    # pair BJ smoother is stronger) cannot masquerade as layout bugs: at
    # rtol_emi 1e-6 the 3-step trajectory spread through the HH gating
    # feedback reaches ~6e-5 relative dc; at 1e-9 it collapses
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-9, rtol_knp=1e-10,
                      max_it_emi=600, max_it_knp=300, gmres_restart=20,
                      agg_size=32, emi_ritz=8)

    outs = {}
    for pair in (False, True):
        S = ge._build_3d_solver()
        S.params = dataclasses.replace(S.params, n_steps_ODE=5)
        if pair:
            S.enable_pair_layout()
        state = S.attach_pc(S._initial_state(0.0), sp)
        step = S.fused_step(sp)
        for _ in range(3):
            state, stats = step(state)
        assert bool(np.all(np.asarray(stats["emi_converged"]))), pair
        assert bool(np.all(np.asarray(stats["knp_converged"]))), pair
        outs[pair] = unpad_state(S, state) if pair else state

    np.testing.assert_allclose(np.asarray(outs[False]["c"]),
                               np.asarray(outs[True]["c"]),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(outs[False]["phi_M"]),
                               np.asarray(outs[True]["phi_M"]),
                               rtol=1e-4, atol=1e-7)
