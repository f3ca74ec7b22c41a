"""Assembly + Krylov validation on single-physics problems.

Before the full KNP-EMI MMS gate, check the DG machinery on a scalar
reaction-diffusion problem  u - div(grad u) = f  with exact solution
u = cos(2 pi x) cos(2 pi y)  (compatible zero-Neumann data on the unit
square): L2 convergence must be ~O(h^2) for DG1.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from knpemidg_tpu.mesh.core import build_mesh
from knpemidg_tpu.mesh.generators import rectangle_mesh, mms_square
from knpemidg_tpu.fem.tabulation import build_geometry, build_membrane_tables
from knpemidg_tpu.fem.norms import l2_error
from knpemidg_tpu.ops import assembly
from knpemidg_tpu.ops.spmv import bell_matvec, block_jacobi_inverse, block_jacobi_apply
from knpemidg_tpu.solvers.krylov import pcg, gmres
from knpemidg_tpu.solvers.direct import bell_to_csr, solve_direct


def unit_square(n):
    v, c = rectangle_mesh((0, 0), (1, 1), n, n)
    return build_mesh(v, c, np.zeros(len(c), dtype=np.int32))


def make_masks(g, mem_tables):
    nf1 = g["f_stag"].shape[0]
    return {
        "f_sip": jnp.asarray(np.asarray(g["f_stag"]) == 0),
        "f_mem": jnp.asarray(np.asarray(mem_tables.mem_of_facet) < mem_tables.n_mem),
        "f_memidx": jnp.asarray(mem_tables.mem_of_facet, dtype=jnp.int32),
    }


def assemble_reaction_diffusion(mesh, f):
    """(1/dt) u + -Lap u with dt=1, via assemble_knp with phi=0 (no drift)."""
    geom = build_geometry(mesh)
    g = geom.to_device()
    tables = build_membrane_tables(mesh, [])
    masks = make_masks(g, tables)
    nc, nd = mesh.num_cells, mesh.dim + 1
    ion = {
        "z": 1.0,
        "D": jnp.ones(nc),
        "c_n": jnp.zeros((nd, nc)),
        "c_k": jnp.ones((nd, nc)),
    }
    phys = {"F": 1.0, "psi": 1.0, "C_M": 1.0, "dt": 1.0, "tau_knp": 20.0 * 2 * 1}
    blocks, rhs = assembly.assemble_knp(
        g, masks, ion, phys,
        phi=jnp.zeros((nd, nc)),
        alpha_sum=jnp.ones((nd, nc)),
        phi_M=jnp.zeros(1),
        I_ch_k=jnp.zeros(1),
        I_ch_tot=jnp.zeros(1),
        f_source=f,
        splitting=True,
    )
    return g, blocks, rhs


def exact(x):
    return np.cos(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])


def source(x, t):
    # device quadrature points are (nq, d, nc): components on axis -2
    return (1 + 8 * jnp.pi**2) * jnp.cos(2 * jnp.pi * x[..., 0, :]) * jnp.cos(
        2 * jnp.pi * x[..., 1, :]
    )


def test_reaction_diffusion_convergence_direct():
    errs, hs = [], []
    for n in (8, 16, 32):
        mesh = unit_square(n)
        g, blocks, rhs = assemble_reaction_diffusion(mesh, source)
        u = solve_direct(np.asarray(blocks), np.asarray(g["nbr"]), np.asarray(rhs))
        errs.append(l2_error(mesh, u.T, exact))
        hs.append(mesh.hmin())
    rates = np.log(np.array(errs[1:]) / np.array(errs[:-1])) / np.log(
        np.array(hs[1:]) / np.array(hs[:-1])
    )
    assert rates[-1] > 1.8, (errs, rates)


def test_matrix_symmetric_and_matvec_agrees():
    mesh = unit_square(8)
    g, blocks, rhs = assemble_reaction_diffusion(mesh, source)
    A = bell_to_csr(np.asarray(blocks), np.asarray(g["nbr"]))
    asym = abs(A - A.T).max()
    assert asym < 1e-12
    x = np.random.default_rng(0).standard_normal(rhs.shape)      # (nd, nc)
    y1 = bell_matvec(blocks, g["nbr"], jnp.asarray(x))
    y2 = (A @ x.T.ravel()).reshape(x.shape[::-1]).T
    assert np.allclose(np.asarray(y1), y2, atol=1e-12)


def test_krylov_solvers_match_direct():
    mesh = unit_square(16)
    g, blocks, rhs = assemble_reaction_diffusion(mesh, source)
    u_ref = solve_direct(np.asarray(blocks), np.asarray(g["nbr"]), np.asarray(rhs))
    Pinv = block_jacobi_inverse(blocks[0])
    mv = lambda v: bell_matvec(blocks, g["nbr"], v)
    pc = lambda r: block_jacobi_apply(Pinv, r)
    x0 = jnp.zeros_like(rhs)
    res = pcg(mv, rhs, x0, pc, rtol=1e-10, atol=0.0, max_it=5000)
    assert bool(res.converged), res.resnorm
    assert np.allclose(np.asarray(res.x), u_ref, atol=1e-6)
    # GMRES is exercised on a mass-dominated operator (the production KNP
    # regime, dt small): restarted GMRES without AMG is not competitive on
    # the pure-Laplacian limit, CG covers that case above.
    nd = rhs.shape[0]
    blocks2 = blocks.at[0].add(
        100.0 * jnp.eye(nd)[:, :, None] * jnp.asarray(g["vol"])[None, None, :]
    )
    u_ref2 = solve_direct(np.asarray(blocks2), np.asarray(g["nbr"]), np.asarray(rhs))
    Pinv2 = block_jacobi_inverse(blocks2[0])
    mv2 = lambda v: bell_matvec(blocks2, g["nbr"], v)
    pc2 = lambda r: block_jacobi_apply(Pinv2, r)
    res2 = gmres(mv2, rhs, x0, pc2, rtol=1e-10, atol=0.0, max_it=500, restart=20)
    assert bool(res2.converged), res2.resnorm
    assert np.allclose(np.asarray(res2.x), u_ref2, atol=1e-8)


def test_emi_operator_nullspace_and_symmetry():
    mesh = mms_square(4)
    geom = build_geometry(mesh)
    g = geom.to_device()
    tables = build_membrane_tables(mesh, [1, 2, 3, 4])
    masks = make_masks(g, tables)
    nc, nd = mesh.num_cells, 3
    rng = np.random.default_rng(1)
    c = jnp.asarray(1.0 + 0.1 * rng.random((3, nd, nc)))
    ions = {
        "z": jnp.asarray([1.0, -1.0, 1.0]),
        "D": jnp.asarray(np.stack([np.full(nc, 6.0), np.full(nc, 3.0), np.full(nc, 1.0)])),
        "c": c,
    }
    phys = {"F": 1.0, "psi": 1.0, "C_phi": 1e2, "tau_emi": 20.0 * 2, "Lp": 1.0}
    n_mem = tables.n_mem
    blocks, rhs, P = assembly.assemble_emi(
        g, masks, ions, phys,
        phi_M=jnp.zeros(n_mem + 1),
        I_ch_tot=jnp.zeros(n_mem + 1),
        splitting=True,
    )
    A = bell_to_csr(np.asarray(blocks), np.asarray(g["nbr"]))
    assert abs(A - A.T).max() < 1e-10
    # constants in the nullspace
    ones = np.ones(A.shape[0])
    assert np.abs(A @ ones).max() < 1e-10
    # matrix is PSD: smallest eigenvalue ~ 0
    import scipy.sparse.linalg as spla

    w = spla.eigsh(A, k=1, which="SA", return_eigenvectors=False, maxiter=5000)
    assert w[0] > -1e-8


def test_assemble_emi_membrane_axis_parity():
    """assemble_emi's membrane-axis Robin source (mem_t fast path) must
    match the legacy masked full-facet test integrals exactly."""
    mesh = mms_square(3)
    geom = build_geometry(mesh)
    g = assembly.precompute_static(geom.to_device())
    tables = build_membrane_tables(mesh, [1, 2, 3, 4])
    masks = make_masks(g, tables)
    nc, nd = mesh.num_cells, 3
    rng = np.random.default_rng(11)
    ions = {
        "z": jnp.asarray([1.0, -1.0, 1.0]),
        "D": jnp.asarray(1.0 + rng.random((3, nc))),
        "c": jnp.asarray(1.0 + 0.1 * rng.random((3, nd, nc))),
    }
    phys = {"F": 96.0, "psi": 0.04, "C_phi": 1e2, "tau_emi": 40.0,
            "Lp": 1.0}
    n_mem = tables.n_mem
    phi_M = jnp.asarray(np.r_[0.07 * rng.random(n_mem) - 0.08, 0.0])
    I_ch_tot = jnp.asarray(np.r_[rng.random(n_mem) - 0.5, 0.0])
    fidx = jnp.asarray(tables.fidx, dtype=jnp.int32)
    mem_t = {
        "fidx": fidx,
        "Rp": g["f_Rp"][:, :, fidx],
        "Rm": g["f_Rm"][:, :, fidx],
        "cp": g["f_cp"][fidx],
        "cm": g["f_cm"][fidx],
    }
    for splitting in (True, False):
        ref = assembly.assemble_emi(g, masks, ions, phys, phi_M=phi_M,
                                    I_ch_tot=I_ch_tot, splitting=splitting)
        fast = assembly.assemble_emi(g, masks, ions, phys, phi_M=phi_M,
                                     I_ch_tot=I_ch_tot, splitting=splitting,
                                     mem_t=mem_t)
        for a, b, name in zip(ref, fast, ("blocks", "rhs", "P")):
            scale = np.abs(np.asarray(a)).max()
            assert np.abs(np.asarray(a) - np.asarray(b)).max() \
                < 1e-10 * scale, (splitting, name)


def test_assemble_knp_all_matches_per_ion():
    """The shared-gather multi-ion assembly (assemble_knp_all) must produce
    exactly the stacked per-ion assemble_knp results (production fast path;
    VERDICT r2 item 8)."""
    mesh = mms_square(3)
    geom = build_geometry(mesh)
    g = assembly.precompute_static(geom.to_device())
    tables = build_membrane_tables(mesh, [1, 2, 3, 4])
    masks = make_masks(g, tables)
    nc, nd = mesh.num_cells, 3
    m = 2
    rng = np.random.default_rng(7)
    z = jnp.asarray([1.0, -1.0])
    D = jnp.asarray(1.0 + rng.random((m, nc)))
    c_k = jnp.asarray(1.0 + 0.2 * rng.random((m, nd, nc)))
    c_n = jnp.asarray(1.0 + 0.2 * rng.random((m, nd, nc)))
    phi = jnp.asarray(0.1 * rng.random((nd, nc)) - 0.05)
    alpha_sum = jnp.asarray(1.0 + rng.random((nd, nc)))
    n_mem = tables.n_mem
    phi_M = jnp.asarray(np.r_[0.07 * rng.random(n_mem) - 0.08, 0.0])
    I_ch = jnp.asarray(np.c_[rng.random((m, n_mem)) - 0.5, np.zeros(m)])
    I_ch_tot = I_ch.sum(axis=0)
    phys = {"F": 96.0, "psi": 0.04, "C_M": 0.02, "dt": 1e-4,
            "tau_knp": 40.0}

    for splitting in (True, False):
        statics = jnp.stack([
            assembly.assemble_knp_static(
                g, masks, {"z": float(z[k]), "D": D[k]}, phys)
            for k in range(m)
        ])
        bl_all, rhs_all = assembly.assemble_knp_all(
            g, masks, {"z": z, "D": D, "c_n": c_n, "c_k": c_k}, phys,
            phi, alpha_sum, phi_M, I_ch, I_ch_tot,
            splitting=splitting, static_blocks=statics,
        )
        per = [
            assembly.assemble_knp(
                g, masks,
                {"z": float(z[k]), "D": D[k], "c_n": c_n[k], "c_k": c_k[k]},
                phys, phi, alpha_sum,
                phi_M=phi_M, I_ch_k=I_ch[k], I_ch_tot=I_ch_tot,
                splitting=splitting, static_blocks=statics[k],
            )
            for k in range(m)
        ]
        bl_ref = np.stack([np.asarray(b) for b, _ in per])
        rhs_ref = np.stack([np.asarray(r) for _, r in per])
        bscale = np.abs(bl_ref).max()
        rscale = np.abs(rhs_ref).max()
        assert np.abs(np.asarray(bl_all) - bl_ref).max() < 1e-12 * bscale, \
            splitting
        assert np.abs(np.asarray(rhs_all) - rhs_ref).max() < 1e-12 * rscale, \
            splitting

        # membrane-axis fast path (mem_t): identical system up to f32
        # reassociation of the membrane rhs terms
        fidx = jnp.asarray(tables.fidx, dtype=jnp.int32)
        mem_t = {
            "fidx": fidx,
            "Rp": g["f_Rp"][:, :, fidx],
            "Rm": g["f_Rm"][:, :, fidx],
            "cp": g["f_cp"][fidx],
            "cm": g["f_cm"][fidx],
        }
        bl_mem, rhs_mem = assembly.assemble_knp_all(
            g, masks, {"z": z, "D": D, "c_n": c_n, "c_k": c_k}, phys,
            phi, alpha_sum, phi_M, I_ch, I_ch_tot,
            splitting=splitting, static_blocks=statics, mem_t=mem_t,
        )
        assert np.abs(np.asarray(bl_mem) - bl_ref).max() < 1e-12 * bscale, \
            splitting
        assert np.abs(np.asarray(rhs_mem) - rhs_ref).max() < 1e-10 * rscale, \
            splitting
