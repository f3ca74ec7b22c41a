"""Batched DG assembly kernels (XLA path).

Replaces the UFL->FFC JIT assembly of the reference (SURVEY.md N2).  The
weak forms are hand-derived from src/knpemidg/solver.py:

* EMI bilinear form  -- solver.py:325-328 (SIP), :346/:362 (membrane/MMS
  coupling), :393 (regularized B operator);
* EMI rhs            -- solver.py:309-310 (diffusive), :344 (Robin),
  :359-374 (MMS sources/flux-jump/Neumann);
* KNP bilinear form  -- solver.py:586-594 (SIP + upwinded drift);
* KNP rhs            -- solver.py:597-657 (time derivative, sources,
  membrane Robin + coupling, MMS variants).

The operator is materialized in a block-ELL layout: for each cell a diagonal
(nd x nd) block plus one block per neighboring cell, so the Krylov matvec is
gather + einsum only (no scatters) -- the TPU-friendly shape.  All functions
are pure jnp and jitted by the callers.

Conventions (mesh/core.py): interior facet "plus" side is the canonical
first cell (ECS / lower subdomain tag on membranes); the stored facet normal
points out of the plus cell and equals the reference's oriented interface
normal n_g (utils.py:61-85).  jump(f) = f_plus - f_minus (FEniCS),
JUMP(f) = f_minus - f_plus = f_ICS - f_ECS (solver.py:14).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def facet_trace(g, u, side: str):
    """Trace of DG1 field u (nc, nd) at facet quad points -> (nf+1, nq)."""
    R = g["f_Rp"] if side == "p" else g["f_Rm"]
    c = g["f_cp"] if side == "p" else g["f_cm"]
    return jnp.einsum("fqi,fi->fq", R, u[c])


def cell_grad(g, u):
    """Gradient of DG1 field (constant per cell) -> (nc, d)."""
    return jnp.einsum("cid,ci->cd", g["G"], u)


def facet_quad_int(g, vals):
    """Facet integral of per-quad values (nf+1, nq) -> (nf+1,)."""
    return g["f_area"] * jnp.einsum("q,fq->f", g["w_f"], vals)


def gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm):
    """Assemble block-ELL operator from per-facet blocks (all (nf+1,nd,nd)).

    Returns blocks (nc, d+2, nd, nd); slot 0 = diagonal. Row padding relies on
    the dummy facet (index nf) having zero area, hence zero blocks.
    """
    cf = g["cf_idx"]                     # (nc, d+1)
    isp = g["cf_is_plus"][..., None, None]
    diag_fac = jnp.where(isp, Mpp[cf], Mmm[cf])      # (nc, d+1, nd, nd)
    off = jnp.where(isp, Mpm[cf], Mmp[cf])
    diag = A_cell + diag_fac.sum(axis=1)
    return jnp.concatenate([diag[:, None], off], axis=1)


def gather_rhs(g, b_cell, b_p, b_m):
    """Assemble rhs (nc, nd) from cell part and per-facet side parts."""
    cf = g["cf_idx"]
    isp = g["cf_is_plus"][..., None]
    return b_cell + jnp.where(isp, b_p[cf], b_m[cf]).sum(axis=1)


def _sip_blocks(g, kp, km, gnp, gnm, tau_over_h, sip_mask, pen_p=None, pen_m=None):
    """Symmetric interior penalty blocks for  kappa grad(u).grad(v) coupling.

    kp/km   : (nf+1, nq) diffusion coefficient traces per side
    gnp/gnm : (nf+1, nd) = n . grad(basis) per side
    tau_over_h: (nf+1,) penalty scale tau/avg(h)
    pen_p/pen_m: (nf+1, nq) penalty coefficient per side; defaults to
                 avg-kappa penalty `avg(k) jump(u) jump(v)` (EMI form,
                 solver.py:328). KNP uses jump(D u) (solver.py:590):
                 pen_p = Dp, pen_m = Dm with weight 1 (pass halves yourself).
    Returns Mpp, Mpm, Mmp, Mmm masked by sip_mask.
    """
    w = g["w_f"]                          # (nq,)
    area = g["f_area"]
    Rp, Rm = g["f_Rp"], g["f_Rm"]         # (nf+1, nq, nd)

    # -<avg(k grad u).n, [v]> : outer([v]_q, F_q) summed with weights
    # F on plus dofs = 0.5*kp_q*gnp, on minus = 0.5*km_q*gnm
    def term1(Jv_p_sign, R_v, k_u, gn_u):
        # sum_q w_q R_v[q,i] * 0.5*k_u[q]*gn_u[j]
        s = jnp.einsum("q,fqi,fq->fi", w, R_v, k_u)
        return Jv_p_sign * (-0.5) * area[:, None, None] * s[:, :, None] * gn_u[:, None, :]

    t1_pp = term1(+1.0, Rp, kp, gnp)
    t1_pm = term1(+1.0, Rp, km, gnm)
    t1_mp = term1(-1.0, Rm, kp, gnp)
    t1_mm = term1(-1.0, Rm, km, gnm)

    # symmetric term: -<avg(k grad v).n, [u]> = transpose with sides swapped
    t2_pp = jnp.swapaxes(t1_pp, 1, 2)
    t2_pm = jnp.swapaxes(t1_mp, 1, 2)
    t2_mp = jnp.swapaxes(t1_pm, 1, 2)
    t2_mm = jnp.swapaxes(t1_mm, 1, 2)

    # penalty: + tau/h <pen-jump(u), [v]>
    if pen_p is None:
        pen_p = 0.5 * (kp + km)
        pen_m = pen_p
    scale = (tau_over_h * area)[:, None, None]

    def pen(R_v, sv, R_u, su, coef):
        return scale * jnp.einsum("q,fq,fqi,fqj->fij", w, coef, R_v, R_u) * (sv * su)

    t3_pp = pen(Rp, +1, Rp, +1, pen_p)
    t3_pm = pen(Rp, +1, Rm, -1, pen_m)
    t3_mp = pen(Rm, -1, Rp, +1, pen_p)
    t3_mm = pen(Rm, -1, Rm, -1, pen_m)

    m = sip_mask[:, None, None]
    return (
        jnp.where(m, t1_pp + t2_pp + t3_pp, 0.0),
        jnp.where(m, t1_pm + t2_pm + t3_pm, 0.0),
        jnp.where(m, t1_mp + t2_mp + t3_mp, 0.0),
        jnp.where(m, t1_mm + t2_mm + t3_mm, 0.0),
    )


def _jump_jump_blocks(g, coef, mask):
    """coef * <[u],[v]> blocks on masked facets; coef (nf+1,) or (nf+1,nq)."""
    w = g["w_f"]
    Rp, Rm = g["f_Rp"], g["f_Rm"]
    if coef.ndim == 1:
        coef = coef[:, None] * jnp.ones_like(g["f_Rp"][..., 0])
    scale = g["f_area"][:, None, None]

    def blk(R_v, sv, R_u, su):
        return scale * jnp.einsum("q,fq,fqi,fqj->fij", w, coef, R_v, R_u) * (sv * su)

    m = mask[:, None, None]
    return (
        jnp.where(m, blk(Rp, 1, Rp, 1), 0.0),
        jnp.where(m, blk(Rp, 1, Rm, -1), 0.0),
        jnp.where(m, blk(Rm, -1, Rp, 1), 0.0),
        jnp.where(m, blk(Rm, -1, Rm, -1), 0.0),
    )


def _test_integrals(g, vals_p, vals_m):
    """rhs side contributions: int_f vals_side * v_side.

    vals_* (nf+1, nq) -> b_p, b_m (nf+1, nd).  The *caller* encodes signs.
    """
    w = g["w_f"]
    b_p = g["f_area"][:, None] * jnp.einsum("q,fq,fqi->fi", w, vals_p, g["f_Rp"])
    b_m = g["f_area"][:, None] * jnp.einsum("q,fq,fqi->fi", w, vals_m, g["f_Rm"])
    return b_p, b_m


# ---------------------------------------------------------------------------
# EMI system (potential)
# ---------------------------------------------------------------------------

def assemble_emi(
    g: Dict[str, Any],
    masks: Dict[str, Any],
    ions: Dict[str, Any],        # z (n_ions,), D (n_ions, nc), c (n_ions, nc, nd)
    phys: Dict[str, Any],        # F, psi, C_phi, tau_emi, Lp
    phi_M: Optional[jnp.ndarray] = None,     # (n_mem+1,) padded
    I_ch_tot: Optional[jnp.ndarray] = None,  # (n_mem+1,) padded
    splitting: bool = True,
    mms=None,
    t=None,
):
    """Build EMI block-ELL operator, rhs, and block-Jacobi preconditioner
    diagonal (from the regularized B operator, solver.py:376-401).

    Returns (blocks, rhs, P_diag_blocks).
    """
    z, D, c = ions["z"], ions["D"], ions["c"]
    F, psi, C_phi, tau = phys["F"], phys["psi"], phys["C_phi"], phys["tau_emi"]
    nd = g["G"].shape[1]

    # kappa = F * psi * sum_k z_k^2 D_k c_k   (DG1 field; solver.py:306)
    kappa = F * psi * jnp.einsum("k,kc,kci->ci", z * z, D, c)

    # --- cell term: int kappa grad(u).grad(v) ------------------------------
    kq = jnp.einsum("qi,ci->cq", g["Phi_c"], kappa)          # (nc, nq_c)
    kbar = jnp.einsum("q,cq->c", g["w_c"], kq)
    GG = jnp.einsum("cid,cjd->cij", g["G"], g["G"])
    A_cell = (g["vol"] * kbar)[:, None, None] * GG

    # --- facet traces of kappa ---------------------------------------------
    kp = facet_trace(g, kappa, "p")
    km = facet_trace(g, kappa, "m")
    gnp = jnp.einsum("fd,fid->fi", g["f_n"], g["G"][g["f_cp"]])
    gnm = jnp.einsum("fd,fid->fi", g["f_n"], g["G"][g["f_cm"]])

    sip = masks["f_sip"]
    mem = masks["f_mem"]
    Mpp, Mpm, Mmp, Mmm = _sip_blocks(g, kp, km, gnp, gnm, tau / g["f_havg"], sip)

    # --- membrane coupling: + C_phi <[u],[v]> on membrane facets ------------
    cphi = jnp.full_like(g["f_area"], C_phi)
    Cpp, Cpm, Cmp, Cmm = _jump_jump_blocks(g, cphi, mem)
    Mpp, Mpm, Mmp, Mmm = Mpp + Cpp, Mpm + Cpm, Mmp + Cmp, Mmm + Cmm

    blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)

    # --- rhs: diffusive terms, all ions -------------------------------------
    # volume: -F z int D grad(c).grad(v);  facet: +F z <avg(D grad c).n, [v]>
    gradc = jnp.einsum("cid,kci->kcd", g["G"], c)            # (n_ions, nc, d)
    flux = jnp.einsum("k,kc,kcd->cd", z, D, gradc)           # sum_k z D grad c
    b_cell = -F * g["vol"][:, None] * jnp.einsum("cd,cid->ci", flux, g["G"])

    fp = jnp.einsum("fd,fd->f", flux[g["f_cp"]], g["f_n"])
    fm = jnp.einsum("fd,fd->f", flux[g["f_cm"]], g["f_n"])
    favg = 0.5 * F * (fp + fm) * sip
    ones = jnp.ones_like(g["f_Rp"][..., 0])
    b_p, b_m = _test_integrals(g, favg[:, None] * ones, -favg[:, None] * ones)

    if mms is None:
        # Robin data: splitting -> phi_M; passive -> phi_M - I_ch/C_phi
        # (solver.py:332-344). Term: + C_phi g <JUMP(v)> = +g C_phi (v_i - v_e)
        gr = phi_M if splitting else phi_M - I_ch_tot / C_phi
        gf = gr[masks["f_memidx"]] * mem                       # (nf+1,)
        bg_p, bg_m = _test_integrals(
            g, -C_phi * gf[:, None] * ones, C_phi * gf[:, None] * ones
        )
        b_p, b_m = b_p + bg_p, b_m + bg_m
    else:
        xq = g["f_qp"]                                         # (nf+1, nq, d)
        stag = g["f_stag"]
        gphi = jnp.zeros_like(xq[..., 0])
        gJ = jnp.zeros_like(gphi)
        for wall in mms.wall_tags:
            wmask = (stag == wall)[:, None]
            gphi = gphi + wmask * mms.g_phi[wall](xq, t)
            gJ = gJ + wmask * mms.g_J_phi[wall](xq, t)
        bg_p, bg_m = _test_integrals(g, -C_phi * gphi, C_phi * gphi)
        # flux-jump defect on plus side (solver.py:369)
        bj_p, _ = _test_integrals(g, gJ, jnp.zeros_like(gJ))
        b_p = b_p + (bg_p + bj_p) * mem[:, None]
        b_m = b_m + bg_m * mem[:, None]

    rhs = gather_rhs(g, b_cell, b_p, b_m)

    if mms is not None:
        # volume sources f_phi per subdomain (solver.py:365-366)
        xq = g["cell_qp"]
        tagc = g["cell_tag"][:, None]
        fsrc = jnp.where(tagc == 1, mms.f_phi[1](xq, t), mms.f_phi[0](xq, t))
        rhs = rhs + g["vol"][:, None] * jnp.einsum(
            "q,cq,qi->ci", g["w_c"], fsrc, g["Phi_c"]
        )
        # exterior Neumann: -F z (J_k . n) v on ds (solver.py:372-374)
        xe = g["e_qp"]
        bdry = jnp.zeros_like(xe[..., 0])
        for k in range(len(mms.neumann)):
            Jk = mms.neumann[k](xe, t)                         # (ne, nq, d)
            bdry = bdry + z[k] * jnp.einsum("fqd,fd->fq", Jk, g["e_n"])
        be = -F * g["e_area"][:, None] * jnp.einsum(
            "q,fq,fqi->fi", g["w_f"], bdry, g["e_R"]
        )
        rhs = rhs.at[g["e_c"]].add(be)

    # --- preconditioner: diag blocks of B = A + kappa/Lp^2 mass --------------
    M0 = jnp.einsum("q,qi,qj->ij", g["w_c"], g["Phi_c"], g["Phi_c"])
    P_diag = blocks[:, 0] + (g["vol"] * kbar / phys["Lp"] ** 2)[:, None, None] * M0

    return blocks, rhs, P_diag


# ---------------------------------------------------------------------------
# KNP system (one ion; callers vmap/stack over ions)
# ---------------------------------------------------------------------------

def assemble_knp_static(g, masks, ion, phys):
    """Time-independent part of the KNP operator for one ion: mass/dt +
    stiffness + SIP + penalty (D is a static P0 field).  Computed once at
    setup; per-step assembly only adds the phi-dependent drift/upwind."""
    z, D = ion["z"], ion["D"]
    dt, tau = phys["dt"], phys["tau_knp"]
    GG = jnp.einsum("cid,cjd->cij", g["G"], g["G"])
    M0 = jnp.einsum("q,qi,qj->ij", g["w_c"], g["Phi_c"], g["Phi_c"])
    A_cell = (
        (g["vol"] / dt)[:, None, None] * M0
        + (g["vol"] * D)[:, None, None] * GG
    )
    sip = masks["f_sip"]
    Dp = D[g["f_cp"]][:, None] * jnp.ones_like(g["f_Rp"][..., 0])
    Dm = D[g["f_cm"]][:, None] * jnp.ones_like(g["f_Rp"][..., 0])
    gnp = jnp.einsum("fd,fid->fi", g["f_n"], g["G"][g["f_cp"]])
    gnm = jnp.einsum("fd,fid->fi", g["f_n"], g["G"][g["f_cm"]])
    # penalty uses jump(D u) (solver.py:590): coefficient D per side
    Mpp, Mpm, Mmp, Mmm = _sip_blocks(
        g, Dp, Dm, gnp, gnm, tau / g["f_havg"], sip, pen_p=Dp, pen_m=Dm
    )
    return gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)


def assemble_knp(
    g: Dict[str, Any],
    masks: Dict[str, Any],
    ion: Dict[str, Any],        # z (), D (nc,), c_n (nc, nd), c_k (nc, nd), idx
    phys: Dict[str, Any],       # F, psi, C_M, dt, tau_knp
    phi: jnp.ndarray,           # (nc, nd) potential from EMI step
    alpha_sum: jnp.ndarray,     # (nc, nd) sum_k D z^2 c_k (nodal, all ions)
    phi_M: Optional[jnp.ndarray] = None,     # (n_mem+1,)
    I_ch_k: Optional[jnp.ndarray] = None,    # (n_mem+1,) this ion's channel current
    I_ch_tot: Optional[jnp.ndarray] = None,  # (n_mem+1,)
    f_source=None,              # callable(x, t) or None (ECS source, dx(0))
    splitting: bool = True,
    mms=None,
    mms_ion: Optional[int] = None,
    t=None,
    static_blocks: Optional[jnp.ndarray] = None,
):
    """Build the KNP block-ELL operator + rhs for one solved ion.

    Returns (blocks, rhs).  The reference assembles a mixed space with
    block-diagonal coupling (each ion only couples to itself through frozen
    phi / c_prev), so we solve the ions as independent scalar systems.
    """
    z, D = ion["z"], ion["D"]
    F, psi, C_M, dt, tau = phys["F"], phys["psi"], phys["C_M"], phys["dt"], phys["tau_knp"]

    M0 = jnp.einsum("q,qi,qj->ij", g["w_c"], g["Phi_c"], g["Phi_c"])
    phibar = jnp.einsum("q,qj->j", g["w_c"], g["Phi_c"])       # int of basis / vol

    if static_blocks is None:
        static_blocks = assemble_knp_static(g, masks, ion, phys)

    # --- phi-dependent cell drift: z psi D u grad(phi).grad(v) ---------------
    sip = masks["f_sip"]
    mem = masks["f_mem"]
    gphi = cell_grad(g, phi)                                    # (nc, d)
    drift = jnp.einsum("cid,cd->ci", g["G"], gphi)              # grad(phi).grad(v_i)
    A_cell = (
        z * psi * (g["vol"] * D)[:, None, None]
        * drift[:, :, None] * phibar[None, None, :]
    )

    # --- upwinded drift on tag-0 facets (solver.py:583-594) ---------------------
    # un_side = max(D_side grad(phi)_side . n_side, 0), n_minus = -n_plus
    un_p = jnp.maximum(D[g["f_cp"]] * jnp.einsum("fd,fd->f", gphi[g["f_cp"]], g["f_n"]), 0.0)
    un_m = jnp.maximum(-D[g["f_cm"]] * jnp.einsum("fd,fd->f", gphi[g["f_cm"]], g["f_n"]), 0.0)
    w = g["w_f"]
    scale = (-z * psi) * g["f_area"] * sip                       # (nf+1,)

    def up_blk(R_v, sv, R_u, un, su):
        return (scale * un * sv * su)[:, None, None] * jnp.einsum(
            "q,fqi,fqj->fij", w, R_v, R_u
        )

    # -z psi <[v], un_p u_p - un_m u_m>
    Mpp = up_blk(g["f_Rp"], +1, g["f_Rp"], un_p, +1)
    Mpm = up_blk(g["f_Rp"], +1, g["f_Rm"], un_m, -1)
    Mmp = up_blk(g["f_Rm"], -1, g["f_Rp"], un_p, +1)
    Mmm = up_blk(g["f_Rm"], -1, g["f_Rm"], un_m, -1)

    blocks = static_blocks + gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)

    # --- rhs ---------------------------------------------------------------------
    c_n = ion["c_n"]
    b_cell = (g["vol"] / dt)[:, None] * jnp.einsum("ij,cj->ci", M0, c_n)

    if f_source is not None:
        fq = f_source(g["cell_qp"], t)                           # (nc, nq_c)
        ecs = (g["cell_tag"] == 0)[:, None]
        b_cell = b_cell + g["vol"][:, None] * jnp.einsum(
            "q,cq,qi->ci", g["w_c"], fq * ecs, g["Phi_c"]
        )

    b_p = jnp.zeros_like(g["f_Rp"][..., 0, :])
    b_m = jnp.zeros_like(b_p)

    if mms is None:
        # alpha = D z^2 c_k / alpha_sum (nodal DG1 per cell, solver.py:603)
        alpha = D[:, None] * z * z * ion["c_k"] / alpha_sum
        a_p = facet_trace(g, alpha, "p")                          # (nf+1, nq)
        a_m = facet_trace(g, alpha, "m")
        C_p = a_p * C_M / (F * z * dt)
        C_m = a_m * C_M / (F * z * dt)
        phiM_f = (phi_M[masks["f_memidx"]] * mem)[:, None]
        Ik_f = (I_ch_k[masks["f_memidx"]] * mem)[:, None]
        Itot_f = (I_ch_tot[masks["f_memidx"]] * mem)[:, None]

        # JUMP(C g_robin v): expanded C*g = C phi_M - I_ch_k/(Fz) (+ alpha I_ch/(Fz))
        # (solver.py:614-625); plus side = ECS is subtracted.
        s_extra = (a_p * Itot_f / (F * z)) if splitting else 0.0
        s_extra_m = (a_m * Itot_f / (F * z)) if splitting else 0.0
        s_e = C_p * phiM_f - Ik_f / (F * z) + s_extra
        s_i = C_m * phiM_f - Ik_f / (F * z) + s_extra_m
        bg_p, bg_m = _test_integrals(g, -s_e * mem[:, None], s_i * mem[:, None])

        # coupling: -[phi][C] avg(v) - [phi] avg(C) [v] (solver.py:628-629)
        jphi = facet_trace(g, phi, "p") - facet_trace(g, phi, "m")
        jC = C_p - C_m
        aC = 0.5 * (C_p + C_m)
        val_p = (-jphi * jC * 0.5 - jphi * aC) * mem[:, None]
        val_m = (-jphi * jC * 0.5 + jphi * aC) * mem[:, None]
        bc_p, bc_m = _test_integrals(g, val_p, val_m)
        b_p = bg_p + bc_p
        b_m = bg_m + bc_m
    else:
        k = mms_ion
        xq = g["f_qp"]
        stag = g["f_stag"]
        C_i = ion["C_sub_i"]     # scalar: coupling coeff ICS (C_sub[1])
        C_e = ion["C_sub_e"]     # scalar: ECS (C_sub[0])
        g1 = jnp.zeros_like(xq[..., 0])
        g2 = jnp.zeros_like(g1)
        for wall in mms.wall_tags:
            wmask = (stag == wall)[:, None]
            g1 = g1 + wmask * mms.g_robin_1[k][wall](xq, t)
            g2 = g2 + wmask * mms.g_robin_2[k][wall](xq, t)
        # robin: + C_1 g_1 v_i - C_2 g_2 v_e (solver.py:653-654)
        br_p, br_m = _test_integrals(g, -C_e * g2 * mem[:, None], C_i * g1 * mem[:, None])
        # coupling with piecewise-constant C (solver.py:649-650)
        jphi = facet_trace(g, phi, "p") - facet_trace(g, phi, "m")
        jC = C_e - C_i           # [C] = C_plus - C_minus
        aC = 0.5 * (C_e + C_i)
        val_p = (-jphi * jC * 0.5 - jphi * aC) * mem[:, None]
        val_m = (-jphi * jC * 0.5 + jphi * aC) * mem[:, None]
        bc_p, bc_m = _test_integrals(g, val_p, val_m)
        b_p = br_p + bc_p
        b_m = br_m + bc_m

    rhs = gather_rhs(g, b_cell, b_p, b_m)

    if mms is not None:
        k = mms_ion
        xq = g["cell_qp"]
        tagc = g["cell_tag"][:, None]
        fsrc = jnp.where(tagc == 1, mms.f_c[k][1](xq, t), mms.f_c[k][0](xq, t))
        rhs = rhs + g["vol"][:, None] * jnp.einsum(
            "q,cq,qi->ci", g["w_c"], fsrc, g["Phi_c"]
        )
        # exterior Neumann: -(J_k . n) v (solver.py:657)
        xe = g["e_qp"]
        Jk = mms.neumann[k](xe, t)
        bdry = jnp.einsum("fqd,fd->fq", Jk, g["e_n"])
        be = -g["e_area"][:, None] * jnp.einsum("q,fq,fqi->fi", g["w_f"], bdry, g["e_R"])
        rhs = rhs.at[g["e_c"]].add(be)

    return blocks, rhs


# ---------------------------------------------------------------------------
# projections / updates (replace utils.pcws_constant_project & friends)
# ---------------------------------------------------------------------------

def membrane_avg(g, mem_fidx, u, side: str):
    """Facet average of DG1 trace on membrane facets -> (n_mem,).

    Equivalent to pcws_constant_project(plus/minus(u, n_g), Q)
    (utils.py:87-124): the DLT0 diagonal-mass projection is exactly the
    facet mean."""
    vals = facet_trace(g, u, side)[mem_fidx]         # (n_mem, nq)
    return jnp.einsum("q,mq->m", g["w_f"], vals)


def membrane_avg_expr(g, mem_fidx, vals_q):
    """Facet average of per-quad values already restricted to membranes."""
    return jnp.einsum("q,mq->m", g["w_f"], vals_q)


def nernst_potential(g, mem_fidx, c, z, F, R, T):
    """E = RT/(zF) * facet-avg ln(c_plus / c_minus)  (solver.py:299-300)."""
    cp = facet_trace(g, c, "p")[mem_fidx]
    cm = facet_trace(g, c, "m")[mem_fidx]
    vals = jnp.log(cp / cm)
    return R * T / (F * z) * jnp.einsum("q,mq->m", g["w_f"], vals)


def jump_phi_M(g, mem_fidx, phi):
    """phi_M = facet-avg JUMP(phi) = phi_i - phi_e (solver.py:813-814)."""
    return jnp.einsum(
        "q,mq->m",
        g["w_f"],
        (facet_trace(g, phi, "m") - facet_trace(g, phi, "p"))[mem_fidx],
    )


def eliminated_concentration(c, z, rho, z_elim):
    """c_N = -(1/z_N)(sum_k z_k c_k + rho); exact nodal arithmetic since all
    fields are DG1 (the reference's global L2 projection, solver.py:831-838,
    is the identity here)."""
    acc = jnp.einsum("k,kci->ci", z, c)
    return -(acc + rho[:, None]) / z_elim
