"""Batched DG assembly kernels (XLA path), cells-last layout.

Replaces the UFL->FFC JIT assembly of the reference (SURVEY.md N2).  The
weak forms are hand-derived from src/knpemidg/solver.py:

* EMI bilinear form  -- solver.py:325-328 (SIP), :346/:362 (membrane/MMS
  coupling), :393 (regularized B operator);
* EMI rhs            -- solver.py:309-310 (diffusive), :344 (Robin),
  :359-374 (MMS sources/flux-jump/Neumann);
* KNP bilinear form  -- solver.py:586-594 (SIP + upwinded drift);
* KNP rhs            -- solver.py:597-657 (time derivative, sources,
  membrane Robin + coupling, MMS variants).

LAYOUT: every hot tensor keeps the long (cell / facet) axis LAST so the TPU
lane dimension (128) maps onto it -- (nc, 4, 4) blocks would pad 32x under
the (8,128) tiling.  Shapes:

    dof fields        u      (nd, nc)
    gradients         G      (nd, d, nc)
    facet traces      f_R*   (nq, nd, nf)
    block operator    B      (K, nd, nd, nc), K = d+2, slot 0 = diagonal
    neighbor table    nbr    (K, nc)

The operator is block-ELL: the Krylov matvec is gather + small einsum only
(no scatters).  MMS data callables receive quadrature points shaped
(..., d, n) (components on axis -2).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _wsum_outer(w, coef, R_v, R_u):
    """sum_q w[q] * coef[q, f] * R_v[q, i, f] * R_u[q, j, f] -> (nd, nd, nf)
    with EVERY intermediate facet-last.

    The einsum formulation ("q,qf,qif,qjf->ijf") lowers to a dot_general
    contracting q whose operands XLA copies into (q, nf, nd) layouts: the
    trailing nd=4 axis pads to 128 lanes under TPU tiling (42.7x memory
    expansion), which OOMs the compile at ~2M facets (ROADMAP round-4
    item 9; 3.76 GB per operand copy on the 995k-tet bundle).  Unrolling
    the small static quadrature axis keeps everything (nd, nd, nf) /
    (nd, nf) -- same flops, ~1x padding."""
    acc = None
    for q in range(R_v.shape[0]):
        c = w[q] if coef is None else (w[q] * coef[q])[None, None, :]
        t = c * (R_v[q][:, None, :] * R_u[q][None, :, :])
        acc = t if acc is None else acc + t
    return acc


def _wsum_vec(w, coef, R_v):
    """sum_q w[q] * coef[q, f] * R_v[q, i, f] -> (nd, nf), facet-last
    (see _wsum_outer for why not einsum)."""
    acc = None
    for q in range(R_v.shape[0]):
        t = (w[q] * coef[q])[None, :] * R_v[q]
        acc = t if acc is None else acc + t
    return acc


def precompute_static(g):
    """Extend the geometry dict with mesh-static assembly tensors so the
    per-step assemblies are coefficient broadcasts instead of re-contracted
    einsums:

      GG   (nd, nd, nc)  grad(phi_i).grad(phi_j) per cell
      gnp/gnm (nd, nf+1) n . grad(basis) per facet side
      E_pp/E_pm/E_mp/E_mm (nd, nd, nf+1) = sum_q w_q R_v[q,i] R_u[q,j]
          (the facet mass tensors behind the upwind / jump-jump blocks)
      M0 (nd, nd), phibar (nd,) reference-cell mass factors
    """
    g = dict(g)
    if _degree(g) == 1:
        g["GG"] = jnp.einsum("idc,jdc->ijc", g["G"], g["G"])
        g["gnp"] = jnp.einsum("df,idf->if", g["f_n"], g["G"][:, :, g["f_cp"]])
        g["gnm"] = jnp.einsum("df,idf->if", g["f_n"], g["G"][:, :, g["f_cm"]])
    else:
        # per-quad-point physical gradients (nq, nd, d, nc) and the
        # quadrature-exact stiffness tensor for constant-per-cell coefficients
        Gq = _Gq(g)
        g["GG2"] = jnp.einsum("q,qadc,qbdc->abc", g["w_c"], Gq, Gq)
        g["gnp"] = g["f_gnp"]                # (nq, nd, nf+1), tabulated
        g["gnm"] = g["f_gnm"]
    w, Rp, Rm = g["w_f"], g["f_Rp"], g["f_Rm"]
    g["E_pp"] = _wsum_outer(w, None, Rp, Rp)
    g["E_pm"] = _wsum_outer(w, None, Rp, Rm)
    g["E_mp"] = _wsum_outer(w, None, Rm, Rp)
    g["E_mm"] = _wsum_outer(w, None, Rm, Rm)
    g["M0"] = jnp.einsum("q,qi,qj->ij", g["w_c"], g["Phi_c"], g["Phi_c"])
    g["phibar"] = jnp.einsum("q,qj->j", g["w_c"], g["Phi_c"])
    return g


def _degree(g) -> int:
    return int(g.get("degree", 1))


def _Gq(g):
    """Per-quad-point physical basis gradients (nq, nd, d, nc): the
    degree->=2 generalization of the constant-per-cell g['G'] (fem/basis)."""
    return jnp.einsum("qai,idc->qadc", g["A_c"], g["G"])


def _GG(g):
    return g["GG"] if "GG" in g else jnp.einsum("idc,jdc->ijc", g["G"], g["G"])


def _gn(g, side):
    """n.grad(basis) per facet side: (nd, nf+1) for degree 1 (constant on
    the facet), (nq, nd, nf+1) for degree >= 2."""
    key = "gnp" if side == "p" else "gnm"
    if key in g:
        return g[key]
    if _degree(g) > 1:
        return g["f_gnp" if side == "p" else "f_gnm"]
    c = g["f_cp"] if side == "p" else g["f_cm"]
    return jnp.einsum("df,idf->if", g["f_n"], g["G"][:, :, c])


def _M0(g):
    if "M0" in g:
        return g["M0"]
    return jnp.einsum("q,qi,qj->ij", g["w_c"], g["Phi_c"], g["Phi_c"])


def _E(g, vu):
    key = f"E_{vu}"
    if key in g:
        return g[key]
    w = g["w_f"]
    Rv = g["f_Rp"] if vu[0] == "p" else g["f_Rm"]
    Ru = g["f_Rp"] if vu[1] == "p" else g["f_Rm"]
    return _wsum_outer(w, None, Rv, Ru)


def facet_trace(g, u, side: str):
    """Trace of DG1 field u (nd, nc) at facet quad points -> (nq, nf+1)."""
    R = g["f_Rp"] if side == "p" else g["f_Rm"]           # (nq, nd, nf)
    c = g["f_cp"] if side == "p" else g["f_cm"]
    return jnp.einsum("qif,if->qf", R, u[:, c])


def cell_grad(g, u):
    """Gradient of DG1 field (constant per cell) -> (d, nc)."""
    return jnp.einsum("idc,ic->dc", g["G"], u)


def gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm):
    """Assemble block-ELL operator from per-facet blocks ((nd,nd,nf+1)).

    Returns blocks (K, nd, nd, nc); slot 0 = diagonal.  Row padding relies
    on the dummy facet (index nf) having zero area, hence zero blocks.

    One STACKED 2-D gather per cell-facet slot: TPU gather cost is
    per-index, so fetching all four facet tensors' columns in one
    (4*nd*nd, nf)-operand gather costs ~the same as one of the four
    rank-3 gathers the naive formulation issues (and rank-3 operands with
    two leading axes take a slow high-rank path besides)."""
    cf = g["cf_idx"]                     # (d+1, nc)
    isp = g["cf_is_plus"]                # (d+1, nc)
    nd = A_cell.shape[0]
    nf1 = Mpp.shape[-1]
    M = jnp.stack([Mpp, Mmm, Mpm, Mmp]).reshape(4 * nd * nd, nf1)
    diag = A_cell
    offs = []
    for l in range(cf.shape[0]):
        sel = isp[l][None, None, :]
        got = M.at[:, cf[l]].get(mode="promise_in_bounds")
        got = got.reshape(4, nd, nd, -1)
        diag = diag + jnp.where(sel, got[0], got[1])
        offs.append(jnp.where(sel, got[2], got[3]))
    return jnp.stack([diag] + offs)      # (K, nd, nd, nc)


def gather_rhs(g, b_cell, b_p, b_m):
    """Assemble rhs (nd, nc) from cell part and per-facet side parts
    (b_p/b_m: (nd, nf+1)); one stacked gather per slot (see gather_blocks)."""
    cf = g["cf_idx"]
    isp = g["cf_is_plus"]
    nd = b_cell.shape[0]
    bpm = jnp.concatenate([b_p, b_m])    # (2*nd, nf+1)
    b = b_cell
    for l in range(cf.shape[0]):
        got = bpm.at[:, cf[l]].get(mode="promise_in_bounds")
        b = b + jnp.where(isp[l][None, :], got[:nd], got[nd:])
    return b


def _sip_blocks(g, kp, km, gnp, gnm, tau_over_h, sip_mask, pen_p=None, pen_m=None):
    """Symmetric interior penalty blocks for  kappa grad(u).grad(v) coupling.

    kp/km   : (nq, nf+1) diffusion coefficient traces per side
    gnp/gnm : (nd, nf+1) = n . grad(basis) per side
    tau_over_h: (nf+1,) penalty scale tau/avg(h)
    pen_p/pen_m: (nq, nf+1) penalty coefficient per side; defaults to
                 avg-kappa (EMI, solver.py:328); KNP uses jump(D u)
                 (solver.py:590).
    Returns Mpp, Mpm, Mmp, Mmm, each (nd, nd, nf+1), masked by sip_mask.
    """
    w = g["w_f"]                          # (nq,)
    area = g["f_area"]
    Rp, Rm = g["f_Rp"], g["f_Rm"]         # (nq, nd, nf+1)

    # -<avg(k grad u).n, [v]>
    def term1(sign_v, R_v, k_u, gn_u):
        if gn_u.ndim == 3:                    # degree >= 2: gn per qp
            return sign_v * (-0.5) * area * _wsum_outer(w, k_u, R_v, gn_u)
        s = _wsum_vec(w, k_u, R_v)                           # (nd, nf)
        return sign_v * (-0.5) * area * s[:, None, :] * gn_u[None, :, :]

    t1_pp = term1(+1.0, Rp, kp, gnp)
    t1_pm = term1(+1.0, Rp, km, gnm)
    t1_mp = term1(-1.0, Rm, kp, gnp)
    t1_mm = term1(-1.0, Rm, km, gnm)

    # symmetric term: transpose blocks with sides swapped
    T = lambda M: jnp.swapaxes(M, 0, 1)
    t2_pp, t2_pm, t2_mp, t2_mm = T(t1_pp), T(t1_mp), T(t1_pm), T(t1_mm)

    if pen_p is None:
        pen_p = 0.5 * (kp + km)
        pen_m = pen_p
    scale = tau_over_h * area

    def pen(R_v, sv, R_u, su, coef):
        return (sv * su) * scale * _wsum_outer(w, coef, R_v, R_u)

    t3_pp = pen(Rp, +1, Rp, +1, pen_p)
    t3_pm = pen(Rp, +1, Rm, -1, pen_m)
    t3_mp = pen(Rm, -1, Rp, +1, pen_p)
    t3_mm = pen(Rm, -1, Rm, -1, pen_m)

    m = sip_mask[None, None, :]
    return (
        jnp.where(m, t1_pp + t2_pp + t3_pp, 0.0),
        jnp.where(m, t1_pm + t2_pm + t3_pm, 0.0),
        jnp.where(m, t1_mp + t2_mp + t3_mp, 0.0),
        jnp.where(m, t1_mm + t2_mm + t3_mm, 0.0),
    )


def _jump_jump_blocks(g, coef, mask):
    """coef * <[u],[v]> blocks on masked facets; coef (nf+1,) or (nq, nf+1).

    For facet-constant coef this is a broadcast over the static facet mass
    tensors E_vu (precompute_static)."""
    if coef.ndim == 1:
        s = jnp.where(mask, coef * g["f_area"], 0.0)[None, None, :]
        return (s * _E(g, "pp"), -s * _E(g, "pm"),
                -s * _E(g, "mp"), s * _E(g, "mm"))
    w = g["w_f"]
    Rp, Rm = g["f_Rp"], g["f_Rm"]
    scale = g["f_area"]

    def blk(R_v, sv, R_u, su):
        return (sv * su) * scale * _wsum_outer(w, coef, R_v, R_u)

    m = mask[None, None, :]
    return (
        jnp.where(m, blk(Rp, 1, Rp, 1), 0.0),
        jnp.where(m, blk(Rp, 1, Rm, -1), 0.0),
        jnp.where(m, blk(Rm, -1, Rp, 1), 0.0),
        jnp.where(m, blk(Rm, -1, Rm, -1), 0.0),
    )


def _test_integrals(g, vals_p, vals_m):
    """rhs side contributions: int_f vals_side * v_side.

    vals_* (nq, nf+1) -> b_p, b_m (nd, nf+1).  The *caller* encodes signs."""
    w = g["w_f"]
    b_p = g["f_area"] * _wsum_vec(w, vals_p, g["f_Rp"])
    b_m = g["f_area"] * _wsum_vec(w, vals_m, g["f_Rm"])
    return b_p, b_m


# ---------------------------------------------------------------------------
# EMI system (potential)
# ---------------------------------------------------------------------------

def assemble_emi(
    g: Dict[str, Any],
    masks: Dict[str, Any],
    ions: Dict[str, Any],        # z (n_ions,), D (n_ions, nc), c (n_ions, nd_c, nc)
    phys: Dict[str, Any],        # F, psi, C_phi, tau_emi, Lp
    phi_M: Optional[jnp.ndarray] = None,     # (n_mem+1,) padded
    I_ch_tot: Optional[jnp.ndarray] = None,  # (n_mem+1,) padded
    splitting: bool = True,
    mms=None,
    t=None,
    gc: Optional[Dict[str, Any]] = None,
    mem_t: Optional[Dict[str, Any]] = None,
    pm: Optional[Dict[str, Any]] = None,
):
    """Build EMI block-ELL operator, rhs, and block-Jacobi preconditioner
    diagonal (the regularized B operator, solver.py:376-401).

    ``pm``: pair maps (ops.pairs.build_pair_maps) -- emit the PAIR-block
    operator instead: returns ((pd, pe), rhs, P_diag_pair) where P_diag's
    pair diagonal includes the intra-pair coupling (a stronger smoother).

    ``mem_t``: membrane-presliced tables (solver._set_membrane_tags); when
    given, the Robin membrane source (C_phi g JUMP(v), solver.py:332-344)
    is computed on the n_mem facet axis and scatter-added into the facet
    rhs instead of running masked full-facet test integrals (~90% of the
    interior facets are not membrane on the EMIx mesh).

    ``gc``: geometry dict of the *concentration* space when it differs from
    the EMI space (mixed ``degree_emi != degree_knp``, reference
    solver.py:163-169); must share g's quadrature rule.  Defaults to ``g``.

    Returns (blocks (K,nd,nd,nc), rhs (nd,nc), P_diag (nd,nd,nc)).
    """
    if gc is None:
        gc = g
    z, D, c = ions["z"], ions["D"], ions["c"]
    F, psi, C_phi, tau = phys["F"], phys["psi"], phys["C_phi"], phys["tau_emi"]

    # kappa = F * psi * sum_k z_k^2 D_k c_k   (nodal field in the c space,
    # (nd_c, nc); solver.py:306)
    kappa = F * psi * jnp.einsum("k,kc,kic->ic", z * z, D, c)

    # --- cell term: int kappa grad(u).grad(v) ------------------------------
    kbar = jnp.einsum("i,ic->c", gc["phibar"], kappa) if "phibar" in gc else \
        jnp.einsum("q,qc->c", gc["w_c"], jnp.einsum("qi,ic->qc", gc["Phi_c"], kappa))
    if _degree(g) == 1:
        A_cell = (g["vol"] * kbar) * _GG(g)
    else:
        kq = jnp.einsum("qa,ac->qc", gc["Phi_c"], kappa)
        Gq = _Gq(g)
        A_cell = g["vol"] * jnp.einsum("q,qc,qadc,qbdc->abc",
                                       g["w_c"], kq, Gq, Gq)

    # --- facet traces of kappa (c-space trace tensors) ----------------------
    kp = facet_trace(gc, kappa, "p")                         # (nq, nf+1)
    km = facet_trace(gc, kappa, "m")
    gnp = _gn(g, "p")
    gnm = _gn(g, "m")

    sip = masks["f_sip"]
    mem = masks["f_mem"]
    Mpp, Mpm, Mmp, Mmm = _sip_blocks(g, kp, km, gnp, gnm, tau / g["f_havg"], sip)

    # --- membrane coupling: + C_phi <[u],[v]> on membrane facets ------------
    cphi = jnp.full_like(g["f_area"], C_phi)
    Cpp, Cpm, Cmp, Cmm = _jump_jump_blocks(g, cphi, mem)
    Mpp, Mpm, Mmp, Mmm = Mpp + Cpp, Mpm + Cpm, Mmp + Cmp, Mmm + Cmm

    if pm is not None:
        from .pairs import gather_blocks_pair
        blocks = gather_blocks_pair(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm)
    else:
        blocks = gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)

    # --- rhs: diffusive terms, all ions -------------------------------------
    # flux = sum_k z_k D_k grad(c_k) lives in the c space; the test-side
    # integration lives in the EMI space -- each branches on its own degree
    ones = jnp.ones_like(g["f_Rp"][:, 0, :])                  # (nq, nf+1)
    if _degree(gc) == 1:
        gradc = jnp.einsum("idc,kic->kdc", gc["G"], c)       # (n_ions, d, nc)
        flux = jnp.einsum("k,kc,kdc->dc", z, D, gradc)       # (d, nc) per cell
        flux_q = None
        fp = jnp.einsum("df,df->f", flux[:, g["f_cp"]], g["f_n"])
        fm = jnp.einsum("df,df->f", flux[:, g["f_cm"]], g["f_n"])
        favg_q = (0.5 * F * (fp + fm) * sip)[None, :] * ones  # (nq, nf+1)
    else:
        gradc_q = jnp.einsum("qadc,kac->kqdc", _Gq(gc), c)
        flux_q = jnp.einsum("k,kc,kqdc->qdc", z, D, gradc_q)
        # n . (sum_k z D grad c) per side via the c-space normal gradients
        gncp, gncm = _gn(gc, "p"), _gn(gc, "m")
        ncp = jnp.einsum("qaf,kaf->kqf", gncp, c[:, :, g["f_cp"]])
        ncm = jnp.einsum("qaf,kaf->kqf", gncm, c[:, :, g["f_cm"]])
        fp = jnp.einsum("k,kf,kqf->qf", z, D[:, g["f_cp"]], ncp)
        fm = jnp.einsum("k,kf,kqf->qf", z, D[:, g["f_cm"]], ncm)
        favg_q = 0.5 * F * (fp + fm) * sip[None, :]
    if _degree(g) == 1:
        fbar = flux if flux_q is None else \
            jnp.einsum("q,qdc->dc", g["w_c"], flux_q)
        b_cell = -F * g["vol"] * jnp.einsum("dc,idc->ic", fbar, g["G"])
    else:
        Gq = _Gq(g)
        if flux_q is None:
            b_cell = -F * g["vol"] * jnp.einsum("q,dc,qadc->ac",
                                                g["w_c"], flux, Gq)
        else:
            b_cell = -F * g["vol"] * jnp.einsum("q,qdc,qadc->ac",
                                                g["w_c"], flux_q, Gq)
    b_p, b_m = _test_integrals(g, favg_q, -favg_q)

    if mms is None:
        # Robin data: splitting -> phi_M; passive -> phi_M - I_ch/C_phi
        # (solver.py:332-344). Term: + C_phi g JUMP(v) = g C_phi (v_i - v_e)
        gr = phi_M if splitting else phi_M - I_ch_tot / C_phi
        if mem_t is not None:
            nm = mem_t["cp"].shape[0]
            fidx = mem_t["fidx"]
            area_m = g["f_area"].at[fidx].get(mode="promise_in_bounds")
            src = C_phi * gr[:nm] * area_m                     # (nm,)
            w_f = g["w_f"]
            bg_p_m = -src * jnp.einsum("q,qim->im", w_f, mem_t["Rp"])
            bg_m_m = src * jnp.einsum("q,qim->im", w_f, mem_t["Rm"])
            b_p = b_p.at[:, fidx].add(bg_p_m, mode="promise_in_bounds",
                                      unique_indices=True)
            b_m = b_m.at[:, fidx].add(bg_m_m, mode="promise_in_bounds",
                                      unique_indices=True)
        else:
            gf = gr[None, :].at[:, masks["f_memidx"]].get(
                mode="promise_in_bounds")[0] * mem             # (nf+1,)
            bg_p, bg_m = _test_integrals(
                g, -C_phi * gf[None, :] * ones, C_phi * gf[None, :] * ones
            )
            b_p, b_m = b_p + bg_p, b_m + bg_m
    else:
        xq = g["f_qp"]                                         # (nq, d, nf+1)
        stag = g["f_stag"]
        gphi = jnp.zeros_like(xq[:, 0, :])
        gJ = jnp.zeros_like(gphi)
        for wall in mms.wall_tags:
            wmask = (stag == wall)[None, :]
            gphi = gphi + wmask * mms.g_phi[wall](xq, t)
            gJ = gJ + wmask * mms.g_J_phi[wall](xq, t)
        bg_p, bg_m = _test_integrals(g, -C_phi * gphi, C_phi * gphi)
        # flux-jump defect on plus side (solver.py:369)
        bj_p, _ = _test_integrals(g, gJ, jnp.zeros_like(gJ))
        b_p = b_p + (bg_p + bj_p) * mem[None, :]
        b_m = b_m + bg_m * mem[None, :]

    rhs = gather_rhs(g, b_cell, b_p, b_m)

    if mms is not None:
        # volume sources f_phi per subdomain (solver.py:365-366)
        xq = g["cell_qp"]                                      # (nq, d, nc)
        tagc = g["cell_tag"][None, :]
        fsrc = jnp.where(tagc == 1, mms.f_phi[1](xq, t), mms.f_phi[0](xq, t))
        rhs = rhs + g["vol"] * jnp.einsum("q,qc,qi->ic", g["w_c"], fsrc, g["Phi_c"])
        # exterior Neumann: -F z (J_k . n) v on ds (solver.py:372-374)
        xe = g["e_qp"]                                         # (nq, d, ne)
        bdry = jnp.zeros_like(xe[:, 0, :])
        for k in range(len(mms.neumann)):
            Jk = mms.neumann[k](xe, t)                         # (nq, d, ne)
            bdry = bdry + z[k] * jnp.einsum("qdf,df->qf", Jk, g["e_n"])
        be = -F * g["e_area"] * jnp.einsum("q,qf,qif->if", g["w_f"], bdry, g["e_R"])
        rhs = rhs.at[:, g["e_c"]].add(be)

    # --- preconditioner: diag blocks of B = A + kappa/Lp^2 mass --------------
    reg = (g["vol"] * kbar / phys["Lp"] ** 2) * _M0(g)[:, :, None]
    if pm is not None:
        from .pairs import pair_block_diag_embed
        pd, pe = blocks
        P_diag = pd + pair_block_diag_embed(pm, reg)
        return (pd, pe), rhs, P_diag
    P_diag = blocks[0] + reg

    return blocks, rhs, P_diag


# ---------------------------------------------------------------------------
# KNP system (one ion)
# ---------------------------------------------------------------------------

def assemble_knp_static(g, masks, ion, phys):
    """Time-independent part of the KNP operator for one ion: mass/dt +
    stiffness + SIP + penalty (D is a static P0 field).  Computed once at
    setup; per-step assembly only adds the phi-dependent drift/upwind."""
    z, D = ion["z"], ion["D"]
    dt, tau = phys["dt"], phys["tau_knp"]
    GG = _GG(g) if _degree(g) == 1 else g["GG2"]
    A_cell = (g["vol"] / dt) * _M0(g)[:, :, None] + (g["vol"] * D) * GG
    sip = masks["f_sip"]
    ones = jnp.ones_like(g["f_Rp"][:, 0, :])
    Dp = D[g["f_cp"]][None, :] * ones
    Dm = D[g["f_cm"]][None, :] * ones
    gnp = _gn(g, "p")
    gnm = _gn(g, "m")
    # penalty uses jump(D u) (solver.py:590): coefficient D per side
    Mpp, Mpm, Mmp, Mmm = _sip_blocks(
        g, Dp, Dm, gnp, gnm, tau / g["f_havg"], sip, pen_p=Dp, pen_m=Dm
    )
    return gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)


def assemble_knp(
    g: Dict[str, Any],
    masks: Dict[str, Any],
    ion: Dict[str, Any],        # z (), D (nc,), c_n (nd, nc), c_k (nd, nc)
    phys: Dict[str, Any],       # F, psi, C_M, dt, tau_knp
    phi: jnp.ndarray,           # (nd, nc) potential from EMI step
    alpha_sum: jnp.ndarray,     # (nd, nc) sum_k D z^2 c_k (nodal, all ions)
    phi_M: Optional[jnp.ndarray] = None,     # (n_mem+1,)
    I_ch_k: Optional[jnp.ndarray] = None,    # (n_mem+1,)
    I_ch_tot: Optional[jnp.ndarray] = None,  # (n_mem+1,)
    f_source=None,              # callable(x, t) or None (ECS source, dx(0))
    splitting: bool = True,
    mms=None,
    mms_ion: Optional[int] = None,
    t=None,
    static_blocks: Optional[jnp.ndarray] = None,
    gp: Optional[Dict[str, Any]] = None,
):
    """Build the KNP block-ELL operator + rhs for one solved ion.

    ``gp``: geometry dict of the *potential* space when it differs from the
    KNP space (mixed ``degree_emi != degree_knp``, reference
    solver.py:163-169); must share g's quadrature rule.  Defaults to ``g``.

    Returns (blocks, rhs).  The reference's mixed system is block-diagonal
    across ions (coupling only through frozen phi / c_prev), so ions are
    independent scalar solves.
    """
    if gp is None:
        gp = g
    z, D = ion["z"], ion["D"]
    F, psi, C_M, dt = phys["F"], phys["psi"], phys["C_M"], phys["dt"]

    M0 = _M0(g)
    phibar = g["phibar"] if "phibar" in g else \
        jnp.einsum("q,qj->j", g["w_c"], g["Phi_c"])

    if static_blocks is None:
        static_blocks = assemble_knp_static(g, masks, ion, phys)

    # --- phi-dependent cell drift: z psi D u grad(phi).grad(v) ---------------
    sip = masks["f_sip"]
    mem = masks["f_mem"]
    scale = (-z * psi) * g["f_area"] * sip                       # (nf+1,)
    if _degree(g) == 1 and _degree(gp) == 1:
        gphi = cell_grad(gp, phi)                                # (d, nc)
        drift = jnp.einsum("idc,dc->ic", g["G"], gphi)           # (nd, nc)
        A_cell = (z * psi * (g["vol"] * D)
                  * drift[:, None, :] * phibar[None, :, None])

        # --- upwinded drift on tag-0 facets (solver.py:583-594): coefficient
        # broadcasts over the static facet mass tensors E_vu ----------------
        # stack D under gphi so each side is ONE 2-D gather (a bare 1-D
        # D[f_cp] gather costs ~3x more than this whole fetch)
        gphiD = jnp.concatenate([gphi, D[None, :]], axis=0)   # (d+1, nc)
        gDp = gphiD.at[:, g["f_cp"]].get(mode="promise_in_bounds")
        gDm = gphiD.at[:, g["f_cm"]].get(mode="promise_in_bounds")
        un_p = jnp.maximum(
            gDp[-1] * jnp.einsum("df,df->f", gDp[:-1], g["f_n"]), 0.0)
        un_m = jnp.maximum(
            -gDm[-1] * jnp.einsum("df,df->f", gDm[:-1], g["f_n"]), 0.0)
        sp_ = (scale * un_p)[None, None, :]
        sm_ = (scale * un_m)[None, None, :]
        Mpp = sp_ * _E(g, "pp")
        Mpm = -sm_ * _E(g, "pm")
        Mmp = -sp_ * _E(g, "mp")
        Mmm = sm_ * _E(g, "mm")
    else:
        # general path: phi gradients from the phi space (gp), trial values /
        # test gradients from the KNP space (g), all at the shared quad rule
        nq_c = g["w_c"].shape[0]
        if _degree(gp) == 1:
            gphi_q = jnp.broadcast_to(cell_grad(gp, phi)[None],
                                      (nq_c,) + phi.shape[1:][:0] + cell_grad(gp, phi).shape)
        else:
            gphi_q = jnp.einsum("qadc,ac->qdc", _Gq(gp), phi)    # (nq, d, nc)
        if _degree(g) == 1:
            Gq_v = jnp.broadcast_to(g["G"][None], (nq_c,) + g["G"].shape)
        else:
            Gq_v = _Gq(g)
        A_cell = (z * psi * (g["vol"] * D)) * jnp.einsum(
            "q,qdc,qidc,qj->ijc", g["w_c"], gphi_q, Gq_v, g["Phi_c"])

        # upwind with per-qp normal phi-gradient traces (phi space)
        nq_f = g["w_f"].shape[0]
        if _degree(gp) == 1:
            gphi = cell_grad(gp, phi)
            np_ = jnp.einsum("df,df->f", gphi[:, g["f_cp"]], g["f_n"])[None, :]
            nm_ = jnp.einsum("df,df->f", gphi[:, g["f_cm"]], g["f_n"])[None, :]
            np_ = jnp.broadcast_to(np_, (nq_f, np_.shape[1]))
            nm_ = jnp.broadcast_to(nm_, (nq_f, nm_.shape[1]))
        else:
            gnp_, gnm_ = _gn(gp, "p"), _gn(gp, "m")
            np_ = jnp.einsum("qaf,af->qf", gnp_, phi[:, g["f_cp"]])
            nm_ = jnp.einsum("qaf,af->qf", gnm_, phi[:, g["f_cm"]])
        un_p = jnp.maximum(D[g["f_cp"]][None, :] * np_, 0.0)
        un_m = jnp.maximum(-D[g["f_cm"]][None, :] * nm_, 0.0)
        w, Rp, Rm = g["w_f"], g["f_Rp"], g["f_Rm"]
        Mpp = scale * _wsum_outer(w, un_p, Rp, Rp)
        Mpm = -scale * _wsum_outer(w, un_m, Rp, Rm)
        Mmp = -scale * _wsum_outer(w, un_p, Rm, Rp)
        Mmm = scale * _wsum_outer(w, un_m, Rm, Rm)

    blocks = static_blocks + gather_blocks(g, A_cell, Mpp, Mpm, Mmp, Mmm)

    # --- rhs ------------------------------------------------------------------
    c_n = ion["c_n"]
    b_cell = (g["vol"] / dt) * jnp.einsum("ij,jc->ic", M0, c_n)

    if f_source is not None:
        fq = f_source(g["cell_qp"], t)                           # (nq, nc)
        ecs = (g["cell_tag"] == 0)[None, :]
        b_cell = b_cell + g["vol"] * jnp.einsum(
            "q,qc,qi->ic", g["w_c"], fq * ecs, g["Phi_c"]
        )

    if mms is None:
        # alpha = D z^2 c_k / alpha_sum (nodal DG1, solver.py:603)
        alpha = D[None, :] * z * z * ion["c_k"] / alpha_sum
        a_p = facet_trace(g, alpha, "p")                          # (nq, nf+1)
        a_m = facet_trace(g, alpha, "m")
        C_p = a_p * C_M / (F * z * dt)
        C_m = a_m * C_M / (F * z * dt)
        # one stacked 2-D gather: per-index TPU gather cost makes three
        # separate 1-D membrane-field gathers ~10x this one
        mem3 = jnp.stack([phi_M, I_ch_k, I_ch_tot])
        got = mem3.at[:, masks["f_memidx"]].get(mode="promise_in_bounds")
        got = got * mem[None, :]
        phiM_f, Ik_f, Itot_f = got[0][None, :], got[1][None, :], got[2][None, :]

        # JUMP(C g_robin v): C*g = C phi_M - I_ch_k/(Fz) (+ alpha I_ch/(Fz))
        # (solver.py:614-625); plus side = ECS is subtracted.
        s_extra_p = (a_p * Itot_f / (F * z)) if splitting else 0.0
        s_extra_m = (a_m * Itot_f / (F * z)) if splitting else 0.0
        s_e = C_p * phiM_f - Ik_f / (F * z) + s_extra_p
        s_i = C_m * phiM_f - Ik_f / (F * z) + s_extra_m
        bg_p, bg_m = _test_integrals(g, -s_e * mem[None, :], s_i * mem[None, :])

        # coupling: -[phi][C] avg(v) - [phi] avg(C) [v] (solver.py:628-629)
        jphi = facet_trace(gp, phi, "p") - facet_trace(gp, phi, "m")
        jC = C_p - C_m
        aC = 0.5 * (C_p + C_m)
        val_p = (-jphi * jC * 0.5 - jphi * aC) * mem[None, :]
        val_m = (-jphi * jC * 0.5 + jphi * aC) * mem[None, :]
        bc_p, bc_m = _test_integrals(g, val_p, val_m)
        b_p = bg_p + bc_p
        b_m = bg_m + bc_m
    else:
        k = mms_ion
        xq = g["f_qp"]
        stag = g["f_stag"]
        C_i = ion["C_sub_i"]     # coupling coeff ICS (C_sub[1])
        C_e = ion["C_sub_e"]     # ECS (C_sub[0])
        g1 = jnp.zeros_like(xq[:, 0, :])
        g2 = jnp.zeros_like(g1)
        for wall in mms.wall_tags:
            wmask = (stag == wall)[None, :]
            g1 = g1 + wmask * mms.g_robin_1[k][wall](xq, t)
            g2 = g2 + wmask * mms.g_robin_2[k][wall](xq, t)
        # robin: + C_1 g_1 v_i - C_2 g_2 v_e (solver.py:653-654)
        mem2 = mem[None, :]
        br_p, br_m = _test_integrals(g, -C_e * g2 * mem2, C_i * g1 * mem2)
        jphi = facet_trace(gp, phi, "p") - facet_trace(gp, phi, "m")
        jC = C_e - C_i           # [C] = C_plus - C_minus
        aC = 0.5 * (C_e + C_i)
        val_p = (-jphi * jC * 0.5 - jphi * aC) * mem2
        val_m = (-jphi * jC * 0.5 + jphi * aC) * mem2
        bc_p, bc_m = _test_integrals(g, val_p, val_m)
        b_p = br_p + bc_p
        b_m = br_m + bc_m

    rhs = gather_rhs(g, b_cell, b_p, b_m)

    if mms is not None:
        k = mms_ion
        xq = g["cell_qp"]
        tagc = g["cell_tag"][None, :]
        fsrc = jnp.where(tagc == 1, mms.f_c[k][1](xq, t), mms.f_c[k][0](xq, t))
        rhs = rhs + g["vol"] * jnp.einsum("q,qc,qi->ic", g["w_c"], fsrc, g["Phi_c"])
        xe = g["e_qp"]
        Jk = mms.neumann[k](xe, t)
        bdry = jnp.einsum("qdf,df->qf", Jk, g["e_n"])
        be = -g["e_area"] * jnp.einsum("q,qf,qif->if", g["w_f"], bdry, g["e_R"])
        rhs = rhs.at[:, g["e_c"]].add(be)

    return blocks, rhs


def assemble_knp_all(
    g: Dict[str, Any],
    masks: Dict[str, Any],
    ions: Dict[str, Any],       # z (m,), D (m,nc), c_n (m,nd,nc), c_k (m,nd,nc)
    phys: Dict[str, Any],
    phi: jnp.ndarray,           # (nd, nc)
    alpha_sum: jnp.ndarray,     # (nd, nc)
    phi_M: jnp.ndarray,         # (n_mem+1,)
    I_ch: jnp.ndarray,          # (m, n_mem+1)
    I_ch_tot: jnp.ndarray,      # (n_mem+1,)
    splitting: bool = True,
    static_blocks: Optional[jnp.ndarray] = None,   # (m, K, nd, nd, nc)
    gp: Optional[Dict[str, Any]] = None,
    mem_t: Optional[Dict[str, Any]] = None,
    pm: Optional[Dict[str, Any]] = None,
):
    """All solved ions' KNP operators + rhs in one pass with SHARED facet /
    membrane gathers (production degree-1 path; reference runs one
    assemble per ion, solver.py:723-731).

    TPU gather cost is per-index, so the phi-gradient / D traces, the
    alpha traces, the membrane fields, and the block/rhs scatter-free
    gathers are each issued ONCE as stacked 2-D operands for all ions
    (replacing m copies in the unrolled per-ion loop; knp_assem phase
    measured 48 -> target <30 ms on the EMIx mesh).  ``max(D*un, 0) ==
    D*max(un, 0)`` since D > 0, so the upwind switch is ion-independent.

    ``mem_t``: the solver's membrane-presliced tables (Rp/Rm/cp/cm/fidx,
    solver._set_membrane_tags).  When given, the ENTIRE membrane rhs
    (Robin sources + [phi][C] coupling, solver.py:609-629) is computed on
    the n_mem facet axis and scattered once into the full facet array --
    on the EMIx mesh only ~24k of the ~240k interior facets are membrane,
    and the full-axis (m, nq, nf) intermediates were ~20 ms/step of pure
    masked-out work (tools/exp_knp_asm_bisect.py).  The phi facet traces
    also leave the big per-side gather in that mode (jphi is only needed
    on membrane facets).

    Returns (blocks (m,K,nd,nd,nc), rhs (m,nd,nc))."""
    if gp is None:
        gp = g
    assert _degree(g) == 1 and _degree(gp) == 1, \
        "assemble_knp_all is the degree-1 production path"
    z, D = ions["z"], ions["D"]                      # (m,), (m, nc)
    c_n, c_k = ions["c_n"], ions["c_k"]              # (m, nd, nc)
    F, psi, C_M, dt = phys["F"], phys["psi"], phys["C_M"], phys["dt"]
    m = z.shape[0]
    nd = c_k.shape[1]
    d = gp["G"].shape[1]
    nf1 = g["f_area"].shape[0]

    M0 = _M0(g)
    phibar = g["phibar"]
    sip = masks["f_sip"]
    mem = masks["f_mem"]
    w, Rp, Rm = g["w_f"], g["f_Rp"], g["f_Rm"]

    # --- shared cell drift --------------------------------------------------
    gphi = cell_grad(gp, phi)                        # (d, nc)
    drift = jnp.einsum("idc,dc->ic", g["G"], gphi)   # (nd, nc)
    A_cell = ((z * psi)[:, None, None, None]
              * (g["vol"] * D)[:, None, None, :]
              * drift[None, :, None, :] * phibar[None, None, :, None])

    # --- ONE stacked gather per side: [gphi | (phi) | D_all] ----------------
    # phi trace rows ride the gather only on the legacy full-facet path;
    # with mem_t the phi jump is gathered membrane-locally below.
    ndp = phi.shape[0]
    if mem_t is None:
        stackA = jnp.concatenate([gphi, phi, D], axis=0)     # (d+ndp+m, nc)
    else:
        stackA = jnp.concatenate([gphi, D], axis=0)          # (d+m, nc)
    SP = stackA.at[:, g["f_cp"]].get(mode="promise_in_bounds")
    SM = stackA.at[:, g["f_cm"]].get(mode="promise_in_bounds")
    u_p = jnp.maximum(jnp.einsum("df,df->f", SP[:d], g["f_n"]), 0.0)
    u_m = jnp.maximum(-jnp.einsum("df,df->f", SM[:d], g["f_n"]), 0.0)
    if mem_t is None:
        D_p, D_m = SP[d + ndp:], SM[d + ndp:]                # (m, nf+1)
        jphi = jnp.einsum("qif,if->qf", gp["f_Rp"], SP[d:d + ndp]) \
            - jnp.einsum("qif,if->qf", gp["f_Rm"], SM[d:d + ndp])  # (nq, nf+1)
    else:
        D_p, D_m = SP[d:], SM[d:]

    # --- upwind blocks ------------------------------------------------------
    scale = (-psi) * z[:, None] * (g["f_area"] * sip)[None, :]   # (m, nf+1)
    sp_ = (scale * D_p * u_p[None, :])[:, None, None, :]
    sm_ = (scale * D_m * u_m[None, :])[:, None, None, :]
    Mpp = sp_ * _E(g, "pp")[None]
    Mpm = -sm_ * _E(g, "pm")[None]
    Mmp = -sp_ * _E(g, "mp")[None]
    Mmm = sm_ * _E(g, "mm")[None]

    # --- batched block gather (one stacked gather per cell-facet slot) ------
    cf = g["cf_idx"]
    isp = g["cf_is_plus"]
    if pm is not None:
        # pair-block emission: static_blocks must already be in pair form
        # ((m, 2nd, 2nd, np), (m, S, 2nd, nd, np)) -- ops.pairs.
        # cell_bell_to_pair converts the cached static operator at setup
        from .pairs import gather_blocks_pair_multi
        pdK, peK = gather_blocks_pair_multi(g, pm, A_cell, Mpp, Mpm, Mmp,
                                            Mmm)
        if static_blocks is not None:
            pdK = pdK + static_blocks[0]
            peK = peK + static_blocks[1]
        blocks = (pdK, peK)
    else:
        Mstk = jnp.stack([Mpp, Mmm, Mpm, Mmp], axis=1).reshape(
            m * 4 * nd * nd, nf1)
        diag = A_cell
        offs = []
        for l in range(cf.shape[0]):
            sel = isp[l][None, None, None, :]
            got = Mstk.at[:, cf[l]].get(mode="promise_in_bounds")
            got = got.reshape(m, 4, nd, nd, -1)
            diag = diag + jnp.where(sel, got[:, 0], got[:, 1])
            offs.append(jnp.where(sel, got[:, 2], got[:, 3]))
        blocks = jnp.stack([diag] + offs, axis=1)    # (m, K, nd, nd, nc)
        if static_blocks is not None:
            blocks = blocks + static_blocks

    # --- rhs ----------------------------------------------------------------
    b_cell = (g["vol"] / dt) * jnp.einsum("ij,kjc->kic", M0, c_n)

    alpha = (D[:, None, :] * (z * z)[:, None, None]) * c_k / alpha_sum[None]
    AU = alpha.reshape(m * nd, -1)
    Cfac = (C_M / (F * dt)) / z                                  # (m,)
    inv_Fz = (1.0 / (F * z))[:, None, None]

    if mem_t is not None:
        # membrane rhs on the n_mem axis: every facet here IS membrane, so
        # no masks; phi_M / I_ch are already slot-ordered (no gather)
        nm = mem_t["cp"].shape[0]
        Rp_m, Rm_m = mem_t["Rp"], mem_t["Rm"]                # (nq, nd, nm)
        fidx = mem_t["fidx"]
        stackM = jnp.concatenate([AU, phi], axis=0)          # (m*nd+ndp, nc)
        MPm = stackM.at[:, mem_t["cp"]].get(mode="promise_in_bounds")
        MMm = stackM.at[:, mem_t["cm"]].get(mode="promise_in_bounds")
        AUp = MPm[:m * nd].reshape(m, nd, nm)
        AUm = MMm[:m * nd].reshape(m, nd, nm)
        jphi_m = jnp.einsum("qim,im->qm", Rp_m, MPm[m * nd:]) \
            - jnp.einsum("qim,im->qm", Rm_m, MMm[m * nd:])   # (nq, nm)
        a_p = jnp.einsum("qim,kim->kqm", Rp_m, AUp)
        a_m = jnp.einsum("qim,kim->kqm", Rm_m, AUm)
        C_p = a_p * Cfac[:, None, None]
        C_m = a_m * Cfac[:, None, None]
        phiM_f = phi_M[:nm][None, None, :]
        Itot_f = I_ch_tot[:nm]
        Ik_f = I_ch[:, :nm][:, None, :]                      # (m,1,nm)
        s_extra_p = (a_p * Itot_f[None, None, :] * inv_Fz) if splitting else 0.0
        s_extra_m = (a_m * Itot_f[None, None, :] * inv_Fz) if splitting else 0.0
        s_e = C_p * phiM_f - Ik_f * inv_Fz + s_extra_p       # (m, nq, nm)
        s_i = C_m * phiM_f - Ik_f * inv_Fz + s_extra_m
        jC = C_p - C_m
        aC = 0.5 * (C_p + C_m)
        jphi_b = jphi_m[None]
        val_p = -s_e + (-jphi_b * jC * 0.5 - jphi_b * aC)
        val_m = s_i + (-jphi_b * jC * 0.5 + jphi_b * aC)
        area_m = g["f_area"].at[fidx].get(mode="promise_in_bounds")
        b_p = area_m * jnp.einsum("q,kqm,qim->kim", w, val_p, Rp_m)
        b_m = area_m * jnp.einsum("q,kqm,qim->kim", w, val_m, Rm_m)
        bpm_m = jnp.concatenate([b_p, b_m], axis=1).reshape(m * 2 * nd, nm)
        bpm = jnp.zeros((m * 2 * nd, nf1), dtype=b_cell.dtype)
        bpm = bpm.at[:, fidx].set(bpm_m, mode="promise_in_bounds",
                                  unique_indices=True)
    else:
        # legacy full-facet path (kept for callers without membrane tables)
        AUp = AU.at[:, g["f_cp"]].get(
            mode="promise_in_bounds").reshape(m, nd, nf1)
        AUm = AU.at[:, g["f_cm"]].get(
            mode="promise_in_bounds").reshape(m, nd, nf1)
        a_p = jnp.einsum("qif,kif->kqf", Rp, AUp)
        a_m = jnp.einsum("qif,kif->kqf", Rm, AUm)
        C_p = a_p * Cfac[:, None, None]
        C_m = a_m * Cfac[:, None, None]

        # membrane fields: one stacked gather
        mem_all = jnp.concatenate([phi_M[None], I_ch_tot[None], I_ch], axis=0)
        got = mem_all.at[:, masks["f_memidx"]].get(mode="promise_in_bounds")
        got = got * mem[None, :]
        phiM_f = got[0][None, None, :]                       # (1,1,nf+1)
        Itot_f = got[1]
        Ik_f = got[2:][:, None, :]                           # (m,1,nf+1)

        s_extra_p = (a_p * Itot_f[None, None, :] * inv_Fz) if splitting else 0.0
        s_extra_m = (a_m * Itot_f[None, None, :] * inv_Fz) if splitting else 0.0
        s_e = C_p * phiM_f - Ik_f * inv_Fz + s_extra_p       # (m, nq, nf+1)
        s_i = C_m * phiM_f - Ik_f * inv_Fz + s_extra_m

        jC = C_p - C_m
        aC = 0.5 * (C_p + C_m)
        jphi_b = jphi[None]
        val_p = -s_e + (-jphi_b * jC * 0.5 - jphi_b * aC)
        val_m = s_i + (-jphi_b * jC * 0.5 + jphi_b * aC)
        memq = mem[None, None, :]
        b_p = g["f_area"] * jnp.einsum("q,kqf,qif->kif", w, val_p * memq, Rp)
        b_m = g["f_area"] * jnp.einsum("q,kqf,qif->kif", w, val_m * memq, Rm)
        bpm = jnp.concatenate([b_p, b_m], axis=1).reshape(m * 2 * nd, nf1)

    # batched rhs gather
    rhs = b_cell
    for l in range(cf.shape[0]):
        got = bpm.at[:, cf[l]].get(mode="promise_in_bounds").reshape(m, 2, nd, -1)
        rhs = rhs + jnp.where(isp[l][None, None, :], got[:, 0], got[:, 1])
    return blocks, rhs


# ---------------------------------------------------------------------------
# projections / updates (replace utils.pcws_constant_project & friends)
# ---------------------------------------------------------------------------

def _mem_trace(g, mem, u, side: str):
    """Membrane-presliced facet trace -> (nq, n_mem).

    Uses the per-membrane trace tensors `mem["Rp"/"Rm"]` and cell maps
    `mem["cp"/"cm"]` cut out of the full facet tables at setup
    (solver._set_membrane_tags): gathers only n_mem cell columns instead
    of the full nf+1 facet axis (~10x fewer gather indices on the EMIx
    mesh, where TPU gather cost is per-index)."""
    R = mem["Rp" if side == "p" else "Rm"]           # (nq, nd, n_mem)
    c = mem["cp" if side == "p" else "cm"]           # (n_mem,)
    return jnp.einsum("qim,im->qm", R, u[:, c])


def membrane_avg_m(g, mem, u, side: str):
    """Facet-average membrane trace via the presliced tensors -> (n_mem,)."""
    return jnp.einsum("q,qm->m", g["w_f"], _mem_trace(g, mem, u, side))


def nernst_potential_m(g, mem, c, z, F, R, T):
    """E = RT/(zF) * facet-avg ln(c_plus / c_minus), presliced."""
    cp = _mem_trace(g, mem, c, "p")
    cm = _mem_trace(g, mem, c, "m")
    return R * T / (F * z) * jnp.einsum("q,qm->m", g["w_f"], jnp.log(cp / cm))


def jump_phi_M_m(g, mem, phi):
    """phi_M = facet-avg JUMP(phi) = phi_i - phi_e, presliced."""
    j = _mem_trace(g, mem, phi, "m") - _mem_trace(g, mem, phi, "p")
    return jnp.einsum("q,qm->m", g["w_f"], j)


def membrane_avg(g, mem_fidx, u, side: str):
    """Facet average of DG1 trace on membrane facets -> (n_mem,).

    Equivalent to pcws_constant_project(plus/minus(u, n_g), Q)
    (utils.py:87-124): the DLT0 diagonal-mass projection is the facet mean."""
    vals = facet_trace(g, u, side)[:, mem_fidx]         # (nq, n_mem)
    return jnp.einsum("q,qm->m", g["w_f"], vals)


def nernst_potential(g, mem_fidx, c, z, F, R, T):
    """E = RT/(zF) * facet-avg ln(c_plus / c_minus)  (solver.py:299-300)."""
    cp = facet_trace(g, c, "p")[:, mem_fidx]
    cm = facet_trace(g, c, "m")[:, mem_fidx]
    return R * T / (F * z) * jnp.einsum("q,qm->m", g["w_f"], jnp.log(cp / cm))


def jump_phi_M(g, mem_fidx, phi):
    """phi_M = facet-avg JUMP(phi) = phi_i - phi_e (solver.py:813-814)."""
    vals = (facet_trace(g, phi, "m") - facet_trace(g, phi, "p"))[:, mem_fidx]
    return jnp.einsum("q,qm->m", g["w_f"], vals)


def eliminated_concentration(c, z, rho, z_elim):
    """c_N = -(1/z_N)(sum_k z_k c_k + rho); exact nodal arithmetic since all
    fields are DG1 (the reference's global L2 projection, solver.py:831-838,
    is the identity here).  c (n_ions-1, nd, nc), rho (nc,)."""
    acc = jnp.einsum("k,kic->ic", z, c)
    return -(acc + rho[None, :]) / z_elim
