"""Two-level + deflation preconditioner (hypre BoomerAMG replacement,
SURVEY.md N4).

Three additive SPD pieces (see make_two_level): a block-Jacobi smoother,
a coarse solve over contiguous fixed-size cell chunks (cells are numbered
(compartment, Morton) by build_mesh, so chunks never straddle membranes and
restrict/prolong are reshape-sum/broadcast -- gather-free), and exact
deflation of the per-compartment constant modes whose tiny eigenvalues
(~ C_phi * membrane area) carry the membrane-jump physics of the EMI
operator.  Coarse operators are re-Galerkinized from the block-ELL operator
at every assembly and inverted densely (equilibrated Cholesky + one
refinement sweep) so each Krylov-iteration apply is GEMVs only.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmv import block_jacobi_apply, block_jacobi_inverse


def aggregate_ids_graph(mesh, agg_size: int) -> np.ndarray:
    """BFS aggregation on the same-tag cell adjacency graph.

    NOTE: not on the default path (the contiguous-chunk coarse space in
    make_two_level avoids its gather-based restrict/prolong); kept as the
    higher-quality aggregation for future shard-local coarse spaces.

    Morton runs fragment badly on intertwined geometries (brain tissue has
    tags alternating along the space-filling curve); growing aggregates by
    breadth-first search over facet-neighbors with equal subdomain tag keeps
    the aggregate count near n_cells/agg_size while never crossing a
    membrane.  Isolated leftover cells join an already-assigned same-tag
    neighbor to avoid singleton aggregates.
    """
    nc = mesh.num_cells
    tags = mesh.cell_tags
    cp, cm = mesh.if_cells[:, 0], mesh.if_cells[:, 1]
    same = tags[cp] == tags[cm]
    e0 = np.concatenate([cp[same], cm[same]])
    e1 = np.concatenate([cm[same], cp[same]])
    order = np.argsort(e0, kind="stable")
    e0, e1 = e0[order], e1[order]
    starts = np.searchsorted(e0, np.arange(nc + 1))

    agg = np.full(nc, -1, dtype=np.int64)
    next_id = 0
    for seed in range(nc):
        if agg[seed] >= 0:
            continue
        agg[seed] = next_id
        count = 1
        frontier = [seed]
        while frontier and count < agg_size:
            nxt = []
            for c in frontier:
                for nb in e1[starts[c]:starts[c + 1]]:
                    if agg[nb] < 0:
                        agg[nb] = next_id
                        count += 1
                        nxt.append(nb)
                        if count >= agg_size:
                            break
                if count >= agg_size:
                    break
            frontier = nxt
        if count == 1:
            # orphan: merge into a same-tag neighbor's aggregate if any
            for nb in e1[starts[seed]:starts[seed + 1]]:
                if agg[nb] >= 0 and agg[nb] != next_id:
                    agg[seed] = agg[nb]
                    break
            if agg[seed] != next_id:
                continue
        next_id += 1
    # compact ids
    uniq, agg = np.unique(agg, return_inverse=True)
    return agg


def compartment_ids(mesh) -> np.ndarray:
    """Connected components of the same-subdomain-tag cell graph: one id per
    enclosed compartment (each ICS cell body, plus the ECS).  These are the
    exact near-null 'membrane jump' modes of the EMI operator."""
    from ..mesh.core import _compartments

    return _compartments(mesh)


def moment_vectors(coords, comp, order: int = 2, dtype=None,
                   order_per_comp=None, host: bool = False,
                   axial_order: int = 0, axial_min_aspect: float = 4.0,
                   return_comp: bool = False):
    """Per-compartment polynomial moment fields for deflation enrichment.

    ``coords`` (nc, nd, d): nodal (vertex) coordinates per cell; ``comp``
    (nc,): compartment ids.  Returns W (nw, nd, nc): for every compartment,
    the centered/scaled monomials {x,y,z} (order>=1) and {x^2,xy,...}
    (order>=2), zero outside the compartment.  Constants are EXCLUDED --
    they are handled exactly by the cancellation-free compartment deflation
    (the moment Galerkin below is built by f32 matvecs, which is safe for
    these bulk-scale modes but catastrophically cancellative for the tiny
    membrane-scale constant modes).

    Why: the compartment-constant deflation captures only the lowest
    membrane-jump mode per cell; during an action-potential upstroke the
    membrane sources excite higher surface harmonics whose eigenvalues sit
    between the tiny constants and the bulk -- on the EMIx mesh the EMI CG
    count at the upstroke drops 200 -> 12 with order=2 (hypre BoomerAMG
    territory, reference solver.py:425-444).

    ``order_per_comp`` (optional, shape (n_comp,)): per-compartment order
    overriding ``order`` -- the membrane-rich ICS bodies are where the
    budget-exceeding harmonics live at ~1M tets, and raising the order
    everywhere wastes W rows (and apply bandwidth) on the one big ECS
    compartment.  ``host=True`` returns numpy float64 and never touches the
    device: the host-f64 moment Galerkin path otherwise carries TWO device
    copies of W (the build input plus the returned mom_W), which is what
    RESOURCE_EXHAUSTED'ed the 995k-tet order-3 build (ROADMAP r5 item 2).

    ``return_comp``: also return ``row_comp`` (nw,) -- the compartment id
    owning each W row (rows are zero outside it); feeds the
    compartment-BLOCKED apply layout (:func:`block_moment_rows`).

    ``axial_order`` (optional): compartments whose per-axis extent aspect
    L[a*]/max(L[other]) exceeds ``axial_min_aspect`` additionally get
    Chebyshev polynomials T_j(loc[a*]) of the scaled dominant-axis
    coordinate for j = order_p+1 .. axial_order.  The scaling-table EMI
    blowup is a domain-LENGTH effect at fixed h (box_3d_axons(1,2) window
    73 -> (1,4) 343): slow AXIAL variation outgrows the tensor budget,
    and axial-only rows cost (axial_order - order_p) per compartment vs
    ~C(p+3,3) for the full tensor.  Chebyshev keeps the high-degree
    host-f64 Galerkin well-conditioned (|loc| <= 1 by the per-axis
    scaling, so the recurrence is stable)."""
    import numpy as np

    comp = np.asarray(comp)
    nc, nd, d = coords.shape
    rows = []
    row_comp = []
    for p in range(int(comp.max()) + 1):
        order_p = int(order if order_per_comp is None else order_per_comp[p])
        m = comp == p
        sel = coords[m]
        ctr = sel.mean(axis=(0, 1))
        # per-AXIS scaling: a scalar L collapses the transverse moments of
        # elongated compartments (36:1 on the bifurcating-neuron mesh) to
        # near-zero fields whose equilibrated Galerkin rows are pure noise
        L = np.abs(sel - ctr).max(axis=(0, 1))
        L = np.where(L > 0, L, 1.0)
        loc = (coords - ctr) / L                   # (nc, nd, d)
        base = []
        if order_p >= 1:
            base += [loc[:, :, a] for a in range(d)]
        if order_p >= 2:
            base += [loc[:, :, a] * loc[:, :, b]
                     for a in range(d) for b in range(a, d)]
        if order_p >= 3:
            base += [loc[:, :, a] * loc[:, :, b] * loc[:, :, c]
                     for a in range(d) for b in range(a, d)
                     for c in range(b, d)]
        if order_p >= 4:
            base += [loc[:, :, a] * loc[:, :, b] * loc[:, :, c] * loc[:, :, e]
                     for a in range(d) for b in range(a, d)
                     for c in range(b, d) for e in range(c, d)]
        if axial_order > order_p:
            ax = int(np.argmax(L))
            others = np.delete(L, ax)
            if others.size == 0 or L[ax] >= axial_min_aspect * others.max():
                x = loc[:, :, ax]
                tm1, t = np.ones_like(x), x          # T_0, T_1
                for j in range(2, axial_order + 1):
                    tm1, t = t, 2.0 * x * t - tm1
                    if j > order_p:
                        base.append(t)
        for f in base:
            rows.append(np.where(m[:, None], f, 0.0).T)    # (nd, nc)
            row_comp.append(p)
    W = np.stack(rows) if rows else np.zeros((0, nd, nc))
    if host:
        W = np.ascontiguousarray(W)
    else:
        W = jnp.asarray(W, dtype=dtype)
    if return_comp:
        return W, np.asarray(row_comp, dtype=np.int64)
    return W


def _equilibration_scale(d):
    """rsqrt of a diagonal with an underflow-safe relative floor.

    Exactly-zero diagonal entries occur legitimately: dead padded pair
    chunks under the sharded pair layout (parallel/sharding.py pads each
    shard's pair count to a common size) have no live cells at all.  The
    old floor ``1e-30 * max(d)`` UNDERFLOWS TO ZERO in float32 whenever
    max(d) < ~1e-8 -- the KNP coarse diagonal is ~vol/dt ~ 1e-11 in the
    cgs unit system -- and ``rsqrt(0) = inf`` then NaN-poisons the whole
    coarse inverse through 0*inf (measured: the 8-way sharded pair dryrun's
    KNP GMRES exited with 0 iterations, unconverged, on CPU-f32; the x64
    test suite never sees it).  A 1e-12 relative floor clamps only rows
    that are numerically dead at f32 precision anyway, and the extra
    ``tiny`` floor keeps an all-dead diagonal finite too."""
    dmax = jnp.max(d)
    tiny = jnp.asarray(jnp.finfo(d.dtype).tiny, dtype=d.dtype)
    floor = jnp.maximum(1e-12 * dmax, tiny)
    return jax.lax.rsqrt(jnp.maximum(d, floor))


def build_moment_deflation(matvec, W, ridge: float = 1e-6, fan=None):
    """Galerkin data for the moment-deflation correction: ``W (nw, nd, nc)``
    deflation fields, ``matvec`` the (current) operator apply on a single
    (nd, nc) field -- or ``fan``, a batched apply (nw, nd, nc) ->
    (nw, nd, nc) that shares the neighbor gather across fields (an order of
    magnitude cheaper; pass ops.spmv.bell_matvec_fan bound to the blocks).
    Returns arrays to merge into the two-level data dict."""
    AW = fan(W) if fan is not None else jax.vmap(matvec)(W)
    Am = jnp.einsum("wic,vic->wv", W, AW)
    Am = 0.5 * (Am + Am.T)
    dm = jnp.diagonal(Am)
    sm = _equilibration_scale(dm)
    As = Am * sm[:, None] * sm[None, :]
    As = As + ridge * jnp.eye(As.shape[0], dtype=As.dtype)
    fac = jax.scipy.linalg.cho_factor(As)
    inv = jax.scipy.linalg.cho_solve(fac, jnp.eye(As.shape[0], dtype=As.dtype))
    return {"mom_W": W, "mom_inv": inv, "mom_s": sm}


def block_moment_rows(W, row_comp, comp, max_frac: float = 0.25,
                      lane: int = 128):
    """Compartment-BLOCKED storage for the moment-deflation fields.

    Every W row is supported on exactly ONE compartment
    (:func:`moment_vectors` zeroes it elsewhere), yet the apply stores W
    dense as (nw, nd, nc): at 995k tets the axial-12 stack is ~95 rows x
    4 x 995k x 4 B = 1.5 GB of HBM read TWICE per EMI iteration, and
    stacking emi_ritz=64 on top RESOURCE_EXHAUSTEDs the chip (ROADMAP r5
    item 2b).  Rows of compartments holding <= ``max_frac`` of the cells
    (the axons, ~4% each; the single big ECS stays dense) are re-stored
    as (n_g, rpg, nd, L) over the compartment's own cell list, L = the
    largest blocked compartment padded to a ``lane`` multiple: the apply
    gathers r at (n_g, L) static indices instead of streaming nc-wide
    mostly-zero rows, and the scatter back touches the same indices.

    Returns ``(perm, W_dense, blk)``: ``perm`` reorders the GLOBAL row
    axis (dense rows first, then blocked rows grouped by compartment) --
    apply it to the Galerkin inv/s; ``blk`` is None when no compartment
    qualifies, else ``dict(W=(n_g, rpg, nd, L), idx=(n_g, L) int32 cell
    ids (pad 0 -- the padded W entries are zero, so gathers multiply 0
    and scatters add 0), rowid=(n_g, rpg) int32 permuted global row ids
    (pad nw -> a dump slot))``.  All numpy; the caller device-puts."""
    W = np.asarray(W)
    row_comp = np.asarray(row_comp)
    comp = np.asarray(comp)
    nw, nd, nc = W.shape
    n_comp = int(comp.max()) + 1 if comp.size else 0
    sizes = np.bincount(comp[comp >= 0], minlength=n_comp)
    has_rows = np.zeros(n_comp, dtype=bool)
    has_rows[np.unique(row_comp)] = True
    blocked = (sizes <= max_frac * nc) & has_rows
    if not blocked.any():
        return np.arange(nw), W, None
    dense_rows = np.flatnonzero(~blocked[row_comp])
    groups = np.flatnonzero(blocked)
    L = -(-int(sizes[groups].max()) // lane) * lane
    rpg = int(max(np.sum(row_comp == g) for g in groups))
    n_g = groups.shape[0]
    Wb = np.zeros((n_g, rpg, nd, L), dtype=W.dtype)
    idx = np.zeros((n_g, L), dtype=np.int32)
    rowid = np.full((n_g, rpg), nw, dtype=np.int32)
    perm = [dense_rows]
    pos = dense_rows.shape[0]
    for gi, g in enumerate(groups):
        cells = np.flatnonzero(comp == g)
        idx[gi, : cells.shape[0]] = cells
        rws = np.flatnonzero(row_comp == g)
        for si, rw in enumerate(rws):
            Wb[gi, si, :, : cells.shape[0]] = W[rw][:, cells]
            rowid[gi, si] = pos
            pos += 1
        perm.append(rws)
    return np.concatenate(perm), np.ascontiguousarray(W[dense_rows]), dict(
        W=Wb, idx=idx, rowid=rowid)


def ritz_lanczos_W(blocks, nbr, precond, b, k: int = 40, n_ritz: int = 8,
                   project_mean: bool = True, matvec=None, mask=None):
    """Device half of the Ritz harvest: k steps of preconditioned Lanczos
    from rhs ``b``, returning the ``n_ritz`` smallest normalized Ritz
    fields W (n_ritz, nd, nc).  Pair with :func:`ritz_galerkin_host` for
    the deflation Galerkin -- see build_ritz_deflation.

    ``project_mean`` removes the global constant from the seed (the EMI
    nullspace convention); pass False for regular operators (KNP).
    ``matvec`` overrides the block-ELL apply (pair-layout path).
    ``mask`` (b-shaped, 0/1): live entries -- the projection averages over
    and re-masks to them (the pair layout's dead self-pair halves must
    stay exactly zero so the harvested fields convert faithfully back to
    cell layout)."""
    from ..ops.spmv import bell_matvec

    shape = b.shape
    mv = matvec if matvec is not None else (
        lambda v: bell_matvec(blocks, nbr, v))

    def dot(a, c):
        return jnp.einsum("ic,ic->", a, c)

    # preconditioned Lanczos: r-basis Qr, z-basis Qz, T tridiagonal.
    # proj: the production PCG projects the constant nullspace out of x
    # and r EVERY iteration (krylov.pcg); without the same here, the
    # chunk-coarse piece of the preconditioner reintroduces the constant
    # over the k iterations and the harvest collapses onto it (A-energy
    # ~0 -> 1/sqrt(dg) blowup; see ritz_galerkin_host).
    if mask is not None:
        w_m = mask.astype(b.dtype)
        wsum = jnp.sum(w_m)
        if project_mean:
            proj = lambda v: (v - jnp.sum(v * w_m) / wsum) * w_m
        else:
            proj = lambda v: v * w_m
    elif project_mean:
        proj = lambda v: v - jnp.mean(v)
    else:
        proj = lambda v: v
    r = proj(b)
    z = proj(precond(r))
    beta0 = jnp.sqrt(jnp.maximum(dot(r, z), 1e-30))
    Qr = jnp.zeros((k, *shape), dtype=b.dtype).at[0].set(r / beta0)
    Qz = jnp.zeros((k, *shape), dtype=b.dtype).at[0].set(z / beta0)
    alphas = jnp.zeros(k, dtype=b.dtype)
    betas = jnp.zeros(k, dtype=b.dtype)

    def body(j, st):
        Qr, Qz, alphas, betas = st
        qz = Qz[j]
        w = mv(qz)
        w = w - jnp.where(j > 0, 1.0, 0.0) * betas[j - 1] * Qr[j - 1]
        a = dot(qz, w)
        w = w - a * Qr[j]
        # full reorthogonalization in the M-inner product (k is small)
        coef = jnp.einsum("kic,ic->k", Qz, w)
        w = w - jnp.einsum("k,kic->ic", coef, Qr)
        w = proj(w)
        z = proj(precond(w))
        bnew = jnp.sqrt(jnp.maximum(dot(w, z), 1e-30))
        Qr = Qr.at[j + 1].set(jnp.where(j + 1 < k, 1.0, 0.0) * w / bnew)
        Qz = Qz.at[j + 1].set(jnp.where(j + 1 < k, 1.0, 0.0) * z / bnew)
        alphas = alphas.at[j].set(a)
        betas = betas.at[j].set(bnew)
        return (Qr, Qz, alphas, betas)

    Qr, Qz, alphas, betas = jax.lax.fori_loop(0, k - 1, body,
                                              (Qr, Qz, alphas, betas))
    # last alpha
    a_last = dot(Qz[k - 1], mv(Qz[k - 1]))
    alphas = alphas.at[k - 1].set(a_last)
    T = (jnp.diag(alphas) + jnp.diag(betas[: k - 1], 1)
         + jnp.diag(betas[: k - 1], -1))
    theta, Y = jnp.linalg.eigh(T.astype(jnp.float64))
    idx = jnp.argsort(theta)[:n_ritz]
    W = jnp.einsum("kv,kic->vic", Y[:, idx].astype(b.dtype), Qz)  # (r, nd, nc)
    # normalize fields
    W = W / jnp.sqrt(jnp.einsum("vic,vic->v", W, W))[:, None, None]
    return W


def _host(x, dtype=None):
    """Device->host pull that also works for multi-process global arrays.

    Under jax.distributed (parallel/multihost.py) the assembled blocks and
    the harvested Ritz fields are globally sharded across processes, and a
    plain ``np.asarray`` raises "spans non-addressable devices".  Every
    process reaches this point collectively (attach_pc is part of the SPMD
    program), so a process_allgather is safe and hands each process the
    full global value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x) if dtype is None else np.asarray(x, dtype=dtype)


def np_two_level_apply(data, P_diag, agg_size: int):
    """NUMPY float64 mirror of :func:`two_level_apply_fn` (additive form,
    incl. compartment / moment / three-level pieces when present in
    ``data``).  Used by the host Ritz harvest: the f32 device Lanczos is
    chaotic (ulp-level program changes resample its deflation quality --
    measured 94 vs 227 first-step EMI iterations on the flagship from one
    reassociated einsum), while a float64 recursion is deterministic and
    cannot collapse onto the nullspace."""
    d = {k: _host(v, np.float64) for k, v in data.items()}
    Pd = _host(P_diag, np.float64)
    Pinv = np.linalg.inv(np.moveaxis(Pd, -1, 0))      # (nc, nd, nd)
    Pinv = np.moveaxis(Pinv, 0, -1)                   # (nd, nd, nc)
    nd, _, nc = Pd.shape
    inv, s = d["inv"], d["s"]
    As = d.get("As")

    def dense_solve(rc):
        rs = s * rc
        z = inv @ rs
        if As is not None:
            z = z + inv @ (rs - As @ z)
        return s * z

    if "d1inv" in d:
        d1inv = d["d1inv"]
        n_agg = d1inv.shape[0]
        n2 = inv.shape[0]
        k2 = -(-n_agg // n2)
        pad2 = n2 * k2 - n_agg

        def coarse_solve(rc):
            rc2 = np.pad(rc, (0, pad2)).reshape(n2, k2).sum(axis=1)
            z2 = dense_solve(rc2)
            return rc * d1inv + np.repeat(z2, k2)[:n_agg]
    else:
        n_agg = inv.shape[0]
        coarse_solve = dense_solve
    pad = n_agg * agg_size - nc

    def apply(r):
        z = np.einsum("ijc,jc->ic", Pinv, r)
        rs = r.sum(axis=0)
        rc = np.pad(rs, (0, pad)).reshape(n_agg, agg_size).sum(axis=1)
        zc = np.repeat(coarse_solve(rc), agg_size)[:nc]
        if "comp_inv" in d:
            invc, sc, OH = d["comp_inv"], d["comp_s"], d["comp_onehot"]
            Asc = d["comp_As"]
            rsc = sc * (OH @ rs)
            zco = invc @ rsc
            zco = zco + invc @ (rsc - Asc @ zco)
            zc = zc + (sc * zco) @ OH
        out = z + zc[None, :]
        if "momb_W" in d:
            # compartment-BLOCKED moment rows: mirror of the momb branch
            # in two_level_apply_fn (dense rows first, then blocked rows
            # gathered over their compartment's cells; pad rowid nw_m
            # dumps into a scratch slot, pad idx 0 adds zeros)
            inv_m, s_m = d["mom_inv"], d["mom_s"]
            Wb = d["momb_W"]
            idx_b = np.asarray(data["momb_idx"]).astype(np.int64)
            rowid_b = np.asarray(data["momb_rowid"]).astype(np.int64)
            nw_m = s_m.shape[0]
            Wm = d.get("mom_W")
            nw_d = Wm.shape[0] if Wm is not None else 0
            rw = np.zeros(nw_m + 1)
            if Wm is not None:
                rw[:nw_d] = np.einsum("wic,ic->w", Wm, r)
            rwb = np.einsum("grdl,dgl->gr", Wb, r[:, idx_b])
            np.add.at(rw, rowid_b.ravel(), rwb.ravel())
            al = s_m * (inv_m @ (s_m * rw[:nw_m]))
            if Wm is not None:
                out = out + np.einsum("w,wic->ic", al[:nw_d], Wm)
            alp = np.concatenate([al, np.zeros(1)])
            flat = np.einsum("gr,grdl->dgl", alp[rowid_b],
                             Wb).reshape(nd, -1)
            for i in range(nd):
                np.add.at(out[i], idx_b.ravel(), flat[i])
        elif "mom_W" in d:
            Wm, inv_m, s_m = d["mom_W"], d["mom_inv"], d["mom_s"]
            rw = s_m * np.einsum("wic,ic->w", Wm, r)
            out = out + np.einsum("w,wic->ic", s_m * (inv_m @ rw), Wm)
        if "ritz_W" in d:
            Wr, inv_r, s_r = d["ritz_W"], d["ritz_inv"], d["ritz_s"]
            rr = s_r * np.einsum("vic,ic->v", Wr, r)
            out = out + np.einsum("v,vic->ic", s_r * (inv_r @ rr), Wr)
        return out

    return apply


def ritz_lanczos_W_host(blocks, nbr, data, P_diag, b, agg_size: int,
                        k: int = 40, n_ritz: int = 8,
                        project_mean: bool = True):
    """HOST float64 Ritz harvest: preconditioned Lanczos with full
    reorthogonalization, numerically deterministic (mirrors
    :func:`ritz_lanczos_W` but in numpy f64 -- see
    :func:`np_two_level_apply` for why).  Runs once per pc build, off the
    hot path; the device pull of blocks (~320 MB on the EMIx mesh) is the
    dominant cost.  Returns W (n_ritz, nd, nc) numpy f64 -- feed straight
    to :func:`ritz_galerkin_host`."""
    B = _host(blocks, np.float64)
    N = _host(nbr)
    precond = np_two_level_apply(data, _host(P_diag, np.float64), agg_size)

    def mv(x):
        y = np.einsum("ijc,jc->ic", B[0], x)
        for kk in range(1, B.shape[0]):
            y = y + np.einsum("ijc,jc->ic", B[kk], x[:, N[kk]])
        return y

    proj = ((lambda v: v - v.mean()) if project_mean else (lambda v: v))
    r = proj(_host(b, np.float64))
    z = proj(precond(r))
    dot = lambda a, c: float(np.einsum("ic,ic->", a, c))
    beta0 = np.sqrt(max(dot(r, z), 1e-300))
    shape = r.shape
    Qr = np.zeros((k, *shape))
    Qz = np.zeros((k, *shape))
    Qr[0], Qz[0] = r / beta0, z / beta0
    alphas = np.zeros(k)
    betas = np.zeros(k)
    for j in range(k - 1):
        w = mv(Qz[j])
        if j > 0:
            w = w - betas[j - 1] * Qr[j - 1]
        a = dot(Qz[j], w)
        w = w - a * Qr[j]
        # full reorthogonalization in the M-inner product
        coef = np.einsum("kic,ic->k", Qz[: j + 1], w)
        w = w - np.einsum("k,kic->ic", coef, Qr[: j + 1])
        w = proj(w)
        z = proj(precond(w))
        bnew = np.sqrt(max(dot(w, z), 1e-300))
        alphas[j] = a
        betas[j] = bnew
        Qr[j + 1], Qz[j + 1] = w / bnew, z / bnew
    alphas[k - 1] = dot(Qz[k - 1], mv(Qz[k - 1]))
    T = (np.diag(alphas) + np.diag(betas[: k - 1], 1)
         + np.diag(betas[: k - 1], -1))
    theta, Y = np.linalg.eigh(T)
    idx = np.argsort(theta)[:n_ritz]
    W = np.einsum("kv,kic->vic", Y[:, idx], Qz)
    return W / np.sqrt(np.einsum("vic,vic->v", W, W))[:, None, None]


def ritz_galerkin_host(blocks, nbr, W, ridge: float = 1e-8,
                       project_mean: bool = False, drop_rel: float = 1e-6,
                       out_dtype=None, device_W: bool = True):
    """HOST-side float64 deflation Galerkin of the Ritz fields.

    Round 2 measured that an f32 Galerkin of these small-A-energy modes is
    noise-dominated and actively HURTS; the round-3 fix computed it "in
    f64" on device -- but on TPU backends with x64 disabled (every
    production process) jnp silently truncates float64 to float32, so the
    fix never actually engaged on hardware (round-4 discovery: the
    UserWarning in the bench logs).  numpy's f64 is unconditional, and the
    harvest runs once per pc build/refresh, off the hot path, so the
    device->host pull (~30 MB of W + blocks on the EMIx mesh) is an
    acceptable setup cost.

    ``project_mean`` (EMI): remove the global-constant component from each
    field in f64.  The f32 Lanczos reintroduces the EMI nullspace over its
    40 iterations (the chunk-coarse apply has no zero-mean guarantee); a
    field that collapses onto the constant has A-energy ~0 and its
    1/sqrt(dg) equilibration injects ~1e12-amplified noise into every
    apply -- measured on CPU-f32 EMIx as phi_M exploding to +-1e5 mV with
    every Krylov solve at its cap, while the same build on TPU passed on
    rounding luck (ritz_s there stayed ~1e3, here 1.9e6).

    ``drop_rel``: fields whose A-energy falls below drop_rel * max are
    ZEROED (W row and its scale), which removes their contribution while
    keeping shapes static for the jitted apply."""
    B = _host(blocks, np.float64)                     # (K, nd, nd, nc)
    N = _host(nbr)
    Wh = _host(W, np.float64)                         # (v, nd, nc)
    if project_mean:
        Wh = Wh - Wh.mean(axis=(1, 2), keepdims=True)
        nrm = np.sqrt((Wh ** 2).sum(axis=(1, 2), keepdims=True))
        # a field that WAS (numerically) the constant vanishes here; zero
        # it rather than dividing by ~0
        ok = nrm > 1e-3
        Wh = np.where(ok, Wh / np.maximum(nrm, 1e-30), 0.0)
    AW = np.einsum("ijc,vjc->vic", B[0], Wh)
    for s in range(1, B.shape[0]):
        AW += np.einsum("ijc,vjc->vic", B[s], Wh[:, :, N[s]])
    G = np.einsum("vic,wic->vw", Wh, AW)
    G = 0.5 * (G + G.T)
    dg = np.diagonal(G).copy()
    live = dg > drop_rel * max(dg.max(), 1e-300)
    Wh = np.where(live[:, None, None], Wh, 0.0)
    sg = np.where(live, 1.0 / np.sqrt(np.maximum(dg, 1e-300)), 0.0)
    Gs = G * sg[:, None] * sg[None, :]
    Gs = Gs + ridge * np.eye(Gs.shape[0])
    Gs[~live, :] = 0.0
    Gs[:, ~live] = 0.0
    Gs[~live, ~live] = 1.0
    # eigenvalue-truncated pseudo-inverse instead of a plain inverse: an
    # f32 Lanczos near-breakdown can hand us near-parallel Ritz fields
    # whose equilibrated Galerkin has eigenvalues at rounding scale; a
    # plain inverse amplifies the f32 APPLY through those directions by
    # ~1/lambda and can make the preconditioner effectively singular.
    # Truncation drops only the breakdown directions.
    lam, V = np.linalg.eigh(Gs)
    keep = lam > 1e-6 * lam.max()
    inv = (V[:, keep] / lam[keep]) @ V[:, keep].T
    # numpy W (the host-built moment path) must NOT round-trip through
    # jnp.asarray just for its dtype -- that is a full-size device copy
    # (1.5 GB at 995k tets order 3, the OOM of ROADMAP r5 item 2)
    if out_dtype is None:
        out_dtype = np.float32 if isinstance(W, np.ndarray) else W.dtype
    dt = np.dtype(getattr(out_dtype, "name", out_dtype))
    # device_W=False hands W back as HOST numpy: the compartment-blocked
    # moment path re-stores it (block_moment_rows) and must never put the
    # dense (nw, nd, nc) array on device at all
    return {"ritz_W": (jnp.asarray(Wh.astype(dt)) if device_W
                       else Wh.astype(dt)),
            "ritz_inv": jnp.asarray(inv.astype(dt)),
            "ritz_s": jnp.asarray(sg.astype(dt))}


def build_ritz_deflation(blocks, nbr, precond, b, k: int = 40,
                         n_ritz: int = 8, ridge: float = 1e-8):
    """Harvest approximate small-eigenvalue modes of the PRECONDITIONED EMI
    operator (preconditioned Lanczos on device, :func:`ritz_lanczos_W`)
    and build their deflation Galerkin in genuine float64 on the host
    (:func:`ritz_galerkin_host`).  Runs once per pc build/refresh, off the
    hot path.  Returns fields to merge into the two-level data dict
    ('ritz_W', 'ritz_inv', 'ritz_s'), applied like the moment correction
    in two_level_apply_fn.  NOT jittable as a whole (host Galerkin);
    callers jit the Lanczos half only."""
    W = ritz_lanczos_W(blocks, nbr, precond, b, k=k, n_ritz=n_ritz)
    return ritz_galerkin_host(blocks, nbr, W, ridge=ridge, project_mean=True)


def build_two_level(blocks, nbr, agg_size: int, sym: bool = True,
                    comp_onehot=None, comp_ids=None, extra_diag=None,
                    mass_diag=None, v=None, max_dense: int | None = 4096,
                    ridge: float = 1e-5):
    """Build the *frozen* coarse-level data of the two-level preconditioner:
    the dense equilibrated coarse inverse (and the compartment-deflation
    inverse).  This is the expensive part (a ~(nc/agg)^3 Cholesky + explicit
    inverse, ~200 ms on the EMIx mesh) -- round 1 rebuilt it inside every
    Krylov solve; here it runs once at setup and the per-step solves reuse
    it.  A preconditioner built from slightly stale blocks is still a valid
    preconditioner (the Krylov iteration corrects for the difference); only
    the block-Jacobi smoother is rebuilt from fresh blocks each solve.

    ``v``: precomputed per-slot block value sums (K, nc) -- the only thing
    ``blocks`` is read for.  The pair-layout path passes
    ops.pairs.pair_v_sums (its blocks live in a different shape); then
    ``blocks`` may be None and ``nbr``/chunks index the PAIR axis.

    ``max_dense``: cap on the dense coarse size.  When nc/agg_size exceeds
    it, the build switches to a THREE-level hierarchy: the level-1 chunk
    system (size nc/agg_size) is treated by a Jacobi sweep on its
    cancellation-free diagonal (``d1inv``, no dense matrix is ever formed),
    and the dense equilibrated inverse moves up to chunks of
    ``agg_size * k2`` cells with k2 = ceil(n_agg / max_dense) -- a
    BPX-style additive hierarchy.  Without it, a ~1M-cell mesh at agg 64
    needs a 15552^2 dense coarse (967 MB + a blocked-Cholesky OOM on v5e,
    ROADMAP round-4 scaling study), and growing agg_size instead weakens
    the coarse (EMI window iterations 103 -> 1475 measured at agg 256 on
    the 995k-tet bundle).

    Returns a pytree of arrays usable as a jit argument."""
    if v is None:
        # unrolled over the tiny (nd, nd) axes: a .sum(axis=(1,2)) reduce
        # can make XLA transpose-copy the whole block tensor with nd minor
        # (32x lane padding at ~1M cells); slice-adds on (K, nc) need none
        nd_b = blocks.shape[1]
        v = sum(blocks[:, i, j] for i in range(nd_b)
                for j in range(nd_b))               # (K, nc)
    nc = v.shape[1]
    n_agg = -(-nc // agg_size)
    if max_dense is not None and n_agg > max_dense:
        # ---- three-level: Jacobi on the level-1 chunk system + dense at
        # agg_size*k2 (ceil(ceil(nc/a)/k) == ceil(nc/(a*k)), so the
        # recursive call's chunks nest exactly: level-1 chunk i belongs to
        # dense super-chunk i // k2)
        k2 = -(-n_agg // max_dense)
        data = build_two_level(None, nbr, agg_size * k2, sym=sym,
                               comp_onehot=comp_onehot, comp_ids=comp_ids,
                               extra_diag=extra_diag, mass_diag=mass_diag,
                               v=v, max_dense=None, ridge=ridge)
        pad = n_agg * agg_size - nc
        agg = jnp.arange(nc + pad, dtype=jnp.int32) // agg_size
        cross = agg[jnp.pad(nbr, ((0, 0), (0, pad)))] != agg[None, :]
        vm = jnp.where(cross, jnp.pad(v, ((0, 0), (0, pad))), 0.0)
        d1 = -vm.sum(axis=0).reshape(n_agg, agg_size).sum(axis=1)
        if mass_diag is not None:
            d1 = d1 + jnp.pad(mass_diag, (0, pad)).reshape(
                n_agg, agg_size).sum(axis=1)
        if extra_diag is not None:
            d1 = d1 + jnp.pad(extra_diag.sum(axis=(0, 1)), (0, pad)).reshape(
                n_agg, agg_size).sum(axis=1)
        dmax1 = jnp.max(d1)
        floor1 = jnp.maximum(1e-12 * dmax1,
                             jnp.asarray(jnp.finfo(d1.dtype).tiny,
                                         dtype=d1.dtype))
        # dead padded chunks get an exact zero (their residual is zero too)
        data["d1inv"] = jnp.where(d1 > floor1,
                                  1.0 / jnp.maximum(d1, floor1), 0.0)
        return data
    pad = n_agg * agg_size - nc
    agg = jnp.arange(nc + pad, dtype=jnp.int32) // agg_size
    cross_chunk = agg[jnp.pad(nbr, ((0, 0), (0, pad)))] != agg[None, :]
    vm_chunk = jnp.where(cross_chunk, jnp.pad(v, ((0, 0), (0, pad))), 0.0)
    rows = jnp.broadcast_to(agg[None, :], vm_chunk.shape)
    cols = agg[jnp.pad(nbr, ((0, 0), (0, pad)))]
    Ac = jnp.zeros((n_agg, n_agg), dtype=v.dtype)
    Ac = Ac.at[rows.ravel(), cols.ravel()].add(vm_chunk.ravel())
    crossing_rowsum = (
        jnp.pad(vm_chunk.sum(axis=0), (0, 0)).reshape(n_agg, agg_size).sum(axis=1)
    )
    diag = -crossing_rowsum
    if mass_diag is not None:
        diag = diag + jnp.pad(mass_diag, (0, pad)).reshape(
            n_agg, agg_size
        ).sum(axis=1)
    if extra_diag is not None:
        diag = diag + jnp.pad(extra_diag.sum(axis=(0, 1)), (0, pad)).reshape(
            n_agg, agg_size
        ).sum(axis=1)
    Ac = Ac.at[jnp.arange(n_agg), jnp.arange(n_agg)].add(diag)
    if not sym:
        Ac = 0.5 * (Ac + Ac.T)
    rank1 = extra_diag is None and mass_diag is None
    d = jnp.diagonal(Ac)
    s = _equilibration_scale(d)
    As = Ac * s[:, None] * s[None, :]
    if rank1:
        As = As + (1.0 / n_agg) * jnp.ones_like(As)
    # small diagonal shift before the Cholesky: f32 Galerkin noise can push
    # a near-null compartment-constant mode of the equilibrated coarse
    # matrix slightly INDEFINITE (measured -1.2e-7 of lambda_max on the
    # elongated bifurcating-neuron mesh), and a NaN-poisoned cho_solve
    # silently zeroes the whole preconditioner (PCG "converges" in 0
    # iterations).  The default 1e-5 of the unit equilibrated diagonal sits
    # ~100x above the observed noise, and direct f64 measurement
    # (tools/exp_coarse_spectrum.py) shows the only modes below it at any
    # measured chunk count are the compartment constants already handled
    # by deflation + the masked projection -- the smallest GENUINE coarse
    # modes are 2+ orders above.  ``ridge`` stays tunable; sub-default
    # values engage the NaN-fallback ladder below.  (An eigh-clamped
    # pseudo-inverse is cleaner but jnp.linalg.eigh at n_agg ~ 1000 is
    # prohibitively slow to compile/run on the remote TPU backend.)
    As = As + ridge * jnp.eye(n_agg, dtype=As.dtype)
    fac = jax.scipy.linalg.cho_factor(As)
    inv = jax.scipy.linalg.cho_solve(fac, jnp.eye(n_agg, dtype=As.dtype))
    if ridge < 1e-5:
        # NaN-fallback ladder: a sub-default ridge may leave the f32
        # coarse indefinite (measured at 995k tets: ridge=1e-7 NaN-poisons
        # the Cholesky and PCG silently "converges" in 0 iterations).
        # Refactor at the safe 1e-5 and select -- pc-build-only cost, and
        # the default path (ridge >= 1e-5) compiles exactly as before.
        fac2 = jax.scipy.linalg.cho_factor(
            As + (1e-5 - ridge) * jnp.eye(n_agg, dtype=As.dtype))
        inv2 = jax.scipy.linalg.cho_solve(
            fac2, jnp.eye(n_agg, dtype=As.dtype))
        inv = jnp.where(jnp.all(jnp.isfinite(inv)), inv, inv2)

    # arrays only: the dict is passed straight through jit boundaries
    # (static metadata -- agg_size, refine -- travels separately)
    data = {"inv": inv, "s": s}
    if sym:
        data["As"] = As

    if comp_onehot is not None:
        comp_onehot = jnp.asarray(comp_onehot)
        if comp_ids is None:
            comp_ids = jnp.argmax(comp_onehot, axis=0).astype(jnp.int32)
        comp_ids = jnp.asarray(comp_ids, dtype=jnp.int32)   # nbr may be traced
        n_comp = comp_onehot.shape[0]
        crossing = comp_ids[nbr] != comp_ids[None, :]
        vm = jnp.where(crossing, v, 0.0)
        rowsc = jnp.broadcast_to(comp_ids[None, :], vm.shape)
        Acomp = jnp.zeros((n_comp, n_comp), dtype=v.dtype)
        Acomp = Acomp.at[rowsc.ravel(), comp_ids[nbr].ravel()].add(vm.ravel())
        offdiag_rowsum = comp_onehot @ vm.sum(axis=0)
        Acomp = Acomp.at[jnp.arange(n_comp), jnp.arange(n_comp)].add(
            -offdiag_rowsum
        )
        if not sym:
            Acomp = 0.5 * (Acomp + Acomp.T)
        dc = jnp.diagonal(Acomp)
        sc = _equilibration_scale(dc)
        Asc = Acomp * sc[:, None] * sc[None, :] + (1.0 / n_comp) * jnp.ones(
            (n_comp, n_comp), dtype=Acomp.dtype
        )
        facc = jax.scipy.linalg.cho_factor(Asc)
        invc = jax.scipy.linalg.cho_solve(facc, jnp.eye(n_comp, dtype=Asc.dtype))
        data["comp_inv"] = invc
        data["comp_s"] = sc
        data["comp_As"] = Asc
        data["comp_onehot"] = comp_onehot
    return data


def two_level_apply_fn(data, P_diag, agg_size: int,
                       matvec: Callable | None = None,
                       omega: float = 2.0 / 3.0,
                       Pinv=None) -> Callable:
    """Per-solve preconditioner apply from frozen coarse `data` (see
    build_two_level) and the *current* block-Jacobi diagonal.  The apply is
    gather/scatter-free: reshape-sum restrict, broadcast prolong, skinny
    matmuls for the compartment projection, dense GEMVs for the coarse.

    `Pinv`: optionally precomputed block-Jacobi inverse (hoisted out of a
    vmap or solve loop); computed from `P_diag` otherwise."""
    if Pinv is None:
        Pinv = block_jacobi_inverse(P_diag)
    nd = P_diag.shape[0]
    nc = P_diag.shape[2]
    inv, s = data["inv"], data["s"]
    refine = "As" in data
    As = data.get("As")

    def dense_solve(rc):
        rs = s * rc
        z = inv @ rs
        if refine:
            z = z + inv @ (rs - As @ z)
        return s * z

    # three-level (build_two_level max_dense): the cell residual restricts
    # to n1 level-1 chunks treated by a Jacobi sweep on d1inv, and the
    # dense solve moves up to n2 = ceil(n1/k2) super-chunks
    three = "d1inv" in data
    if three:
        d1inv = data["d1inv"]
        n_agg = d1inv.shape[0]
        n2 = inv.shape[0]
        k2 = -(-n_agg // n2)
        pad2 = n2 * k2 - n_agg

        def coarse_solve(rc):
            rc2 = jnp.pad(rc, (0, pad2)).reshape(n2, k2).sum(axis=1)
            z2 = dense_solve(rc2)
            return rc * d1inv + jnp.broadcast_to(
                z2[:, None], (n2, k2)).reshape(-1)[:n_agg]
    else:
        n_agg = inv.shape[0]
        coarse_solve = dense_solve
    pad = n_agg * agg_size - nc

    comp = "comp_inv" in data
    if comp:
        invc, sc, OH = data["comp_inv"], data["comp_s"], data["comp_onehot"]
        Asc = data["comp_As"]

        def comp_solve(rcomp):
            # one refinement sweep: the compartment system is the
            # f32-fragile piece (tiny membrane-scale eigenvalues)
            rsc = sc * rcomp
            zc = invc @ rsc
            zc = zc + invc @ (rsc - Asc @ zc)
            return sc * zc

    mom = "mom_W" in data
    if mom:
        Wm, inv_m, s_m = data["mom_W"], data["mom_inv"], data["mom_s"]
    momb = "momb_W" in data
    if momb:
        # compartment-BLOCKED moment rows (block_moment_rows): dense rows
        # (big compartments) in mom_W, blocked rows as (n_g, rpg, nd, L)
        # gathered/scattered at (n_g, L) static cell indices
        Wb = data["momb_W"]
        idx_b, rowid_b = data["momb_idx"], data["momb_rowid"]
        inv_m, s_m = data["mom_inv"], data["mom_s"]
        nw_m = s_m.shape[0]
        nw_d = data["mom_W"].shape[0] if mom else 0
    ritz = "ritz_W" in data
    if ritz:
        Wr, inv_r, s_r = data["ritz_W"], data["ritz_inv"], data["ritz_s"]

    def coarse(r):
        rs = r.sum(axis=0)                               # (nc,)
        rc = jnp.pad(rs, (0, pad)).reshape(n_agg, agg_size).sum(axis=1)
        zc = coarse_solve(rc)
        z = jnp.broadcast_to(
            zc[:, None], (n_agg, agg_size)
        ).reshape(-1)[:nc]
        if comp:
            z = z + comp_solve(OH @ rs) @ OH
        out = jnp.broadcast_to(z[None, :], (nd, nc))
        if momb:
            rw = jnp.zeros(nw_m + 1, dtype=r.dtype)
            if mom:
                rw = rw.at[:nw_d].set(jnp.einsum("wic,ic->w", Wm, r))
            rg = r[:, idx_b]                             # (nd, n_g, L)
            rwb = jnp.einsum("grdl,dgl->gr", Wb, rg)
            rw = rw.at[rowid_b.ravel()].add(rwb.ravel())[:nw_m]
            al = s_m * (inv_m @ (s_m * rw))
            if mom:
                out = out + jnp.einsum("w,wic->ic", al[:nw_d], Wm)
            alp = jnp.concatenate([al, jnp.zeros(1, dtype=al.dtype)])
            vals = jnp.einsum("gr,grdl->dgl", alp[rowid_b], Wb)
            out = out.at[:, idx_b.ravel()].add(vals.reshape(nd, -1))
        elif mom:
            rw = s_m * jnp.einsum("wic,ic->w", Wm, r)
            out = out + jnp.einsum("w,wic->ic", s_m * (inv_m @ rw), Wm)
        if ritz:
            rr = s_r * jnp.einsum("vic,ic->v", Wr, r)
            out = out + jnp.einsum("v,vic->ic", s_r * (inv_r @ rr), Wr)
        return out

    if matvec is None:
        def apply(r):                      # additive: BJ + coarse (+ comp)
            return block_jacobi_apply(Pinv, r) + coarse(r)
        return apply

    def apply(r):                          # symmetric V-cycle: BJ, coarse, BJ
        z = omega * block_jacobi_apply(Pinv, r)
        r1 = r - matvec(z)
        z = z + coarse(r1)
        r2 = r - matvec(z)
        return z + omega * block_jacobi_apply(Pinv, r2)

    return apply


def two_level_apply_batched(data, P_diag, agg_size: int,
                            matvec: Callable | None = None,
                            omega: float = 2.0 / 3.0) -> Callable:
    """Batched two-level apply: `data` leaves and `P_diag` carry a leading
    system axis m; the returned apply maps (m, nd, nc) -> (m, nd, nc).
    The block-Jacobi inverses are hoisted out of the per-iteration closure
    so Krylov loops don't re-invert every apply.  Pairs with
    krylov.gmres_batched / ops.spmv.bell_matvec_multi for the multi-ion
    KNP solve.

    Additive (BJ + coarse) by default; with ``matvec`` (the BATCHED
    operator apply sharing one gather across systems) the corrections wrap
    into a symmetric V-cycle (BJ, coarse, BJ) at the price of two extra
    batched matvecs per apply.

    A zero-matvec "multiplicative" cycle approximating the post-smoothing
    residual in coarse space (R(r - A z) ~ R r - Ac R z) was tried in
    round 4 and is ALGEBRAICALLY VACUOUS: with the same Ac in the residual
    and the solve, P Ac^{-1}(R r - Ac R z) = P Ac^{-1} R r - P R z -- the
    correction never sees A's true action on the smoothed iterate, it just
    subtracts z's chunk means.  Measured on EMIx: KNP GMRES stalls at the
    iteration cap.  Any real multiplicative coupling needs the fine
    matvec (ROADMAP.md round-4 notes)."""
    Pinv = jax.vmap(block_jacobi_inverse)(P_diag)

    def bj(r):
        return jnp.einsum("mijc,mjc->mic", Pinv, r)

    def coarse_only(r):
        def one(d, rs):
            nd, nc = rs.shape
            inv, s = d["inv"], d["s"]

            def dense_solve(rc2):
                rc2 = s * rc2
                z2 = inv @ rc2
                if "As" in d:
                    z2 = z2 + inv @ (rc2 - d["As"] @ z2)
                return s * z2

            if "d1inv" in d:               # three-level (build_two_level)
                d1inv = d["d1inv"]
                n_agg = d1inv.shape[0]
                n2 = inv.shape[0]
                k2 = -(-n_agg // n2)
                pad2 = n2 * k2 - n_agg

                def coarse_solve(rc1):
                    zc2 = dense_solve(jnp.pad(rc1, (0, pad2))
                                      .reshape(n2, k2).sum(axis=1))
                    return rc1 * d1inv + jnp.broadcast_to(
                        zc2[:, None], (n2, k2)).reshape(-1)[:n_agg]
            else:
                n_agg = inv.shape[0]
                coarse_solve = dense_solve
            pad = n_agg * agg_size - nc
            rsum = rs.sum(axis=0)
            rc = jnp.pad(rsum, (0, pad)).reshape(n_agg, agg_size).sum(axis=1)
            z = coarse_solve(rc)
            zf = jnp.broadcast_to(z[:, None], (n_agg, agg_size)).reshape(-1)[:nc]
            out = jnp.broadcast_to(zf[None, :], (nd, nc))
            if "ritz_W" in d:      # per-ion Ritz deflation (knp_ritz)
                Wr, inv_r, s_r = d["ritz_W"], d["ritz_inv"], d["ritz_s"]
                rr = s_r * jnp.einsum("vic,ic->v", Wr, rs)
                out = out + jnp.einsum("v,vic->ic", s_r * (inv_r @ rr), Wr)
            return out

        return jax.vmap(one)(data, r)

    if matvec is None:
        def apply(r):
            return bj(r) + coarse_only(r)
        return apply

    def apply(r):
        z = omega * bj(r)
        z = z + coarse_only(r - matvec(z))
        return z + omega * bj(r - matvec(z))

    return apply


def make_two_level(blocks, P_diag, nbr, agg_size: int, sym: bool = True,
                   matvec: Callable | None = None, omega: float = 2.0 / 3.0,
                   comp_onehot=None, comp_ids=None, extra_diag=None,
                   mass_diag=None, ridge: float = 1e-5) -> Callable:
    """Build-and-apply in one go (see build_two_level / two_level_apply_fn).

    Additive combination of three SPD pieces:
      * block-Jacobi smoother from `P_diag` (nd, nd, nc) -- high frequency;
      * aggregate coarse solve over *contiguous fixed-size Morton chunks*
        (`extra_diag` (nd, nd, nc) adds the B-operator mass regularization
        for the singular EMI case) -- bulk low frequency;
      * exact *compartment deflation* (`comp_onehot` (n_comp, nc): indicator
        matrix of the connected components of the same-subdomain cell
        graph): the per-compartment constant modes have eigenvalues
        ~ C_phi * membrane area, orders of magnitude below the bulk
        spectrum; solving their Galerkin system exactly (a tiny
        uniform-scale matrix, f32-safe) replaces BoomerAMG's
        strength-based coarsening for the EMI operator.

    CANCELLATION-FREE Galerkin assembly (build_two_level): a naive R^T A R
    sums each chunk's O(1) bulk entries down to the tiny boundary scale,
    which is catastrophic in f32 (indefinite coarse matrices -> NaN
    Cholesky).  Off-diagonals use only chunk-CROSSING entries; diagonals
    come from the exact identity A(non-mass part) @ 1 = 0, plus the
    explicitly supplied positive parts (`mass_diag` (nc,): the KNP mass
    term; `extra_diag`: the EMI B-operator regularization).

    THE HOT-PATH RULE: the per-iteration apply contains NO gathers or
    scatters -- TPU random gather runs ~2 orders of magnitude below HBM
    bandwidth.  Contiguous chunks make restrict/prolong a reshape-sum /
    broadcast; the compartment projection is a skinny matmul (MXU).
    Scatters appear only in the once-per-setup Galerkin coarse assembly.

    Prefer build_two_level (once, at setup) + two_level_apply_fn (per
    solve) in production: the dense coarse inverse costs ~200 ms on the
    EMIx mesh and must not be rebuilt per step.

    `sym=False` symmetrizes the coarse operators (upwinded KNP).  With
    `matvec`, wraps the corrections in a symmetric V-cycle instead.

    Layout: blocks (K, nd, nd, nc); residuals (nd, nc).
    """
    data = build_two_level(blocks, nbr, agg_size, sym=sym,
                           comp_onehot=comp_onehot, comp_ids=comp_ids,
                           extra_diag=extra_diag, mass_diag=mass_diag,
                           ridge=ridge)
    return two_level_apply_fn(data, P_diag, agg_size, matvec=matvec,
                              omega=omega)
