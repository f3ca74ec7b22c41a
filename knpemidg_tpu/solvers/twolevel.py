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


def coarse_matrix(blocks, nbr, agg, n_agg):
    """A_c[a,b] = sum over cell rows in a, neighbor cols in b of block sums.

    blocks (K, nd, nd, nc), nbr (K, nc), agg (nc,)."""
    v = blocks.sum(axis=(1, 2))                 # (K, nc)
    rows = jnp.broadcast_to(agg[None, :], v.shape)
    cols = agg[nbr]
    Ac = jnp.zeros((n_agg, n_agg), dtype=blocks.dtype)
    return Ac.at[rows.ravel(), cols.ravel()].add(v.ravel())


def _dense_spd_inverse(Ac, rank1: bool = False, refine: bool = True):
    """Equilibrated explicit inverse of a (near-)SPD dense matrix.

    Symmetric diagonal scaling brings the pivots to O(1) so the f32
    Cholesky on TPU doesn't break down on badly scaled coarse operators;
    with `rank1`, the (exactly singular) global-constant direction is
    shifted by a rank-one O(1) term after scaling.  Returns apply(rc)."""
    d = jnp.diagonal(Ac)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30 * jnp.max(d)))
    As = Ac * s[:, None] * s[None, :]
    if rank1:
        n = Ac.shape[0]
        As = As + (1.0 / n) * jnp.ones_like(As)
    fac = jax.scipy.linalg.cho_factor(As)
    inv = jax.scipy.linalg.cho_solve(fac, jnp.eye(As.shape[0], dtype=As.dtype))

    def apply(rc):
        # explicit inverse (GEMVs; triangular solves are sequential and slow
        # per Krylov iteration on TPU); `refine` adds one iterative-
        # refinement sweep in the scaled space -- needed for the
        # ill-conditioned EMI coarse in f32, skippable for the well-scaled
        # mass-dominated KNP coarse (saves two GEMVs per apply)
        rs = s * rc
        z = inv @ rs
        if refine:
            z = z + inv @ (rs - As @ z)
        return s * z

    return apply


def make_two_level(blocks, P_diag, nbr, agg_size: int, sym: bool = True,
                   matvec: Callable | None = None, omega: float = 2.0 / 3.0,
                   comp_onehot=None, comp_ids=None, extra_diag=None,
                   mass_diag=None) -> Callable:
    """Build the preconditioner apply for one assembled operator.

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

    THE HOT-PATH RULE: the per-iteration apply contains NO gathers or
    scatters -- TPU random gather runs ~2 orders of magnitude below HBM
    bandwidth.  Contiguous chunks make restrict/prolong a reshape-sum /
    broadcast; the compartment projection is a skinny matmul (MXU).
    Scatters appear only in the once-per-solve Galerkin coarse assembly.

    `sym=False` symmetrizes the coarse operators (upwinded KNP).  With
    `matvec`, wraps the corrections in a symmetric V-cycle instead.

    Layout: blocks (K, nd, nd, nc); residuals (nd, nc).
    """
    Pinv = block_jacobi_inverse(P_diag)
    nd = blocks.shape[1]
    nc = blocks.shape[3]
    n_agg = -(-nc // agg_size)
    pad = n_agg * agg_size - nc
    agg = jnp.arange(nc + pad, dtype=jnp.int32) // agg_size

    # CANCELLATION-FREE Galerkin assembly: a naive R^T A R sums each chunk's
    # O(1) bulk entries down to the tiny boundary scale, which is
    # catastrophic in f32 (indefinite coarse matrices -> NaN Cholesky).
    # Off-diagonals use only chunk-CROSSING entries; diagonals come from the
    # exact identity A(non-mass part) @ 1 = 0, i.e. within-chunk sums equal
    # minus the crossing sums, plus the explicitly supplied positive parts
    # (`mass_diag` (nc,): the KNP mass term; `extra_diag`: the EMI
    # B-operator regularization).
    v = blocks.sum(axis=(1, 2))                     # (K, nc)
    cross_chunk = agg[jnp.pad(nbr, ((0, 0), (0, pad)))] != agg[None, :]
    vm_chunk = jnp.where(cross_chunk, jnp.pad(v, ((0, 0), (0, pad))), 0.0)
    rows = jnp.broadcast_to(agg[None, :], vm_chunk.shape)
    cols = agg[jnp.pad(nbr, ((0, 0), (0, pad)))]
    Ac = jnp.zeros((n_agg, n_agg), dtype=blocks.dtype)
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
    solve = _dense_spd_inverse(
        Ac, rank1=extra_diag is None and mass_diag is None, refine=sym
    )

    solve_comp = None
    if comp_onehot is not None:
        # Compartment Galerkin matrix from compartment-CROSSING entries only
        # (the naive R^T A R cancels O(1) bulk sums down to the tiny
        # membrane scale -- catastrophic in f32); diagonal from exact
        # row-sum-zero (A annihilates constants).
        if comp_ids is None:
            comp_ids = jnp.argmax(comp_onehot, axis=0).astype(jnp.int32)
        n_comp = comp_onehot.shape[0]
        crossing = comp_ids[nbr] != comp_ids[None, :]
        vm = jnp.where(crossing, v, 0.0)
        rowsc = jnp.broadcast_to(comp_ids[None, :], vm.shape)
        Acomp = jnp.zeros((n_comp, n_comp), dtype=blocks.dtype)
        Acomp = Acomp.at[rowsc.ravel(), comp_ids[nbr].ravel()].add(vm.ravel())
        offdiag_rowsum = comp_onehot @ vm.sum(axis=0)
        Acomp = Acomp.at[jnp.arange(n_comp), jnp.arange(n_comp)].add(
            -offdiag_rowsum
        )
        if not sym:
            Acomp = 0.5 * (Acomp + Acomp.T)
        solve_comp = _dense_spd_inverse(Acomp, rank1=True)

    def coarse(r):
        rs = r.sum(axis=0)                               # (nc,)
        # contiguous-chunk restrict: reshape-sum (no gather/scatter)
        rc = jnp.pad(rs, (0, pad)).reshape(n_agg, agg_size).sum(axis=1)
        zc = solve(rc)
        z = jnp.broadcast_to(
            zc[:, None], (n_agg, agg_size)
        ).reshape(-1)[:nc]
        if solve_comp is not None:
            # skinny-matmul projection (MXU), no gather/scatter
            rcomp = comp_onehot @ rs
            zcomp = solve_comp(rcomp)
            z = z + zcomp @ comp_onehot
        return jnp.broadcast_to(z[None, :], (nd, nc))

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
