"""Block-ELL sparse matvec, cells-last layout.

The DG operator has a fixed sparsity of K = d+2 blocks per cell row (self +
one neighbor per facet), stored dense as ``blocks (K, nd, nd, nc)`` with
the neighbor table ``nbr (K, nc)`` (slot 0 = self).  The matvec is gather +
small fused multiply-add over the lane (cell) axis -- no scatters, no MXU
needed, bandwidth-bound at ~K*nd^2 floats/row, and shards over the cell
axis with only halo gathers.

Replaces PETSc MatMult inside the Krylov loops (SURVEY.md N3).
"""
from __future__ import annotations

import jax.numpy as jnp


def bell_matvec(blocks: jnp.ndarray, nbr: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y[i,c] = sum_{k,j} blocks[k,i,j,c] * x[j, nbr[k,c]];  x, y: (nd, nc).

    Slot 0 is the diagonal (nbr[0] = identity), so only the K-1 off-diagonal
    slots pay for a gather -- TPU random gather is the single most expensive
    operation in the Krylov loop.

    NOTE on the einsum: XLA lowers it to a dot_general that keeps a
    RESIDENT transposed copy of the whole block tensor with nd on the
    lane axis (32x tile padding: 1.2 GB for the 37 MB flagship EMI
    operator, 9.5 GB at 1M cells -- the current single-chip fused-step
    mesh-size wall, ROADMAP round-4 item 9).  Both elementwise-FMA
    reformulations measured SLOWER on the hot path (6.07 and 1.60 vs
    1.33 ms/apply on the EMIx mesh), so the einsum stays; scaling past
    ~1M cells per chip goes through sharding, not this kernel."""
    y = jnp.einsum("ijc,jc->ic", blocks[0], x)
    xg = x.at[:, nbr[1:]].get(mode="promise_in_bounds")     # (nd, K-1, nc)
    return y + jnp.einsum("kijc,jkc->ic", blocks[1:], xg)


def bell_matvec_multi(blocks: jnp.ndarray, nbr: jnp.ndarray,
                      x: jnp.ndarray) -> jnp.ndarray:
    """Batched block-ELL matvec: m independent operators sharing one
    neighbor table.  blocks (m, K, nd, nd, nc), x (m, nd, nc) -> (m, nd, nc).

    THE point of this function (vs vmap(bell_matvec)): the neighbor gather
    is issued ONCE on an (m*nd, nc) array.  TPU gather cost is per-INDEX
    (~2.4 ns/index on v5e), independent of the payload width up to >=64 B,
    so m systems gather for the price of one -- whereas vmap turns the
    gather into per-index strided (nd, m, 1) slices that run ~3x slower
    than even m separate gathers.  Used by the multi-ion KNP solve
    (reference runs one PETSc KSP per ion, solver.py:683-701; here the ions
    share each Krylov iteration's gather)."""
    m, nd, nc = x.shape
    y = jnp.einsum("mijc,mjc->mic", blocks[:, 0], x)
    xf = x.reshape(m * nd, nc)
    xg = xf.at[:, nbr[1:]].get(mode="promise_in_bounds")   # (m*nd, K-1, nc)
    xg = xg.reshape(m, nd, nbr.shape[0] - 1, nc)
    return y + jnp.einsum("mkijc,mjkc->mic", blocks[:, 1:], xg)


def bell_matvec_fan(blocks: jnp.ndarray, nbr: jnp.ndarray,
                    x: jnp.ndarray) -> jnp.ndarray:
    """One operator applied to m vectors: blocks (K, nd, nd, nc),
    x (m, nd, nc) -> (m, nd, nc), one 2-D gather per slot with all m
    vectors riding the payload (TPU gather cost is per-index).  Used by
    the moment-deflation Galerkin build (45-63 fields per apply);
    vmap(bell_matvec) would issue m slow high-rank gathers instead.

    Per-SLOT gathers (same total index count as one stacked gather of all
    slots): the stacked form's (m, nd, K-1, nc) intermediate puts small
    axes in the sublane tile and pads 2.8-32x -- 15 GB and a compile OOM
    at m=45 fields on a 1M-cell mesh (ROADMAP round-4 item 9).

    Above ~0.5M cells the (i, j) contraction is additionally UNROLLED into
    elementwise lane ops: the dot_general form makes XLA materialize a
    transposed copy of the whole block tensor with nd minor (layout
    {2,1,3,0}, 32x lane padding = 9.5 GB on a 995k-cell mesh -- the
    round-4 scaling study's pc-build OOM); 16 broadcast multiplies on
    (m, nc) lanes need no copy at all.  Below the threshold the einsum
    stays: the two forms differ at the ulp level, and the downstream f32
    Lanczos Ritz harvest is chaotic enough that ANY reassociation
    resamples its deflation quality (measured: the flagship EMIx
    first-step EMI count moved 94 -> 227 on CPU-f32 from this unroll
    alone), so the small-mesh path keeps the numerics every recorded
    benchmark was measured with."""
    m, nd, nc = x.shape
    unroll = nc > (1 << 19)

    def apply_slot(bk, xs):                     # (nd, nd, nc), (m, nd, nc)
        if not unroll:
            return jnp.einsum("ijc,mjc->mic", bk, xs)
        return jnp.stack([
            sum(bk[i, j][None] * xs[:, j] for j in range(nd))
            for i in range(nd)
        ], axis=1)                              # (m, nd, nc)

    y = apply_slot(blocks[0], x)
    xf = x.reshape(m * nd, nc)
    for k in range(1, nbr.shape[0]):
        xg = xf.at[:, nbr[k]].get(mode="promise_in_bounds")
        y = y + apply_slot(blocks[k], xg.reshape(m, nd, nc))
    return y


def block_jacobi_inverse(diag_blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the (nd x nd) diagonal blocks: (nd, nd, nc) -> same.

    Unrolled Gauss-Jordan over the trailing (cell) axis: pure elementwise
    VPU arithmetic on (nc,) lanes.  jnp.linalg.inv on a (nc, 4, 4) batch
    lowers to a batched LU on TPU that costs ~100 ms at nc=122k -- ~1000x
    this formulation.  No pivoting: the DG diagonal blocks are
    mass-regularized SPD (EMI P_diag carries the B-operator mass, KNP
    blocks carry vol/dt), so pivots stay safely positive.

    Stand-in smoother for hypre BoomerAMG (SURVEY.md N4)."""
    nd = diag_blocks.shape[0]
    # A and I as nd x nd lists of (nc,) rows
    A = [[diag_blocks[i, j] for j in range(nd)] for i in range(nd)]
    I = [[jnp.full_like(diag_blocks[0, 0], 1.0 if i == j else 0.0)
          for j in range(nd)] for i in range(nd)]
    for k in range(nd):
        piv = 1.0 / A[k][k]
        A[k] = [a * piv for a in A[k]]
        I[k] = [a * piv for a in I[k]]
        for i in range(nd):
            if i == k:
                continue
            f = A[i][k]
            A[i] = [a - f * b for a, b in zip(A[i], A[k])]
            I[i] = [a - f * b for a, b in zip(I[i], I[k])]
    return jnp.stack([jnp.stack(row) for row in I])


def block_jacobi_apply(Pinv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ijc,jc->ic", Pinv, r)
