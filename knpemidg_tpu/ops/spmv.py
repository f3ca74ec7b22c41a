"""Block-ELL sparse matvec.

The DG operator has a fixed sparsity of d+2 blocks per cell row (self +
one neighbor per facet), stored dense as ``blocks (nc, K, nd, nd)`` with the
neighbor table ``nbr (nc, K)`` (slot 0 = self).  The matvec is gather +
batched small matmul -- no scatters, so it maps cleanly onto TPU vector
units and shards over the cell axis with only halo gathers.

Replaces PETSc MatMult inside the Krylov loops (SURVEY.md N3).
"""
from __future__ import annotations

import jax.numpy as jnp


def bell_matvec(blocks: jnp.ndarray, nbr: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y[c] = sum_k blocks[c,k] @ x[nbr[c,k]];  x, y: (nc, nd)."""
    xg = x[nbr]                                   # (nc, K, nd)
    return jnp.einsum("ckij,ckj->ci", blocks, xg)


def block_jacobi_inverse(diag_blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the (nd x nd) diagonal blocks -> (nc, nd, nd).

    Stand-in for hypre BoomerAMG (SURVEY.md N4) as the v1 preconditioner."""
    return jnp.linalg.inv(diag_blocks)


def block_jacobi_apply(Pinv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("cij,cj->ci", Pinv, r)
