"""Host-side sparse direct solves (MUMPS stand-in, SURVEY.md N4).

The reference's MMS verification runs use MUMPS LU with null-pivot handling
for the singular EMI matrix (solver.py:414-422).  Here: scipy SuperLU; the
singular EMI system is solved through a bordered extension
``[[A, 1], [1^T, 0]]`` which enforces a zero-mean solution and projects an
inconsistent rhs -- same solution (up to the constant) as MUMPS'
icntl(24) null-pivot least squares.

These run on host numpy (outside jit); they are verification-path only.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def bell_to_csr(blocks: np.ndarray, nbr: np.ndarray) -> sp.csr_matrix:
    """Block-ELL + neighbor table -> scipy CSR (N, N).

    Accepts either host layout (nc, K, nd, nd) with nbr (nc, K) or the
    device cells-last layout (K, nd, nd, nc) with nbr (K, nc)."""
    blocks = np.asarray(blocks)
    nbr = np.asarray(nbr)
    if nbr.shape[0] == blocks.shape[0] and blocks.shape[-1] == nbr.shape[-1]:
        # device layout (K, nd, nd, nc) / (K, nc) -> host (nc, K, nd, nd)
        blocks = np.transpose(blocks, (3, 0, 1, 2))
        nbr = nbr.T
    nc, K, nd, _ = blocks.shape
    rows = np.repeat(np.arange(nc) * nd, K * nd * nd) + np.tile(
        np.repeat(np.arange(nd), nd), nc * K
    )
    cols = (np.repeat(nbr, nd * nd, axis=None) * nd).reshape(nc, K, nd, nd) + np.arange(nd)
    A = sp.coo_matrix(
        (np.asarray(blocks).ravel(), (rows, cols.ravel())), shape=(nc * nd, nc * nd)
    )
    A.sum_duplicates()
    return A.tocsr()


def solve_direct(blocks, nbr, b, nullspace_constant: bool = False) -> np.ndarray:
    """LU solve; with `nullspace_constant`, solve the bordered system.

    ``b`` in the device layout (nd, nc); returns the same layout."""
    blocks = np.asarray(blocks, dtype=np.float64)
    nbr = np.asarray(nbr)
    b = np.asarray(b, dtype=np.float64)
    A = bell_to_csr(blocks, nbr)
    rhs = b.T.ravel()                       # cell-major dof order
    if nullspace_constant:
        n = A.shape[0]
        ones = np.ones((n, 1)) / np.sqrt(n)
        Ab = sp.bmat([[A, ones], [ones.T, None]], format="csc")
        sol = spla.spsolve(Ab, np.concatenate([rhs, [0.0]]))
        return sol[:-1].reshape(b.shape[::-1]).T
    return spla.spsolve(A.tocsc(), rhs).reshape(b.shape[::-1]).T
