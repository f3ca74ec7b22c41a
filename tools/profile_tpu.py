#!/usr/bin/env python3
"""Microbenchmarks of the KNP-EMI hot path on the current default device.

Times (with a fori_loop of dependent applications inside one jit, so host
dispatch is amortized and the remote-backend sync problem is bypassed):
  * bell_matvec on the real EMIx operators (EMI + vmapped KNP)
  * the neighbor gather alone, in several formulations
  * the two-level preconditioner apply
  * one GMRES Arnoldi step (CGS2 orthogonalization)
Prints one line per measurement: name, ms/op, achieved GB/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 50


def timed(name, fn, x, nbytes=0.0, reps=REPS):
    """fn must be (x -> y) with y shaped like x; loops it `reps` times."""
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])   # sync
    t0 = time.perf_counter()
    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    gbs = nbytes / dt / 1e9 if nbytes else 0.0
    print(f"{name:45s} {dt*1e3:9.3f} ms/op   {gbs:8.1f} GB/s", flush=True)
    return dt


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.ops.spmv import bell_matvec, block_jacobi_inverse, block_jacobi_apply

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, rtol_knp=1e-7, gmres_restart=60,
                      agg_size=32)
    print(f"# backend={jax.default_backend()} n_cells={S.n_cells} "
          f"nd={S.nd} n_mem={S.n_mem}", flush=True)

    state = S._initial_state(0.0)
    phi_M_pad, I_ch_pad, I_ch_tot_pad = S._pads(state)
    asm_emi = jax.jit(S._assemble_emi)
    blocks, rhs, Pd = asm_emi(state["c"], state["c_elim"], phi_M_pad,
                              I_ch_tot_pad, state["t"])
    blocks = jax.block_until_ready(blocks)
    nbr = S.g["nbr"]
    nc, nd = S.n_cells, S.nd
    K = blocks.shape[0]
    fb = np.dtype(np.float32).itemsize

    # ---- matvec & gather variants -----------------------------------
    x = rhs
    mv_bytes = (K * nd * nd * nc + 2 * nd * nc + (K - 1) * nd * nc) * fb
    timed("bell_matvec (EMI op)", lambda v: bell_matvec(blocks, nbr, v),
          x, mv_bytes)

    gather_bytes = ((K - 1) * nd * nc + nd * nc) * fb
    timed("gather x[:, nbr[1:]] (cells-last)",
          lambda v: v.at[:, nbr[1:]].get(mode="promise_in_bounds") \
                     .sum(axis=1) * 0.5 + v,
          x, gather_bytes)

    xT = jnp.asarray(np.asarray(x).T.copy())        # (nc, nd) cells-first
    nbrT = nbr[1:].T                                # (nc, K-1)
    timed("gather xT[nbr] (cells-first rows)",
          lambda v: v[nbrT].sum(axis=1) * 0.5 + v,
          xT, gather_bytes)

    nbr_flat = nbr[1:].reshape(-1)
    timed("gather flat take (cells-last)",
          lambda v: jnp.take(v, nbr_flat, axis=1,
                             unique_indices=False, indices_are_sorted=False)
                     .reshape(nd, K - 1, nc).sum(axis=1) * 0.5 + v,
          x, gather_bytes)

    # one gather per slot (4 separate smaller gathers)
    def slotwise(v):
        acc = v
        for k in range(1, K):
            acc = acc + v.at[:, nbr[k]].get(mode="promise_in_bounds")
        return acc * 0.25
    timed("gather slot-wise (4 gathers)", slotwise, x, gather_bytes)

    # ---- preconditioner ----------------------------------------------
    Pinv = jax.jit(block_jacobi_inverse)(Pd)
    timed("block-Jacobi apply", lambda v: block_jacobi_apply(Pinv, v) + v,
          x, (nd * nd * nc + 2 * nd * nc) * fb)

    P = S._make_precond(blocks, Pd, sp, sym=True)
    timed("two-level precond apply (EMI)", lambda v: P(v) + v, x)

    # ---- CGS2 Arnoldi step (GMRES inner) ------------------------------
    m = sp.gmres_restart
    n = x.size
    V = jnp.zeros((m + 1, n), dtype=x.dtype).at[0].set(x.ravel() / jnp.linalg.norm(x))

    def arnoldi_step(V):
        w = bell_matvec(blocks, nbr, P(V[0].reshape(nd, nc))).ravel()
        h1 = V @ w
        w = w - h1 @ V
        h2 = V @ w
        w = w - h2 @ V
        return V.at[1].set(w / jnp.linalg.norm(w))
    timed(f"GMRES step (matvec+P+CGS2, m={m})", arnoldi_step, V,
          (4 * (m + 1) * n) * fb)

    # ---- full solves ---------------------------------------------------
    solve_emi = jax.jit(lambda b, P_, r, st: S._emi_solve_iterative(b, P_, r, st["phi"], sp))
    phi, iters, conv = solve_emi(blocks, Pd, rhs, state)
    float(np.asarray(phi).ravel()[0])
    t0 = time.perf_counter()
    phi, iters, conv = solve_emi(blocks, Pd, rhs, state)
    float(np.asarray(phi).ravel()[0])
    t_emi = time.perf_counter() - t0
    print(f"{'EMI solve':45s} {t_emi*1e3:9.3f} ms    iters={int(iters)} conv={bool(conv)}", flush=True)

    asm_knp = jax.jit(lambda st, ph: S._knp_assemble_all(
        st["c"], st["c_elim"], ph, *S._pads(st)[0:1], S._pads(st)[1],
        S._pads(st)[2], st["t"], st["c"]))
    # simpler: reuse phase fns
    asm_emi_t0 = time.perf_counter()
    blocks2, rhs2, Pd2 = asm_emi(state["c"], state["c_elim"], phi_M_pad,
                                 I_ch_tot_pad, state["t"])
    float(np.asarray(rhs2).ravel()[0])
    print(f"{'EMI assemble':45s} {(time.perf_counter()-asm_emi_t0)*1e3:9.3f} ms", flush=True)

    fns = S._phase_fns(sp)
    asm_knp_j, solve_knp_j = fns[2], fns[3]
    bK, rK = asm_knp_j(state, phi)
    jax.block_until_ready(rK); float(np.asarray(rK).ravel()[0])
    t0 = time.perf_counter()
    bK, rK = asm_knp_j(state, phi)
    float(np.asarray(rK).ravel()[0])
    print(f"{'KNP assemble (vmapped ions)':45s} {(time.perf_counter()-t0)*1e3:9.3f} ms", flush=True)

    c, kiters, kconv = solve_knp_j(bK, rK, state)
    float(np.asarray(c).ravel()[0])
    t0 = time.perf_counter()
    c, kiters, kconv = solve_knp_j(bK, rK, state)
    float(np.asarray(c).ravel()[0])
    t_knp = time.perf_counter() - t0
    print(f"{'KNP solve':45s} {t_knp*1e3:9.3f} ms    iters={np.asarray(kiters).tolist()} conv={np.asarray(kconv).tolist()}", flush=True)


if __name__ == "__main__":
    main()
