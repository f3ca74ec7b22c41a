#!/usr/bin/env python3
"""Per-component cost of one EMI CG iteration on the EMIx workload.

Times each additive piece of the production preconditioner (block-Jacobi,
aggregate coarse, compartment deflation, moment deflation) plus the matvec
and a full PCG body, at production settings (agg 64, moment order 2,
frozen pc).  Also measures a FACTORED moment apply (monomials x one-hot
instead of the dense (nw, nd, nc) W) as a candidate replacement.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 50


def timed(name, fn, x, nbytes=0.0, reps=REPS):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    gbs = nbytes / dt / 1e9 if nbytes else 0.0
    print(f"{name:48s} {dt*1e3:9.3f} ms/op   {gbs:8.1f} GB/s", flush=True)
    return dt


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.ops.spmv import (bell_matvec, block_jacobi_inverse,
                                       block_jacobi_apply)
    from knpemidg_tpu.solvers.twolevel import two_level_apply_fn

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=30,
                      agg_size=64)
    print(f"# backend={jax.default_backend()} n_cells={S.n_cells} "
          f"nd={S.nd} n_mem={S.n_mem}", flush=True)

    state = S.attach_pc(S._initial_state(0.0), sp)
    pc = state["pc"]["emi"]
    phi_M_pad, I_ch_pad, I_ch_tot_pad = S._pads(state)
    asm = S._jit(("asm_emi", True), S._assemble_emi)
    blocks, rhs, Pd = asm(state["c"], state["c_elim"], phi_M_pad,
                          I_ch_tot_pad, state["t"])
    blocks = jax.block_until_ready(blocks)
    nbr = S.g["nbr"]
    nc, nd = S.n_cells, S.nd
    K = blocks.shape[0]
    fb = 4
    x = rhs
    print(f"# pc keys: {sorted(pc.keys())}; mom_W {pc.get('mom_W').shape if 'mom_W' in pc else None}",
          flush=True)

    mv_bytes = (K * nd * nd * nc + 2 * nd * nc + (K - 1) * nd * nc) * fb
    timed("bell_matvec", lambda v: bell_matvec(blocks, nbr, v), x, mv_bytes)

    Pinv = jax.jit(block_jacobi_inverse)(Pd)
    timed("block-Jacobi apply", lambda v: block_jacobi_apply(Pinv, v) + v,
          x, (nd * nd + 3 * nd) * nc * fb)

    # --- coarse (aggregate) only ---
    inv, s = pc["inv"], pc["s"]
    As = pc["As"]
    n_agg = inv.shape[0]
    agg_size = sp.agg_size
    pad = n_agg * agg_size - nc

    def coarse_only(r):
        rs = r.sum(axis=0)
        rc = jnp.pad(rs, (0, pad)).reshape(n_agg, agg_size).sum(axis=1)
        rc = s * rc
        z = inv @ rc
        z = z + inv @ (rc - As @ z)
        z = s * z
        zfull = jnp.broadcast_to(z[:, None], (n_agg, agg_size)).reshape(-1)[:nc]
        return r + zfull[None, :]
    timed(f"coarse apply (n_agg={n_agg})", coarse_only, x,
          (2 * nd * nc + 3 * n_agg * n_agg) * fb)

    # --- compartment deflation only ---
    invc, sc, OH, Asc = pc["comp_inv"], pc["comp_s"], pc["comp_onehot"], pc["comp_As"]

    def comp_only(r):
        rs = r.sum(axis=0)
        rsc = sc * (OH @ rs)
        zc = invc @ rsc
        zc = zc + invc @ (rsc - Asc @ zc)
        z = (sc * zc) @ OH
        return r + z[None, :]
    timed(f"compartment apply (n_comp={OH.shape[0]})", comp_only, x,
          (2 * nd * nc + 2 * OH.size) * fb)

    # --- moment deflation only (dense W) ---
    Wm, inv_m, s_m = pc["mom_W"], pc["mom_inv"], pc["mom_s"]
    nw = Wm.shape[0]

    def mom_only(r):
        rw = s_m * jnp.einsum("wic,ic->w", Wm, r)
        return r + jnp.einsum("w,wic->ic", s_m * (inv_m @ rw), Wm)
    timed(f"moment apply DENSE (nw={nw})", mom_only, x,
          (2 * nw * nd * nc) * fb)

    # --- moment deflation FACTORED (mono x one-hot) ---
    comp_np = S._comp_np
    coords = np.moveaxis(np.asarray(S.g["nodes"], dtype=np.float64), -1, 0)
    n_comp = int(comp_np.max()) + 1
    ctrs = np.zeros((n_comp, coords.shape[2]))
    Ls = np.ones(n_comp)
    for p in range(n_comp):
        sel = coords[comp_np == p]
        ctrs[p] = sel.mean(axis=(0, 1))
        Ls[p] = float(np.abs(sel - ctrs[p]).max()) or 1.0
    loc = (coords - ctrs[comp_np][:, None, :]) / Ls[comp_np][:, None, None]
    d = coords.shape[2]
    base = [loc[:, :, a] for a in range(d)]
    base += [loc[:, :, a] * loc[:, :, b] for a in range(d) for b in range(a, d)]
    mono = jnp.asarray(np.stack([f.T for f in base]), dtype=x.dtype)  # (q, nd, nc)
    nq = mono.shape[0]
    # verify factored == dense W up to ordering: W[p*nq+q] = mono[q]*ind[p]
    Wf = np.asarray(Wm).reshape(n_comp, nq, nd, nc)
    ind = np.asarray(OH)  # (n_comp, nc)
    err = np.abs(Wf - np.asarray(mono)[None] * ind[:, None, None, :]).max()
    print(f"# factored-W reconstruction max err: {err:.3e}", flush=True)

    s_m2 = jnp.asarray(np.asarray(s_m).reshape(n_comp, nq))

    def mom_factored(r):
        rq = jnp.einsum("qic,ic->qc", mono, r)            # (nq, nc)
        rw = s_m2 * jnp.einsum("qc,pc->pq", rq, OH)        # (n_comp, nq)
        zw = (inv_m @ (rw.reshape(-1))).reshape(n_comp, nq) * s_m2
        zq = zw.T @ OH                                     # (nq, nc)
        return r + jnp.einsum("qic,qc->ic", mono, zq)
    timed(f"moment apply FACTORED (nq={nq})", mom_factored, x,
          (2 * nq * nd * nc) * fb)
    # correctness vs dense
    a = jax.jit(mom_only)(x)
    b = jax.jit(mom_factored)(x)
    print(f"# factored apply max rel err: "
          f"{float(jnp.abs(a-b).max()/jnp.abs(a).max()):.3e}", flush=True)

    # --- full frozen-pc apply + matvec ---
    P = two_level_apply_fn(pc, Pd, sp.agg_size)
    timed("full precond apply (frozen pc)", lambda v: P(v) + v, x)

    def cg_body(v):
        Ap = bell_matvec(blocks, nbr, v)
        alpha = jnp.vdot(v.ravel(), Ap.ravel())
        r = v - alpha / (1e30) * Ap
        z = P(r)
        rz = jnp.vdot(r.ravel(), z.ravel())
        return z + (rz / (1e30)) * v
    timed("PCG body (matvec+P+2 dots)", cg_body, x)

    # --- actual solve at this state ---
    solve = S._jit(("prof_solve", sp),
                   lambda b, Pd_, r, st: S._emi_solve_iterative(
                       b, Pd_, r, st["phi"], sp,
                       pc=st["pc"]["emi"], phi_prev=st.get("phi_prev")))
    phi, iters, conv = solve(blocks, Pd, rhs, state)
    float(np.asarray(phi).ravel()[0])
    t0 = time.perf_counter()
    phi, iters, conv = solve(blocks, Pd, rhs, state)
    float(np.asarray(phi).ravel()[0])
    t_emi = time.perf_counter() - t0
    print(f"{'EMI solve (frozen pc, predictor)':48s} {t_emi*1e3:9.3f} ms"
          f"    iters={int(iters)} conv={bool(conv)}", flush=True)


if __name__ == "__main__":
    main()
