#!/usr/bin/env python3
"""Per-iteration cost of the EMI PCG and batched KNP GMRES loops, measured
as the SLOPE between two fixed iteration counts inside one jit (immune to
the remote backend's per-call overhead), plus the true fused-step cost via
a lax.scan block of steps.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def sync(v):
    return float(np.asarray(jax.tree_util.tree_leaves(v)[0]).ravel()[0])


def timeit(fn, *args):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    r = fn(*args)
    sync(r)
    return time.perf_counter() - t0


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.ops.spmv import bell_matvec, bell_matvec_multi
    from knpemidg_tpu.solvers.twolevel import two_level_apply_fn, two_level_apply_batched

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=30,
                      agg_size=64)
    print(f"# backend={jax.default_backend()}", flush=True)

    state = S.attach_pc(S._initial_state(0.0), sp)
    pc = state["pc"]
    phi_M_pad, I_ch_pad, I_ch_tot_pad = S._pads(state)
    asm = S._jit(("asm_emi", True), S._assemble_emi)
    blocks, rhs, Pd = asm(state["c"], state["c_elim"], phi_M_pad,
                          I_ch_tot_pad, state["t"])
    jax.block_until_ready(blocks)
    nbr = S.g["nbr"]
    P = two_level_apply_fn(pc["emi"], Pd, sp.agg_size)

    # ---- EMI PCG body slope ----
    def make_cg(n_it):
        @jax.jit
        def run(b, x0):
            def proj(v):
                return v - jnp.mean(v)

            def body(i, st):
                x, r, z, p, rz = st
                Ap = bell_matvec(blocks, nbr, p)
                alpha = rz / jnp.vdot(p.ravel(), Ap.ravel())
                x = proj(x + alpha * p)
                r = proj(r - alpha * Ap)
                z = P(r)
                rz_new = jnp.vdot(r.ravel(), z.ravel())
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new)

            r = proj(b)
            z = P(r)
            st = (x0, r, z, z, jnp.vdot(r.ravel(), z.ravel()))
            return jax.lax.fori_loop(0, n_it, body, st)[0]
        return run

    t20 = timeit(make_cg(20), rhs, jnp.zeros_like(rhs))
    t60 = timeit(make_cg(60), rhs, jnp.zeros_like(rhs))
    per_it = (t60 - t20) / 40
    print(f"EMI PCG: 20it {t20*1e3:.1f} ms, 60it {t60*1e3:.1f} ms  "
          f"-> {per_it*1e3:.3f} ms/iter (overhead+setup {1e3*(t20-20*per_it):.1f} ms)",
          flush=True)

    # ---- KNP batched GMRES Arnoldi slope ----
    asm_knp = S._jit(("asm_knp_all2",),
                     lambda st, ph: S._knp_assemble_all(
                         st["c"], st["c_elim"], ph, *S._pads(st), st["t"],
                         st["c"]))
    blocksK, rhsK = asm_knp(state, state["phi"])
    jax.block_until_ready(blocksK)
    pcf = two_level_apply_batched(pc["knp"], blocksK[:, 0], sp.agg_size)
    mb = rhsK.shape[0]
    n = rhsK.size // mb
    shape = rhsK.shape

    def make_gm(n_it, m):
        @jax.jit
        def run(b):
            bv = b.reshape(mb, n)
            V = jnp.zeros((mb, m + 1, n), dtype=b.dtype)
            V = V.at[:, 0].set(bv / jnp.sqrt(
                jnp.einsum("sn,sn->s", bv, bv))[:, None])

            def body(j, V):
                vj = jax.lax.dynamic_index_in_dim(V, j % m, axis=1,
                                                  keepdims=False)
                w = pcf(bell_matvec_multi(blocksK, nbr,
                                          vj.reshape(shape))).reshape(mb, n)
                h1 = jnp.einsum("skn,sn->sk", V, w)
                w = w - jnp.einsum("sk,skn->sn", h1, V)
                h2 = jnp.einsum("skn,sn->sk", V, w)
                w = w - jnp.einsum("sk,skn->sn", h2, V)
                nrm = jnp.sqrt(jnp.einsum("sn,sn->s", w, w))
                return jax.vmap(lambda Vs, ws: Vs.at[(j % m) + 1].set(ws))(
                    V, w / nrm[:, None])

            return jax.lax.fori_loop(0, n_it, body, V)
        return run

    m = sp.gmres_restart
    t10 = timeit(make_gm(10, m), rhsK)
    t30 = timeit(make_gm(30, m), rhsK)
    per_it = (t30 - t10) / 20
    print(f"KNP GMRES(m={m}) Arnoldi: 10it {t10*1e3:.1f} ms, 30it {t30*1e3:.1f} ms"
          f"  -> {per_it*1e3:.3f} ms/iter", flush=True)

    # ---- true fused-step cost via scan blocks ----
    for bs in (1, 4):
        block = S._jit(("slope_block", bs), S.fused_block(sp, bs))
        r = block(state)
        sync(r[0]["c"])
        t0 = time.perf_counter()
        r = block(state)
        sync(r[0]["c"])
        dt = time.perf_counter() - t0
        print(f"fused_block({bs}): total {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
