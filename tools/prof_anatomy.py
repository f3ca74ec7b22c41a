#!/usr/bin/env python3
"""Per-iteration anatomy of the KNP batched GMRES and EMI CG on the
production EMIx workload, pair layout (the current bench config):
matvec / pc apply / CGS2 orthogonalization, each timed as 50 reps in one
scan with a single scalar sync."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import bench

NREP = 50


def timed(name, f, x, nrep=NREP):
    @jax.jit
    def run(x):
        def body(c, _):
            return f(c), jnp.float32(0)
        y, _ = jax.lax.scan(body, x, None, length=nrep)
        return y
    y = run(x)
    bench._scalar_sync(y)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x)
        bench._scalar_sync(y)
        ts.append((time.perf_counter() - t0) / nrep * 1e3)
    print(f"{name:28s}: {min(ts):7.3f} ms/apply  (3 reps: "
          f"{['%.3f' % t for t in ts]})", flush=True)
    return min(ts)


def main():
    S, sp = bench.build(pair=True)
    print(f"# backend={jax.default_backend()} n_cells={S.n_cells} "
          f"npair={int(S.pairs['int_f'].shape[0])}", flush=True)
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("prof_adv", 4, sp), S.fused_block(sp, 4))
    state, _ = blk(state)           # representative mid-window state
    bench._scalar_sync(state["c"])

    asm_emi, solve_emi, asm_knp, solve_knp, finalize = S._phase_fns(sp)
    blocks, rhs, Pd = asm_emi(state)
    phi, emi_it, _ = solve_emi(blocks, Pd, rhs, state)
    blocksK, rhsK = asm_knp(state, phi)
    print(f"# emi_iters at this state: {int(emi_it)}", flush=True)

    from knpemidg_tpu.ops.pairs import (from_pair, pair_matvec,
                                        pair_matvec_multi, pair_nbr,
                                        pair_v_sums, to_pair)
    from knpemidg_tpu.ops.spmv import block_jacobi_inverse
    from knpemidg_tpu.solvers.twolevel import (build_two_level,
                                               two_level_apply_batched,
                                               two_level_apply_fn)
    pm = S.pairs
    agg_p = sp.agg_size // 2

    # ---------------- KNP side (batched, 3-1=... solved ions) ----------
    pdK, peK = blocksK
    mb = pdK.shape[0]
    mvK = lambda V: pair_matvec_multi(pdK, peK, pm, V)
    c_p = to_pair(pm, jnp.stack([state["c"]]))[0] if False else None
    rhs_p = to_pair(pm, jnp.stack([rhsK]))[0]
    lm = S._pair_mask.astype(rhs_p.dtype)[None]
    pdK_bj = (pdK * S._pair_bj_halves[None]
              if getattr(sp, "pair_bj", "full") == "halves" else pdK)
    data = jax.vmap(
        lambda pd_, pe_: build_two_level(
            None, pair_nbr(pm), agg_p, sym=False,
            mass_diag=S._pair_mass / S.params.dt,
            v=pair_v_sums(pd_, pe_)))(pdK, peK)
    pcf0 = two_level_apply_batched(data, pdK_bj, agg_p)
    pcf = lambda r: pcf0(r) * lm

    V0 = rhs_p  # (mb, nd, 2, npair)-ish batched vector
    print(f"# KNP batched vector shape: {V0.shape}  mb={mb}", flush=True)
    t_mv = timed("knp pair matvec_multi", mvK, V0)
    t_pc = timed("knp two-level pc apply", pcf, V0)

    # pc anatomy: BJ einsum vs coarse correction (the apply is additive)
    from knpemidg_tpu.ops.spmv import block_jacobi_inverse as _bji
    Pinv = jax.vmap(_bji)(pdK_bj)
    t_bj = timed("knp pc: bj einsum", lambda r: jnp.einsum(
        "mijc,mjc->mic", Pinv, r), V0)

    def coarse_one(d, rs):
        nd_, nc_ = rs.shape
        inv, s = d["inv"], d["s"]
        n_agg = inv.shape[0]
        pad = n_agg * agg_p - nc_
        rsum = rs.sum(axis=0)
        rc = jnp.pad(rsum, (0, pad)).reshape(n_agg, agg_p).sum(axis=1)
        z2 = s * (inv @ (s * rc))
        zf = jnp.broadcast_to(z2[:, None], (n_agg, agg_p)).reshape(-1)[:nc_]
        return jnp.broadcast_to(zf[None, :], (nd_, nc_))

    t_co = timed("knp pc: coarse only", lambda r: jax.vmap(coarse_one)(
        data, r), V0)
    # NOTE: bj-alone (0.96 ms) + coarse-alone (0.80 ms) measure MORE than
    # the fused full apply (0.74 ms): at this size every op is
    # latency/materialization-bound, not bandwidth-bound, and XLA overlaps
    # the additive terms inside the real apply.  Microbenchmark deltas do
    # NOT transfer to the solve loop -- the cgs2c/carry burial
    # (tools/exp_cgs2c_ab.py) is the end-to-end proof.

    # CGS2 orthogonalization at restart m: w - V(V^T w), twice
    m = sp.gmres_restart
    n = V0.size // mb
    key = jax.random.PRNGKey(0)
    Vb = jax.random.normal(key, (mb, m + 1, n), dtype=V0.dtype)

    def orth1(w):
        h = jnp.einsum("skn,sn->sk", Vb, w)
        return w - jnp.einsum("sk,skn->sn", h, Vb)

    w0 = V0.reshape(mb, n)
    t_o1 = timed("knp CGS pass (full V)", orth1, w0)

    # Givens/rot fori + bookkeeping: the rest of arnoldi_body, approximated
    # by a full solve minus parts
    res = solve_knp(blocksK, rhsK, state)
    bench._scalar_sync(res[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = solve_knp(blocksK, rhsK, state)
        bench._scalar_sync(out[0])
        ts.append(time.perf_counter() - t0)
    iters = np.asarray(res[1])
    print(f"knp full solve: {min(ts)*1e3:.1f} ms, iters={iters.tolist()}",
          flush=True)

    # ---------------- EMI side --------------------------------------
    pd_e, pe_e = blocks
    mvE = lambda v: pair_matvec(pd_e, pe_e, pm, v)
    r_p = to_pair(pm, rhs)
    t_emv = timed("emi pair matvec", mvE, r_p)
    ts = []
    res_e = solve_emi(blocks, Pd, rhs, state)
    bench._scalar_sync(res_e[0])
    for _ in range(3):
        t0 = time.perf_counter()
        out = solve_emi(blocks, Pd, rhs, state)
        bench._scalar_sync(out[0])
        ts.append(time.perf_counter() - t0)
    print(f"emi full solve: {min(ts)*1e3:.1f} ms, iters={int(res_e[1])}",
          flush=True)

    tot_knp = int(np.max(iters))
    print(json.dumps({
        "knp_matvec_ms": round(t_mv, 3), "knp_pc_ms": round(t_pc, 3),
        "knp_cgs_pass_ms": round(t_o1, 3),
        "knp_iter_est_ms": round(t_mv + t_pc + 2 * t_o1, 3),
        "emi_matvec_ms": round(t_emv, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
