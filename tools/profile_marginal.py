#!/usr/bin/env python3
"""Marginal per-op costs of hot ops: time fori_loop at two rep counts and
difference out the fixed RPC/dispatch floor (~30 ms per jit call through
the remote tunnel).  Returns scalars only (14.5 MB/s tunnel!)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

R1, R2 = 20, 220


def marginal(name, fn, x, nbytes=0.0):
    def make(reps):
        @jax.jit
        def loop(a):
            r = jax.lax.fori_loop(0, reps, lambda i, v: fn(v), a)
            leaves = jax.tree_util.tree_leaves(r)
            return sum(jnp.sum(l) * 0 for l in leaves) + jnp.asarray(leaves[0]).ravel()[0]
        return loop
    lo, hi = make(R1), make(R2)
    float(lo(x)); float(hi(x))
    t0 = time.perf_counter(); float(lo(x)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(x)); t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (R2 - R1)
    gbs = nbytes / dt / 1e9 if nbytes and dt > 0 else 0.0
    print(f"{name:52s} {dt*1e3:9.4f} ms/op   {gbs:8.1f} GB/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    NC, ND, K = 121617, 4, 5
    fb = 4
    print(f"# backend={jax.default_backend()}", flush=True)

    blocks = jnp.asarray(rng.normal(size=(K, ND, ND, NC)), dtype=jnp.float32)
    nbr_np = np.clip(np.arange(NC)[None, :] + rng.integers(-600, 600, size=(K, NC)),
                     0, NC - 1).astype(np.int32)
    nbr_np[0] = np.arange(NC)
    nbr = jnp.asarray(nbr_np)
    x = jnp.asarray(rng.normal(size=(ND, NC)), dtype=jnp.float32)

    # dense parts
    diag = blocks[0]
    dbytes = (ND * ND * NC + 2 * ND * NC) * fb
    marginal("diag einsum ijc,jc->ic", lambda v: jnp.einsum("ijc,jc->ic", diag, v), x, dbytes)
    marginal("diag broadcast-sum", lambda v: (diag * v[None]).sum(1), x, dbytes)

    mvbytes = (K * ND * ND * NC + 2 * ND * NC + (K - 1) * ND * NC) * fb
    def mv_einsum(v):
        y = jnp.einsum("ijc,jc->ic", blocks[0], v)
        xg = v.at[:, nbr[1:]].get(mode="promise_in_bounds")
        return y + jnp.einsum("kijc,jkc->ic", blocks[1:], xg)
    marginal("bell_matvec einsum (round-1)", mv_einsum, x, mvbytes)

    # gathers
    gbytes = ((K - 1) * ND * NC + ND * NC) * fb
    marginal("gather x[:, nbr[1:]]",
             lambda v: v.at[:, nbr[1:]].get(mode="promise_in_bounds").sum(1) * 0.5 + v,
             x, gbytes)
    xr4 = jnp.asarray(rng.normal(size=(NC, ND)), dtype=jnp.float32)
    nbr_flat = nbr[1:].reshape(-1)
    marginal("row gather (nc,4)[flat_idx]",
             lambda v: v + 0.25 * v.at[nbr_flat].get(mode="promise_in_bounds")
                                   .reshape(K - 1, NC, ND).sum(0),
             xr4, ((K - 1) * NC * ND + NC * ND) * fb)
    xr8 = jnp.asarray(rng.normal(size=(NC, 8)), dtype=jnp.float32)
    marginal("row gather (nc,8)[flat_idx]",
             lambda v: v + 0.25 * v.at[nbr_flat].get(mode="promise_in_bounds")
                                   .reshape(K - 1, NC, 8).sum(0),
             xr8, ((K - 1) * NC * 8 + NC * 8) * fb)

    # CGS2
    n = ND * NC
    for m in (20, 60):
        V = jnp.asarray(rng.normal(size=(m + 1, n)), dtype=jnp.float32)
        def ortho(w):
            h1 = V @ w
            w = w - h1 @ V
            h2 = V @ w
            return w - h2 @ V
        marginal(f"CGS2 pair m={m}", ortho,
                 jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32),
                 4 * (m + 1) * n * fb)

    # coarse solve GEMV (two-level): n_agg x n_agg explicit inverse
    for n_agg in (3801, 1901):
        Ainv = jnp.asarray(rng.normal(size=(n_agg, n_agg)), dtype=jnp.float32)
        marginal(f"coarse GEMV n_agg={n_agg}",
                 lambda v: (Ainv @ v) * 0.999,
                 jnp.asarray(rng.normal(size=(n_agg,)), dtype=jnp.float32),
                 n_agg * n_agg * fb)

    # comp_onehot skinny matmul (n_comp, nc)
    n_comp = 244
    OH = jnp.asarray((rng.random(size=(n_comp, NC)) < 0.004).astype(np.float32))
    marginal("comp one-hot restrict+prolong",
             lambda v: v + 0.01 * ((OH @ v) @ OH),
             jnp.asarray(rng.normal(size=(NC,)), dtype=jnp.float32),
             2 * n_comp * NC * fb)


if __name__ == "__main__":
    main()
