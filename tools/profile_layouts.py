#!/usr/bin/env python3
"""Layout experiments for the block-ELL matvec on TPU.

Round-1 used einsum contractions over tiny (nd=4) axes with cells on the
minormost (lane) axis; XLA lowers those to batched dot_generals with the
batch on the minor axis, forcing full relayouts (measured: block-Jacobi at
6.5 GB/s).  This benchmarks VPU-friendly broadcast/FMA formulations and
gather variants to pick the production kernel shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 50
NC = 121617
ND = 4
K = 5


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
    print(f"{name:52s} {dt*1e3:9.3f} ms/op   {gbs:8.1f} GB/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    fb = 4
    blocks = jnp.asarray(rng.normal(size=(K, ND, ND, NC)), dtype=jnp.float32)
    # plausible neighbor structure: mostly nearby after Morton ordering
    nbr_np = np.clip(
        np.arange(NC)[None, :] + rng.integers(-600, 600, size=(K, NC)),
        0, NC - 1,
    ).astype(np.int32)
    nbr_np[0] = np.arange(NC)
    nbr = jnp.asarray(nbr_np)
    x = jnp.asarray(rng.normal(size=(ND, NC)), dtype=jnp.float32)

    print(f"# backend={jax.default_backend()}", flush=True)

    # ---------------- dense diag-block apply --------------------------
    diag = blocks[0]
    dbytes = (ND * ND * NC + 2 * ND * NC) * fb
    timed("diag einsum ijc,jc->ic (round-1)",
          lambda v: jnp.einsum("ijc,jc->ic", diag, v), x, dbytes)
    timed("diag broadcast-sum (B * x[None]).sum(1)",
          lambda v: (diag * v[None, :, :]).sum(axis=1), x, dbytes)

    def diag_unrolled(v):
        return jnp.stack([
            sum(diag[i, j] * v[j] for j in range(ND)) for i in range(ND)
        ])
    timed("diag unrolled FMA rows", diag_unrolled, x, dbytes)

    # flat-rows storage (nd*nd, nc)
    diag_flat = diag.reshape(ND * ND, NC)
    def diag_flat_fma(v):
        return jnp.stack([
            sum(diag_flat[i * ND + j] * v[j] for j in range(ND))
            for i in range(ND)
        ])
    timed("diag flat-rows FMA", diag_flat_fma, x, dbytes)

    # ---------------- full bell matvec -------------------------------
    mvbytes = (K * ND * ND * NC + 2 * ND * NC + (K - 1) * ND * NC) * fb

    def mv_einsum(v):
        y = jnp.einsum("ijc,jc->ic", blocks[0], v)
        xg = v.at[:, nbr[1:]].get(mode="promise_in_bounds")
        return y + jnp.einsum("kijc,jkc->ic", blocks[1:], xg)
    timed("bell_matvec einsum (round-1)", mv_einsum, x, mvbytes)

    def mv_fma(v):
        xg = v.at[:, nbr[1:]].get(mode="promise_in_bounds")  # (nd, K-1, nc)
        rows = []
        for i in range(ND):
            acc = sum(blocks[0, i, j] * v[j] for j in range(ND))
            for k in range(1, K):
                acc = acc + sum(
                    blocks[k, i, j] * xg[j, k - 1] for j in range(ND)
                )
            rows.append(acc)
        return jnp.stack(rows)
    timed("bell_matvec broadcast FMA", mv_fma, x, mvbytes)

    # ---------------- gather formulations -----------------------------
    gbytes = ((K - 1) * ND * NC + ND * NC) * fb

    timed("gather A: x[:, nbr[1:]] one shot",
          lambda v: v.at[:, nbr[1:]].get(mode="promise_in_bounds")
                     .sum(axis=(1,)) * 0.5 + v, x, gbytes)

    def g_slotrow(v):
        acc = v
        for k in range(1, K):
            for j in range(ND):
                acc = acc.at[j].add(v[j].at[nbr[k]].get(mode="promise_in_bounds"))
        return acc * 0.1
    timed("gather B: 16 flat (nc,) gathers", g_slotrow, x, gbytes)

    xr = jnp.asarray(rng.normal(size=(NC, 8)), dtype=jnp.float32)
    nbr_flat = nbr[1:].reshape(-1)
    def g_rows(v):
        g = v.at[nbr_flat].get(mode="promise_in_bounds")   # ((K-1)*nc, 8)
        return v + 0.25 * g.reshape(K - 1, NC, 8).sum(axis=0)
    timed("gather C: row gather from (nc, 8)", g_rows,
          xr, ((K - 1) * NC * 8 + NC * 8) * fb)

    xr4 = jnp.asarray(rng.normal(size=(NC, ND)), dtype=jnp.float32)
    def g_rows4(v):
        g = v.at[nbr_flat].get(mode="promise_in_bounds")   # ((K-1)*nc, 4)
        return v + 0.25 * g.reshape(K - 1, NC, ND).sum(axis=0)
    timed("gather D: row gather from (nc, 4)", g_rows4,
          xr4, ((K - 1) * NC * ND + NC * ND) * fb)

    xr128 = jnp.asarray(rng.normal(size=(NC, 128)), dtype=jnp.float32)
    nbr1 = nbr[1]
    def g_rows128(v):
        g = v.at[nbr1].get(mode="promise_in_bounds")       # (nc, 128)
        return v + 0.25 * g
    timed("gather E: row gather from (nc, 128), 1 slot", g_rows128,
          xr128, (2 * NC * 128) * fb)

    # one-hot matmul gather within +-1024 window (bf16 MXU)
    W = 2048
    delta = np.asarray(nbr_np[1:] - np.arange(NC)[None, :] + W // 2)
    inw = (delta >= 0) & (delta < W)
    print(f"# window hit rate at W={W}: {inw.mean():.4f}", flush=True)

    # ---------------- GEMV orthogonalization shape --------------------
    n = ND * NC
    m = 61
    V = jnp.asarray(rng.normal(size=(m, n)), dtype=jnp.float32)
    def ortho(w):
        h1 = V @ w
        w = w - h1 @ V
        h2 = V @ w
        return w - h2 @ V
    timed(f"CGS2 pair (V ({m},{n}))", ortho,
          jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32),
          4 * m * n * fb)


if __name__ == "__main__":
    main()
