#!/usr/bin/env python3
"""Isolate (a) the per-call overhead of the remote backend vs reps count,
(b) the cost of ravel()-based dots (TPU relayout) vs einsum dots,
(c) reshape relayout cost on (nd, nc) fields."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

nd, nc = 4, 121617
x = jnp.asarray(np.random.rand(nd, nc).astype(np.float32))
P = jnp.asarray(np.random.rand(nd, nd, nc).astype(np.float32))


def timed(name, fn, x, reps):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    r = loop(x)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0)
    print(f"{name:44s} reps={reps:4d}  {dt*1e3/reps:9.4f} ms/op  total {dt*1e3:8.1f} ms",
          flush=True)


for reps in (50, 500):
    timed("elementwise v*1.0001+0.1", lambda v: v * 1.0001 + 0.1, x, reps)
for reps in (50, 500):
    timed("block-jacobi einsum", lambda v: jnp.einsum("ijc,jc->ic", P, v), x, reps)
for reps in (50, 500):
    timed("ravel vdot (relayout?)",
          lambda v: v + jnp.vdot(v.ravel(), v.ravel()) * 1e-30, x, reps)
    timed("einsum dot (no reshape)",
          lambda v: v + jnp.einsum("ic,ic->", v, v) * 1e-30, x, reps)
    timed("reshape roundtrip",
          lambda v: (v.ravel() * 1.0001).reshape(nd, nc), x, reps)
    timed("mean-subtract proj", lambda v: v - jnp.mean(v), x, reps)
