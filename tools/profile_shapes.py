#!/usr/bin/env python3
"""Hypothesis tests: (a) elementwise bandwidth vs array shape (TPU (8,128)
tiling pads small-sublane shapes), (b) Mosaic in-VMEM lane gather support,
(c) gather from 2D-tiled operands."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 50
NC = 121617
NCP = 121856          # padded to multiple of 1024 (= 238 * 512)


def timed(name, fn, x, nbytes, reps=REPS):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)
    r = loop(x); float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    r = loop(x); float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.4f} ms/op   {nbytes/dt/1e9:8.1f} GB/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"# backend={jax.default_backend()}", flush=True)

    # (a) elementwise y = x*1.0001 + 0.5 at various shapes, same volume
    vol = 16 * NCP
    for shape in [(vol,), (4, 4, NCP), (16, NCP), (16, NCP // 512, 512),
                  (16 * NCP // 512, 512), (NCP, 16), (16 * NCP // 128, 128)]:
        x = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
        timed(f"eltwise {str(shape):30s}", lambda v: v * 1.0001 + 0.5,
              x, 2 * vol * 4)

    # FMA chain mimicking the diag apply: 16 coefficient rows
    B = jnp.asarray(rng.normal(size=(16, NCP // 512, 512)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, NCP // 512, 512)), dtype=jnp.float32)
    def diag2d(v):
        return jnp.stack([
            sum(B[i * 4 + j] * v[j] for j in range(4)) for i in range(4)
        ])
    timed("diag apply, rows as (ncp/512, 512)", diag2d, x, (16 + 8) * NCP * 4)

    B1 = B.reshape(16, NCP)
    x1 = x.reshape(4, NCP)
    def diag1d(v):
        return jnp.stack([
            sum(B1[i * 4 + j] * v[j] for j in range(4)) for i in range(4)
        ])
    timed("diag apply, rows as (ncp,)", diag1d, x1, (16 + 8) * NCP * 4)

    # (b) pallas in-VMEM lane gather
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nbr = jnp.asarray(
            rng.integers(0, NCP, size=(4, NCP)).astype(np.int32)
            .reshape(4, NCP // 512, 512))
        xsrc = jnp.asarray(rng.normal(size=(NCP,)), dtype=jnp.float32)

        def gk(idx_ref, x_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0,
                                unique_indices=False, indices_are_sorted=False)

        @jax.jit
        def pgather(idx, xs):
            return pl.pallas_call(
                gk,
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, xs)

        r = pgather(nbr, xsrc)
        ref = np.asarray(xsrc)[np.asarray(nbr).ravel()].reshape(nbr.shape)
        err = np.abs(np.asarray(r) - ref).max()
        print(f"# pallas take(axis=0 of 1D src): works, err={err:.1e}", flush=True)
        timed("pallas gather 4*ncp from 1D VMEM src",
              lambda idx: pgather(idx, xsrc).astype(jnp.int32), nbr, 4 * NCP * 8)
    except Exception as e:
        print(f"# pallas 1D-src gather FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # (b2) gather along lanes of a 2D (8, N) source
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        xs2 = jnp.asarray(rng.normal(size=(8, NCP)), dtype=jnp.float32)
        nbr1 = jnp.asarray(rng.integers(0, NCP, size=(8, NCP)).astype(np.int32))

        def gk2(idx_ref, x_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

        @jax.jit
        def pgather2(idx, xs):
            return pl.pallas_call(
                gk2,
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, xs)

        r = pgather2(nbr1, xs2)
        ref = np.take_along_axis(np.asarray(xs2), np.asarray(nbr1), axis=1)
        err = np.abs(np.asarray(r) - ref).max()
        print(f"# pallas take_along_axis(lane) on (8,ncp): works, err={err:.1e}", flush=True)
        timed("pallas lane-gather (8,ncp) take_along_axis",
              lambda idx: pgather2(idx, xs2).astype(jnp.int32), nbr1, 8 * NCP * 8)
    except Exception as e:
        print(f"# pallas lane-gather FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # (c) XLA gather with 2D-tiled operand/indices
    xs = jnp.asarray(rng.normal(size=(NCP,)), dtype=jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, NCP, size=(4, NCP // 512, 512)).astype(np.int32))
    timed("XLA take from (ncp,), idx (4,238,512)",
          lambda i: (xs[i] + 1.0).astype(jnp.int32) & 0 | i,
          idx2, 4 * NCP * 8)


if __name__ == "__main__":
    import jax
    print(jax.__version__, flush=True)
    main()
