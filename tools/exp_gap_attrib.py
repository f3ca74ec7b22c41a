#!/usr/bin/env python3
"""Itemize the per-step cost of the fused EMIx block (VERDICT r3 item 1).

Method: time fused blocks of n = 1,2,4,6,8,10 steps (same initial state,
deterministic trajectory prefixes -- rerun iteration counts are bit-identical
on TPU, measured r4), then least-squares

    wall(n) = overhead + fixed*n + c_emi*emi_total(n) + c_knp*knp_total(n)

(knp_total = per-step max over ions: the batched GMRES iterates until the
slowest ion converges).  The fit decomposes the honest block wall into
per-block overhead (dispatch + sync RTT), per-step fixed cost (ODE +
assemblies + setups + finalize), and per-iteration Krylov costs -- closing
the bench-vs-device-trace gap to the millisecond.

Run on the TPU: python tools/exp_gap_attrib.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

import bench

REPS = 5
LENGTHS = (1, 2, 4, 6, 8, 10)


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH
    from knpemidg_tpu.mesh.generators import box_3d_axons

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2

    S, sp = bench.build(mesh=mesh)
    state = S.attach_pc(S._initial_state(0.0), sp)

    rows = []           # (n, wall_s, emi_total, knp_total)
    for n in LENGTHS:
        block = S._jit(("bench_block", n, sp), S.fused_block(sp, n))
        out, stats = block(state)                      # compile + warm
        bench._scalar_sync(out["c"])
        emi = np.asarray(stats["emi_iters"]).reshape(n)
        knp = np.asarray(stats["knp_iters"]).reshape(n, -1).max(axis=1)
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out, stats = block(state)
            bench._scalar_sync(out["c"])
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        rows.append((n, w, int(emi.sum()), int(knp.sum())))
        print(f"n={n:2d}: median {w*1e3:8.1f} ms  (all {np.round(np.asarray(walls)*1e3,1)})"
              f"  emi_total={emi.sum():4d} knp_total={knp.sum():4d}  emi={emi}")

    # least squares: wall = overhead + fixed*n + a*emi + b*knp
    A = np.array([[1.0, n, e, k] for n, _, e, k in rows])
    y = np.array([w for _, w, _, _ in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ coef
    print("\nfit: overhead %.1f ms/block, fixed %.2f ms/step, "
          "EMI %.3f ms/iter, KNP %.3f ms/iter" %
          (coef[0] * 1e3, coef[1] * 1e3, coef[2] * 1e3, coef[3] * 1e3))
    for (n, w, e, k), p in zip(rows, pred):
        print(f"  n={n:2d}: measured {w*1e3:8.1f}  model {p*1e3:8.1f}  "
              f"residual {(w-p)*1e3:+6.1f} ms")
    n, w, e, k = rows[-1]
    print("\n10-step block itemization (ms/step):")
    print(f"  overhead/10   : {coef[0]*1e3/10:6.1f}")
    print(f"  fixed         : {coef[1]*1e3:6.1f}")
    print(f"  EMI  ({e:3d} it): {coef[2]*e*1e3/10:6.1f}")
    print(f"  KNP  ({k:3d} it): {coef[3]*k*1e3/10:6.1f}")
    print(f"  total model   : {(pred[-1])*1e3/10:6.1f}   measured {w*1e2:6.1f}")


if __name__ == "__main__":
    main()
