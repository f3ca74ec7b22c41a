#!/usr/bin/env python3
"""A/B the HOST f64 Ritz harvest (emi_ritz_host) against the device f32
harvest on the flagship EMIx window.

Why: the f32 device Lanczos is CHAOTIC -- ulp-level program changes
resample its deflation quality (round-4 session 3: one reassociated
einsum moved the flagship's first-step EMI count 94 <-> 227 on CPU-f32).
The host f64 recursion (solvers/twolevel.ritz_lanczos_W_host) is
deterministic.  This measures whether determinism costs or buys window
iterations, and what the one-time harvest adds to pc-build time.

Run on the TPU: python tools/exp_ritz_host.py
"""
import dataclasses
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

N_STEPS = 14
REPS = 3


def run_config(mesh, name, **over):
    S, sp = bench.build(mesh=mesh, pair=True)
    sp = dataclasses.replace(sp, **over)
    t0 = time.perf_counter()
    state = S.attach_pc(S._initial_state(0.0), sp)
    bench._scalar_sync(state["phi_M"])
    t_pc = time.perf_counter() - t0
    blk = S._jit(("ritz_host_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    knp = np.asarray(st["knp_iters"]).reshape(N_STEPS, -1).max(1)
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls)) / N_STEPS * 1e3
    print(f"{name:12s}: emi={emi.tolist()} total={int(emi.sum())}  "
          f"knp_total={int(knp.sum())}  {wall:.1f} ms/step  "
          f"pc build {t_pc:.1f} s", flush=True)
    return emi, knp, wall, np.asarray(out["c"])


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH
    from knpemidg_tpu.mesh.generators import box_3d_axons

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2

    r0 = run_config(mesh, "ritz0", emi_ritz=0)
    rd = run_config(mesh, "device24")
    rh = run_config(mesh, "host24", emi_ritz_host=True)

    c0 = r0[3]
    for name, r in [("device24", rd), ("host24", rh)]:
        dev = np.max(np.abs(r[3] - c0) / (np.abs(c0) + 1e-30))
        print(f"{name}: max rel dc vs ritz0 = {dev:.2e}")


if __name__ == "__main__":
    main()
