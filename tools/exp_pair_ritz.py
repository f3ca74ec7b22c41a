#!/usr/bin/env python3
"""Does EMI Ritz deflation pay on the PAIR layout once the harvest uses the
PRODUCTION preconditioner?

Round 4 measured ritz24 on the pair layout as a LOSS (181 -> 254 window
iters) and shipped AUTO-off there (config.py emi_ritz rationale).  But that
measurement harvested with the FULL-pair block-Jacobi while the production
solve runs pair_bj='halves' + live mask -- the Lanczos targeted the small
modes of a different preconditioned operator.  solver._build_pc now matches
the harvest preconditioner to production; this A/Bs ritz {0, 16, 24, 32}
on the EMIx 14-step window, pair layout, production tolerances.

Run on the TPU: python tools/exp_pair_ritz.py
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
    blk = S._jit(("pair_ritz_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
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
    results = {}
    for n in (16, 24, 32):
        results[n] = run_config(mesh, f"ritz{n}", emi_ritz=n)

    c0 = r0[3]
    for n, r in results.items():
        dev = np.max(np.abs(r[3] - c0) / (np.abs(c0) + 1e-30))
        print(f"ritz{n}: max rel dc vs ritz0 = {dev:.2e}")


if __name__ == "__main__":
    main()
