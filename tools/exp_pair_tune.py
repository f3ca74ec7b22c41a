#!/usr/bin/env python3
"""Pair-layout tuning on the EMIx workload (follow-up to exp_pair_ab):

1. pair_bj 'full' vs 'halves' -- is the KNP count regression (+17% at
   'full') caused by the stronger pair smoother unbalancing the additive
   two-level sum?  'halves' reproduces the cell smoother exactly.
2. tight-tolerance accuracy check -- is the 9.1e-3 dc deviation between
   layouts tolerance-driven trajectory spread (shrinks with rtol) or an
   f32 accuracy bug in the pair path (does not shrink)?

Run on the TPU: python tools/exp_pair_tune.py
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

REPS = 3
N_STEPS = 14


def run_one(S, sp, name):
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("pair_tune", N_STEPS, sp), S.fused_block(sp, N_STEPS))
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
    w = float(np.median(walls))
    conv = (bool(np.all(np.asarray(st["emi_converged"]))),
            bool(np.all(np.asarray(st["knp_converged"]))))
    print(f"{name:22s}: emi_total={int(emi.sum())} knp_total={int(knp.sum())}"
          f" knp={knp.tolist()} conv={conv} wall {w/N_STEPS*1e3:.1f} ms/step",
          flush=True)
    if getattr(S, "_cell_unpad_idx", None) is not None:
        from knpemidg_tpu.parallel.sharding import unpad_state

        out = unpad_state(S, out)     # interleaved pair order
    return emi, knp, w, np.asarray(out["c"])


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH
    from knpemidg_tpu.mesh.generators import box_3d_axons

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2

    S0, sp = bench.build(mesh=mesh)
    S1, _ = bench.build(mesh=mesh)
    S1.enable_pair_layout()

    tight = dataclasses.replace(sp, rtol_emi=1e-6, rtol_knp=1e-8)

    _, _, w_c, c_c = run_one(S0, sp, "cell")
    _, _, w_f, c_f = run_one(S1, sp, "pair full")
    _, _, w_h, c_h = run_one(S1, dataclasses.replace(sp, pair_bj="halves"),
                             "pair halves")
    _, _, _, c_ct = run_one(S0, tight, "cell tight")
    _, _, _, c_ft = run_one(S1, tight, "pair full tight")

    rel = lambda a, b: float(np.max(np.abs(a - b)
                                    / np.maximum(np.abs(b), 1e-30)))
    print(f"\nproduction-tol dc: pair-full vs cell {rel(c_f, c_c):.2e}, "
          f"pair-halves vs cell {rel(c_h, c_c):.2e}")
    print(f"tight-tol dc: pair-full vs cell {rel(c_ft, c_ct):.2e} "
          f"(tolerance-driven if << the production number)")


if __name__ == "__main__":
    main()
