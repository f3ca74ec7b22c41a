#!/usr/bin/env python3
"""A/B the KNP Ritz deflation (knp_ritz) on the EMIx 14-step window.

KNP is the larger Krylov cost post-emi_ritz (366 vs 196 iters/window);
its counts GROW 17->46 through the window as |grad phi| drift
strengthens.  A fresh pc does NOT help (identical counts, round 3) and
the true V-cycle halves counts but loses on wall (round 4) -- this tests
whether deflating the slowest preconditioned modes (harvested once at
t=0, f64 host Galerkin, additive apply: no extra matvec) flattens the
growth the way emi_ritz collapsed the EMI spike steps.

Protocol: EMIx production workload, 14-step window, deterministic counts.
Run on the TPU: python tools/exp_knp_ritz.py
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

import dataclasses
import numpy as np

import bench

REPS = 5
N_STEPS = 14

CONFIGS = [
    ("knp_ritz=0 (default)", dict(knp_ritz=0)),
    ("knp_ritz=8", dict(knp_ritz=8)),
    ("knp_ritz=16", dict(knp_ritz=16)),
    ("knp_ritz=32", dict(knp_ritz=32)),
]


def run_config(S, sp, name):
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("knp_ritz_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    knp = np.asarray(st["knp_iters"]).reshape(N_STEPS, -1).max(1)
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    conv = bool(np.all(np.asarray(st["knp_converged"])))
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{name:22s}: knp={knp.tolist()} total={int(knp.sum())} "
          f"emi_total={int(emi.sum())} conv={conv} "
          f"wall {w/N_STEPS*1e3:.1f} ms/step", flush=True)
    return knp, w, np.asarray(out["c"])


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH
    from knpemidg_tpu.mesh.generators import box_3d_axons

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2

    S, sp0 = bench.build(mesh=mesh)

    res = {}
    for name, kw in CONFIGS:
        sp = dataclasses.replace(sp0, **kw)
        try:
            res[name] = run_config(S, sp, name)
        except Exception as e:
            print(f"{name:22s}: FAILED {e!r}")

    base = CONFIGS[0][0]
    if base in res:
        knp0, w0, c0 = res[base]
        print("\nsummary (vs no-knp-ritz base):")
        for name, (knp, w, c) in res.items():
            rel = float(np.max(np.abs(c - c0)
                               / np.maximum(np.abs(c0), 1e-30)))
            d = int(knp.sum()) - int(knp0.sum())
            print(f"  {name:22s}: total {int(knp.sum()):4d} ({d:+d}, "
                  f"{d/max(int(knp0.sum()),1)*100:+.1f}%)  "
                  f"wall {w/N_STEPS*1e3:6.1f} ms/step  max rel dc {rel:.2e}")


if __name__ == "__main__":
    main()
