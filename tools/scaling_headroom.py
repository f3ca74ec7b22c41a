#!/usr/bin/env python3
"""Single-chip scale headroom (VERDICT r3 item 5).

The flagship EMIx mesh (121,617 tets / 486k EMI DoF) is small for a TPU.
This instrument scales the 3D axon-bundle workload to ~1-4M tets and runs
the reference 10-step protocol at production tolerances on each size,
recording ms/step, per-phase Krylov iteration counts, and the device HBM
footprint -- the table shows where memory or the gather floor bends.

Sizes (box_3d_axons(resolution_factor, length_factor), tets = nx*ny*nz*6):
    r1l2:  64 x 18 x 18 x 6 =   124,416   (bench synthetic stand-in)
    r1l4: 128 x 18 x 18 x 6 =   497,664   (~ the EMI DoF of the EMIx mesh)
    r2l2: 128 x 36 x 36 x 6 =   995,328
    r2l4: 256 x 36 x 36 x 6 = 1,990,656
    r3l1: 128 x 72 x 72 x 6 = 3,981,312

Run on the TPU: python tools/scaling_headroom.py [sizes...] [--over k=v ...]
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

SIZES = {
    "r1l2": (1, 2),
    "r1l4": (1, 4),
    "r2l2": (2, 2),
    "r2l4": (2, 4),
    "r3l1": (3, 1),
}
N_STEPS = 10
REPS = 3

# agg 64 everywhere: build_two_level's max_dense (default 4096) now
# switches to a THREE-level hierarchy automatically when nc/agg exceeds
# it, so the coarse no longer weakens with mesh size.  (The earlier
# workaround scaled agg with the mesh -- 256 at 995k tets cost EMI window
# iterations 103 -> 1475, measured; the dense level-1 coarse at agg 64
# OOMed at 926 MB + blocked-Cholesky workspace.)
AGG = {n: 64 for n in SIZES}

# SolverParams overrides applied to every size (e.g. the round-5 scale
# stack: emi_moment_host / emi_ritz_host / emi_ritz), set via
#   python tools/scaling_headroom.py r1l2 --over emi_ritz=64 emi_ritz_host=1
OVER = {}


def hbm_mb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st["bytes_in_use"] / 1e6, 1)
    except Exception:
        return None


def run_size(name):
    from knpemidg_tpu.mesh.generators import box_3d_axons

    r, l = SIZES[name]
    t0 = time.perf_counter()
    mesh = box_3d_axons(r, length_factor=l)
    mesh.vertices *= 1e2                     # m -> cm (emix unit system)
    t_mesh = time.perf_counter() - t0
    n_cells = len(mesh.cells)

    import dataclasses

    S, sp = bench.build(mesh=mesh)
    sp = dataclasses.replace(sp, agg_size=AGG[name], **OVER)
    t1 = time.perf_counter()
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("headroom", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, stats = blk(state)                  # compile + warm
    bench._scalar_sync(out["c"])
    t_setup = time.perf_counter() - t1
    mem = hbm_mb()

    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out, stats = blk(state)
        bench._scalar_sync(out["c"])
        walls.append(time.perf_counter() - t0)
    ms_step = float(np.median(walls)) / N_STEPS * 1e3
    emi = np.asarray(stats["emi_iters"]).reshape(-1)
    knp = np.asarray(stats["knp_iters"]).reshape(N_STEPS, -1).max(1)
    ok = bool(np.isfinite(np.asarray(out["c"])).all())
    row = {
        "size": name, "n_cells": n_cells,
        "emi_dof": n_cells * S.nd, "ms_per_step": round(ms_step, 2),
        "ms_per_cell_us": round(ms_step * 1e3 / n_cells, 4),
        "emi_total": int(emi.sum()), "knp_total": int(knp.sum()),
        "emi_iters": emi.tolist(), "knp_iters": knp.tolist(),
        "agg_size": AGG[name], "hbm_mb": mem, "mesh_build_s": round(t_mesh, 1),
        "setup_compile_s": round(t_setup, 1), "finite": ok,
    }
    print(row)
    return row


def _parse_over(argv):
    """Split argv into size names and --over k=v SolverParams overrides."""
    names, i = [], 0
    while i < len(argv) and argv[i] != "--over":
        names.append(argv[i])
        i += 1
    for kv in argv[i + 1:]:
        k, v = kv.split("=", 1)
        OVER[k] = (v.lower() in ("1", "true") if v.lower() in
                   ("0", "1", "true", "false") else
                   (int(v) if v.lstrip("-").isdigit() else float(v)))
    return names


def main():
    names = _parse_over(sys.argv[1:]) or list(SIZES)
    rows = []
    for n in names:
        try:
            rows.append(run_size(n))
        except Exception as e:
            print({"size": n, "error": repr(e)})
    print("\n| size | tets | EMI DoF | ms/step | us/cell/step | EMI iters "
          "| KNP iters | HBM MB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['size']} | {r['n_cells']:,} | {r['emi_dof']:,} "
              f"| {r['ms_per_step']} | {r['ms_per_cell_us']} "
              f"| {r['emi_total']} | {r['knp_total']} | {r['hbm_mb']} |")


if __name__ == "__main__":
    main()
