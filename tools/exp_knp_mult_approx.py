#!/usr/bin/env python3
"""KNP preconditioner A/B on the production EMIx workload (VERDICT r3
item 3 follow-up): additive two-level vs the symmetric V-cycle.

ROUND-4 RESULTS (14-step window, reference tolerances, emi_ritz=16,
deterministic iteration counts; this file is the measurement record):

  additive (default)    : knp_total  366           wall 180.5 ms/step
  two_level_mult_approx : knp_total 14280 DIVERGED wall 2657.7 ms/step
  two_level_mult        : knp_total  214 (-41.5%)  wall 411.1 ms/step

* 'two_level_mult_approx' (a zero-matvec multiplicative cycle whose
  coarse correction used the coarse-space residual R r - Ac R z) was
  REMOVED after this measurement: it is algebraically vacuous -- with the
  same Ac in the residual and the solve, P Ac^{-1}(R r - Ac R z)
  = P Ac^{-1} R r - P R z, i.e. it never sees A's true action on the
  smoothed iterate, it just subtracts the iterate's chunk means.  On EMIx
  the KNP GMRES stalls at the iteration cap.  Any real multiplicative
  coupling needs the fine matvec.
* 'two_level_mult' (kept as an option) cuts KNP iteration counts 41.5%
  (drift growth 17->46 becomes 12->22) but pays two gather-bound batched
  matvecs per apply: wall is a clear LOSS at these counts (+230 ms/step
  here; the round-3 "wash" verdict was at pre-ritz iteration counts).
  Its trajectory also drifts to dc ~6e-3 vs additive: the V-cycle pc-norm
  stopping test is weaker in true residual at rtol 1e-7 in f32.

Conclusion: additive two-level stays the production default; the KNP
drift growth is an intrinsic conditioning trend, already bounded by the
coarse correction, and the remaining lever is per-iteration cost (the
gather floor), not counts.

Run on the TPU: python tools/exp_knp_mult_approx.py
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


def run_variant(S, sp, name):
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("knp_pc_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    knp = np.asarray(st["knp_iters"]).reshape(N_STEPS, -1).max(1)
    conv = bool(np.all(np.asarray(st["knp_converged"])))
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{name:22s}: knp={knp.tolist()} total={int(knp.sum())}  "
          f"emi_total={int(emi.sum())}  conv={conv}  "
          f"wall {w*1e3:.1f} ms ({w/N_STEPS*1e3:.1f} ms/step)")
    return knp, w, np.asarray(out["c"]), conv


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
    for name, kind in (("additive (default)", ""),
                       ("two_level_mult", "two_level_mult")):
        sp = dataclasses.replace(sp0, precond_knp=kind)
        res[name] = run_variant(S, sp, name)

    base_knp, base_w, base_c, _ = res["additive (default)"]
    print("\nsummary:")
    for name, (knp, w, c, conv) in res.items():
        rel = float(np.max(np.abs(c - base_c)
                           / np.maximum(np.abs(base_c), 1e-30)))
        print(f"  {name:22s}: knp_total {int(knp.sum()):4d} "
              f"({(knp.sum()-base_knp.sum())/base_knp.sum()*100:+.1f}%)  "
              f"wall {w/N_STEPS*1e3:6.1f} ms/step "
              f"({(w-base_w)/N_STEPS*1e3:+.1f})  max rel dc {rel:.2e}")


if __name__ == "__main__":
    main()
