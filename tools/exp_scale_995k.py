#!/usr/bin/env python3
"""The 995k-tet EMI iteration blowup (VERDICT r4 item 1 / ROADMAP item 12):
execute the three diagnosed levers and measure.

At 995k tets the EMI window total is 1432-1475 vs ~103-140 at 124k -- the
finer mesh excites membrane harmonics past the order-2-moment + 24-Ritz
deflation budget (hypre BoomerAMG keeps EMI counts mesh-size-flat,
reference solver.py:425-444).  Levers:
  (a) emi_moment_order=3 with the NEW host-f64 moment Galerkin
      (emi_moment_host; the round-3 "order 3 doubles counts" burial was
      an f32-device-Galerkin-noise artifact);
  (b) a scaled Ritz budget (emi_ritz 48/64, k = 2*n);
  (c) the deterministic f64 host harvest (emi_ritz_host) at scale.

Protocol: 10-step box_3d_axons(2, 2) = 995,328 tets at production
tolerances, cell layout (the scaling-table configuration).

Run on the TPU: python tools/exp_scale_995k.py [config ...]
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

N_STEPS = 10
REPS = 2

CONFIGS = {
    "base": {},
    "mom3host": dict(emi_moment_order=3, emi_moment_host=True),
    "ritz64host": dict(emi_ritz=64, emi_ritz_host=True),
    "mom3+ritz64": dict(emi_moment_order=3, emi_moment_host=True,
                        emi_ritz=64, emi_ritz_host=True),
    "mom4host": dict(emi_moment_order=4, emi_moment_host=True),
    "mom4+ritz64": dict(emi_moment_order=4, emi_moment_host=True,
                        emi_ritz=64, emi_ritz_host=True),
    # lever (e): per-compartment moment order -- order 3/4 only on the
    # membrane-rich ICS compartments (host-f64 Galerkin, host-built W:
    # the flat mom3host OOM'ed on the doubled device W residency)
    "mom3ics": dict(emi_moment_order_ics=3, emi_moment_host=True),
    "mom4ics": dict(emi_moment_order_ics=4, emi_moment_host=True),
    "mom3ics+ritz64": dict(emi_moment_order_ics=3, emi_moment_host=True,
                           emi_ritz=64, emi_ritz_host=True),
    "mom4ics+ritz64": dict(emi_moment_order_ics=4, emi_moment_host=True,
                           emi_ritz=64, emi_ritz_host=True),
    # lever (d), found after (a)-(c): the fixed 1e-5 ridge on the
    # EQUILIBRATED coarse matrix caps the smallest genuine coarse modes,
    # which shrink as the chunk count grows (~8k chunks at 995k vs ~2k at
    # EMIx size) -- exactly the modes the coarse level exists to treat.
    "ridge1e-6": dict(coarse_ridge=1e-6),
    "ridge1e-7": dict(coarse_ridge=1e-7),
    "ridge1e-8": dict(coarse_ridge=1e-8),
    "ridge1e-7+ritz64": dict(coarse_ridge=1e-7, emi_ritz=64,
                             emi_ritz_host=True),
}

_MESH = None


def get_mesh():
    global _MESH
    if _MESH is None:
        from knpemidg_tpu.mesh.generators import box_3d_axons

        t0 = time.perf_counter()
        _MESH = box_3d_axons(2, length_factor=2)
        _MESH.vertices *= 1e2                  # m -> cm (emix unit system)
        print(f"mesh: {len(_MESH.cells)} tets ({time.perf_counter()-t0:.0f} s)",
              flush=True)
    return _MESH


def run_config(name):
    over = CONFIGS[name]
    S, sp = bench.build(mesh=get_mesh())
    sp = dataclasses.replace(sp, **over)
    t0 = time.perf_counter()
    state = S.attach_pc(S._initial_state(0.0), sp)
    bench._scalar_sync(state["phi_M"])
    t_pc = time.perf_counter() - t0
    blk = S._jit(("scale995", N_STEPS, sp), S.fused_block(sp, N_STEPS))
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
    ms = float(np.median(walls)) / N_STEPS * 1e3
    n_cells = len(get_mesh().cells)
    print(f"{name:12s}: emi={emi.tolist()} total={int(emi.sum())}  "
          f"knp_total={int(knp.sum())}  {ms:.0f} ms/step "
          f"({ms*1e3/n_cells:.2f} us/cell)  pc build {t_pc:.0f} s",
          flush=True)
    return emi, knp, ms, np.asarray(out["c"])


def main():
    names = sys.argv[1:] or ["base", "mom3host", "ritz64host", "mom3+ritz64"]
    results = {}
    for n in names:
        try:
            results[n] = run_config(n)
        except Exception as e:
            print(f"{n}: FAILED {e!r}", flush=True)
    if "base" in results and len(results) > 1:
        c0 = results["base"][3]
        for n, r in results.items():
            if n == "base":
                continue
            dev = np.max(np.abs(r[3] - c0) / (np.abs(c0) + 1e-30))
            print(f"{n}: max rel dc vs base = {dev:.2e}")


if __name__ == "__main__":
    main()
