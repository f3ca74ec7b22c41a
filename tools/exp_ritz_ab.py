#!/usr/bin/env python3
"""Re-litigate the EMI cross-step Ritz deflation (VERDICT r3 item 2).

Round 3 measured emi_ritz=16 at 201 vs 240 EMI iterations over a 12-step
window and called it "inside trajectory noise" (reruns varied 240-326).
Round 4 established that the noise was a host-side retrace artifact --
iteration counts are BIT-IDENTICAL across reruns of the same compiled
block -- so the A/B is now clean and cheap.

Protocol: the EMIx production workload, a 14-step window (the AP upstroke
spike steps land inside it), reference tolerances.  Configurations:

  base        two-level + moment deflation (production default)
  ritz16@0    emi_ritz=16 harvested from the t=0 rhs (round-3 config)
  ritz16@3    pc refreshed WITH the Ritz harvest after 3 steps (the
              cross-step variant: harvest sees an AP-window rhs)
  ritz32@3    wider harvest at the refreshed state

For each: per-step EMI iteration counts, window total, wall median over
REPS reruns of the post-warmup block, and final-state agreement with base
(equal-accuracy check: all runs converge to the same rtol, so states must
agree at solver-tolerance level).

Run on the TPU: python tools/exp_ritz_ab.py
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
WARM = 3          # steps before the pc refresh in the @3 configs
N_STEPS = 14      # total window length


def run_config(S, sp_base, name, ritz=0, refresh_at=None):
    """Returns (emi_per_step, knp_per_step, wall_med_s, final_c)."""
    sp_ritz = dataclasses.replace(sp_base, emi_ritz=ritz)
    state = S.attach_pc(S._initial_state(0.0),
                        sp_base if refresh_at else sp_ritz)
    sp_run = sp_base if (ritz and refresh_at) else sp_ritz

    emi_all, knp_all = [], []
    if refresh_at:
        blk_w = S._jit(("ritz_ab", WARM, sp_run), S.fused_block(sp_run, WARM))
        state, st = blk_w(state)
        bench._scalar_sync(state["c"])
        emi_all += np.asarray(st["emi_iters"]).reshape(-1).tolist()
        knp_all += np.asarray(st["knp_iters"]).reshape(WARM, -1).max(1).tolist()
        t0 = time.perf_counter()
        state = S._refresh_pc(state, sp_ritz)
        bench._scalar_sync(state["phi_M"])
        t_refresh = time.perf_counter() - t0
        n_rest = N_STEPS - WARM
        sp_run = sp_ritz
    else:
        t_refresh = 0.0
        n_rest = N_STEPS

    blk = S._jit(("ritz_ab", n_rest, sp_run, ritz > 0),
                 S.fused_block(sp_run, n_rest))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    emi_all += np.asarray(st["emi_iters"]).reshape(-1).tolist()
    knp_all += np.asarray(st["knp_iters"]).reshape(n_rest, -1).max(1).tolist()

    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))

    print(f"{name:10s}: emi={emi_all} total={sum(emi_all)}  "
          f"knp_total={sum(knp_all)}  "
          f"wall(last {n_rest} steps) {wall*1e3:.1f} ms "
          f"({wall/n_rest*1e3:.1f} ms/step)"
          + (f"  refresh {t_refresh*1e3:.0f} ms" if refresh_at else ""))
    return emi_all, knp_all, wall, np.asarray(out["c"])


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

    res = {}
    res["base"] = run_config(S, sp, "base")
    res["ritz16@0"] = run_config(S, sp, "ritz16@0", ritz=16)
    res["ritz16@3"] = run_config(S, sp, "ritz16@3", ritz=16, refresh_at=WARM)
    res["ritz32@3"] = run_config(S, sp, "ritz32@3", ritz=32, refresh_at=WARM)

    c0 = res["base"][3]
    base_total = sum(res["base"][0])
    base_tail = sum(res["base"][0][WARM:])
    print("\nsummary (window EMI totals, equal-accuracy check):")
    for k, (emi, knp, wall, c) in res.items():
        rel = float(np.max(np.abs(c - c0) / np.maximum(np.abs(c0), 1e-30)))
        tail = sum(emi[WARM:])
        print(f"  {k:10s}: total {sum(emi):4d} ({sum(emi)-base_total:+d}, "
              f"{(sum(emi)-base_total)/base_total*100:+.1f}%)  "
              f"tail(steps {WARM}..{N_STEPS-1}) {tail:4d} "
              f"({(tail-base_tail)/base_tail*100:+.1f}%)  "
              f"max rel dc vs base {rel:.2e}")


if __name__ == "__main__":
    main()
