#!/usr/bin/env python3
"""Adaptive (count-triggered) preconditioner refresh: does it pay on the
EMIx AP window?  (VERDICT r4 item 3; reference analog: per-step AMG
re-setup, solver.py:727-742.)

Round-3 facts this must beat: a per-step-FRESH KNP two-level pc measured
ITERATION-IDENTICAL to the frozen one (the late-window KNP drift 18->49 is
operator-drift conditioning, not staleness), and the EMI spikes are
rhs-intrinsic (fresh pc still spikes).  The adaptive policy
(config.SolverParams.pc_refresh_factor) refreshes only when the last
step's total Krylov work exceeds factor x the best step since the last
refresh -- this measures whether ANY refresh schedule can win the window,
and what each refresh costs.

Protocol: 28 EMIx steps at production tolerances (pair layout), scan
blocks of 4, configs {no refresh, fixed every 8, adaptive 1.5x, 2.0x}.

Run on the TPU: python tools/exp_adaptive_refresh.py
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

N_STEPS = 28
BLOCK = 4


def run_config(mesh, name, **over):
    S, sp = bench.build(mesh=mesh, pair=True)
    sp = dataclasses.replace(sp, **over)

    refreshes = {"n": 0, "wall": 0.0}
    orig = S._refresh_pc

    def counting_refresh(state, sp_):
        t0 = time.perf_counter()
        out = orig(state, sp_)
        bench._scalar_sync(out["pc"]["emi"]["s"])
        refreshes["n"] += 1
        refreshes["wall"] += time.perf_counter() - t0
        return out

    S._refresh_pc = counting_refresh
    t0 = time.perf_counter()
    S.solve_system_active(N_STEPS * S.params.dt, 0.0, sp, scan_steps=BLOCK)
    wall = time.perf_counter() - t0
    emi = np.asarray(S.stats.emi_niters)
    knp = np.asarray([np.sum(x) for x in S.stats.knp_niters])
    print(f"{name:14s}: emi_total={int(emi.sum())} knp_total={int(knp.sum())}"
          f"  refreshes={refreshes['n']} ({refreshes['wall']:.1f} s)"
          f"  wall={wall:.1f} s ({wall/N_STEPS*1e3:.0f} ms/step incl refresh"
          f"+compile)", flush=True)
    print(f"   emi={emi.tolist()}")
    print(f"   knp={knp.tolist()}", flush=True)
    return emi, knp, refreshes, wall


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH

    mesh = load_emix_mesh(DEFAULT_MESH)
    run_config(mesh, "frozen", pc_refresh_every=0)
    run_config(mesh, "fixed8", pc_refresh_every=8)
    run_config(mesh, "adapt1.5", pc_refresh_factor=1.5)
    run_config(mesh, "adapt2.0", pc_refresh_factor=2.0)


if __name__ == "__main__":
    main()
