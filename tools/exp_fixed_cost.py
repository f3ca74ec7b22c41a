#!/usr/bin/env python3
"""Experiments on the EMIx step's cost structure (one sync per 12-step
block):

  base      -- production settings (order-2 moments, restart 30)
  maxit1    -- max_it_emi = max_it_knp = 1: the per-step FIXED cost
               (ODE + both assemblies + finalize + 1 Krylov iter each)
  restart16 / restart20 -- KNP GMRES basis-size effect (CGS2 reads the
               whole static-shaped basis every iteration)
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

N_WARM, N_MEAS = 2, 12


def main(which=("base", "maxit1", "restart16", "restart20")):
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams

    mesh = load_emix_mesh(DEFAULT_MESH)
    s0 = jax.jit(lambda a: jnp.asarray(a).ravel()[0] * 1.0)

    def sync(v):
        return float(np.asarray(s0(jax.tree_util.tree_leaves(v)[0])))

    base = dict(direct_emi=False, direct_knp=False,
                rtol_emi=1e-5, atol_emi=1e-40,
                rtol_knp=1e-7, atol_knp=2e-40,
                max_it_emi=1000, max_it_knp=1000,
                gmres_restart=30, agg_size=64)
    variants = {
        "base": {},
        "maxit1": dict(max_it_emi=1, max_it_knp=1),
        "restart16": dict(gmres_restart=16),
        "restart20": dict(gmres_restart=20),
        "bicgstab": dict(knp_solver="bicgstab"),
        # restart=1 + max_it 1: ONE Arnoldi step and one CG iter -- the
        # true per-step fixed cost (ODE + assemblies + solve setup +
        # finalize)
        "maxit1b": dict(max_it_emi=1, max_it_knp=1, gmres_restart=1),
        "knp_freshpc": {},
        "cgs1": dict(gmres_orth="cgs1"),
        "knp_mult": dict(precond_knp="two_level_mult"),
        "ritz8": dict(emi_ritz=8),
        "ritz16": dict(emi_ritz=16),
        "emi_mult": dict(precond="two_level_mult", precond_knp="two_level"),
    }
    for name in which:
        S = build_solver(mesh=mesh)
        sp = SolverParams(**{**base, **variants.get(name, {})})
        t0 = time.perf_counter()
        state = S.attach_pc(S._initial_state(0.0), sp)
        if name == "knp_freshpc":
            # drop the frozen KNP coarse data: _knp_solve_all then rebuilds
            # the two-level data INSIDE the jitted step from the current
            # blocks (the pcK=None path) -- no drift, extra per-step build
            state = dict(state, pc={"emi": state["pc"]["emi"]})
        warm = S._jit(("expw", N_WARM, sp), S.fused_block(sp, N_WARM))
        state, _ = warm(state)
        sync(state["c"])
        block = S._jit(("expb", N_MEAS, sp), S.fused_block(sp, N_MEAS))
        out, st = block(state)
        sync(out["c"])
        t1 = time.perf_counter()
        out, st = block(state)
        sync(out["c"])
        wall = time.perf_counter() - t1
        emi = np.asarray(st["emi_iters"]).tolist()
        knp = np.asarray(st["knp_iters"]).max(axis=1).tolist()
        print(f"{name:10s}: {wall*1e3/N_MEAS:8.2f} ms/step  "
              f"emi_sum={sum(emi)}  knp_max_per_step={knp}  "
              f"[compile {t1-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("base", "maxit1", "restart16", "restart20"))
