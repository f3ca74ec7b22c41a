#!/usr/bin/env python3
"""Is the pair layout's +11% KNP window-iteration cost really chunk
composition?  (VERDICT r4 item 2b.)

The two pair orderings -- interleaved (pair p = slots 2p, 2p+1; pads
interspersed at dead halves) and representative-ordered (legacy
interleave=False) -- give the preconditioner's contiguous chunks
DIFFERENT cell compositions, while the operator, matching, and rounding
paths are otherwise identical.  If KNP window counts move materially
between them, chunk composition is load-bearing and boundary alignment
could pay; if they sit within the usual trajectory spread, the +11%
gap to the cell layout is not a chunk-boundary effect.

Economics context (host measurement, round 5): EXACT chunk alignment is
dead either way --
  * matching restricted to 64-cell Morton blocks: match rate 95.3% ->
    86.4%, per-block pair count p50 36 / max 41, so uniform padding to
    P=44 inflates the matvec to 83,644 pairs (+31% gather indices);
  * unrestricted matching assigned to chunks by representative cell:
    28.7% of pairs straddle chunk boundaries, per-chunk count max 43,
    same +19..31% padding;
and the KNP matvec is the dominant per-iteration cost, so >=19% matvec
inflation cannot buy back an 11% count win.

Run on the TPU: python tools/exp_pair_knp_chunks.py
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


def run_config(mesh, name, interleave):
    from run_EMIx_simulation import build_solver
    from knpemidg_tpu.config import SolverParams

    S = build_solver(mesh=mesh)
    S.enable_pair_layout(interleave=interleave)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=30,
                      agg_size=64)
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("knp_chunks_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    knp_steps = np.asarray(st["knp_iters"]).reshape(N_STEPS, -1).max(1)
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls)) / N_STEPS * 1e3
    print(f"{name:14s}: emi_total={int(emi.sum())}  "
          f"knp={knp_steps.tolist()} knp_total={int(knp_steps.sum())}  "
          f"{wall:.1f} ms/step", flush=True)
    return emi, knp_steps, wall


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH

    mesh = load_emix_mesh(DEFAULT_MESH)
    run_config(mesh, "interleaved", True)
    run_config(mesh, "repr-ordered", False)


if __name__ == "__main__":
    main()
