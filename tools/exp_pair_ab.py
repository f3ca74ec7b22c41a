#!/usr/bin/env python3
"""A/B the pair-block operator layout on the EMIx production workload.

The standalone matvec measured 0.856 vs 1.327 ms/apply (-35.5%,
tools/exp_pair_matvec.py).  This runs the FULL fused 14-step window with
solver.enable_pair_layout() vs the cell layout: per-step wall, iteration
counts (the pair block-Jacobi sees intra-pair coupling, so counts may
drop too), and solution agreement.

Run on the TPU: python tools/exp_pair_ab.py
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

REPS = 5
N_STEPS = 14


def run_one(pair: bool, mesh):
    S, sp = bench.build(mesh=mesh)
    if pair:
        t0 = time.perf_counter()
        S.enable_pair_layout()
        print(f"# pair maps built in {time.perf_counter()-t0:.1f} s; "
              f"npair={int(S.pairs['int_f'].shape[0])} "
              f"match={float(np.asarray(S.pairs['live1']).mean())*100:.1f}%",
              flush=True)
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("pair_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    t0 = time.perf_counter()
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    t_compile = time.perf_counter() - t0
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    knp = np.asarray(st["knp_iters"]).reshape(N_STEPS, -1).max(1)
    conv = (bool(np.all(np.asarray(st["emi_converged"]))),
            bool(np.all(np.asarray(st["knp_converged"]))))
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    name = "pair" if pair else "cell"
    print(f"{name:5s}: emi={emi.tolist()} total={int(emi.sum())} "
          f"knp={knp.tolist()} total={int(knp.sum())} conv={conv} "
          f"wall {w/N_STEPS*1e3:.1f} ms/step (compile+warm {t_compile:.0f} s)",
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

    emi0, knp0, w0, c0 = run_one(False, mesh)
    emi1, knp1, w1, c1 = run_one(True, mesh)

    rel = float(np.max(np.abs(c1 - c0) / np.maximum(np.abs(c0), 1e-30)))
    print(f"\npair vs cell: wall {w1/N_STEPS*1e3:.1f} vs {w0/N_STEPS*1e3:.1f}"
          f" ms/step ({(w1/w0-1)*100:+.1f}%)  emi {int(emi1.sum())} vs "
          f"{int(emi0.sum())}  knp {int(knp1.sum())} vs {int(knp0.sum())}  "
          f"max rel dc {rel:.2e}")


if __name__ == "__main__":
    main()
