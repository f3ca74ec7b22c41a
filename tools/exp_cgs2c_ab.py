#!/usr/bin/env python3
"""A/B the chunked CGS2 orthogonalization ('cgs2c') for the batched KNP
GMRES on the EMIx production workload (pair layout, bench config).

Motivation: at restart 30 the full-basis CGS2 einsums read all 31 basis
rows four times per Arnoldi step (~480 MB at EMIx size) even though only
j+1 rows are populated; 'cgs2c' bounds a chunked while_loop at
ceil((j+1)/8) chunks so the traffic scales with the iteration number.
Projections are identical in exact arithmetic (rows > j are zero), so
iteration counts should match modulo f32 reduction-order noise.

Run on the TPU: python tools/exp_cgs2c_ab.py
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


def run_one(orth: str, mesh, rot: str = "replay"):
    import dataclasses

    S, sp = bench.build(mesh=mesh, pair=True)
    sp = dataclasses.replace(sp, gmres_orth=orth, gmres_rot=rot)
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("cgs_ab", N_STEPS, sp), S.fused_block(sp, N_STEPS))
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
    print(f"{orth}/{rot}: emi={emi.tolist()} total={int(emi.sum())} "
          f"knp={knp.tolist()} total={int(knp.sum())} conv={conv} "
          f"wall {w/N_STEPS*1e3:.1f} ms/step (compile+warm {t_compile:.0f} s)",
          flush=True)
    if getattr(S, "_cell_unpad_idx", None) is not None:
        from knpemidg_tpu.parallel.sharding import unpad_state

        out = unpad_state(S, out)
    return emi, knp, w, np.asarray(out["c"])


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH

    mesh = load_emix_mesh(DEFAULT_MESH)
    print(f"# backend={jax.default_backend()}", flush=True)
    e_a, k_a, w_a, c_a = run_one("cgs2", mesh)
    e_b, k_b, w_b, c_b = run_one("cgs2c", mesh)
    e_c, k_c, w_c, c_c = run_one("cgs2c", mesh, rot="carry")
    e_d, k_d, w_d, c_d = run_one("cgs2", mesh, rot="carry")
    for name, (k, w, c) in {"cgs2c": (k_b, w_b, c_b),
                            "cgs2c+carry": (k_c, w_c, c_c),
                            "cgs2+carry": (k_d, w_d, c_d)}.items():
        rel = float(np.max(np.abs(c_a - c)) / np.max(np.abs(c_a)))
        print(f"# {name} vs cgs2: {w / w_a * 100 - 100:+.1f}% wall, "
              f"knp iters {int(k.sum())} vs {int(k_a.sum())}, "
              f"max rel dc {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
