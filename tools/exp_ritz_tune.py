#!/usr/bin/env python3
"""Tune the EMI deflation mix now that the Ritz harvest is genuinely f64
(round 4): does ritz subsume the order-2 moment deflation, and does a
wider t=0 harvest cut deeper?

The moment correction carries 63 fields (9 monomials x 7 compartments) =
122 MB of Galerkin bandwidth per CG apply on the EMIx mesh; the ritz
correction carries n_ritz fields.  If ritz16/24 alone matches
mom2+ritz16's counts, the apply gets ~0.25 ms cheaper and setup lighter.

Protocol: EMIx production workload, 14-step window, deterministic counts.
Run on the TPU: python tools/exp_ritz_tune.py
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
    ("mom2+ritz0 (r3 base)", dict(emi_moment_order=2, emi_ritz=0)),
    ("mom2+ritz16 (default)", dict(emi_moment_order=2, emi_ritz=16)),
    ("mom2+ritz24", dict(emi_moment_order=2, emi_ritz=24)),
    ("mom0+ritz16", dict(emi_moment_order=0, emi_ritz=16)),
    ("mom0+ritz24", dict(emi_moment_order=0, emi_ritz=24)),
    ("mom1+ritz16", dict(emi_moment_order=1, emi_ritz=16)),
]


def run_config(S, sp, name):
    state = S.attach_pc(S._initial_state(0.0), sp)
    blk = S._jit(("ritz_tune", N_STEPS, sp), S.fused_block(sp, N_STEPS))
    out, st = blk(state)
    bench._scalar_sync(out["c"])
    emi = np.asarray(st["emi_iters"]).reshape(-1)
    conv = bool(np.all(np.asarray(st["emi_converged"])))
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out2, _ = blk(state)
        bench._scalar_sync(out2["c"])
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{name:22s}: emi={emi.tolist()} total={int(emi.sum())} conv={conv} "
          f"wall {w/N_STEPS*1e3:.1f} ms/step")
    return emi, w, np.asarray(out["c"])


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

    if "mom2+ritz16 (default)" in res:
        _, _, c0 = res["mom2+ritz16 (default)"]
        print("\nsummary (vs default):")
        for name, (emi, w, c) in res.items():
            rel = float(np.max(np.abs(c - c0)
                               / np.maximum(np.abs(c0), 1e-30)))
            print(f"  {name:22s}: total {int(emi.sum()):4d}  "
                  f"wall {w/N_STEPS*1e3:6.1f} ms/step  max rel dc {rel:.2e}")


if __name__ == "__main__":
    main()
