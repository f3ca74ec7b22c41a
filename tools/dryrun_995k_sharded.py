#!/usr/bin/env python3
"""995k-tet bundle through the 8-way sharded step on virtual CPU devices
(VERDICT r4 item 5): correctness gate for the scaling table's largest row.

Builds box_3d_axons(2, 2) = 995,328 tets, shards the full active step over
an 8-device cell-axis mesh (explicit halo pipeline), runs ONE fused
splitting step at production tolerances, and asserts convergence (not just
finiteness -- a capped Krylov solve produces finite garbage).  Parity
against single-device is gated at smaller sizes (tests/test_sharding.py);
at 995k a single-device CPU reference would double an already ~20-min
single-core run for no additional coverage.

Run: python tools/dryrun_995k_sharded.py [n_devices=8]
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np


def main():
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.mesh.generators import box_3d_axons
    from knpemidg_tpu.parallel.sharding import device_mesh, shard_solver

    import bench

    t0 = time.perf_counter()
    mesh = box_3d_axons(2, length_factor=2)
    mesh.vertices *= 1e2
    print(f"mesh: {len(mesh.cells)} tets ({time.perf_counter()-t0:.0f} s)",
          flush=True)

    S, sp = bench.build(mesh=mesh)
    S.params = dataclasses.replace(S.params, n_steps_ODE=5)
    sp = dataclasses.replace(sp, max_it_emi=2000, max_it_knp=1000)
    dm = device_mesh(N_DEV)
    shard_state = shard_solver(S, dm)
    t0 = time.perf_counter()
    state = S.attach_pc(shard_state(S._initial_state(0.0)), sp)
    print(f"pc build {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    out, st = S.fused_step(sp)(state)
    jax.block_until_ready(out["c"])
    print(f"step (incl compile) {time.perf_counter()-t0:.0f} s", flush=True)
    assert np.isfinite(np.asarray(out["c"])).all()
    assert bool(np.all(np.asarray(st["emi_converged"]))), "EMI at cap"
    assert bool(np.all(np.asarray(st["knp_converged"]))), "KNP at cap"
    print(f"dryrun_995k_sharded({N_DEV}): ok, "
          f"emi_iters={int(st['emi_iters'])}, "
          f"knp_iters={np.asarray(st['knp_iters']).tolist()}", flush=True)


if __name__ == "__main__":
    main()
