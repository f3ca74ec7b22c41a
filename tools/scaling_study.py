#!/usr/bin/env python3
"""Sharding scaling study on virtual CPU devices.

Reports, for a range of device counts, the halo-exchange geometry of the
flagship mesh (boundary cells per shard, collective volume vs a full state
all-gather -- the round-1 GSPMD fallback) and verifies a sharded full step
against the single-device result.  The reference's analog is its MPI
strong-scaling setup (companion paper arXiv:2403.04491); real multi-chip
wall-clock needs hardware, but the communication volumes and correctness
are checkable anywhere.

Usage:  python tools/scaling_study.py [max_devices=8]
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_req}").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def main():
    import types

    from knpemidg_tpu.fem.tabulation import build_geometry
    from knpemidg_tpu.mesh.core import _compartments
    from knpemidg_tpu.parallel.halo import build_halo
    from knpemidg_tpu.parallel.sharding import shard_partition

    # flagship mesh if present, else the synthetic 3D bundle
    from run_EMIx_simulation import DEFAULT_MESH

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        from knpemidg_tpu.mesh.io import load_emix_mesh

        mesh = load_emix_mesh(DEFAULT_MESH)
        name = "EMIx 121,617-tet"
    else:
        from knpemidg_tpu.mesh.generators import box_3d_axons

        mesh = box_3d_axons(0)
        name = "synthetic 16k-tet"

    g = build_geometry(mesh, 2, 2)
    nbr = np.asarray(g.nbr).T
    fake = types.SimpleNamespace(mesh=mesh, _comp_np=_compartments(mesh))
    print(f"# {name}: halo-exchange geometry (geometric Morton-block partition)")
    print(f"# {'ndev':>4} {'shard':>8} {'B/shard':>8} {'halo vol':>9} "
          f"{'vs all-gather':>13}")
    for nd_ in (2, 4, 8, 16, 32, 64):
        perm, _ = shard_partition(fake, nd_)
        inv = np.empty(perm.size, dtype=np.int64)
        inv[perm] = np.arange(perm.size)
        h = build_halo(inv[nbr][:, perm], nd_)
        vol = nd_ * h["B"]
        print(f"  {nd_:>4} {h['S']:>8} {h['B']:>8} {vol:>9} "
              f"{h['n_pad'] / vol:>12.1f}x")

    # correctness: sharded step == single-device (small 2D problem)
    n_avail = len(jax.devices())
    from run_2D import build_solver
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.parallel.sharding import (device_mesh, shard_solver,
                                                unpad_state)

    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-8, rtol_knp=1e-8,
                      max_it_emi=200, max_it_knp=100, gmres_restart=10)
    S_ref = build_solver(resolution=0)
    ref, _ = S_ref.fused_step(sp)(S_ref._initial_state(0.0))
    for nd_ in (2, 4, n_avail):
        S = build_solver(resolution=0)
        shard_state = shard_solver(S, device_mesh(nd_))
        out, _ = S.fused_step(sp)(shard_state(S._initial_state(0.0)))
        out = unpad_state(S, out)
        err = float(np.abs(np.asarray(out["c"]) - np.asarray(ref["c"])).max())
        print(f"  {nd_}-device step vs single-device: max |dc| = {err:.2e}")
        assert err < 1e-3
    print("# sharded steps consistent with single-device")


if __name__ == "__main__":
    main()
