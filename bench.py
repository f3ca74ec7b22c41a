#!/usr/bin/env python3
"""Benchmark: time per timestep on the EMIx 3D brain-tissue workload.

North-star metric (BASELINE.md): per-timestep cost (assembly + Krylov
solves, here plus the vmapped membrane ODE step, all fused in one jitted
program) on the 121,617-tet emimesh volume, dt = 0.1 ms, iterative solvers
at the reference's production tolerances (rtol_emi 1e-5, rtol_knp 1e-7 --
reachable in f32 through the increment-form solves).  The reference
publishes no numbers (BASELINE.json published: {});
``vs_baseline`` therefore reports the measured speedup of this chip over
the same program on the host CPU (one full XLA-CPU step), the stand-in for
the "CPU node" in the >=5x north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))

import jax

# persistent compilation cache: the fused EMIx step is a large program and
# the (remote) TPU compile dominates cold-start otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

N_STEPS = 5
CPU_STEPS = 1


def build(dtype=None, mesh=None):
    from run_EMIx_simulation import build_solver
    from knpemidg_tpu.config import SolverParams

    S = build_solver(dtype=dtype, mesh=mesh)
    # reference production tolerances (run_EMIx_simulation.py:224-234);
    # increment-form solves make rtol_knp 1e-7 reachable in f32
    sp = SolverParams(
        direct_emi=False, direct_knp=False,
        rtol_emi=1e-5, atol_emi=1e-40,
        rtol_knp=1e-7, atol_knp=2e-40,
        max_it_emi=1000, max_it_knp=1000, gmres_restart=30, agg_size=64,
    )
    return S, sp


def _sync(state, stats):
    """Force completion by pulling results to host: block_until_ready is a
    no-op on some experimental remote backends, so a device->host read of
    values that depend on both solves is the reliable barrier."""
    import numpy as np

    return float(state["phi_M"].min()) + float(np.asarray(stats["knp_iters"]).sum())


def time_steps(S, sp, n_steps, label):
    import jax

    step = S.fused_step(sp)
    state = S.attach_pc(S._initial_state(0.0), sp)
    # warmup: compile + 1 step
    state, stats = step(state)
    _sync(state, stats)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state)
        _sync(state, stats)
    dt_wall = (time.perf_counter() - t0) / n_steps
    import numpy as np

    print(
        f"# {label}: {dt_wall*1e3:.2f} ms/step  "
        f"emi_iters={int(stats['emi_iters'])} "
        f"knp_iters={np.asarray(stats['knp_iters']).tolist()}",
        file=sys.stderr,
    )
    return dt_wall


def phase_breakdown(S, sp):
    """Honest per-phase wall times (VERDICT r1 item 5): one step through the
    separately-jitted phase functions (solver._phase_fns) with a device sync
    between phases, plus the vmapped membrane ODE step, plus an achieved-
    bandwidth estimate for the block-ELL matvec (the Krylov hot op)."""
    import jax
    import jax.numpy as jnp

    state = S.attach_pc(S._initial_state(0.0), sp)
    ph = {}
    if S.mem_models:
        ode = jax.jit(lambda st: S._ode_step(st, first_step=False))
        state = ode(state)                              # compile
        jax.block_until_ready(state["phi_M"])
        t0 = time.perf_counter()
        state = ode(state)
        jax.block_until_ready(state["phi_M"])
        ph["ode"] = time.perf_counter() - t0
    # warm the phase jits with one throwaway pass, then measure
    S._timed_pde_step_phased(state, sp, 0)
    S.stats.phase_records.clear()
    state = S._timed_pde_step_phased(state, sp, 1)
    ph.update(S.stats.phase_records[-1])

    # matvec: chained applies inside one jit -> achieved HBM bandwidth
    blocks, rhs, _ = S._phase_fns(sp)[0](state)
    nbr = S.g["nbr"]
    from knpemidg_tpu.ops.spmv import bell_matvec
    R = 50

    @jax.jit
    def chain(x):
        def body(c, _):
            return bell_matvec(blocks, nbr, c) * 1e-2, ()
        return jax.lax.scan(body, x, None, length=R)[0]

    x = jnp.zeros_like(rhs)
    jax.block_until_ready(chain(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x))
    mv_s = (time.perf_counter() - t0) / R
    K, nd, _, nc = blocks.shape
    bytes_per = 4 * nc * (K * nd * nd + 2 * nd + (K - 1) * nd) + 4 * nc * (K - 1)
    ph["matvec_ms"] = mv_s * 1e3
    ph["matvec_gbps"] = bytes_per / mv_s / 1e9
    return {k: round(float(v), 4) for k, v in ph.items()}


def main():
    import jax

    # mesh built once on host, reused for both backends
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        # reference assets unavailable: comparable-size synthetic 3D
        # workload (124,416 tets vs the EMIx volume's 121,617)
        from knpemidg_tpu.mesh.generators import box_3d_axons

        print("# EMIx mesh assets missing; using synthetic 124k-tet axon "
              "bundle", file=sys.stderr)
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2          # m -> cm (emix unit system)

    S, sp = build(mesh=mesh)
    t_dev = time_steps(S, sp, N_STEPS, f"device[{jax.default_backend()}]")
    try:
        phases = phase_breakdown(S, sp)
        print(f"# phases: {phases}", file=sys.stderr)
    except Exception as e:                            # pragma: no cover
        print(f"# phase breakdown failed: {e}", file=sys.stderr)
        phases = {}

    t_cpu = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            S2, sp2 = build(mesh=mesh)
            t_cpu = time_steps(S2, sp2, CPU_STEPS, "cpu")
    except Exception as e:                            # pragma: no cover
        print(f"# cpu baseline failed: {e}", file=sys.stderr)

    vs = (t_cpu / t_dev) if t_cpu else 1.0
    print(json.dumps({
        "metric": "emix_time_per_timestep",
        "value": round(t_dev * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(vs, 3),
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
