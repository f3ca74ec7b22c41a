#!/usr/bin/env python3
"""Honest per-phase timings with SCALAR-ONLY syncs (a full-array pull over
the remote tunnel costs ~60 ms at ~30 MB/s and poisoned earlier phase
numbers).  Each phase is jitted via S._jit (aux as arguments) and returns
its normal outputs; the sync reduces to one device scalar and pulls 4 B.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams
    from functools import partial

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=30,
                      agg_size=64)
    print(f"# backend={jax.default_backend()}", flush=True)

    s0 = jax.jit(lambda a: jnp.asarray(a).ravel()[0] * 1.0)

    def sync(v):
        return float(s0(jax.tree_util.tree_leaves(v)[0]))

    # RTT of a scalar pull
    x = jnp.float32(1.0) + 0
    float(np.asarray(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(np.asarray(s0(x)))
    rtt = (time.perf_counter() - t0) / 10
    print(f"scalar sync cost: {rtt*1e3:.1f} ms", flush=True)

    state = S.attach_pc(S._initial_state(0.0), sp)
    # advance 2 steps so the phases see a warm production state
    step = S.fused_step(sp)
    for _ in range(2):
        state, stats = step(state)
    sync(state["c"])
    print(f"# warm state: emi_iters={int(stats['emi_iters'])} "
          f"knp_iters={np.asarray(stats['knp_iters']).tolist()}", flush=True)

    ode = S._jit(("p_ode",), partial(S._ode_step, first_step=False))

    def asm_emi(st):
        pads = S._pads(st)
        return S._assemble_emi(st["c"], st["c_elim"], pads[0], pads[2], st["t"])

    def solve_emi(blocks, Pd, rhs, st):
        pc = st.get("pc")
        return S._emi_solve_iterative(blocks, Pd, rhs, st["phi"], sp,
                                      pc=pc.get("emi") if pc else None,
                                      phi_prev=st.get("phi_prev"))

    def asm_knp(st, phi):
        pads = S._pads(st)
        return S._knp_assemble_all(st["c"], st["c_elim"], phi, pads[0],
                                   pads[1], pads[2], st["t"], st["c"])

    def solve_knp(blocksK, rhsK, st):
        pc = st.get("pc")
        return S._knp_solve_all(blocksK, rhsK, st["c"], sp,
                                pcK=pc.get("knp") if pc else None)

    j_asm_emi = S._jit(("p_asm_emi",), asm_emi)
    j_solve_emi = S._jit(("p_solve_emi", sp), solve_emi)
    j_asm_knp = S._jit(("p_asm_knp",), asm_knp)
    j_solve_knp = S._jit(("p_solve_knp", sp), solve_knp)

    def timed(name, fn, *args, reps=3):
        best = 1e9
        out = None
        for _ in range(reps + 1):           # first call compiles
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:22s} {(best - rtt)*1e3:9.2f} ms", flush=True)
        return out

    st1 = timed("ode", ode, state)
    blocks, rhs, Pd = timed("emi_assem", j_asm_emi, st1)
    phi, it_e, _ = timed("emi_solve", j_solve_emi, blocks, Pd, rhs, st1)
    bK, rK = timed("knp_assem", j_asm_knp, st1, phi)
    c, it_k, _ = timed("knp_solve", j_solve_knp, bK, rK, st1)
    print(f"# emi_iters={int(it_e)} knp_iters={np.asarray(it_k).tolist()}",
          flush=True)

    # full fused step at the same state, scalar sync
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = step(state)
        sync(out[0]["c"])
        best = min(best, time.perf_counter() - t0)
    print(f"{'fused step':22s} {(best - rtt)*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
