#!/usr/bin/env python3
"""Honest per-phase timing of the production EMIx step on the current
device: ODE / EMI-assemble / EMI-solve / KNP-assemble / KNP-solve, at
reference tolerances, state kept on device, scalar-only host pulls
(the remote tunnel moves ~15 MB/s -- pulling a field costs 100+ ms)."""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

N_STEPS = 4


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    sp = SolverParams(direct_emi=False, direct_knp=False,
                      rtol_emi=1e-5, atol_emi=1e-40,
                      rtol_knp=1e-7, atol_knp=2e-40,
                      max_it_emi=1000, max_it_knp=1000, gmres_restart=60,
                      agg_size=32)
    print(f"# backend={jax.default_backend()} n_cells={S.n_cells} n_mem={S.n_mem}",
          flush=True)

    asm_emi, solve_emi, asm_knp, solve_knp, finalize = S._phase_fns(sp)
    from functools import partial
    ode = jax.jit(partial(S._ode_step, first_step=False))

    # tiny sync helpers: reduce to scalar on device, pull 4 bytes
    s0 = jax.jit(lambda a: jnp.asarray(a).ravel()[0])

    state = S.attach_pc(S._initial_state(0.0), sp)
    for step in range(N_STEPS):
        ph = {}
        t0 = time.perf_counter()
        state = ode(state)
        float(s0(state["phi_M"]))
        t1 = time.perf_counter(); ph["ode"] = t1 - t0
        blocks, rhs, Pd = asm_emi(state)
        float(s0(rhs))
        t2 = time.perf_counter(); ph["emi_assem"] = t2 - t1
        phi, emi_iters, emi_conv = solve_emi(blocks, Pd, rhs, state)
        float(s0(phi))
        t3 = time.perf_counter(); ph["emi_solve"] = t3 - t2
        bK, rK = asm_knp(state, phi)
        float(s0(rK))
        t4 = time.perf_counter(); ph["knp_assem"] = t4 - t3
        c, knp_iters, knp_conv = solve_knp(bK, rK, state)
        float(s0(c))
        t5 = time.perf_counter(); ph["knp_solve"] = t5 - t4
        state = finalize(state, c, phi)
        float(s0(state["c_elim"]))
        t6 = time.perf_counter(); ph["finalize"] = t6 - t5
        print(json.dumps({
            "step": step,
            "phases_ms": {k: round(v * 1e3, 1) for k, v in ph.items()},
            "total_ms": round((t6 - t0) * 1e3, 1),
            "emi_iters": int(emi_iters),
            "knp_iters": np.asarray(knp_iters).tolist(),
            "conv": [bool(emi_conv)] + np.asarray(knp_conv).tolist(),
        }), flush=True)


if __name__ == "__main__":
    main()
