#!/usr/bin/env python3
"""Split the fixed per-step cost: time the EMI assembly, KNP assembly and
ODE step in isolation by repeating them inside ONE jitted fori_loop
(inputs perturbed through the carry so XLA cannot hoist), slope between
two repetition counts."""
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
                      rtol_emi=1e-5, rtol_knp=1e-7,
                      max_it_emi=1000, max_it_knp=1000,
                      gmres_restart=30, agg_size=64)
    print(f"# backend={jax.default_backend()}", flush=True)
    s0 = jax.jit(lambda a: jnp.asarray(a).ravel()[0] * 1.0)

    def sync(v):
        return float(np.asarray(s0(jax.tree_util.tree_leaves(v)[0])))

    state = S.attach_pc(S._initial_state(0.0), sp)
    step = S.fused_step(sp)
    state, _ = step(state)
    sync(state["c"])

    def slope(name, make):
        ts = {}
        for R in (4, 12):
            fn = S._jit((name, R), make(R))
            out = fn(state)
            sync(out)
            t0 = time.perf_counter()
            out = fn(state)
            sync(out)
            ts[R] = time.perf_counter() - t0
        per = (ts[12] - ts[4]) / 8
        print(f"{name:14s} {per*1e3:8.2f} ms/op   (4: {ts[4]*1e3:.0f} ms, "
              f"12: {ts[12]*1e3:.0f} ms)", flush=True)

    def make_emi(R):
        def fn(st):
            pads = S._pads(st)

            def body(i, acc):
                blocks, rhs, Pd = S._assemble_emi(
                    st["c"] + acc * 1e-30, st["c_elim"], pads[0], pads[2],
                    st["t"])
                return acc + rhs * 1e-30

            return jax.lax.fori_loop(0, R, body, jnp.zeros_like(st["phi"]))
        return fn

    def make_knp(R):
        def fn(st):
            pads = S._pads(st)

            def body(i, acc):
                bK, rK = S._knp_assemble_all(
                    st["c"] + acc[None] * 1e-30, st["c_elim"], st["phi"],
                    pads[0], pads[1], pads[2], st["t"], st["c"])
                return acc + rK[0] * 1e-30

            return jax.lax.fori_loop(0, R, body, jnp.zeros_like(st["phi"]))
        return fn

    def make_ode(R):
        def fn(st):
            def body(i, carry):
                st2 = dict(st, phi_M=carry)
                st3 = S._ode_step(st2, first_step=False)
                return st3["phi_M"]

            return jax.lax.fori_loop(0, R, body, st["phi_M"])
        return fn

    def make_finalize(R):
        def fn(st):
            def body(i, carry):
                ns, _ = S._finalize_step(dict(st, phi=st["phi"] + carry * 1e-30),
                                         {}, st["c"], st["phi"], True, st["t"])
                return carry + ns["phi_M"] * 1e-30

            return jax.lax.fori_loop(0, R, body, jnp.zeros_like(st["phi_M"]))
        return fn

    slope("emi_assembly", make_emi)
    slope("knp_assembly", make_knp)
    slope("ode_step", make_ode)
    slope("finalize", make_finalize)


if __name__ == "__main__":
    main()
