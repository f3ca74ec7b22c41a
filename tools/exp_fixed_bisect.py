#!/usr/bin/env python3
"""Bisect the iteration-INDEPENDENT cost of the fused EMIx step.

exp_gap_attrib.py's block-length regression put the fixed per-step cost at
~130 ms (not round 3's claimed ~40): Krylov iterations explain only ~35% of
the step.  This tool builds CUMULATIVE variant steps -- ODE only; + EMI
assembly; + EMI solve at max_it 1 (incl. predictor matvecs); + KNP
assembly; + KNP solve at max_it 1; + finalize -- each scanned 10x inside
one jit with one device sync, so consecutive differences itemize the fixed
cost phase by phase WITHOUT per-phase sync pollution.

Variant states fold tiny multiples of the produced arrays back into the
carry so XLA cannot dead-code-eliminate the phase under test.

Run on the TPU: python tools/exp_fixed_bisect.py
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

import jax.numpy as jnp
import numpy as np

import bench

N = 10
REPS = 5


def pads(st):
    phi_M, I_ch = st["phi_M"], st["I_ch"]
    phi_M_pad = jnp.concatenate([phi_M, jnp.zeros(1, phi_M.dtype)])
    I_ch_pad = jnp.concatenate(
        [I_ch, jnp.zeros((I_ch.shape[0], 1), I_ch.dtype)], axis=1)
    return phi_M_pad, I_ch_pad, I_ch_pad.sum(axis=0)


def main():
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from run_EMIx_simulation import DEFAULT_MESH
    from knpemidg_tpu.mesh.generators import box_3d_axons

    if os.path.exists(os.path.join(DEFAULT_MESH, "mesh.h5")):
        mesh = load_emix_mesh(DEFAULT_MESH)
    else:
        mesh = box_3d_axons(1, length_factor=2)
        mesh.vertices *= 1e2

    S, sp = bench.build(mesh=mesh)
    import dataclasses
    sp1 = dataclasses.replace(sp, max_it_emi=1, max_it_knp=1)
    state = S.attach_pc(S._initial_state(0.0), sp)

    eps = jnp.asarray(1e-30, dtype=S.dtype)

    def v_ode(st):
        return S._ode_step(st, first_step=False)

    def v_emi_asm(st):
        st = v_ode(st)
        pM, iP, iT = pads(st)
        blocks, rhs, Pd = S._assemble_emi(st["c"], st["c_elim"], pM, iT, st["t"])
        out = dict(st)
        out["phi"] = st["phi"] + eps * rhs + eps * blocks[0][:, 0, :] \
            + eps * Pd[:, 0, :]
        return out

    def v_emi_solve(st):
        st = v_ode(st)
        pM, iP, iT = pads(st)
        blocks, rhs, Pd = S._assemble_emi(st["c"], st["c_elim"], pM, iT, st["t"])
        pc = st.get("pc") or {}
        phi, it, conv = S._emi_solve_iterative(
            blocks, Pd, rhs, st["phi"], sp1,
            pc=pc.get("emi"), phi_prev=st.get("phi_prev"))
        out = dict(st)
        out["phi"] = phi
        if "phi_prev" in st:
            out["phi_prev"] = st["phi"]
        return out

    def v_knp_asm(st):
        st = v_emi_solve(st)
        pM, iP, iT = pads(st)
        blocksK, rhsK = S._knp_assemble_all(
            st["c"], st["c_elim"], st["phi"], pM, iP, iT, st["t"], st["c"])
        out = dict(st)
        out["c"] = st["c"] + eps * rhsK + eps * blocksK[:, 0][:, :, 0, :]
        return out

    def v_knp_solve(st):
        st = v_emi_solve(st)
        pM, iP, iT = pads(st)
        blocksK, rhsK = S._knp_assemble_all(
            st["c"], st["c_elim"], st["phi"], pM, iP, iT, st["t"], st["c"])
        pc = st.get("pc") or {}
        c, it, conv = S._knp_solve_all(blocksK, rhsK, st["c"], sp1,
                                       pcK=pc.get("knp"))
        out = dict(st)
        out["c"] = c
        return out

    def v_full(st):
        st = S._ode_step(st, first_step=False)
        st, _ = S._pde_step(st, sp1)
        return st

    variants = [
        ("ode", v_ode),
        ("+emi_asm", v_emi_asm),
        ("+emi_solve1", v_emi_solve),
        ("+knp_asm", v_knp_asm),
        ("+knp_solve1", v_knp_solve),
        ("full(maxit1)", v_full),
    ]

    prev = 0.0
    print(f"{'variant':14s} {'ms/step':>9s} {'delta':>8s}   walls")
    for name, fn in variants:
        def block(st, fn=fn):
            def body(c, _):
                return fn(c), ()
            return jax.lax.scan(body, st, None, length=N)[0]

        b = S._jit(("bisect", name, N), block)
        out = b(state)
        bench._scalar_sync(out["phi"])
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = b(state)
            bench._scalar_sync(out["phi"])
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls)) / N
        print(f"{name:14s} {w*1e3:9.2f} {(w-prev)*1e3:+8.2f}   "
              f"{np.round(np.asarray(walls)*1e3, 1)}")
        prev = w


if __name__ == "__main__":
    main()
