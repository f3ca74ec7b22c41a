#!/usr/bin/env python3
"""Piecewise marginal profiling of the assembly kernels on the EMIx mesh:
which part of assemble_emi (95 ms/step) / assemble_knp (258 ms/step for 2
ions) actually costs."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))
import jax, jax.numpy as jnp, numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

R1, R2 = 10, 60


def marginal(name, fn, x):
    def make(reps):
        @jax.jit
        def loop(a):
            def body(i, v):
                out = fn(v)
                # fold result back into the carry to keep the chain dependent
                leaves = jax.tree_util.tree_leaves(out)
                bump = sum(jnp.sum(l) * 1e-30 for l in leaves).astype(v.dtype)
                return v + bump
            r = jax.lax.fori_loop(0, reps, body, x)
            return r.ravel()[0]
        return loop
    lo, hi = make(R1), make(R2)
    float(lo(x)); float(hi(x))
    t0 = time.perf_counter(); float(lo(x)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(x)); t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (R2 - R1)
    print(f"{name:52s} {dt*1e3:9.3f} ms/op", flush=True)
    return dt


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.ops import assembly
    from knpemidg_tpu.ops.assembly import (facet_trace, gather_blocks,
                                           gather_rhs, _sip_blocks,
                                           _jump_jump_blocks, _test_integrals)

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    print(f"# backend={jax.default_backend()} nc={S.n_cells} "
          f"nf={int(S.geom.f_area.shape[0])-1 if hasattr(S.geom,'f_area') else '?'}",
          flush=True)

    state = S._initial_state(0.0)
    phi_M_pad, I_ch_pad, I_ch_tot_pad = S._pads(state)
    g, masks = S.g, S.masks
    c, c_elim, phi, t = state["c"], state["c_elim"], state["phi"], state["t"]

    # full assemblies
    marginal("assemble_emi (full)",
             lambda cc: S._assemble_emi(cc, c_elim, phi_M_pad, I_ch_tot_pad, t)[1],
             c)
    marginal("knp_assemble_all (2 ions, full)",
             lambda cc: S._knp_assemble_all(cc, c_elim, phi, phi_M_pad,
                                            I_ch_pad, I_ch_tot_pad, t, cc)[1],
             c)

    # ---- EMI pieces ----
    z, D = S.z, S.D
    F, psi = S.params.F, S.params.psi
    call = S._all_c(c, c_elim)
    kappa = F * psi * jnp.einsum("k,kc,kic->ic", z * z, D, call)

    marginal("emi: kappa+cell term",
             lambda k: (g["vol"] * jnp.einsum("q,qc->c", g["w_c"],
                        jnp.einsum("qi,ic->qc", g["Phi_c"], k)))[None, None, :]
                       * jnp.einsum("idc,jdc->ijc", g["G"], g["G"]),
             kappa)
    marginal("emi: facet traces kp/km",
             lambda k: facet_trace(g, k, "p") + facet_trace(g, k, "m"), kappa)

    kp = facet_trace(g, kappa, "p")
    km = facet_trace(g, kappa, "m")
    gnp_ = jnp.einsum("df,idf->if", g["f_n"], g["G"][:, :, g["f_cp"]])
    gnm_ = jnp.einsum("df,idf->if", g["f_n"], g["G"][:, :, g["f_cm"]])
    marginal("emi: gnp/gnm gathers+einsum",
             lambda k: jnp.einsum("df,idf->if", g["f_n"],
                                  g["G"][:, :, g["f_cp"]]) + k[:1, :] * 0,
             kp)
    marginal("emi: _sip_blocks",
             lambda k: _sip_blocks(g, k, km, gnp_, gnm_,
                                   S.tau / g["f_havg"], masks["f_sip"])[0],
             kp)
    Mpp, Mpm, Mmp, Mmm = _sip_blocks(g, kp, km, gnp_, gnm_,
                                     S.tau / g["f_havg"], masks["f_sip"])
    A_cell = jnp.zeros((S.nd, S.nd, S.n_cells), dtype=S.dtype)
    marginal("emi: gather_blocks",
             lambda M: gather_blocks(g, A_cell, M, Mpm, Mmp, Mmm)[0],
             Mpp)
    marginal("emi: _jump_jump_blocks (C_phi)",
             lambda m: _jump_jump_blocks(
                 g, jnp.full_like(g["f_area"], 1.0), masks["f_mem"])[0] + m * 0,
             Mpp)

    # ---- KNP pieces ----
    gphi = assembly.cell_grad(g, phi)
    marginal("knp: upwind un_p/un_m",
             lambda gp: jnp.maximum(D[0][g["f_cp"]] * jnp.einsum(
                 "df,df->f", gp[:, g["f_cp"]], g["f_n"]), 0.0),
             gphi)
    un_p = jnp.maximum(D[0][g["f_cp"]] * jnp.einsum("df,df->f", gphi[:, g["f_cp"]], g["f_n"]), 0.0)
    w = g["w_f"]
    scale = -psi * g["f_area"] * masks["f_sip"]
    marginal("knp: one upwind block einsum",
             lambda u: (scale * u) * jnp.einsum("q,qif,qjf->ijf", w,
                                                g["f_Rp"], g["f_Rp"]),
             un_p)
    Epp = jnp.einsum("q,qif,qjf->ijf", w, g["f_Rp"], g["f_Rp"])
    marginal("knp: upwind block via static tensor",
             lambda u: (scale * u) * Epp, un_p)

    # rhs pieces
    alpha_sum = jnp.einsum("k,kc,kic->ic", z**2, D, call)
    alpha = D[0][None, :] * ((1.0 * c[0]) / alpha_sum)
    marginal("knp: alpha facet traces",
             lambda a: facet_trace(g, a, "p") + facet_trace(g, a, "m"), alpha)


if __name__ == "__main__":
    main()
