#!/usr/bin/env python3
"""Bisect the KNP assembly cost (exp_fixed_bisect.py found ~89 ms/step --
3.5x round 3's in-jit-repetition estimate, which XLA CSE had deflated).

Cumulative stages of ops/assembly.assemble_knp_all, each run R times inside
one jitted scan whose carry feeds the next iteration's inputs (no CSE), one
device sync.  Consecutive deltas itemize the assembly.

Run on the TPU: python tools/exp_knp_asm_bisect.py
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
from knpemidg_tpu.ops import assembly
from knpemidg_tpu.ops.assembly import cell_grad, _E, _M0

R = 10
REPS = 5


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
    state = S.attach_pc(S._initial_state(0.0), sp)

    c, c_elim, phi, t = state["c"], state["c_elim"], state["phi"], state["t"]
    phi_M, I_ch = state["phi_M"], state["I_ch"]
    phi_M_pad = jnp.concatenate([phi_M, jnp.zeros(1, phi_M.dtype)])
    I_ch_pad = jnp.concatenate(
        [I_ch, jnp.zeros((I_ch.shape[0], 1), I_ch.dtype)], axis=1)
    I_ch_tot_pad = I_ch_pad.sum(axis=0)

    m = S.N_ions
    z, D = S.z[:m], S.D[:m]
    statics = S._knp_static_blocks.get(-1)
    phys = S._phys_knp()

    def stages(g, masks, c_k, phi, alpha_sum, upto):
        """Cumulative re-implementation of assemble_knp_all's stages;
        returns a scalar-ish accumulator folding every live intermediate."""
        gp = g
        c_n = c_k
        F, psi, C_M, dt = phys["F"], phys["psi"], phys["C_M"], phys["dt"]
        nd = c_k.shape[1]
        d = g["G"].shape[1]
        nf1 = g["f_area"].shape[0]
        acc = jnp.float32(0.0)

        M0 = _M0(g)
        phibar = g["phibar"]
        sip = masks["f_sip"]
        mem = masks["f_mem"]
        w, Rp, Rm = g["w_f"], g["f_Rp"], g["f_Rm"]

        gphi = cell_grad(gp, phi)
        drift = jnp.einsum("idc,dc->ic", g["G"], gphi)
        A_cell = ((z * psi)[:, None, None, None]
                  * (g["vol"] * D)[:, None, None, :]
                  * drift[None, :, None, :] * phibar[None, None, :, None])
        if upto == "drift":
            return A_cell.sum()

        ndp = phi.shape[0]
        stackA = jnp.concatenate([gphi, phi, D], axis=0)
        SP = stackA.at[:, g["f_cp"]].get(mode="promise_in_bounds")
        SM = stackA.at[:, g["f_cm"]].get(mode="promise_in_bounds")
        u_p = jnp.maximum(jnp.einsum("df,df->f", SP[:d], g["f_n"]), 0.0)
        u_m = jnp.maximum(-jnp.einsum("df,df->f", SM[:d], g["f_n"]), 0.0)
        D_p, D_m = SP[d + ndp:], SM[d + ndp:]
        jphi = jnp.einsum("qif,if->qf", gp["f_Rp"], SP[d:d + ndp]) \
            - jnp.einsum("qif,if->qf", gp["f_Rm"], SM[d:d + ndp])
        scale = (-psi) * z[:, None] * (g["f_area"] * sip)[None, :]
        sp_ = (scale * D_p * u_p[None, :])[:, None, None, :]
        sm_ = (scale * D_m * u_m[None, :])[:, None, None, :]
        Mpp = sp_ * _E(g, "pp")[None]
        Mpm = -sm_ * _E(g, "pm")[None]
        Mmp = -sp_ * _E(g, "mp")[None]
        Mmm = sm_ * _E(g, "mm")[None]
        if upto == "upwind":
            return (A_cell.sum() + Mpp.sum() + Mpm.sum() + Mmp.sum()
                    + Mmm.sum() + jphi.sum())

        cf = g["cf_idx"]
        isp = g["cf_is_plus"]
        Mstk = jnp.stack([Mpp, Mmm, Mpm, Mmp], axis=1).reshape(
            m * 4 * nd * nd, nf1)
        diag = A_cell
        offs = []
        for l in range(cf.shape[0]):
            sel = isp[l][None, None, None, :]
            got = Mstk.at[:, cf[l]].get(mode="promise_in_bounds")
            got = got.reshape(m, 4, nd, nd, -1)
            diag = diag + jnp.where(sel, got[:, 0], got[:, 1])
            offs.append(jnp.where(sel, got[:, 2], got[:, 3]))
        blocks = jnp.stack([diag] + offs, axis=1)
        if upto == "blockgather":
            return blocks.sum() + jphi.sum()
        if upto == "statics":
            blocks = blocks + statics
            return blocks.sum() + jphi.sum()
        blocks = blocks + statics

        b_cell = (g["vol"] / dt) * jnp.einsum("ij,kjc->kic", M0, c_n)
        alpha = (D[:, None, :] * (z * z)[:, None, None]) * c_k / alpha_sum[None]
        AU = alpha.reshape(m * nd, -1)
        AUp = AU.at[:, g["f_cp"]].get(mode="promise_in_bounds").reshape(m, nd, nf1)
        AUm = AU.at[:, g["f_cm"]].get(mode="promise_in_bounds").reshape(m, nd, nf1)
        a_p = jnp.einsum("qif,kif->kqf", Rp, AUp)
        a_m = jnp.einsum("qif,kif->kqf", Rm, AUm)
        if upto == "alpha":
            return blocks.sum() + b_cell.sum() + a_p.sum() + a_m.sum() + jphi.sum()

        Cfac = (C_M / (F * dt)) / z
        C_p = a_p * Cfac[:, None, None]
        C_m = a_m * Cfac[:, None, None]
        mem_all = jnp.concatenate([phi_M_pad[None], I_ch_tot_pad[None],
                                   I_ch_pad], axis=0)
        got = mem_all.at[:, masks["f_memidx"]].get(mode="promise_in_bounds")
        got = got * mem[None, :]
        phiM_f = got[0][None, None, :]
        Itot_f = got[1]
        Ik_f = got[2:2 + m][:, None, :]
        if upto == "memgather":
            return (blocks.sum() + b_cell.sum() + a_p.sum() + a_m.sum()
                    + jphi.sum() + got.sum())
        inv_Fz = (1.0 / (F * z))[:, None, None]
        s_e = C_p * phiM_f - Ik_f * inv_Fz + a_p * Itot_f[None, None, :] * inv_Fz
        s_i = C_m * phiM_f - Ik_f * inv_Fz + a_m * Itot_f[None, None, :] * inv_Fz
        jC = C_p - C_m
        aC = 0.5 * (C_p + C_m)
        jphi_b = jphi[None]
        val_p = -s_e + (-jphi_b * jC * 0.5 - jphi_b * aC)
        val_m = s_i + (-jphi_b * jC * 0.5 + jphi_b * aC)
        if upto == "sei":
            return (blocks.sum() + b_cell.sum() + jphi.sum()
                    + val_p.sum() + val_m.sum())
        memq = mem[None, None, :]
        b_p = g["f_area"] * jnp.einsum("q,kqf,qif->kif", w, val_p * memq, Rp)
        b_m = g["f_area"] * jnp.einsum("q,kqf,qif->kif", w, val_m * memq, Rm)
        bpm = jnp.concatenate([b_p, b_m], axis=1).reshape(m * 2 * nd, nf1)
        if upto == "bpm":
            return blocks.sum() + b_cell.sum() + jphi.sum() + bpm.sum()
        rhs = b_cell
        for l in range(cf.shape[0]):
            got = bpm.at[:, cf[l]].get(
                mode="promise_in_bounds").reshape(m, 2, nd, -1)
            rhs = rhs + jnp.where(isp[l][None, None, :], got[:, 0], got[:, 1])
        return blocks.sum() + rhs.sum()

    UPTO = ["drift", "upwind", "blockgather", "statics", "alpha", "memgather",
            "sei", "bpm", "full", "wrapper"]

    prev = 0.0
    print(f"{'stage':12s} {'ms/rep':>8s} {'delta':>8s}")
    for upto in UPTO:
        def body(carry, _, upto=upto):
            ck, acc = carry
            # phi must depend on the carry: the production step feeds a FRESH
            # phi from the EMI solve every step, so the phi-dependent
            # advection blocks are rebuilt each step -- a constant phi lets
            # XLA hoist them out of this scan and undercount the assembly.
            phi_c = phi + 1e-30 * ck.reshape(-1)[0]
            if upto == "wrapper":
                blocksK, rhsK = S._knp_assemble_all(
                    ck, c_elim, phi_c, phi_M_pad, I_ch_pad, I_ch_tot_pad, t, ck)
                s = blocksK.sum() + rhsK.sum()
            else:
                alpha_sum = jnp.einsum("k,kc,kic->ic", S.z**2, S.D,
                                       S._all_c(ck, c_elim))
                s = stages(S.g, S.masks, ck, phi_c, alpha_sum, upto)
            ck = ck + 1e-30 * s            # serialize reps
            return (ck, acc + s), ()

        def block(ck):
            return jax.lax.scan(body, (ck, jnp.float32(0.0)), None, length=R)[0]

        b = S._jit(("knpasm", upto, R), block)
        out = b(c)
        bench._scalar_sync(out[1])
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = b(c)
            bench._scalar_sync(out[1])
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls)) / R
        print(f"{upto:12s} {w*1e3:8.2f} {(w-prev)*1e3:+8.2f}")
        prev = w


if __name__ == "__main__":
    main()
