"""EMI-only solver (TPU rebuild of src/knpemidg/solver_emi.py).

Same structure as :class:`knpemidg_tpu.solver.Solver` but solves only the
potential: concentrations stay frozen at their initial values, so each step
is ODE -> EMI solve -> phi_M update (solver_emi.py:618-700).  Nernst
potentials and the membrane traces of K_e / Na_i are computed from the
frozen concentration fields (:663-673).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .config import SolverParams
from .ops import assembly
from .solvers.krylov import pcg
from .solvers import direct as direct_solvers
from .solver import Solver, Traces


class SolverEMI(Solver):
    _emi_only = True          # attach_pc skips the (never-used) KNP build

    def _pde_step(self, state, solver_params: SolverParams):
        sp_ = solver_params
        c, c_elim, phi, phi_M, t = (
            state["c"], state["c_elim"], state["phi"], state["phi_M"], state["t"]
        )
        pad = lambda v: jnp.concatenate([v, jnp.zeros(1, dtype=v.dtype)])
        I_ch = state["I_ch"]
        I_ch_tot_pad = pad(I_ch.sum(axis=0))

        stats = {}
        asm_emi = self._jit(("asm_emi", self.splitting_scheme), self._assemble_emi)
        blocks, rhs, Pd = asm_emi(c, c_elim, pad(phi_M), I_ch_tot_pad, t)
        if sp_.direct_emi:
            phi = jnp.asarray(
                direct_solvers.solve_direct(blocks, self.g["nbr"], rhs,
                                            nullspace_constant=True),
                dtype=self.dtype,
            )
            stats["emi_iters"] = jnp.int32(0)
        else:
            pc = state.get("pc")
            mv = lambda v: self._matvec(blocks, v)
            r0 = rhs - mv(phi)
            res = pcg(
                mv, r0, jnp.zeros_like(phi),
                self._make_precond(blocks, Pd, sp_, sym=True,
                                   pc=pc.get("emi") if pc else None),
                rtol=sp_.rtol_emi, atol=sp_.atol_emi, max_it=sp_.max_it_emi,
                project_nullspace=True, b_ref=rhs,
                nullspace_mask=getattr(self, "_pad_mask", None),
            )
            phi = phi + res.x
            stats["emi_iters"] = res.iters
        stats["knp_iters"] = jnp.zeros(self.N_ions, dtype=jnp.int32)

        phi_M = assembly.jump_phi_M_m(self.g, self.mem_dev, phi)
        new_state = dict(state)
        new_state.update(phi=phi, phi_M=phi_M, t=t + self.params.dt)
        return new_state, stats

    def _initial_state(self, t0):
        state = super()._initial_state(t0)
        if self.params.phi_M_init_type == "function" and callable(self.params.phi_M_init):
            # SolverEMI honors function-type phi_M inits by projection onto
            # the trace space (solver_emi.py:181)
            import numpy as np

            vals = np.asarray([self.params.phi_M_init(x) for x in self.tables.midpoints])
            state["phi_M"] = jnp.asarray(vals, dtype=self.dtype)
        return state


class StandardSolverEMI(SolverEMI):
    """K_e / Na_i trace pushes of the reference EMI-only loop
    (solver_emi.py:666-673); ion order [K, *, Na-eliminated]."""

    def update_ode(self, tag, traces: Traces):
        return {
            "K_e": traces.plus(0),
            "Na_i": traces.minus(len(self.ion_list) - 1),
        }
