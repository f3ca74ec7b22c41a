"""EMI-only solver (TPU rebuild of src/knpemidg/solver_emi.py).

Same structure as :class:`knpemidg_tpu.solver.Solver` but solves only the
potential: concentrations stay frozen at their initial values, so each step
is ODE -> EMI solve -> phi_M update (solver_emi.py:618-700).  Nernst
potentials and the membrane traces of K_e / Na_i are computed from the
frozen concentration fields (:663-673).

Picard mode (solver_emi.py:512-557): with frozen concentrations the
reference's inner iteration measures ``||c_prev_k - c||_inf = 0`` after the
first EMI solve, i.e. EMI-Picard is exactly one EMI solve + phi_M update
per global step -- the inherited :meth:`Solver.solve_for_time_step_picard`
reproduces that through the ``c_n``/``advance_time`` kwargs accepted here.
"""
from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp

from .config import SolverParams
from .ops import assembly
from .solvers import direct as direct_solvers
from .solver import Solver, Traces
from .utils.stats import bcolors


class SolverEMI(Solver):
    _emi_only = True          # attach_pc skips the (never-used) KNP build

    def _pde_step(self, state, solver_params: SolverParams, c_n=None,
                  advance_time: bool = True):
        """One EMI time step (solve_for_time_step, solver_emi.py:491-509).

        ``c_n``/``advance_time`` match :meth:`Solver._pde_step` so the
        inherited Picard driver works; concentrations are frozen, so
        ``c_n`` is unused."""
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
            stats["emi_converged"] = jnp.bool_(True)
        else:
            pc = state.get("pc")
            phi, stats["emi_iters"], stats["emi_converged"] = (
                self._emi_solve_iterative(
                    blocks, Pd, rhs, phi, sp_,
                    pc=pc.get("emi") if pc else None,
                    phi_prev=state.get("phi_prev"),
                )
            )
        stats["knp_iters"] = jnp.zeros(self.N_ions, dtype=jnp.int32)
        stats["knp_converged"] = jnp.ones(self.N_ions, dtype=jnp.bool_)

        phi_M = assembly.jump_phi_M_m(self.g, self.mem_dev, phi)
        new_state = dict(state)
        new_state.update(phi=phi, phi_M=phi_M)
        if advance_time:
            new_state["t"] = t + self.params.dt
        if "phi_prev" in state:
            new_state["phi_prev"] = state["phi"]
        return new_state, stats

    # ------------------------------------------------------------------
    # phase-split stepping: EMI-only phases (the inherited version would
    # assemble and solve KNP, which this solver never uses)
    # ------------------------------------------------------------------
    def _phase_fns(self, sp_: SolverParams):
        key = ("phased_emi", self.splitting_scheme, sp_)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def asm_emi(state):
            phi_M_pad, _, I_ch_tot_pad = self._pads(state)
            return self._assemble_emi(state["c"], state["c_elim"],
                                      phi_M_pad, I_ch_tot_pad, state["t"])

        def solve_emi(blocks, Pd, rhs, state):
            pc = state.get("pc")
            return self._emi_solve_iterative(
                blocks, Pd, rhs, state["phi"], sp_,
                pc=pc.get("emi") if pc else None,
                phi_prev=state.get("phi_prev"),
            )

        def finalize(state, phi):
            phi_M = assembly.jump_phi_M_m(self.g, self.mem_dev, phi)
            new_state = dict(state)
            new_state.update(phi=phi, phi_M=phi_M, t=state["t"] + self.params.dt)
            if "phi_prev" in state:
                new_state["phi_prev"] = state["phi"]
            return new_state

        fns = tuple(self._jit(key + (i,), f)
                    for i, f in enumerate((asm_emi, solve_emi, finalize)))
        self._jit_cache[key] = fns
        return fns

    def _timed_pde_step_phased(self, state, sp_: SolverParams, k):
        asm_emi, solve_emi, finalize = self._phase_fns(sp_)
        ph = {}
        tmark = [_time.perf_counter()]

        def phase(name, sync_val):
            jax.block_until_ready(sync_val)
            now = _time.perf_counter()
            ph[name] = now - tmark[0]
            tmark[0] = now

        t0 = _time.perf_counter()
        blocks, rhs, Pd = asm_emi(state)
        phase("emi_assem", rhs)
        phi, emi_iters, emi_conv = solve_emi(blocks, Pd, rhs, state)
        phase("emi_solve", phi)
        new_state = finalize(state, phi)
        jax.block_until_ready(new_state["phi_M"])
        wall = _time.perf_counter() - t0
        st = {"emi_iters": emi_iters,
              "knp_iters": jnp.zeros(self.N_ions, dtype=jnp.int32),
              "emi_converged": emi_conv,
              "phases": ph}
        self._check_convergence(st, sp_)
        self.stats.record_step(st, wall)
        if sp_.verbose:
            print(f"{bcolors.WARNING} t = {float(new_state['t']):.6g}  k = {k} {bcolors.ENDC}")
            print(
                f"{bcolors.OKGREEN} emi iters: {int(emi_iters)}, "
                f"phases: { {p: round(v, 4) for p, v in ph.items()} } {bcolors.ENDC}"
            )
        return new_state

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
