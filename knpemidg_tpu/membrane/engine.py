"""Vmapped membrane ODE engine.

Replaces the reference's per-facet sequential LSODA loop
(src/knpemidg/membrane.py:84-119, numbalsoda) with a fixed-substep RK4
integrator vmapped over all membrane points at once -- the per-point ODEs
are independent, so on TPU this is a single batched elementwise program
(SURVEY.md N5).  `n_steps_ODE` substeps per PDE step mirror the reference
apps (run_2D.py:67).

Model protocol (the JAX analog of the gotran module protocol,
examples/idealized-geometries/mm_hh.py):

    STATES:  dict  name -> state index   ('V' = membrane potential)
    PARAMS:  dict  name -> parameter index
    init_states()  -> np.ndarray (n_states,)
    init_params()  -> np.ndarray (n_params,)
    rhs(t, y, p)   -> dy/dt  (pure jnp, single point; engine vmaps)
    currents(t, y, p) -> dict name -> value  (channel currents; the
        reference writes these into the parameter array inside the RHS,
        mm_hh.py:154-159 -- here they are computed functionally from the
        final state)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MembraneState:
    """States/params for all membrane points of one tag (pytree).

    Layout: points LAST -- (n_states, n) / (n_params, n) -- so the long
    membrane-point axis maps onto the TPU lane dimension (a (n, 1)-state
    glial model stored points-first would pad 128x)."""

    states: jnp.ndarray                       # (n_states, n)
    params: jnp.ndarray                       # (n_params, n)
    model: Any = dataclasses.field(metadata=dict(static=True))

    # -- convenience accessors (reference set_state/get_state, membrane.py:44-77)
    def has_param(self, name) -> bool:
        return name in self.model.PARAMS

    def has_state(self, name) -> bool:
        return name in self.model.STATES

    def get_state(self, name):
        return self.states[self.model.STATES[name]]

    def replace_state(self, name, values):
        idx = self.model.STATES[name]
        if isinstance(self.states, np.ndarray):
            states = self.states.copy()
            states[idx] = np.asarray(values)
            return dataclasses.replace(self, states=states)
        return dataclasses.replace(self, states=self.states.at[idx].set(values))


def make_membrane(model, midpoints: np.ndarray, dtype=jnp.float64) -> MembraneState:
    """Setup-time states/params stay host-side numpy (eager device ops are
    expensive on remote-compile TPU backends); they become device arrays on
    first entry into the jitted step."""
    n = len(midpoints)
    s0 = np.asarray(model.init_states(), dtype=np.float64)
    p0 = np.asarray(model.init_params(), dtype=np.float64)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    return MembraneState(
        states=np.tile(s0[:, None], (1, n)).astype(np_dtype),
        params=np.tile(p0[:, None], (1, n)).astype(np_dtype),
        model=model,
    )


def set_param(mm: MembraneState, name: str, values) -> MembraneState:
    idx = mm.model.PARAMS[name]
    if isinstance(mm.params, np.ndarray):
        params = mm.params.copy()
        params[idx] = np.asarray(values)
        return dataclasses.replace(mm, params=params)
    return dataclasses.replace(mm, params=mm.params.at[idx].set(values))


def get_param(mm: MembraneState, name: str):
    return mm.params[mm.model.PARAMS[name]]


def ode_step(mm: MembraneState, t, dt: float, n_sub: int,
             scheme: str = "rk4") -> MembraneState:
    """Advance all points by dt with n_sub substeps, then refresh the
    channel-current parameters from the final state.

    ``scheme``:
      * ``"rk4"`` (default) -- classic fixed-substep RK4, validated < 0.1 mV
        vs LSODA at the reference apps' dt / n_steps_ODE;
      * ``"rush_larsen"`` -- exponential (exact-in-frozen-V) update for the
        gating states ``dy = a(V)(1-y) - b(V)y``, midpoint RK2 for the
        rest.  Unconditionally stable in the gates, so it keeps accuracy at
        larger dt where RK4's substeps start to strain (the stiffness-robust
        option standing in for the reference's adaptive LSODA,
        src/knpemidg/membrane.py:108-113).  Falls back to RK4 when the
        model declares no gating split.
    """
    model = mm.model
    if isinstance(mm.states, np.ndarray):
        mm = dataclasses.replace(
            mm, states=jnp.asarray(mm.states), params=jnp.asarray(mm.params)
        )
    h = dt / n_sub
    gating = model.gating_indices() if scheme == "rush_larsen" else None

    def rk4_point(y, p):
        def sub(i, carry):
            y, tt = carry
            k1 = model.rhs(tt, y, p)
            k2 = model.rhs(tt + 0.5 * h, y + 0.5 * h * k1, p)
            k3 = model.rhs(tt + 0.5 * h, y + 0.5 * h * k2, p)
            k4 = model.rhs(tt + h, y + h * k3, p)
            return (y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), tt + h)

        y, _ = jax.lax.fori_loop(0, n_sub, sub, (y, jnp.asarray(t, y.dtype)))
        return y

    def rl_point(y, p):
        gidx = jnp.asarray(gating, dtype=jnp.int32)

        def gate_half(y, tt, hh):
            # exponential gate update: y_g <- y_inf + (y_g - y_inf) e^{-hh/tau}
            a, b = model.gating_rates(tt, y, p)
            tau_inv = a + b
            y_inf = a / tau_inv
            newg = y_inf + (y[gidx] - y_inf) * jnp.exp(-hh * tau_inv)
            return y.at[gidx].set(newg)

        def sub(i, carry):
            # Strang split (2nd order): half exponential gates, midpoint RK2
            # for the non-gating states with gate rows frozen, half gates
            y, tt = carry
            y = gate_half(y, tt, 0.5 * h)
            k1 = model.rhs(tt, y, p).at[gidx].set(0.0)
            k2 = model.rhs(tt + 0.5 * h, y + 0.5 * h * k1, p).at[gidx].set(0.0)
            y = y + h * k2
            y = gate_half(y, tt + 0.5 * h, 0.5 * h)
            return (y, tt + h)

        y, _ = jax.lax.fori_loop(0, n_sub, sub, (y, jnp.asarray(t, y.dtype)))
        return y

    point = rl_point if gating else rk4_point
    states = jax.vmap(point, in_axes=-1, out_axes=-1)(mm.states, mm.params)
    mm = dataclasses.replace(mm, states=states)

    # write back channel currents at (t+dt, y_final) -- the reference's RHS
    # side effect (mm_hh.py:154-159) evaluated at the end of the interval
    cur = jax.vmap(lambda y, p: model.currents(t + dt, y, p),
                   in_axes=-1, out_axes=-1)(states, mm.params)
    params = mm.params
    for name, vals in cur.items():
        params = params.at[model.PARAMS[name]].set(vals)
    return dataclasses.replace(mm, params=params)


def ode_run(mm: MembraneState, t0: float, dt: float, n_steps: int,
            n_sub: int = 1) -> MembraneState:
    """Integrate n_steps PDE-steps in one jitted scan (used by the
    calibration pipeline, run_calibration.py:50-51, which steps 100,000
    times to steady state)."""
    import jax

    def body(carry, k):
        return ode_step(carry, t0 + k * dt, dt, n_sub), None

    mm2, _ = jax.lax.scan(
        body,
        dataclasses.replace(
            mm,
            states=jnp.asarray(mm.states),
            params=jnp.asarray(mm.params),
        ),
        jnp.arange(n_steps),
    )
    return mm2
