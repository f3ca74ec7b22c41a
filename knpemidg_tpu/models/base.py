"""Membrane ODE model protocol (JAX analog of the gotran module protocol).

The reference ships gotran-generated numba modules with positional state /
parameter tables (e.g. examples/idealized-geometries/mm_hh.py).  Here a model
is a small object with name->index maps and two pure functions; parameter
*values* are accessed by name so the storage layout is free to differ.

All rhs/currents run under vmap over membrane points and jit inside the
solver step; they must be pure jnp.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax.numpy as jnp


class ODEModel:
    """Base: subclasses set STATE_NAMES / PARAM_DEFAULTS and implement
    rhs / currents using the `p` accessor."""

    STATE_NAMES: Sequence[str] = ()
    STATE_INIT: Sequence[float] = ()
    # name -> default value
    PARAM_DEFAULTS: Dict[str, float] = {}

    def __init__(self, **overrides):
        self.STATES = {n: i for i, n in enumerate(self.STATE_NAMES)}
        self.PARAMS = {n: i for i, n in enumerate(self.PARAM_DEFAULTS)}
        self._param_init = np.array(
            [overrides.get(k, v) for k, v in self.PARAM_DEFAULTS.items()],
            dtype=np.float64,
        )
        self._state_init = np.array(self.STATE_INIT, dtype=np.float64)
        self.name = type(self).__name__

    # -- gotran-protocol surface (membrane.py API parity) ------------------
    def init_states(self):
        return self._state_init.copy()

    def init_params(self):
        return self._param_init.copy()

    def state_indices(self, *names):
        idx = [self.STATES[n] for n in names]
        return idx[0] if len(idx) == 1 else idx

    def parameter_indices(self, *names):
        idx = [self.PARAMS[n] for n in names]
        return idx[0] if len(idx) == 1 else idx

    # -- helpers ------------------------------------------------------------
    def p(self, params, name):
        return params[self.PARAMS[name]]

    def rhs(self, t, y, params):                      # pragma: no cover
        raise NotImplementedError

    def currents(self, t, y, params) -> Dict[str, jnp.ndarray]:  # pragma: no cover
        raise NotImplementedError

    # -- Rush-Larsen split (optional) ---------------------------------------
    # Models whose states include Hodgkin-Huxley-type gates
    # ``dy = alpha(V)(1-y) - beta(V) y`` may declare them to enable the
    # exponential-integrator option (membrane/engine.ode_step
    # scheme='rush_larsen').
    GATING_STATES: Sequence[str] = ()

    def gating_indices(self):
        """Static tuple of gating-state indices ((), i.e. falsy, when the
        model declares none -> engine falls back to RK4)."""
        return tuple(self.STATES[n] for n in self.GATING_STATES)

    def gating_rates(self, t, y, params):             # pragma: no cover
        """(alpha, beta) stacked over GATING_STATES order, each (n_g,)."""
        raise NotImplementedError


def sodium_potassium_pump_saturating(I_max, m_K, K_e, m_Na, Na_i):
    """Na/K-ATPase: I_max / ((1 + m_K/K_e)^2 (1 + m_Na/Na_i)^3)
    (mm_hh.py:143-144)."""
    return I_max / ((1 + m_K / K_e) ** 2 * (1 + m_Na / Na_i) ** 3)


def sodium_potassium_pump_michaelis(I_max, m_K, K_e, m_Na, Na_i):
    """Alternative pump law used by the astrocyte glial model
    (local-astrocyte-depolarization/mm_glial.py:157-159)."""
    return (
        I_max
        * (K_e / (K_e + m_K))
        * (Na_i**1.5 / (Na_i**1.5 + m_Na**1.5))
    )


def vtrap(x, y):
    """x / (1 - exp(-x/y)) with the removable singularity at x = 0 handled.

    The classic HH alpha_m/alpha_n rates are singular where V crosses
    exactly -40/-55 mV; in f32 with tens of thousands of membrane points
    riding an AP upstroke that 0/0 *does* get hit (the f64 LSODA reference
    never sees it), and a single NaN state poisons every subsequent solve.
    Near zero we use the series y * (1 + u/2 + u^2/12), u = x/y."""
    u = x / y
    small = jnp.abs(u) < 1e-4
    safe = jnp.where(small, 1.0, u)
    return jnp.where(
        small, y * (1.0 + u / 2.0 + u * u / 12.0), x / (1.0 - jnp.exp(-safe))
    )


def hh_gating_rates_mV(V):
    """Classic HH 1952 rate functions, V in mV, rates in 1/ms."""
    am = 0.1 * vtrap(V + 40.0, 10.0)
    bm = 4.0 * jnp.exp(-(V + 65.0) / 18.0)
    ah = 0.07 * jnp.exp(-(V + 65.0) / 20.0)
    bh = 1.0 / (1.0 + jnp.exp(-(V + 35.0) / 10.0))
    an = 0.01 * vtrap(V + 55.0, 10.0)
    bn = 0.125 * jnp.exp(-(V + 65.0) / 80.0)
    return am, bm, ah, bh, an, bn


def hh_gating_rates_SI(V):
    """Same rates with V in volts, rates in 1/s (mm_hh.py:126-137 uses the
    equivalent shifted form; x/(exp(x/y)-1) == vtrap(-x, y))."""
    v = V * 1e3  # mV
    am = 0.1e3 * vtrap(v + 40.0, 10.0)
    bm = 4.0e3 * jnp.exp(-(v + 65.0) / 18.0)
    ah = 0.07e3 * jnp.exp(-(v + 65.0) / 20.0)
    bh = 1.0e3 / (jnp.exp((30.0 - (v + 65.0)) / 10.0) + 1.0)
    an = 0.01e3 * vtrap(v + 55.0, 10.0)
    bn = 0.125e3 * jnp.exp(-(v + 65.0) / 80.0)
    return am, bm, ah, bh, an, bn
