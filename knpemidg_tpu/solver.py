"""Coupled KNP-EMI solver (TPU-native rebuild of src/knpemidg/solver.py).

Mathematical model (solver.py:30-60): for each ion k,
``dc_k/dt + div J_k = f_k`` with ``J_k = -D_k grad c_k - z_k D_k psi c_k
grad phi``; charge conservation ``-F sum_k z_k div J_k = 0``; the last ion is
eliminated by electroneutrality; membrane facets carry capacitive + channel
dynamics through a Robin interface condition with C_phi = C_M/dt.

Splitting scheme (solver.py:36-43): per time step
  step 0 (ODE):  advance membrane ODEs (vmapped fixed-substep RK4),
  step I (EMI):  elliptic DG solve for phi (CG + block-Jacobi, nullspace
                 projected; or host direct solve),
  step II (KNP): parabolic DG solve per solved ion (GMRES + block-Jacobi,
                 ions batched),
then update phi_M = JUMP(phi), Nernst potentials, eliminated ion.

Everything device-side is pure-functional; the per-step PDE pipeline is one
jitted function (assembly is batched einsums, Krylov loops are
lax.while_loop).  The outer time loop runs on host for I/O and stats,
matching the reference's per-step instrumentation (solver.py:1146-1198).
"""
from __future__ import annotations

import time as _time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import Ion, PhysicalParams, SolverParams, StimParams, ion_from_dict
from .mesh.core import Mesh
from .fem.tabulation import build_geometry, build_membrane_tables
from .ops import assembly
from .ops.spmv import (bell_matvec, bell_matvec_fan,
                       bell_matvec_multi, block_jacobi_apply,
                       block_jacobi_inverse)
from .solvers.krylov import bicgstab_batched, gmres, gmres_batched, pcg
from .solvers import direct as direct_solvers
from .solvers.twolevel import (block_moment_rows, build_moment_deflation,
                               ritz_galerkin_host,
                               ritz_lanczos_W, ritz_lanczos_W_host,
                               build_two_level, compartment_ids,
                               make_two_level, moment_vectors,
                               two_level_apply_batched, two_level_apply_fn)
from .membrane.engine import make_membrane, ode_step, set_param, get_param
from .utils.stats import SolverStats, bcolors


class Traces:
    """Membrane-trace helpers handed to `update_ode` (the reference pushes
    pcws_constant_project(plus/minus(c)) into ODE params, run_2D.py:38-49).
    Index `k` refers to the full ion list; the last ion is the eliminated
    one."""

    def __init__(self, solver, c, c_elim, sl):
        self._s = solver
        self._c = c
        self._elim = c_elim
        self._sl = sl  # (start, stop) membrane slice of this tag

    def _field(self, k):
        n = len(self._s.ion_list)
        return self._elim if k == n - 1 else self._c[k]

    def plus(self, k):
        """ECS-side facet-average trace of ion k on this tag's membranes."""
        g, mem = self._s._g_knp(), self._s._mem_knp()
        vals = assembly.membrane_avg_m(g, mem, self._field(k), "p")
        return vals[self._sl[0]:self._sl[1]]

    def minus(self, k):
        """ICS-side facet-average trace of ion k."""
        g, mem = self._s._g_knp(), self._s._mem_knp()
        vals = assembly.membrane_avg_m(g, mem, self._field(k), "m")
        return vals[self._sl[0]:self._sl[1]]

    def ion_index(self, name):
        return self._s.ion_names.index(name)


class Solver:
    """Reference-parity API (solver.py:62-84): construct, then
    setup_domain -> setup_parameters -> setup_FEM_spaces ->
    [setup_membrane_model] -> solve_system_{active,passive}."""

    def __init__(self, params, ion_list, degree_emi=1, degree_knp=1, mms=None,
                 sf=1, dtype=None):
        if degree_emi not in (1, 2) or degree_knp not in (1, 2):
            raise NotImplementedError(
                "DG degrees 1 and 2 supported (the reference's DG_k spaces, "
                "solver.py:163-169; its shipped runs all use 1)")
        self.degree = degree_emi          # EMI (potential) space degree
        self.degree_knp = degree_knp      # concentration space degree
        self.mixed_degrees = degree_emi != degree_knp
        self.params = params if isinstance(params, PhysicalParams) else params
        self.ion_list = [
            i if isinstance(i, Ion) else ion_from_dict(i) for i in ion_list
        ]
        self.ion_names = [i.name for i in self.ion_list]
        self.N_ions = len(ion_list) - 1      # number of *solved* ions
        self.mms = mms
        self.sf = sf
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        self.stats = SolverStats()
        self.mem_models: Dict[int, Any] = {}
        self.splitting_scheme = True
        self.pair_layout = False             # see enable_pair_layout
        self.pairs = None
        self._jit_cache: Dict[Any, Any] = {}
        # serializes the aux-swap tracing trick in _jit: the swap mutates
        # `self` for the duration of a trace, which is re-entrant on one
        # thread (nested traces save/restore correctly) but not safe across
        # threads -- the RLock makes concurrent use correct by exclusion
        import threading

        self._trace_lock = threading.RLock()

    # ------------------------------------------------------------------
    # setup phases
    # ------------------------------------------------------------------
    def setup_domain(self, mesh: Mesh, quad_degree: Optional[int] = None):
        """Build geometry tables; penalty tau = 20 * gdim * degree
        (solver.py:110-111).

        Cell numbering: build_mesh orders cells by (compartment, Morton), so
        the preconditioner's contiguous coarse chunks never mix compartments
        (reshape-based restrict/prolong stays gather-free; see
        solvers/twolevel.py)."""
        self._invalidate_caches()
        self._comp_np = compartment_ids(mesh)
        self.mesh = mesh
        # both spaces must share one quadrature rule so cross-space fields
        # (kappa in the EMI form, phi in the KNP form) evaluate at the same
        # points under mixed degrees
        qd = max(quad_degree or 4, 2 * self.degree, 2 * self.degree_knp)
        self.geom = build_geometry(mesh, quad_degree_cell=qd,
                                   quad_degree_facet=qd, degree=self.degree)
        self.g = assembly.precompute_static(self.geom.to_device(self.dtype))
        if self.mixed_degrees:
            self.geom_knp = build_geometry(mesh, quad_degree_cell=qd,
                                           quad_degree_facet=qd,
                                           degree=self.degree_knp)
            self.g2 = assembly.precompute_static(
                self.geom_knp.to_device(self.dtype))
        else:
            self.geom_knp = self.geom
        self.gdim = mesh.dim
        self.tau = 20.0 * self.gdim * self.degree
        self.tau_knp = 20.0 * self.gdim * self.degree_knp
        self.n_cells = mesh.num_cells
        self.nd = self.geom.nd
        self.nd_knp = self.geom_knp.nd
        # characteristic domain length for the B-operator mass scaling
        # (solver.py:383-393)
        ext = mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
        self.Lp = float(ext.max())
        if self.mms is not None:
            self._set_membrane_tags(list(self.mms.wall_tags))
        return self

    def enable_pair_layout(self, interleave: bool = True):
        """Switch the iterative Krylov path to the pair-block operator
        layout (ops/pairs.py): 2-cell macro rows whose external neighbor
        gather carries ~25% fewer indices (measured -35.5% per matvec on
        the EMIx mesh) and whose block-Jacobi smoother sees the intra-pair
        coupling.  Fields/rhs stay cell-indexed; each solve converts its
        vectors once.

        ``interleave`` (default): additionally renumber the cell axis so
        pair p occupies slots (2p, 2p+1), with inert pad cells (the
        parallel.sharding.pad_cell_axis convention) as the dead second
        halves of self-pairs.  The conversions become reshapes and the
        preconditioner's pair chunks cover exactly the cell layout's
        contiguous (compartment, Morton) chunk ranges -- the
        order-by-representative pair sequence cost +11% KNP window
        iterations from shifted chunk boundaries (ROADMAP round-4).
        Costs ~4.7% inert cell padding on the EMIx mesh (assembly rows
        only; the pair count -- and hence every Krylov matvec -- is
        unchanged).

        Supported: degree_emi == degree_knp == 1, mms=None, unsharded.
        Call AFTER setup_FEM_spaces/setup_membrane_model and BEFORE
        attach_pc (the frozen pc data is layout-specific; the interleave
        renumbering must see the membrane cell maps)."""
        from .ops.pairs import (build_pair_maps, interleave_pair_maps,
                                pair_maps_to_device)

        assert self.degree == 1 and self.degree_knp == 1, \
            "pair layout: degree-1 production path only"
        assert self.mms is None, "pair layout: not for MMS verification"
        assert getattr(self, "_halo_mv", None) is None, \
            "pair layout: enable before/instead of sharding (round-4 scope)"
        if self.pairs is None:
            pmh = build_pair_maps(self.geom)
            npair = int(pmh["int_f"].shape[0])
            # pair mass from the ORIGINAL numbering (pad cells carry mean
            # volume but are dead halves -- they must not add mass)
            vol = np.asarray(self.geom.vol)
            pair_mass = (vol[pmh["cop"][0]]
                         + vol[pmh["cop"][1]] * pmh["live1"])
            if interleave:
                pmh, perm = interleave_pair_maps(pmh, self.n_cells)
                self._apply_interleave(perm)
            self._finalize_pair_setup(pmh, pair_mass)
        return self

    def _finalize_pair_setup(self, pmh, pair_mass: np.ndarray):
        """Install pair maps + derived masks on the solver (shared by
        enable_pair_layout and parallel.sharding.shard_solver's pair
        mode)."""
        from .ops.pairs import pair_maps_to_device

        self.pairs_host = pmh
        self.pairs = pair_maps_to_device(pmh)
        npair = int(pmh["int_f"].shape[0])       # shard mode pads pairs
        live = np.ones((2, npair), dtype=bool)
        live[0] = pmh.get("live0", True)
        live[1] = pmh["live1"]
        mask = np.repeat(live, self.nd, axis=0)            # (2nd, npair)
        self._pair_mask = jnp.asarray(mask)
        # (2nd, 2nd, 1) mask selecting the two per-cell diagonal
        # sub-blocks (the 'halves' pair_bj variant)
        self._pair_bj_halves = jnp.asarray(
            np.kron(np.eye(2), np.ones((self.nd, self.nd)))[:, :, None],
            dtype=self.dtype)
        self._pair_mass = jnp.asarray(pair_mass, dtype=self.dtype)
        self.pair_layout = True
        self._invalidate_caches()

    def _pair_W_to_cell(self, W_pair):
        """pair->cell conversion of harvested deflation fields, OFF device
        for interleaved maps: under a multi-process mesh the pair maps are
        globally sharded and eager mixed local/global ops raise, while the
        consumer (ritz_galerkin_host) pulls to host anyway."""
        from .ops.pairs import from_pair, from_pair_host
        from .solvers.twolevel import _host

        if "cell_col" not in self.pairs_host:
            return from_pair_host(self.pairs_host, _host(W_pair))
        return from_pair(self.pairs, W_pair)    # legacy gather maps

    def _ritz_W_to_pair(self, W_cell):
        """cell->pair conversion of host-built deflation fields (see
        _pair_W_to_cell)."""
        from .ops.pairs import to_pair, to_pair_host

        if "cell_col" not in self.pairs_host:
            out = to_pair_host(self.pairs_host, np.asarray(W_cell))
            return jnp.asarray(out, dtype=self.dtype)
        return to_pair(self.pairs, W_cell)      # legacy gather maps

    def _apply_interleave(self, perm: np.ndarray):
        """Renumber every cell-indexed solver array by the interleaved pair
        permutation (see enable_pair_layout): pad the cell axis with the
        inert cells the permutation references (ids >= n_cells), permute
        pads into the dead half slots, and remap the initial fields.
        Reuses the sharding machinery (pad_cell_axis / permute_cells)."""
        from .parallel.sharding import pad_cell_axis, permute_cells

        assert hasattr(self, "c_init"), \
            "pair interleave: call enable_pair_layout after setup_FEM_spaces"
        nc = self.n_cells
        extra = len(perm) - nc
        # composition: under sharding a shard-block permutation has already
        # been applied, so `perm` values are ids in THAT numbering
        prev_perm = getattr(self, "_cell_perm", None)
        prev_inv = getattr(self, "_cell_perm_inv", None)
        pad_cell_axis(self, extra)     # builds _comp_onehot at the real size
        # _comp_np must match the padded size before permute_cells; pads
        # are deflation-invisible: zero one-hot columns (pad_cell_axis) and
        # compartment id -1 so the moment-deflation fields exclude them
        # (_emi_moment_W / moment_vectors -- a pad assigned to a real
        # compartment would inject its zeroed node coordinates into that
        # compartment's moment basis)
        self._comp_np = np.concatenate(
            [self._comp_np, np.full(extra, -1, dtype=self._comp_np.dtype)])
        permute_cells(self, perm)
        # _comp_onehot/_comp_ids are dropped by enable_pair_layout's final
        # _invalidate_caches and rebuilt lazily from the padded+permuted
        # _comp_np (zero columns / id 0 at the -1 pads, _comp_arrays)
        self._pad_mask = jnp.asarray(perm < nc)
        self.n_cells_pad = len(perm)
        # original cell id -> padded slot (unpad_state, H5 output)
        inv2 = self._cell_perm_inv
        self._cell_unpad_idx = (inv2[prev_inv[:nc]] if prev_inv is not None
                                else inv2[:nc].copy())

        # initial fields were built at the original size: pad slots take
        # their live partner's value if it is live, else cell 0 (any
        # finite value works -- pad rows are decoupled and their Krylov
        # increments stay exactly zero; a live source keeps concentrations
        # positive for the stats gates)
        src = perm.copy()
        partner = perm[np.arange(len(perm)) ^ 1]   # the other pair half
        dead = perm >= nc
        src[dead] = np.where(partner[dead] < nc, partner[dead], 0)
        if prev_perm is not None:                  # compose to ORIGINAL ids
            src = prev_perm[src]
        for name in ("c_init", "c_elim_init", "phi_init"):
            v = np.asarray(getattr(self, name))
            setattr(self, name, jnp.asarray(v[..., src], dtype=self.dtype))

        src_j = jnp.asarray(src)

        def pair_state(state):
            """Map an original-numbering state (e.g. a checkpoint from a
            non-interleaved run) into the padded interleaved numbering;
            no-op on already-padded fields."""
            out = dict(state)
            for key in ("c", "c_elim", "phi", "phi_prev"):
                if key in state and state[key].shape[-1] == nc:
                    out[key] = state[key][..., src_j]
            return out

        self._shard_state = pair_state

    def _set_membrane_tags(self, tags):
        self.tables = build_membrane_tables(self.mesh, tags)
        self.mem_dev = self.tables.to_device(self.dtype)
        # membrane-presliced trace tensors: gathers over n_mem instead of
        # the full facet axis (ops/assembly._mem_trace)
        fidx = self.tables.fidx
        self.mem_dev["Rp"] = self.g["f_Rp"][:, :, fidx]
        self.mem_dev["Rm"] = self.g["f_Rm"][:, :, fidx]
        self.mem_dev["cp"] = self.g["f_cp"][fidx]
        self.mem_dev["cm"] = self.g["f_cm"][fidx]
        if self.mixed_degrees:
            # concentration-space trace tensors (Traces / Nernst read c
            # fields; phi_M jumps read the EMI tensors above)
            self.mem_dev2 = dict(self.mem_dev)
            self.mem_dev2["Rp"] = self.g2["f_Rp"][:, :, fidx]
            self.mem_dev2["Rm"] = self.g2["f_Rm"][:, :, fidx]
        nf1 = self.geom.f_stag.shape[0]
        self.masks = {
            "f_sip": jnp.asarray(self.geom.f_stag == 0),
            "f_mem": jnp.asarray(self.tables.mem_of_facet < self.tables.n_mem),
            "f_memidx": jnp.asarray(self.tables.mem_of_facet, dtype=jnp.int32),
        }
        self.n_mem = self.tables.n_mem

    def _cellwise(self, sub: Dict[int, Any]) -> np.ndarray:
        """Per-subdomain dict -> per-cell P0 array (reference make_global,
        solver.py:1244-1258)."""
        out = np.zeros(self.n_cells)
        for tag, val in sub.items():
            out[self.mesh.cell_tags == tag] = float(val)
        return out

    def _invalidate_caches(self):
        """Drop jit traces and cached static blocks bound to the previous
        mesh/physics; called by setup_domain/setup_parameters so re-setup on
        an existing Solver never reuses stale traces (ADVICE r1)."""
        self._jit_cache = {}
        for attr in ("_knp_static_blocks", "_comp_onehot", "_comp_ids"):
            if hasattr(self, attr):
                delattr(self, attr)

    def setup_parameters(self):
        """Diffusion fields per ion + background charge (solver.py:124-154)."""
        self._invalidate_caches()
        p = self.params
        self.D = jnp.asarray(
            np.stack([self._cellwise(ion.D_sub) for ion in self.ion_list]),
            dtype=self.dtype,
        )
        rho = p.rho_sub if p.rho_sub is not None else {}
        self.rho = jnp.asarray(self._cellwise(rho) if rho else np.zeros(self.n_cells),
                               dtype=self.dtype)
        self.z = jnp.asarray([float(i.z) for i in self.ion_list], dtype=self.dtype)
        return self

    # knp-space accessors: with mixed degrees these return the second
    # geometry / membrane tables, which travel through _jit as aux args;
    # otherwise they alias the (possibly traced) EMI-space dicts
    def _g_knp(self):
        return getattr(self, "g2", None) or self.g

    def _mem_knp(self):
        return getattr(self, "mem_dev2", None) or self.mem_dev

    def _interp_init(self, sub, kind, geom=None) -> np.ndarray:
        """Nodal interpolation of initial data per subdomain
        (solver.py:179-206).  Nodes are the degree-k Lagrange points."""
        geom = geom or self.geom
        coords = geom.nodes                                # (nc, nd, d)
        out = np.zeros((self.n_cells, geom.nd))
        if kind == "function":
            return np.asarray(sub, dtype=np.float64)
        for tag, val in sub.items():
            m = self.mesh.cell_tags == tag
            if kind == "constant":
                out[m] = float(val)
            elif kind == "expression":
                out[m] = np.asarray(val(coords[m]))
            else:
                raise ValueError(
                    f"initial condition type {kind!r} not recognized -- use "
                    f"'constant', 'expression' or 'function'"
                )
        return out

    def setup_FEM_spaces(self):
        """Initial conditions for concentrations, potential, phi_M
        (solver.py:157-225)."""
        c0 = []
        for ion in self.ion_list:
            # host interpolation is (nc, nd); device layout is cells-last
            c0.append(self._interp_init(ion.c_init_sub, ion.c_init_sub_type,
                                        geom=self.geom_knp).T)
        self.c_init = jnp.asarray(np.stack(c0[:-1]), dtype=self.dtype)
        self.c_elim_init = jnp.asarray(c0[-1], dtype=self.dtype)
        self.phi_init = jnp.asarray(
            np.zeros((self.nd, self.n_cells)), dtype=self.dtype
        )
        return self

    def setup_membrane_model(self, stim_params: StimParams, odes: Dict[int, Any]):
        """One vmapped ODE system per membrane tag (reference MembraneModel,
        membrane.py:9-41); Cm pushed into ODE params (solver.py:248);
        stimulus applied via the spatial locator mask (membrane.py:92-104)."""
        self._set_membrane_tags(sorted(odes))
        self.stim_params = stim_params
        self.mem_models = {}
        for tag, model in odes.items():
            s0, s1 = self.tables.slices[tag]
            mids = self.tables.midpoints[s0:s1]
            mm = make_membrane(model, mids, dtype=self.dtype)
            mm = set_param(mm, "Cm", np.full(s1 - s0, self.params.C_M))
            if stim_params is not None and stim_params.stimulus:
                locator = stim_params.stimulus_locator or (lambda x: True)
                mask = np.array([bool(locator(x)) for x in mids])
                for key, value in stim_params.stimulus.items():
                    cur = np.array(get_param(mm, key))
                    cur[mask] = value
                    mm = set_param(mm, key, cur)
            self.mem_models[tag] = mm
        return self

    # ------------------------------------------------------------------
    # subclass hook (reference solver.py:1137-1144)
    # ------------------------------------------------------------------
    def update_ode(self, tag: int, traces: Traces) -> Dict[str, jnp.ndarray]:
        """Return {ode_param_name: per-facet values} pushed into the tag's
        ODE parameters each step.  Subclasses implement this (e.g. K_e
        plus-trace / Na_i minus-trace, run_2D.py:38-49)."""
        raise NotImplementedError("Subclasses must implement update_ode")

    # ------------------------------------------------------------------
    # assembly wrappers
    # ------------------------------------------------------------------
    def _phys_emi(self):
        p = self.params
        return {
            "F": p.F, "psi": p.psi, "C_phi": p.C_phi,
            "tau_emi": self.tau, "Lp": self.Lp,
        }

    def _phys_knp(self):
        p = self.params
        return {
            "F": p.F, "psi": p.psi, "C_M": p.C_M, "dt": p.dt,
            "tau_knp": self.tau_knp,
        }

    def _all_c(self, c, c_elim):
        return jnp.concatenate([c, c_elim[None]], axis=0)

    def _assemble_emi(self, c, c_elim, phi_M_pad, I_ch_tot_pad, t,
                      pair: bool = False):
        ions = {"z": self.z, "D": self.D, "c": self._all_c(c, c_elim)}
        return assembly.assemble_emi(
            self.g, self.masks, ions, self._phys_emi(),
            phi_M=phi_M_pad, I_ch_tot=I_ch_tot_pad,
            splitting=self.splitting_scheme, mms=self.mms, t=t,
            gc=self._g_knp(),
            mem_t=getattr(self, "mem_dev", None),
            pm=self.pairs if pair else None,
        )

    @staticmethod
    def _f_source_callable(ion):
        """Normalize `Ion.f_source` to a callable(x_qp, t) -> (q, nc) or
        None.  Numeric nonzero values become constant callables -- config.py
        documents float sources and the reference integrates a constant
        f_source over dx(0) (solver.py:599); silently dropping them was
        ADVICE r1."""
        fs = ion.f_source
        if callable(fs):
            return fs
        val = float(fs)
        if val == 0.0:
            return None
        # x is the cells-last quadrature-point array (q, dim, nc) -> (q, nc)
        return lambda x, t: jnp.full((x.shape[0], x.shape[-1]), val,
                                     dtype=x.dtype)

    def _knp_static(self, k):
        """Cache the time-independent KNP operator part per ion (mass +
        stiffness + SIP; computed once, reused every step).

        Must only populate the cache with *concrete* arrays: when first hit
        inside a jit trace the result is a tracer that would poison later
        re-traces, so traced results are returned uncached (the per-trace
        cost is one extra static assembly at trace time, folded by XLA).
        """
        if not hasattr(self, "_knp_static_blocks"):
            self._knp_static_blocks = {}
        if k not in self._knp_static_blocks:
            ion = self.ion_list[k]
            iond = {"z": float(ion.z), "D": self.D[k]}
            fn = self._jit(("knp_static",), lambda ion: (
                assembly.assemble_knp_static(self._g_knp(), self.masks, ion,
                                             self._phys_knp())))
            val = fn(iond)
            if isinstance(val, jax.core.Tracer):
                return val
            self._knp_static_blocks[k] = val
        return self._knp_static_blocks[k]

    def _assemble_knp_ion(self, k, c, c_elim, phi, phi_M_pad, I_ch_pad,
                          I_ch_tot_pad, t, c_n=None):
        call = self._all_c(c, c_elim)
        alpha_sum = jnp.einsum("k,kc,kic->ic", self.z**2, self.D, call)
        ion = self.ion_list[k]
        iond = {
            "z": float(ion.z), "D": self.D[k],
            "c_n": c[k] if c_n is None else c_n[k], "c_k": c[k],
        }
        if self.mms is not None:
            iond["C_sub_i"] = float(ion.C_sub[1])
            iond["C_sub_e"] = float(ion.C_sub[0])
        f_source = self._f_source_callable(ion)
        return assembly.assemble_knp(
            self._g_knp(), self.masks, iond, self._phys_knp(), phi, alpha_sum,
            phi_M=phi_M_pad, I_ch_k=I_ch_pad[k], I_ch_tot=I_ch_tot_pad,
            f_source=f_source, splitting=self.splitting_scheme,
            mms=self.mms, mms_ion=k, t=t,
            static_blocks=self._knp_static(k), gp=self.g,
        )

    # ------------------------------------------------------------------
    # one PDE time step (steps I + II + updates)
    # ------------------------------------------------------------------
    def _pde_step(self, state, solver_params: SolverParams, c_n=None,
                  advance_time: bool = True):
        """Pure function: EMI solve -> KNP solves -> state updates.

        Direct solves (MMS verification) run on host between jitted
        assemblies; the iterative path is fully traceable.  ``c_n`` (the
        previous *time-level* concentrations) defaults to the current state;
        Picard inner iterations pass the frozen time-level explicitly while
        the state carries the latest Picard iterate (solver.py:850-927).
        """
        sp_ = solver_params
        c, c_elim, phi, phi_M, t = (
            state["c"], state["c_elim"], state["phi"], state["phi_M"], state["t"]
        )
        pc = state.get("pc")
        if c_n is None:
            c_n = c
        pad = lambda v: jnp.concatenate([v, jnp.zeros(1, dtype=v.dtype)])
        phi_M_pad = pad(phi_M)
        I_ch = state["I_ch"]                         # (n_ions, n_mem)
        I_ch_pad = jnp.concatenate(
            [I_ch, jnp.zeros((I_ch.shape[0], 1), dtype=I_ch.dtype)], axis=1
        )
        I_ch_tot_pad = I_ch_pad.sum(axis=0)

        stats = {}
        # eager (host-direct) path: time phases inline -- this branch is
        # never jitted (_step_fn / fused_step exclude direct solves), so
        # perf_counter is meaningful here
        eager = sp_.direct_emi or sp_.direct_knp
        if eager:
            phases = stats["phases"] = {}
            _tmark = [_time.perf_counter()]

            def _phase(name, sync_val):
                jax.block_until_ready(sync_val)
                now = _time.perf_counter()
                phases[name] = phases.get(name, 0.0) + (now - _tmark[0])
                _tmark[0] = now

        # ---- step I: EMI ------------------------------------------------
        pair = self.pair_layout and not eager
        asm_emi = self._jit(("asm_emi", self.splitting_scheme, pair),
                            partial(self._assemble_emi, pair=pair))
        blocks, rhs, Pd = asm_emi(c, c_elim, phi_M_pad, I_ch_tot_pad, t)
        if eager:
            _phase("emi_assem", rhs)
        if sp_.direct_emi:
            phi_new = jnp.asarray(
                direct_solvers.solve_direct(blocks, self.g["nbr"], rhs,
                                            nullspace_constant=True),
                dtype=self.dtype,
            )
            stats["emi_iters"] = jnp.int32(0)
            stats["emi_converged"] = jnp.bool_(True)
        else:
            phi_new, stats["emi_iters"], stats["emi_converged"] = (
                self._emi_solve_iterative(
                    blocks, Pd, rhs, phi, sp_,
                    pc=pc.get("emi") if pc else None,
                    phi_prev=state.get("phi_prev"),
                )
            )
        if eager:
            _phase("emi_solve", phi_new)
        phi = phi_new

        # ---- step II: KNP per solved ion ---------------------------------
        if self.mms is None and not sp_.direct_knp:
            # production path: ions are independent identical-structure
            # solves -- vmap them (halves program size vs unrolling, and
            # batches the Krylov matvecs on device)
            blocksK, rhsK = self._knp_assemble_all(
                c, c_elim, phi, phi_M_pad, I_ch_pad, I_ch_tot_pad, t, c_n
            )
            if eager:
                _phase("knp_assem", rhsK)
            c, stats["knp_iters"], stats["knp_converged"] = (
                self._knp_solve_all(blocksK, rhsK, c, sp_,
                                    pcK=pc.get("knp") if pc else None)
            )
            if eager:
                _phase("knp_solve", c)
            return self._finalize_step(state, stats, c, phi, advance_time, t)

        new_c = []
        knp_iters = []
        knp_conv = []
        for k in range(self.N_ions):
            asm_knp = self._jit(
                ("asm_knp", k, self.splitting_scheme),
                partial(self._assemble_knp_ion, k),
            )
            blocks, rhs = asm_knp(c, c_elim, phi, phi_M_pad, I_ch_pad,
                                  I_ch_tot_pad, t, c_n)
            if eager:
                _phase("knp_assem", rhs)
            if sp_.direct_knp:
                ck = jnp.asarray(
                    direct_solvers.solve_direct(blocks, self.g["nbr"], rhs),
                    dtype=self.dtype,
                )
                knp_iters.append(jnp.int32(0))
                knp_conv.append(jnp.bool_(True))
            else:
                # increment form (see EMI above): the KNP solution has
                # ||c|| ~ 100 mM but per-step changes ~1e-2 mM, so solving
                # for the increment pushes the f32 residual floor ~4 orders
                # below the reference's rtol_knp = 1e-7 target
                mv = lambda v: self._matvec(blocks, v)
                r0 = rhs - mv(c[k])
                res = gmres(
                    mv, r0, jnp.zeros_like(r0),
                    self._make_precond(blocks, blocks[0], sp_, sym=False),
                    rtol=sp_.rtol_knp, atol=sp_.atol_knp,
                    max_it=sp_.max_it_knp, restart=sp_.gmres_restart,
                    b_ref=rhs,
                )
                ck = c[k] + res.x
                knp_iters.append(res.iters)
                knp_conv.append(res.converged)
            if eager:
                _phase("knp_solve", ck)
            new_c.append(ck)
        c = jnp.stack(new_c)
        stats["knp_iters"] = jnp.stack(knp_iters)
        stats["knp_converged"] = jnp.stack(knp_conv)
        return self._finalize_step(state, stats, c, phi, advance_time, t)

    def _emi_solve_iterative(self, blocks, Pd, rhs, phi, sp_: SolverParams,
                             pc=None, phi_prev=None):
        """Increment-form PCG for the EMI system (jittable): solve
        A d = b - A phi_0 around zero -- the f32 residual floor scales with
        ||d|| instead of ||phi||, while the tolerance stays relative to the
        full rhs (b_ref).

        ``phi_prev`` enables the linear-predictor initial guess
        2 phi_k - phi_{k-1}: during an AP upstroke phi changes fast but
        smoothly, so extrapolation often lands far closer than phi_k (109
        -> 11 iters measured on spike steps) -- but it overshoots at
        trajectory kinks, so the guess with the smaller initial residual
        is selected per solve (cost: one extra matvec)."""
        pair = isinstance(blocks, tuple)
        if pair:
            from .ops.pairs import pair_matvec, to_pair, from_pair

            pm = self.pairs
            pd_, pe_ = blocks
            hmv = getattr(self, "_halo_pair_mv", None)
            mv = ((lambda v: hmv(self._halo_pair_data, pd_, pe_, v))
                  if hmv is not None
                  else (lambda v: pair_matvec(pd_, pe_, pm, v)))
            # one stacked conversion gather for every cell-layout vector
            stackc = [rhs, phi] + ([phi_prev] if phi_prev is not None else [])
            sp_stack = to_pair(pm, jnp.stack(stackc))
            rhs = sp_stack[0]
            phi = sp_stack[1]
            phi_prev = sp_stack[2] if len(stackc) == 3 else None
            mask = self._pair_mask
        else:
            mv = lambda v: self._matvec(blocks, v)
            mask = getattr(self, "_pad_mask", None)
        if phi_prev is not None:
            pred = 2.0 * phi - phi_prev
            ra = rhs - mv(phi)
            rb = rhs - mv(pred)
            use_pred = (jnp.vdot(rb.ravel(), rb.ravel())
                        < jnp.vdot(ra.ravel(), ra.ravel()))
            guess = jnp.where(use_pred, pred, phi)
            r0 = jnp.where(use_pred, rb, ra)
        else:
            guess = phi
            r0 = rhs - mv(phi)
        res = pcg(
            mv, r0, jnp.zeros_like(phi),
            self._make_precond(blocks, Pd, sp_, sym=True, pc=pc),
            rtol=sp_.rtol_emi, atol=sp_.atol_emi, max_it=sp_.max_it_emi,
            project_nullspace=True, b_ref=rhs,
            nullspace_mask=mask,
        )
        out = guess + res.x
        if pair:
            out = from_pair(self.pairs, out)
        return out, res.iters, res.converged

    def _finalize_step(self, state, stats, c, phi, advance_time, t):
        """Post-solve updates (solver.py:808-845)."""
        phi_M = assembly.jump_phi_M_m(self.g, self.mem_dev, phi)
        c_elim = assembly.eliminated_concentration(
            c, self.z[:-1], self.rho, float(self.ion_list[-1].z)
        )
        if advance_time:
            t = t + self.params.dt
        new_state = dict(state)
        new_state.update(c=c, c_elim=c_elim, phi=phi, phi_M=phi_M, t=t)
        if "phi_prev" in state:        # predictor base for the next step
            new_state["phi_prev"] = state["phi"]
        return new_state, stats

    def _knp_assemble_all(self, c, c_elim, phi, phi_M_pad, I_ch_pad,
                          I_ch_tot_pad, t, c_n):
        """Vmapped KNP assembly for all solved ions: (blocks, rhs) stacked
        over the ion axis (jittable)."""
        call = self._all_c(c, c_elim)
        alpha_sum = jnp.einsum("k,kc,kic->ic", self.z**2, self.D, call)
        # the ion-stacked static operator is cached by attach_pc: restacking
        # (m, K, nd, nd, nc) inside the jitted step costs a ~150 MB copy
        # per step that XLA does not reliably hoist out of scan blocks
        cache = getattr(self, "_knp_static_blocks", {})
        statics = cache.get(-1)
        if statics is None:
            statics = jnp.stack([self._knp_static(k)
                                 for k in range(self.N_ions)])

        # f_source contributions (per-ion callables) outside the vmap
        g = self._g_knp()
        src_rows = []
        for k in range(self.N_ions):
            fsrc = self._f_source_callable(self.ion_list[k])
            if fsrc is not None:
                fq = fsrc(g["cell_qp"], t)
                ecs = (g["cell_tag"] == 0)[None, :]
                src_rows.append(g["vol"] * jnp.einsum(
                    "q,qc,qi->ic", g["w_c"], fq * ecs, g["Phi_c"]
                ))
            else:
                src_rows.append(jnp.zeros((self.nd_knp, phi.shape[-1]),
                                          dtype=phi.dtype))
        srcs = jnp.stack(src_rows)

        phys = self._phys_knp()

        if self.degree == 1 and self.degree_knp == 1:
            # production path: ONE shared-gather pass over all ions
            # (assembly.assemble_knp_all -- phi/D/alpha/membrane traces and
            # the block/rhs slot gathers are each issued once, not per ion)
            pair = self.pair_layout
            if pair:
                cache = getattr(self, "_knp_static_blocks", {})
                statics_use = cache.get(-2)        # pair-converted statics
                if statics_use is None:
                    from .ops.pairs import cell_bell_to_pair

                    statics_use = cell_bell_to_pair(self.pairs, statics)
            else:
                statics_use = statics
            ionsd = {"z": self.z[:self.N_ions], "D": self.D[:self.N_ions],
                     "c_n": c_n, "c_k": c}
            blocksK, rhsK = assembly.assemble_knp_all(
                g, self.masks, ionsd, phys, phi, alpha_sum,
                phi_M=phi_M_pad, I_ch=I_ch_pad[:self.N_ions],
                I_ch_tot=I_ch_tot_pad, splitting=self.splitting_scheme,
                static_blocks=statics_use, gp=self.g,
                mem_t=getattr(self, "mem_dev", None),
                pm=self.pairs if pair else None,
            )
            return blocksK, rhsK + srcs

        def asm_one(z, D, c_k, c_nk, I_ch_k, static_blocks, src):
            iond = {"z": z, "D": D, "c_n": c_nk, "c_k": c_k}
            blocks, rhs = assembly.assemble_knp(
                g, self.masks, iond, phys, phi, alpha_sum,
                phi_M=phi_M_pad, I_ch_k=I_ch_k, I_ch_tot=I_ch_tot_pad,
                f_source=None, splitting=self.splitting_scheme,
                static_blocks=static_blocks, gp=self.g,
            )
            return blocks, rhs + src

        # UNROLLED over ions, not vmapped: vmap adds a leading batch axis to
        # every facet/cell gather operand, which sends TPU gathers down a
        # high-rank slow path (~3x the flat 2-D gather the unrolled trace
        # emits).  XLA still overlaps the independent per-ion work.
        outs = [
            asm_one(self.z[k], self.D[k], c[k], c_n[k], I_ch_pad[k],
                    statics[k], srcs[k])
            for k in range(self.N_ions)
        ]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    def _knp_solve_all(self, blocksK, rhsK, c, sp_: SolverParams, pcK=None):
        """Batched increment-form GMRES over the ion axis (jittable): all
        solved ions share one Krylov loop whose matvec issues a single
        neighbor gather (ops/spmv.bell_matvec_multi) -- the gather is
        per-index-cost-bound on TPU, so the extra ions ride along free.
        `pcK`: frozen coarse data stacked over the ion axis.  Replaces the
        reference's sequential per-ion KSP solves (solver.py:683-701)."""
        g = self.g
        kind = sp_.precond_knp or sp_.precond
        pair = isinstance(blocksK, tuple)
        if pair:
            from .ops.pairs import (from_pair, pair_matvec_multi, pair_nbr,
                                    pair_v_sums, to_pair)

            pm = self.pairs
            pdK, peK = blocksK
            hmv = getattr(self, "_halo_pair_mv", None)
            mv = ((lambda V: hmv(self._halo_pair_data, pdK, peK, V))
                  if hmv is not None
                  else (lambda V: pair_matvec_multi(pdK, peK, pm, V)))
            agg_p = sp_.agg_size // 2
            conv = to_pair(pm, jnp.stack([rhsK, c]))
            rhs_p, c_p = conv[0], conv[1]
            lm = self._pair_mask.astype(rhs_p.dtype)[None]
            pdK_bj = (pdK * self._pair_bj_halves[None]
                      if getattr(sp_, "pair_bj", "full") == "halves"
                      else pdK)
            if kind.startswith("two_level"):
                data = pcK if pcK is not None else jax.vmap(
                    lambda pd_, pe_: build_two_level(
                        None, pair_nbr(pm), agg_p, sym=False,
                        mass_diag=self._pair_mass / self.params.dt,
                        v=pair_v_sums(pd_, pe_),
                        ridge=getattr(sp_, "coarse_ridge", 1e-5),
                    )
                )(pdK, peK)
                pcf0 = two_level_apply_batched(
                    data, pdK_bj, agg_p,
                    matvec=mv if kind == "two_level_mult" else None)
                # live-masked: the chunk prolong writes into dead self-pair
                # halves (see _make_precond's pair branch)
                pcf = lambda r: pcf0(r) * lm
            else:
                Pinv = jax.vmap(block_jacobi_inverse)(pdK_bj)
                pcf = lambda r: jnp.einsum("mijc,mjc->mic", Pinv, r) * lm
            r0 = rhs_p - mv(c_p)
            b_ref = rhs_p
        else:
            mv = lambda V: self._matvec(blocksK, V)
            if kind.startswith("two_level"):
                data = pcK if pcK is not None else jax.vmap(
                    lambda b: build_two_level(
                        b, g["nbr"], sp_.agg_size, sym=False,
                        mass_diag=g["vol"] / self.params.dt,
                        ridge=getattr(sp_, "coarse_ridge", 1e-5),
                    )
                )(blocksK)
                pcf = two_level_apply_batched(
                    data, blocksK[:, 0], sp_.agg_size,
                    matvec=mv if kind == "two_level_mult" else None)
            else:
                Pinv = jax.vmap(block_jacobi_inverse)(blocksK[:, 0])
                pcf = lambda r: jnp.einsum("mijc,mjc->mic", Pinv, r)
            r0 = rhsK - mv(c)
            b_ref = rhsK
        if getattr(sp_, "knp_solver", "gmres") == "bicgstab":
            res = bicgstab_batched(
                mv, r0, jnp.zeros_like(r0), pcf,
                rtol=sp_.rtol_knp, atol=sp_.atol_knp,
                max_it=sp_.max_it_knp, b_ref=b_ref,
            )
        else:
            res = gmres_batched(
                mv, r0, jnp.zeros_like(r0), pcf,
                rtol=sp_.rtol_knp, atol=sp_.atol_knp,
                max_it=sp_.max_it_knp, restart=sp_.gmres_restart,
                b_ref=b_ref, orth=getattr(sp_, "gmres_orth", "cgs2"),
                rot=getattr(sp_, "gmres_rot", "replay"),
            )
        dx = from_pair(self.pairs, res.x) if pair else res.x
        return c + dx, res.iters, res.converged

    # ------------------------------------------------------------------
    # Picard iteration (solver.py:850-927)
    # ------------------------------------------------------------------
    def solve_for_time_step_picard(self, state, solver_params: SolverParams,
                                   tol: float = 1e-4, max_iter: int = 25):
        """One global time step via inner Picard iterations over steps I+II,
        converged when the sup-norm change of the concentrations drops below
        `tol` (reference defaults, solver.py:862-864); diverging iterations
        raise (reference exits, :912-915)."""
        c_n = state["c"]
        s = dict(self.attach_pc(state, solver_params))
        s["t"] = state["t"] + self.params.dt      # t advanced first (:859)
        step = self._jit(
            ("picard_inner", self.splitting_scheme, solver_params),
            partial(self._pde_step, solver_params=solver_params,
                    advance_time=False),
        ) if not (solver_params.direct_emi or solver_params.direct_knp) else \
            partial(self._pde_step, solver_params=solver_params,
                    advance_time=False)
        eps = np.inf
        it = 0
        stats = None
        while eps > tol:
            if it >= max_iter:
                raise RuntimeError(
                    f"Picard solver: max iterations ({max_iter}) reached "
                    f"(eps={eps})"
                )
            it += 1
            prev_eps = eps
            prev = s["c"]
            s, stats = step(dict(s, c=s["c"]), c_n=c_n)
            eps = float(jnp.abs(prev - s["c"]).max())
            # the reference exits when eps grows between iterations
            # (solver.py:912-915) -- actual divergence, not an iteration cap
            if eps > prev_eps:
                raise RuntimeError(
                    f"Picard solver diverged (eps increased {prev_eps} -> {eps})"
                )
            self._check_convergence(stats, solver_params)
        if solver_params.verbose:
            print(f"{bcolors.OKCYAN} Summary Picard: eps = {eps}, #iters = {it} {bcolors.ENDC}")
        return s, stats, it

    # ------------------------------------------------------------------
    # ODE step (step 0 of the splitting, solver.py:1072-1118)
    # ------------------------------------------------------------------
    def _ode_step(self, state, first_step: bool):
        p = self.params
        c, c_elim, phi_M = state["c"], state["c_elim"], state["phi_M"]
        new_mem = {}
        I_ch_rows = []
        for tag, mm in state["mem"].items():
            s0, s1 = self.tables.slices[tag]
            # push PDE -> ODE: membrane potential (skip on first step with
            # constant phi_M init, solver.py:1086-1094)
            if not (first_step and p.phi_M_init_type == "constant"):
                mm = mm.replace_state("V", phi_M[s0:s1])
            # Nernst potentials for every ion (solver.py:1097-1098)
            for k, ion in enumerate(self.ion_list):
                field = c_elim if k == len(self.ion_list) - 1 else c[k]
                E = assembly.nernst_potential_m(
                    self._g_knp(), self._mem_knp(), field, float(ion.z),
                    p.F, p.R, p.temperature,
                )[s0:s1]
                if mm.has_param(f"E_{ion.name}"):
                    mm = set_param(mm, f"E_{ion.name}", E)
            # app-specific parameter pushes (subclass hook)
            upd = self.update_ode(tag, Traces(self, c, c_elim, (s0, s1)))
            for name, vals in upd.items():
                mm = set_param(mm, name, vals)
            # integrate
            mm = ode_step(mm, state["t"], p.dt, p.n_steps_ODE,
                          scheme=getattr(p, "ode_scheme", "rk4"))
            new_mem[tag] = mm
            I_ch_rows.append((s0, s1, mm))

        # pull ODE -> PDE: phi_M and channel currents (solver.py:1108-1113)
        phi_M_new = phi_M
        I_ch = jnp.zeros((len(self.ion_list), self.n_mem), dtype=self.dtype)
        for (s0, s1, mm) in I_ch_rows:
            phi_M_new = phi_M_new.at[s0:s1].set(mm.get_state("V"))
            for k, ion in enumerate(self.ion_list):
                name = f"I_ch_{ion.name}"
                if mm.has_param(name):
                    I_ch = I_ch.at[k, s0:s1].set(get_param(mm, name))

        new_state = dict(state)
        new_state.update(mem=new_mem, phi_M=phi_M_new, I_ch=I_ch)
        return new_state

    # ------------------------------------------------------------------
    # initial state
    # ------------------------------------------------------------------
    def _initial_state(self, t0: float):
        p = self.params
        # host-side numpy construction: eager device ops are costly on
        # remote-compile TPU backends; jit converts leaves on entry
        np_dtype = np.dtype(jnp.dtype(self.dtype).name)
        if p.phi_M_init_type == "constant":
            phi_M = np.full(self.n_mem, float(p.phi_M_init), dtype=np_dtype)
            # active runs: seed phi_M from each membrane model's resting V so
            # the first ODE step sees its own initial state (the reference
            # instead *skips* the V push on step 0, solver.py:1086-1094 --
            # same semantics, but this also keeps the fused/benchmark step
            # uniform across iterations)
            for tag, mm in self.mem_models.items():
                s0, s1 = self.tables.slices[tag]
                phi_M[s0:s1] = np.asarray(mm.states)[mm.model.STATES["V"]]
        elif p.phi_M_init_type == "expression":
            phi_M = np.asarray(
                [p.phi_M_init(x) for x in self.tables.midpoints]
                if callable(p.phi_M_init) else np.zeros(self.n_mem),
                dtype=np_dtype,
            )
        elif p.phi_M_init_type == "function":
            phi_M = np.asarray(p.phi_M_init, dtype=np_dtype)
        else:
            raise ValueError(f"unknown phi_M_init_type {p.phi_M_init_type!r}")
        state = {
            "c": self.c_init,
            "c_elim": self.c_elim_init,
            "phi": self.phi_init,
            "phi_prev": self.phi_init,   # linear-predictor base (EMI guess)
            "phi_M": jnp.asarray(phi_M),
            "I_ch": jnp.asarray(
                np.zeros((len(self.ion_list), self.n_mem), dtype=np_dtype)
            ),
            "t": jnp.asarray(np.asarray(t0, dtype=np_dtype)),
            "mem": dict(self.mem_models),
        }
        return state

    # ------------------------------------------------------------------
    # drivers (solver.py:930-1135)
    # ------------------------------------------------------------------
    def solve_system_passive(self, Tstop, t, solver_params: SolverParams,
                             membrane_params=None, filename=None,
                             save_fields=False, save_solver_stats=False,
                             picard=False):
        """No splitting / no ODE stepping; used by the MMS verification
        drivers (solver.py:930-1011)."""
        self.splitting_scheme = False
        self._io_setup(filename, save_fields, save_solver_stats, solver_params)
        state = self.attach_pc(self._maybe_shard(self._initial_state(float(t))),
                               solver_params)
        if self._h5 is not None:       # initial frame (solver.py:1223-1225)
            self._h5.append(state)
        n_steps = int(round(Tstop / self.params.dt))
        for k in range(n_steps):
            if picard:
                state, st, _ = self.solve_for_time_step_picard(state, solver_params)
                self.stats.record_step(st, 0.0)
            else:
                state = self._timed_pde_step(state, solver_params, k)
            self._io_step(state, k)
        self._io_close()
        self.state = state
        return state

    def solve_system_active(self, Tstop, t, solver_params: SolverParams,
                            filename=None, save_fields=False,
                            save_solver_stats=False, scan_steps: int = 0):
        """Full splitting scheme with membrane ODEs (solver.py:1014-1135).

        ``scan_steps > 0`` runs that many steps per jitted lax.scan block
        (iterative solvers only); I/O and stats are recorded per block."""
        self.splitting_scheme = True
        self._io_setup(filename, save_fields, save_solver_stats, solver_params)
        state = self.attach_pc(self._maybe_shard(self._initial_state(float(t))),
                               solver_params)
        if self._h5 is not None:       # initial frame (solver.py:1223-1225)
            self._h5.append(state)
        n_steps = int(round(Tstop / self.params.dt))

        refresh = solver_params.pc_refresh_every
        # count-triggered refresh (pc_refresh_factor): refresh when the last
        # step's total Krylov work exceeds factor x the best step since the
        # previous refresh.  Reference analog: per-step AMG re-setup
        # (solver.py:727-742) -- here gated on measured degradation because
        # a rebuild costs ~1.6 s on the EMIx mesh.
        factor = getattr(solver_params, "pc_refresh_factor", 0.0)
        adaptive = {"best": None, "last": None}

        def _track_work(step_st):
            w = float(np.asarray(step_st["emi_iters"])) + float(
                np.sum(np.asarray(step_st["knp_iters"])))
            adaptive["last"] = w
            if adaptive["best"] is None or w < adaptive["best"]:
                adaptive["best"] = w

        def _adaptive_trigger():
            return (factor > 0 and adaptive["best"] is not None
                    and adaptive["last"] > factor * adaptive["best"])

        if scan_steps > 0:
            assert not (solver_params.direct_emi or solver_params.direct_knp)
            k = 0
            while k < n_steps:
                if (refresh and k and (k % refresh) < scan_steps) or \
                        _adaptive_trigger():
                    state = self._refresh_pc(state, solver_params)
                    adaptive["best"] = None
                # final block shrinks to the remaining steps so the loop
                # never integrates past Tstop (ADVICE r1: ceil-overshoot)
                bs = min(scan_steps, n_steps - k)
                block = self._jit(("block", bs, solver_params),
                                  self.fused_block(solver_params, bs))
                ts = _time.perf_counter()
                state, st = block(state)
                jax.block_until_ready(state["c"])
                wall = _time.perf_counter() - ts
                for j in range(bs):
                    step_st = {key: val[j] for key, val in st.items()}
                    self._check_convergence(step_st, solver_params)
                    self.stats.record_step(step_st, wall / bs)
                    _track_work(step_st)
                k += bs
                self._io_step(state, k)
            self._io_close()
            self.state = state
            return state

        for k in range(n_steps):
            if (refresh and k and k % refresh == 0) or _adaptive_trigger():
                state = self._refresh_pc(state, solver_params)
                adaptive["best"] = None
            ts = _time.perf_counter()
            ode_fn = self._jit(("ode_step", k == 0),
                               partial(self._ode_step, first_step=(k == 0)))
            state = ode_fn(state)
            jax.block_until_ready(state["phi_M"])
            self.stats.ode_solve_timer += _time.perf_counter() - ts
            state = self._timed_pde_step(state, solver_params, k)
            if factor > 0 and self.stats.emi_niters:
                _track_work({"emi_iters": self.stats.emi_niters[-1],
                             "knp_iters": self.stats.knp_niters[-1]})
            self._io_step(state, k)
        self._io_close()
        self.state = state
        return state

    # Geometry/mask/static tensors referenced by the jitted step functions.
    # They are passed as ARGUMENTS through every jit (see _jit) instead of
    # being captured as closure constants: embedding ~100-250 MB of facet
    # tensors + cached static operators into each program made the remote
    # TPU compiler constant-fold them for minutes (and risks its request
    # size limit); as parameters the programs stay small and compile fast.
    _AUX_FIELDS = ("g", "masks", "D", "z", "rho", "mem_dev", "g2", "mem_dev2",
                   "_halo_data", "_halo_pair_data", "pairs", "_pair_mask",
                   "_pair_mass")

    def _aux_pytree(self):
        aux = {}
        for name in self._AUX_FIELDS:
            v = getattr(self, name, None)
            if v is None:
                continue
            if isinstance(v, dict):
                # only array leaves travel; static metadata (ints) stays
                aux[name] = {k: a for k, a in v.items()
                             if hasattr(a, "ndim")}
            else:
                aux[name] = v
        aux["statics"] = dict(getattr(self, "_knp_static_blocks", {}))
        return aux

    def _jit(self, key, fn):
        """jit `fn` with the solver's geometry/static arrays routed in as a
        pytree argument: during tracing the aux entries are temporarily
        swapped onto `self`, so `fn` (and everything it calls) transparently
        reads traced values instead of baking device constants into the
        program."""
        # the operator layout changes every traced program: key on it so a
        # toggled enable_pair_layout can never hit a stale trace
        key = (key, self.pair_layout)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def wrapped(aux, *args, **kwargs):
            saved = {}
            self._trace_lock.acquire()
            try:
                for name, v in aux.items():
                    if name == "statics":
                        saved["_knp_static_blocks"] = getattr(
                            self, "_knp_static_blocks", {})
                        self._knp_static_blocks = dict(v)
                        continue
                    cur = getattr(self, name)
                    saved[name] = cur
                    if isinstance(cur, dict):
                        setattr(self, name, {**cur, **v})
                    else:
                        setattr(self, name, v)
                return fn(*args, **kwargs)
            finally:
                for name, v in saved.items():
                    setattr(self, name, v)
                self._trace_lock.release()

        jfn = jax.jit(wrapped)

        def caller(*args, **kwargs):
            return jfn(self._aux_pytree(), *args, **kwargs)

        caller._jitted = jfn
        self._jit_cache[key] = caller
        return caller

    def _comp_arrays(self):
        """Host-side compartment indicators (one-hot rows -> the deflation
        projection is a skinny MXU matmul, gather-free).  Cached as NUMPY:
        jnp arrays created while tracing are tracers and must never be
        cached across traces."""
        if not hasattr(self, "_comp_onehot"):
            # _comp_np may be longer than n_cells and carry -1 entries:
            # inert pad cells from the interleaved pair renumbering
            # (_apply_interleave) are deflation-invisible (zero columns)
            comp = self._comp_np
            live = comp >= 0
            oh = np.zeros((int(comp.max()) + 1, comp.shape[0]))
            oh[comp[live], np.flatnonzero(live)] = 1.0
            self._comp_onehot = oh.astype(np.dtype(jnp.dtype(self.dtype).name))
            self._comp_ids = np.where(live, comp, 0).astype(np.int32)
        return self._comp_onehot, self._comp_ids

    def _matvec(self, blocks, v):
        """Block-ELL operator apply; routed through the explicit-halo
        shard_map pipeline (parallel/halo.py) when the solver has been
        sharded over a device mesh, else the single-chip gather matvec.
        Handles both single systems (nd, nc) and ion-batched (m, nd, nc)."""
        mv = getattr(self, "_halo_mv", None)
        if mv is not None:
            return mv(self._halo_data, blocks, v)
        if v.ndim == 3:
            return bell_matvec_multi(blocks, self.g["nbr"], v)
        return bell_matvec(blocks, self.g["nbr"], v)

    def _make_precond(self, blocks, P_diag, sp_: SolverParams, sym: bool,
                      pc=None):
        """BoomerAMG stand-in: two-level aggregation preconditioner
        (solvers/twolevel.py), or plain block-Jacobi.  `sym` marks the
        (singular) EMI operator, which also gets the rank-one nullspace
        regularization of the coarse matrix.

        `pc`: frozen coarse-level data from `_build_pc` -- the dense coarse
        inverse costs ~200 ms on the EMIx mesh, so production solves reuse
        data built once at the initial state (the block-Jacobi smoother is
        still rebuilt from the fresh P_diag)."""
        kind = sp_.precond if sym else (sp_.precond_knp or sp_.precond)
        pair = isinstance(blocks, tuple)
        if kind.startswith("two_level"):
            if pair:
                from .ops.pairs import (onehot_to_pair, pair_matvec,
                                        pair_nbr, pair_v_sums)

                pd_, pe_ = blocks
                hmv = getattr(self, "_halo_pair_mv", None)
                pmv = ((lambda v: hmv(self._halo_pair_data, pd_, pe_, v))
                       if hmv is not None
                       else (lambda v: pair_matvec(pd_, pe_, self.pairs, v)))
                mv = pmv if kind == "two_level_mult" else None
                agg_p = sp_.agg_size // 2          # chunks stay agg_size CELLS
                # the chunk-coarse prolong broadcasts into DEAD self-pair
                # halves; left unmasked, dead(p) pollutes <p, A p> through
                # the dead-identity rows and CG's alpha loses optimality
                # (measured: stall at the iteration cap).  The live-masked
                # apply is the pc restricted to the live subspace -- SPD
                # there, and dead Krylov components stay exactly zero.
                lm = self._pair_mask.astype(P_diag.dtype)
                if getattr(sp_, "pair_bj", "full") == "halves":
                    P_diag = P_diag * self._pair_bj_halves
                if pc is not None:
                    fn = two_level_apply_fn(pc, P_diag, agg_p, matvec=mv)
                    return lambda r: fn(r) * lm
                comp_onehot, comp_ids = (self._comp_arrays() if sym
                                         else (None, None))
                if comp_onehot is not None:
                    pmh = self.pairs_host
                    comp_onehot = jnp.asarray(
                        np.asarray(comp_onehot)[:, pmh["cop"][0]])
                    comp_ids = jnp.asarray(
                        np.asarray(comp_ids)[pmh["cop"][0]])
                data = build_two_level(
                    None, pair_nbr(self.pairs), agg_p, sym=sym,
                    comp_onehot=comp_onehot, comp_ids=comp_ids,
                    extra_diag=(P_diag - pd_) if sym else None,
                    mass_diag=None if sym else self._pair_mass
                    / self.params.dt,
                    v=pair_v_sums(pd_, pe_),
                    ridge=getattr(sp_, "coarse_ridge", 1e-5),
                )
                fn = two_level_apply_fn(data, P_diag, agg_p, matvec=mv)
                return lambda r: fn(r) * lm
            mv = (
                (lambda v: self._matvec(blocks, v))
                if kind == "two_level_mult" else None
            )
            if pc is not None:
                return two_level_apply_fn(pc, P_diag, sp_.agg_size, matvec=mv)
            comp_onehot, comp_ids = self._comp_arrays() if sym else (None, None)
            # EMI (sym): mass-regularized aggregate coarse + exact
            # compartment deflation; KNP: aggregate coarse with the exact
            # (1/dt) mass diagonal (sum_ij of the cell mass block = vol/dt)
            extra = (P_diag - blocks[0]) if sym else None
            mass_diag = None if sym else self.g["vol"] / self.params.dt
            return make_two_level(
                blocks, P_diag, self.g["nbr"], sp_.agg_size,
                sym=sym, matvec=mv,
                comp_onehot=comp_onehot, comp_ids=comp_ids,
                extra_diag=extra, mass_diag=mass_diag,
                ridge=getattr(sp_, "coarse_ridge", 1e-5),
            )
        Pinv = block_jacobi_inverse(P_diag)
        return lambda r: block_jacobi_apply(Pinv, r)

    def _build_pc(self, state, sp_: SolverParams, reuse_ritz=None):
        """Build the frozen two-level coarse data for EMI and per-ion KNP
        operators at the given state (once, outside the per-step jits).
        Returns {'emi': data, 'knp': stacked data} to be carried in the
        state pytree, or None when not applicable (direct solves, MMS,
        jacobi preconditioning)."""
        if self.mms is not None or (sp_.direct_emi and sp_.direct_knp):
            return None
        pair = self.pair_layout
        if pair:
            from .ops import pairs as _pairs
        # emi_ritz -1 = AUTO: deflation pays on the cell layout (566 ->
        # 299 window iters) and HURTS on the pair layout (181 -> 254) --
        # measured rationale in config.py
        n_ritz = sp_.emi_ritz if sp_.emi_ritz >= 0 else (0 if pair else 24)
        pc = {}
        phi_M_pad, I_ch_pad, I_ch_tot_pad = self._pads(state)
        if not sp_.direct_emi and sp_.precond.startswith("two_level"):
            asm_emi = self._jit(("asm_emi", self.splitting_scheme, pair),
                                partial(self._assemble_emi, pair=pair))
            blocks, rhs, Pd = asm_emi(state["c"], state["c_elim"], phi_M_pad,
                                      I_ch_tot_pad, state["t"])
            comp_onehot, comp_ids = self._comp_arrays()
            if pair:
                # two-level coarse data over the PAIR axis (chunks of
                # agg_size//2 pairs = agg_size cells; pairs never cross
                # compartments by construction)
                pmh = self.pairs_host
                oh_p = jnp.asarray(np.asarray(comp_onehot)[:, pmh["cop"][0]])
                ids_p = jnp.asarray(np.asarray(comp_ids)[pmh["cop"][0]])
                build = self._jit(
                    ("pc_emi_pair", sp_.agg_size, sp_.coarse_ridge),
                    lambda bp, P: build_two_level(
                        None, _pairs.pair_nbr(self.pairs),
                        sp_.agg_size // 2, sym=True,
                        comp_onehot=oh_p, comp_ids=ids_p,
                        extra_diag=P - bp[0],
                        v=_pairs.pair_v_sums(*bp),
                        ridge=sp_.coarse_ridge,
                    ),
                )
                pc["emi"] = build(blocks, Pd)
            else:
                build = self._jit(
                    ("pc_emi", sp_.agg_size, sp_.coarse_ridge),
                    lambda b, P: build_two_level(
                        b, self.g["nbr"], sp_.agg_size, sym=True,
                        comp_onehot=jnp.asarray(comp_onehot),
                        comp_ids=jnp.asarray(comp_ids),
                        extra_diag=P - b[0],
                        ridge=sp_.coarse_ridge,
                    ),
                )
                pc["emi"] = build(blocks, Pd)
            if sp_.emi_moment_order > 0:
                mom = (self._emi_moment_data_host(state, blocks, sp_)
                       if (getattr(sp_, "emi_moment_host", False)
                           or getattr(sp_, "emi_moment_blocked", False))
                       else self._emi_moment_data_any(blocks, sp_))
                pc["emi"] = dict(pc["emi"], **mom)
            if reuse_ritz:
                pc["emi"] = dict(pc["emi"], **reuse_ritz)
            elif n_ritz > 0 and getattr(sp_, "emi_ritz_host", False):
                # fully-host f64 harvest (deterministic; see config) -- runs
                # on CELL blocks in both layouts, with a cell two-level +
                # moment pc mirrored in numpy (twolevel.np_two_level_apply)
                if pair:
                    asm_c = self._jit(("asm_emi", self.splitting_scheme,
                                       False), self._assemble_emi)
                    blocks_c, rhs_c, Pd_c = asm_c(
                        state["c"], state["c_elim"], phi_M_pad,
                        I_ch_tot_pad, state["t"])
                    build_c = self._jit(
                        ("pc_emi_cell_harvest", sp_.agg_size,
                         sp_.coarse_ridge),
                        lambda b, P: build_two_level(
                            b, self.g["nbr"], sp_.agg_size, sym=True,
                            comp_onehot=jnp.asarray(comp_onehot),
                            comp_ids=jnp.asarray(comp_ids),
                            extra_diag=P - b[0],
                            ridge=sp_.coarse_ridge,
                        ),
                    )
                    data_c = build_c(blocks_c, Pd_c)
                    if sp_.emi_moment_order > 0:
                        data_c = dict(data_c, **self._emi_moment_data(
                            blocks_c, sp_))
                else:
                    blocks_c, rhs_c, Pd_c = blocks, rhs, Pd
                    data_c = pc["emi"]
                W_h = ritz_lanczos_W_host(
                    blocks_c, self.g["nbr"], data_c, Pd_c, rhs_c,
                    sp_.agg_size,
                    # k=40 is the measured-good depth up to the AUTO budget
                    # (n_ritz 24); larger budgets (the 995k scale stack)
                    # need k >= 2n for converged small Ritz pairs
                    k=(40 if n_ritz <= 24 else 2 * n_ritz),
                    n_ritz=n_ritz)
                ritz = ritz_galerkin_host(blocks_c, self.g["nbr"], W_h,
                                          project_mean=True)
                if pair:
                    ritz["ritz_W"] = self._ritz_W_to_pair(ritz["ritz_W"])
                if all(bool(np.isfinite(np.asarray(v)).all())
                       for v in ritz.values()):
                    pc["emi"] = dict(pc["emi"], **ritz)
                else:                                  # pragma: no cover
                    print(f"{bcolors.WARNING} emi_ritz host harvest "
                          f"non-finite; disabled {bcolors.ENDC}")
            elif n_ritz > 0:
                # device Lanczos -> host f64 Galerkin: jnp "f64" silently
                # truncates to f32 on TPU without x64 (round-4 finding --
                # the round-3 on-device Galerkin never actually ran in f64
                # on hardware, which is why emi_ritz looked marginal)
                if pair:
                    agg_p = sp_.agg_size // 2

                    def _pmv(bp, v):
                        hmv = getattr(self, "_halo_pair_mv", None)
                        if hmv is not None:      # sharded pair path
                            return hmv(self._halo_pair_data, bp[0], bp[1], v)
                        return _pairs.pair_matvec(bp[0], bp[1], self.pairs, v)

                    # harvest with the PRODUCTION preconditioner: the solve
                    # path (_make_precond) applies the pair_bj='halves' BJ
                    # scope and the live mask; harvesting with the full-pair
                    # BJ targets the small modes of a DIFFERENT
                    # preconditioned operator and the resulting deflation
                    # space misses the production solver's slow modes
                    # (round-4's "ritz hurts on pair" measurement carried
                    # this mismatch)
                    bj_h = (self._pair_bj_halves
                            if getattr(sp_, "pair_bj", "full") == "halves"
                            else None)
                    lm_h = self._pair_mask.astype(Pd.dtype)

                    def _harvest(bp, Pd_, data, r):
                        Pd_b = Pd_ * bj_h if bj_h is not None else Pd_
                        fn = two_level_apply_fn(data, Pd_b, agg_p)
                        return ritz_lanczos_W(
                            None, None, lambda v: fn(v) * lm_h,
                            _pairs.to_pair(self.pairs, r),
                            k=(40 if n_ritz <= 24 else 2 * n_ritz),
                            n_ritz=n_ritz,
                            matvec=lambda v: _pmv(bp, v),
                            mask=self._pair_mask)

                    harvest = self._jit(
                        ("pc_ritz_W_pair", sp_.agg_size, n_ritz,
                         getattr(sp_, "pair_bj", "full")), _harvest)
                    W_pair = harvest(blocks, Pd, pc["emi"], rhs)
                    # f64 Galerkin runs on CELL blocks (exact: the live
                    # entries carry the same values; dead halves are
                    # masked to zero in the harvest)
                    asm_c = self._jit(("asm_emi", self.splitting_scheme,
                                       False), self._assemble_emi)
                    blocks_c, _, _ = asm_c(state["c"], state["c_elim"],
                                           phi_M_pad, I_ch_tot_pad,
                                           state["t"])
                    W_cell = self._pair_W_to_cell(W_pair)
                    ritz = ritz_galerkin_host(blocks_c, self.g["nbr"],
                                              W_cell, project_mean=True)
                    ritz["ritz_W"] = self._ritz_W_to_pair(ritz["ritz_W"])
                else:
                    harvest = self._jit(
                        ("pc_ritz_W", sp_.agg_size, n_ritz),
                        lambda b, Pd_, data, r: ritz_lanczos_W(
                            b, self.g["nbr"],
                            two_level_apply_fn(data, Pd_, sp_.agg_size),
                            r, k=(40 if n_ritz <= 24 else 2 * n_ritz),
                            n_ritz=n_ritz),
                    )
                    ritz_W = harvest(blocks, Pd, pc["emi"], rhs)
                    # project_mean: strip the EMI nullspace (global
                    # constant) from the harvested fields in f64 -- see the
                    # function's docstring for the CPU-f32 catastrophe this
                    # prevents
                    ritz = ritz_galerkin_host(blocks, self.g["nbr"], ritz_W,
                                              project_mean=True)
                # the harvest is numerically fragile (near-parallel Ritz
                # vectors make the Galerkin ill-conditioned); a NaN here
                # would silently zero every later solve's tolerance test,
                # so drop the enrichment unless it is finite
                if all(bool(np.isfinite(np.asarray(v)).all())
                       for v in ritz.values()):
                    pc["emi"] = dict(pc["emi"], **ritz)
                else:                                  # pragma: no cover
                    print(f"{bcolors.WARNING} emi_ritz harvest non-finite; "
                          f"disabled for this pc build {bcolors.ENDC}")
        kind_knp = sp_.precond_knp or sp_.precond
        if (not sp_.direct_knp and kind_knp.startswith("two_level")
                and not getattr(self, "_emi_only", False)):
            asm_knp = self._jit(
                ("asm_knp_all", self.splitting_scheme),
                lambda st: self._knp_assemble_all(
                    st["c"], st["c_elim"], st["phi"], *self._pads(st),
                    st["t"], st["c"],
                ),
            )
            blocksK, rhsK = asm_knp(state)
            if pair:
                build_k = self._jit(
                    ("pc_knp_pair", sp_.agg_size, sp_.coarse_ridge),
                    lambda bp: jax.vmap(lambda pd_, pe_: build_two_level(
                        None, _pairs.pair_nbr(self.pairs),
                        sp_.agg_size // 2, sym=False,
                        mass_diag=self._pair_mass / self.params.dt,
                        v=_pairs.pair_v_sums(pd_, pe_),
                        ridge=sp_.coarse_ridge,
                    ))(bp[0], bp[1]),
                )
            else:
                build_k = self._jit(
                    ("pc_knp", sp_.agg_size, sp_.coarse_ridge),
                    jax.vmap(lambda b: build_two_level(
                        b, self.g["nbr"], sp_.agg_size, sym=False,
                        mass_diag=self.g["vol"] / self.params.dt,
                        ridge=sp_.coarse_ridge,
                    )),
                )
            pc["knp"] = build_k(blocksK)
            if getattr(sp_, "knp_ritz", 0) > 0 and pair:
                raise NotImplementedError(
                    "knp_ritz (an experimental, measured-and-buried option)"
                    " is not wired for the pair layout")
            if getattr(sp_, "knp_ritz", 0) > 0:
                # per-ion harvest with the same device-Lanczos + f64 host
                # Galerkin recipe as emi_ritz.  The KNP operator is mildly
                # nonsymmetric (upwind drift); the fully-reorthogonalized
                # Lanczos basis is still the preconditioned Krylov subspace
                # of the initial residual, and the deflation Galerkin is
                # computed exactly (symmetric part) on the host.  Seed =
                # the t=0 increment-form residual rhs - A c (the actual
                # first solve's r0, mirroring the EMI harvest seed).
                harvest_k = self._jit(
                    ("pc_knp_ritz_W", sp_.agg_size, sp_.knp_ritz),
                    lambda b, data, r, c_m: ritz_lanczos_W(
                        b, self.g["nbr"],
                        two_level_apply_fn(data, b[0], sp_.agg_size),
                        r - bell_matvec(b, self.g["nbr"], c_m),
                        n_ritz=sp_.knp_ritz, project_mean=False),
                )
                parts = []
                for m in range(self.N_ions):
                    data_m = jax.tree.map(lambda x: x[m], pc["knp"])
                    W_m = harvest_k(blocksK[m], data_m, rhsK[m],
                                    state["c"][m])
                    parts.append(ritz_galerkin_host(
                        blocksK[m], self.g["nbr"], W_m))
                ritz_k = {k: jnp.stack([p[k] for p in parts])
                          for k in parts[0]}
                if all(bool(np.isfinite(np.asarray(v)).all())
                       for v in ritz_k.values()):
                    pc["knp"] = dict(pc["knp"], **ritz_k)
                else:                                  # pragma: no cover
                    print(f"{bcolors.WARNING} knp_ritz harvest non-finite; "
                          f"disabled for this pc build {bcolors.ENDC}")
        return pc or None

    def _emi_moment_W(self, sp_: SolverParams, host: bool = False,
                      return_comp: bool = False):
        """Per-compartment moment deflation fields W (nw, nd, nc)
        (solvers/twolevel.moment_vectors): coordinates follow the shard
        renumbering/padding when the solver is sharded.

        ``host=True`` keeps W in numpy f64 (the host-f64 Galerkin path;
        avoids a duplicate device copy -- see moment_vectors).  When
        ``emi_moment_order_ics`` > emi_moment_order, ICS compartments (any
        compartment whose cells carry a nonzero subdomain tag) get the
        higher order -- they are where the membrane harmonics live, and
        the single big ECS compartment would otherwise dominate the W row
        count for modes the order-2 budget already covers."""
        # nodes (nd, d, nc) already follow any shard permutation and
        # padding of the cell axis; sharded solvers keep a host snapshot
        # (the device array is non-addressable under a multi-process mesh)
        nodes = getattr(self, "_nodes_np", None)
        if nodes is None:
            nodes = np.asarray(self.g["nodes"], dtype=np.float64)
        coords = np.moveaxis(np.asarray(nodes, dtype=np.float64),
                             -1, 0)                        # (nc_pad, nd, d)
        comp = self._comp_np
        extra = coords.shape[0] - comp.shape[0]
        if extra:
            comp = np.concatenate([comp, np.full(extra, -1, dtype=comp.dtype)])
        order_per_comp = None
        o_ics = int(getattr(sp_, "emi_moment_order_ics", 0) or 0)
        if o_ics > sp_.emi_moment_order:
            # cell_tags are in ORIGINAL mesh order while comp follows any
            # pair/shard permutation -- map tags onto the padded slots
            tags = np.asarray(self.mesh.cell_tags)
            idx = getattr(self, "_cell_unpad_idx", None)
            if idx is None:
                inv = getattr(self, "_cell_perm_inv", None)
                idx = None if inv is None else inv[: tags.shape[0]]
            comp_of_orig = (comp[np.asarray(idx)] if idx is not None
                            else comp[: tags.shape[0]])
            n_comp = int(comp.max()) + 1
            order_per_comp = np.full(n_comp, sp_.emi_moment_order, np.int64)
            for p in range(n_comp):
                sel = comp_of_orig == p
                if sel.any() and (tags[sel] != 0).any():
                    order_per_comp[p] = o_ics
        out = moment_vectors(
            coords, comp, sp_.emi_moment_order, dtype=self.dtype,
            order_per_comp=order_per_comp, host=host,
            axial_order=int(getattr(sp_, "emi_moment_axial", 0) or 0),
            return_comp=return_comp)
        if return_comp:
            W, row_comp = out
            return W, row_comp, comp
        return out

    def _emi_moment_data(self, blocks, sp_: SolverParams):
        W = self._emi_moment_W(sp_)
        build = self._jit(
            ("pc_emi_mom", sp_.emi_moment_order, sp_.emi_moment_order_ics,
             getattr(sp_, "emi_moment_axial", 0)),
            lambda b, Wm: build_moment_deflation(
                None, Wm,
                fan=lambda X: bell_matvec_fan(b, self.g["nbr"], X)),
        )
        return build(blocks, W)

    def _emi_moment_data_host(self, state, blocks, sp_: SolverParams):
        """Moment-deflation Galerkin in HOST float64 (emi_moment_host):
        reuses twolevel.ritz_galerkin_host on the moment fields.  The
        device f32 Galerkin is noise-dominated above order 2 (round-3
        burial: orders 3/4 DOUBLED counts); the exact f64 Galerkin lifts
        that ceiling -- the lever for the ~1M-tet EMI iteration blowup
        (ROADMAP item 12), where the membrane harmonics exceed the order-2
        budget.  On the pair layout the Galerkin runs on freshly assembled
        CELL blocks (exact: live pair entries carry the same values) and
        the fields convert with to_pair.  W stays HOST-side numpy through
        the Galerkin -- the device only ever holds the single returned
        mom_W copy (the 995k order-3 OOM fix, ROADMAP r5 item 2).

        ``emi_moment_blocked`` (cell layout only): re-store the fields
        compartment-BLOCKED (twolevel.block_moment_rows) so the apply
        gathers each row over its own compartment's cells instead of
        streaming nc-wide mostly-zero rows -- the HBM fix that lets the
        995k axial-12 stack coexist with emi_ritz=64 (ROADMAP r5 item
        2b).  Exact same math: rows are permuted (dense-first) and the
        Galerkin inv/s permute with them."""
        pair = isinstance(blocks, tuple)
        blocked = bool(getattr(sp_, "emi_moment_blocked", False)) and not pair
        if blocked:
            W, row_comp, comp = self._emi_moment_W(sp_, host=True,
                                                   return_comp=True)
        else:
            W = self._emi_moment_W(sp_, host=True)
        if pair:
            phi_M_pad, _, I_ch_tot_pad = self._pads(state)
            asm_c = self._jit(("asm_emi", self.splitting_scheme, False),
                              self._assemble_emi)
            blocks_c, _, _ = asm_c(state["c"], state["c_elim"], phi_M_pad,
                                   I_ch_tot_pad, state["t"])
        else:
            blocks_c = blocks
        out = ritz_galerkin_host(blocks_c, self.g["nbr"], W, ridge=1e-6,
                                 out_dtype=self.dtype, device_W=not blocked)
        if blocked:
            perm, W_dense, blk = block_moment_rows(out["ritz_W"], row_comp,
                                                   comp)
            inv = np.asarray(out["ritz_inv"])[perm][:, perm]
            s = np.asarray(out["ritz_s"])[perm]
            mom = {"mom_inv": jnp.asarray(inv), "mom_s": jnp.asarray(s)}
            if blk is None or W_dense.shape[0]:
                mom["mom_W"] = jnp.asarray(W_dense)
            if blk is not None:
                mom["momb_W"] = jnp.asarray(blk["W"])
                mom["momb_idx"] = jnp.asarray(blk["idx"])
                mom["momb_rowid"] = jnp.asarray(blk["rowid"])
            return mom
        mom = {"mom_W": out["ritz_W"], "mom_inv": out["ritz_inv"],
               "mom_s": out["ritz_s"]}
        if pair:
            from .ops import pairs as _pairs

            mom["mom_W"] = _pairs.to_pair(self.pairs, mom["mom_W"])
        return mom

    def _emi_moment_data_any(self, blocks, sp_: SolverParams):
        """Layout dispatch: Galerkin the moment fields with whichever
        operator format the solve will apply them in (the dot products are
        identical -- live pair entries carry the same values)."""
        if not isinstance(blocks, tuple):
            return self._emi_moment_data(blocks, sp_)
        from .ops import pairs as _pairs

        W = self._emi_moment_W(sp_)
        build = self._jit(
            ("pc_emi_mom_pair", sp_.emi_moment_order,
             sp_.emi_moment_order_ics, getattr(sp_, "emi_moment_axial", 0)),
            lambda bp, Wm: build_moment_deflation(
                None, _pairs.to_pair(self.pairs, Wm),
                fan=lambda X: _pairs.pair_matvec_fan(bp[0], bp[1],
                                                     self.pairs, X)),
        )
        return build(blocks, W)

    def _refresh_pc(self, state, sp_: SolverParams):
        """Rebuild the frozen preconditioner data at the current state (the
        coarse/deflation Galerkin matrices drift with the concentrations).

        The EMI Ritz harvest is NOT re-run: re-harvesting at a mid-window
        state is measured actively harmful (tools/exp_ritz_ab.py, r4: +82%
        window iterations at step 3, divergence at n_ritz=32 -- the
        increment-form rhs at a converged state is a degenerate Lanczos
        seed), while the t=0 harvest keeps winning across the window even
        as the blocks drift.  The existing ritz fields ride through."""
        old = state.get("pc") or {}
        keep = {k: v for k, v in (old.get("emi") or {}).items()
                if k.startswith("ritz_")}
        state = {k: v for k, v in state.items() if k != "pc"}
        return self.attach_pc(state, sp_, reuse_ritz=keep or None)

    def attach_pc(self, state, sp_: SolverParams, reuse_ritz=None):
        """Attach frozen preconditioner data to a state pytree (no-op if
        already present or not applicable).  Also populates the KNP
        static-operator cache EAGERLY: _knp_static can only cache concrete
        arrays, and every per-step entry point traces under _jit, so
        without this host-side call the static assembly (mass + stiffness
        + SIP per ion) would re-run inside every compiled step."""
        if self.mms is None and not getattr(self, "_emi_only", False):
            for k in range(self.N_ions):
                self._knp_static(k)
            cache = self._knp_static_blocks
            if -1 not in cache and all(
                    k in cache for k in range(self.N_ions)):
                # key -1: the ion-STACKED static operator (int key keeps the
                # pytree dict sortable)
                cache[-1] = jnp.stack(
                    [cache[k] for k in range(self.N_ions)])
            if self.pair_layout and -2 not in cache and -1 in cache:
                # key -2: the pair-converted static operator (the per-step
                # pair assembly adds it directly; one-time conversion)
                from .ops.pairs import cell_bell_to_pair

                cache[-2] = cell_bell_to_pair(self.pairs, cache[-1])
        if "pc" in state:
            return state
        pc = self._build_pc(state, sp_, reuse_ritz=reuse_ritz)
        if pc is None:
            return state
        return dict(state, pc=pc)

    def _step_fn(self, solver_params: SolverParams):
        """Fully-jitted PDE step for the iterative path; eager orchestration
        (with jitted assemblies) when host direct solves are requested."""
        if not solver_params.direct_emi and not solver_params.direct_knp:
            key = ("pde_step", self.splitting_scheme, solver_params)
            return self._jit(key, partial(self._pde_step, solver_params=solver_params))
        return partial(self._pde_step, solver_params=solver_params)

    def _check_convergence(self, st, sp_: SolverParams):
        """Fail loudly when a Krylov solve hit max_it without converging
        (reference: ksp_error_if_not_converged, solver.py:428).  Host-side:
        jitted steps *record* the flags; the drivers raise."""
        if not sp_.error_if_not_converged or st is None:
            return
        if "emi_converged" in st and not bool(np.all(np.asarray(st["emi_converged"]))):
            raise RuntimeError(
                f"EMI Krylov solve did not converge within "
                f"max_it_emi={sp_.max_it_emi} (rtol_emi={sp_.rtol_emi})"
            )
        if "knp_converged" in st and not bool(np.all(np.asarray(st["knp_converged"]))):
            raise RuntimeError(
                f"KNP Krylov solve did not converge within "
                f"max_it_knp={sp_.max_it_knp} (rtol_knp={sp_.rtol_knp})"
            )

    def _timed_pde_step(self, state, solver_params, k):
        if (self.save_solver_stats and self.mms is None
                and not solver_params.direct_emi
                and not solver_params.direct_knp):
            return self._timed_pde_step_phased(state, solver_params, k)
        ts = _time.perf_counter()
        state, st = self._step_fn(solver_params)(state)
        jax.block_until_ready(state["c"])
        dt_wall = _time.perf_counter() - ts
        self._check_convergence(st, solver_params)
        self.stats.record_step(st, dt_wall)
        if solver_params.verbose:
            print(f"{bcolors.WARNING} t = {float(state['t']):.6g}  k = {k} {bcolors.ENDC}")
            print(
                f"{bcolors.OKGREEN} emi iters: {int(st['emi_iters'])}, "
                f"knp iters: {np.asarray(st['knp_iters']).tolist()}, "
                f"step wall: {dt_wall:.4f}s {bcolors.ENDC}"
            )
        return state

    # ------------------------------------------------------------------
    # phase-split stepping (honest per-phase stats, reference protocol
    # solver.py:1146-1198) ---------------------------------------------
    # ------------------------------------------------------------------
    @staticmethod
    def _pads(state):
        phi_M = state["phi_M"]
        phi_M_pad = jnp.concatenate([phi_M, jnp.zeros(1, dtype=phi_M.dtype)])
        I_ch = state["I_ch"]
        I_ch_pad = jnp.concatenate(
            [I_ch, jnp.zeros((I_ch.shape[0], 1), dtype=I_ch.dtype)], axis=1
        )
        return phi_M_pad, I_ch_pad, I_ch_pad.sum(axis=0)

    def _phase_fns(self, sp_: SolverParams):
        """Separately-jitted (assemble | solve) x (EMI | KNP) + finalize so
        each phase can be timed with a device sync in between.  Used when
        `save_solver_stats` is on (instrumentation runs); the production
        fast path stays one fused program."""
        key = ("phased", self.splitting_scheme, sp_, self.pair_layout)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def asm_emi(state):
            phi_M_pad, _, I_ch_tot_pad = self._pads(state)
            return self._assemble_emi(state["c"], state["c_elim"],
                                      phi_M_pad, I_ch_tot_pad, state["t"],
                                      pair=self.pair_layout)

        def solve_emi(blocks, Pd, rhs, state):
            pc = state.get("pc")
            return self._emi_solve_iterative(
                blocks, Pd, rhs, state["phi"], sp_,
                pc=pc.get("emi") if pc else None,
            )

        def asm_knp(state, phi):
            phi_M_pad, I_ch_pad, I_ch_tot_pad = self._pads(state)
            return self._knp_assemble_all(
                state["c"], state["c_elim"], phi, phi_M_pad, I_ch_pad,
                I_ch_tot_pad, state["t"], state["c"],
            )

        def solve_knp(blocksK, rhsK, state):
            pc = state.get("pc")
            return self._knp_solve_all(blocksK, rhsK, state["c"], sp_,
                                       pcK=pc.get("knp") if pc else None)

        def finalize(state, c, phi):
            return self._finalize_step(state, {}, c, phi, True, state["t"])[0]

        fns = tuple(self._jit(key + (i,), f) for i, f in
                    enumerate((asm_emi, solve_emi, asm_knp, solve_knp,
                               finalize)))
        self._jit_cache[key] = fns
        return fns

    def _timed_pde_step_phased(self, state, sp_: SolverParams, k):
        asm_emi, solve_emi, asm_knp, solve_knp, finalize = self._phase_fns(sp_)
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
        blocksK, rhsK = asm_knp(state, phi)
        phase("knp_assem", rhsK)
        c, knp_iters, knp_conv = solve_knp(blocksK, rhsK, state)
        phase("knp_solve", c)
        new_state = finalize(state, c, phi)
        jax.block_until_ready(new_state["c_elim"])
        wall = _time.perf_counter() - t0
        st = {"emi_iters": emi_iters, "knp_iters": knp_iters,
              "emi_converged": emi_conv, "knp_converged": knp_conv,
              "phases": ph}
        self._check_convergence(st, sp_)
        self.stats.record_step(st, wall)
        if sp_.verbose:
            print(f"{bcolors.WARNING} t = {float(new_state['t']):.6g}  k = {k} {bcolors.ENDC}")
            print(
                f"{bcolors.OKGREEN} emi iters: {int(emi_iters)}, "
                f"knp iters: {np.asarray(knp_iters).tolist()}, "
                f"phases: { {p: round(v, 4) for p, v in ph.items()} } {bcolors.ENDC}"
            )
        return new_state

    # ------------------------------------------------------------------
    # fused full step (ODE + EMI + KNP in one jittable function) --------
    # ------------------------------------------------------------------
    def fused_step(self, solver_params: SolverParams, first_step: bool = False):
        """Jitted state -> (state, stats) function combining the whole
        splitting step; the benchmark / multi-chip entry point.  Iterative
        solvers only (host direct solves cannot be fused).

        Already jitted via _jit (geometry passed as arguments) -- do NOT
        wrap the result in another jax.jit, which would re-capture the
        geometry as program constants."""
        assert not solver_params.direct_emi and not solver_params.direct_knp

        def step(state):
            if self.mem_models:
                state = self._ode_step(state, first_step=first_step)
            return self._pde_step(state, solver_params)

        return self._jit(("fused", first_step, solver_params), step)

    def fused_block(self, solver_params: SolverParams, n_steps: int):
        """lax.scan of `n_steps` fused splitting steps in one jittable
        function (state -> (state, stacked_stats)); amortizes host dispatch
        between I/O points -- use sf-aligned blocks with save cadence."""
        step = self.fused_step(solver_params)

        def block(state):
            def body(carry, _):
                return step(carry)

            return jax.lax.scan(body, state, None, length=n_steps)

        return block

    # ------------------------------------------------------------------
    # I/O (HDF5 layout parity with solver.py:1214-1237)
    # ------------------------------------------------------------------
    def _io_setup(self, filename, save_fields, save_solver_stats, solver_params):
        self.filename = filename
        self.save_fields = save_fields
        self.save_solver_stats = save_solver_stats
        if (save_fields or save_solver_stats) and filename is None:
            raise ValueError("specify filename when saving fields/solver stats")
        self._h5 = None
        if save_fields:
            from .io.checkpoint import H5Writer

            self._h5 = H5Writer(filename + "results.h5", self.mesh)
        if save_solver_stats:
            self.stats.open_files(filename + "solver/", self.mesh,
                                  self.N_ions * self.n_cells * self.nd_knp,
                                  self.n_cells * self.nd, solver_params)

    def _maybe_shard(self, state):
        """Pad + place a fresh state when the solver has been sharded
        (parallel/sharding.shard_solver) so the production drivers
        (solve_system_active/passive) run sharded unchanged."""
        fn = getattr(self, "_shard_state", None)
        return fn(state) if fn is not None else state

    def _io_step(self, state, k):
        if self._h5 is not None and (k % self.sf) == 0:
            if getattr(self, "_shard_state", None) is not None:
                from .parallel.sharding import unpad_state

                self._h5.append(dict(state, **unpad_state(self, state)))
            else:
                self._h5.append(state)

    def _io_close(self):
        if self._h5 is not None:
            self._h5.close()
        self.stats.close_files()


class StandardSolver(Solver):
    """The `update_ode` used by every shipped application (run_2D.py:38-49,
    run_3D.py, run_EMIx_simulation.py:39-50): push the ECS trace of K and
    the ICS trace of Na into the membrane ODEs.  `na_index` handles ion
    orderings where Na is not the eliminated ion (run_tortuosity.py:44-49)."""

    def __init__(self, *args, k_index=0, na_index=None, **kw):
        super().__init__(*args, **kw)
        self._k_index = k_index
        self._na_index = na_index  # None -> eliminated ion

    def update_ode(self, tag, traces: Traces):
        na = self._na_index if self._na_index is not None else len(self.ion_list) - 1
        return {
            "K_e": traces.plus(self._k_index),
            "Na_i": traces.minus(na),
        }
