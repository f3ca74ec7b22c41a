"""HDF5 field output + full checkpoint/resume.

Field output keeps the reference's group layout (solver.py:1214-1237):
``/mesh``, ``/subdomains``, ``/surfaces`` written once, then
``/concentrations/vector_i``, ``/elim_concentration/vector_i``,
``/potential/vector_i`` appended per saved step, so the post-processing
suite reads both outputs the same way.  (DOF layout here is the dense
``(n_cells, nd)`` cell-nodal DG1 layout, recorded in attrs.)

Checkpoint/resume (an improvement over the reference, which only
checkpoints outputs -- SURVEY.md section 5): `save_checkpoint` /
`load_checkpoint` round-trip the *entire* solver state (concentrations,
potential, phi_M, per-tag ODE states/params, time), enabling exact restart.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

try:
    import h5py
except ImportError:                                   # pragma: no cover
    h5py = None

from ..mesh.core import Mesh


class H5Writer:
    def __init__(self, filename: str, mesh: Mesh):
        if h5py is None:
            raise RuntimeError("h5py is unavailable")
        import os

        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        self.f = h5py.File(filename, "w")
        m = self.f.create_group("mesh")
        m.create_dataset("coordinates", data=mesh.vertices)
        m.create_dataset("topology", data=mesh.cells)
        self.f.create_group("subdomains").create_dataset("values", data=mesh.cell_tags)
        s = self.f.create_group("surfaces")
        s.create_dataset("interior_facet_vertices", data=mesh.if_verts)
        s.create_dataset("interior_values", data=mesh.if_tags)
        s.create_dataset("exterior_facet_vertices", data=mesh.ef_verts)
        s.create_dataset("exterior_values", data=mesh.ef_tags)
        for name in ("concentrations", "elim_concentration", "potential"):
            self.f.create_group(name)
        self.f.attrs["dof_layout"] = "DG1 cell-nodal (n_cells, dim+1)"
        self.idx = 0
        self.times = []

    def append(self, state: Dict[str, Any]):
        i = self.idx
        # device fields are cells-last (nd, nc); stored as (nc, nd) to match
        # the documented dof layout
        self.f["concentrations"].create_dataset(
            f"vector_{i}", data=np.asarray(state["c"]).transpose(0, 2, 1)
        )
        self.f["elim_concentration"].create_dataset(
            f"vector_{i}", data=np.asarray(state["c_elim"]).T
        )
        self.f["potential"].create_dataset(f"vector_{i}", data=np.asarray(state["phi"]).T)
        self.times.append(float(state["t"]))
        self.idx += 1

    def close(self):
        self.f.create_dataset("time", data=np.asarray(self.times))
        self.f.close()


class H5Reader:
    """Read back results.h5 for the figure/post-processing suite
    (reference make_figures_2D.py:30-38)."""

    def __init__(self, filename: str):
        self.f = h5py.File(filename, "r")

    @property
    def n_frames(self):
        return len(self.f["potential"])

    @property
    def times(self):
        return np.asarray(self.f["time"])

    def mesh_arrays(self):
        return (
            np.asarray(self.f["mesh/coordinates"]),
            np.asarray(self.f["mesh/topology"]),
            np.asarray(self.f["subdomains/values"]),
        )

    def frame(self, i):
        return {
            "c": np.asarray(self.f[f"concentrations/vector_{i}"]),
            "c_elim": np.asarray(self.f[f"elim_concentration/vector_{i}"]),
            "phi": np.asarray(self.f[f"potential/vector_{i}"]),
        }

    def close(self):
        self.f.close()


def _write_tree(grp, tree: Dict[str, Any]):
    for k, v in tree.items():
        if isinstance(v, dict):
            _write_tree(grp.create_group(str(k)), v)
        else:
            grp.create_dataset(str(k), data=np.asarray(v))


def _read_tree(grp, dtype):
    import jax.numpy as jnp

    out = {}
    for k, v in grp.items():
        if isinstance(v, h5py.Group):
            out[k] = _read_tree(v, dtype)
        else:
            a = v[()]
            # floating leaves follow the solver dtype; index/flag leaves
            # keep their stored type
            out[k] = jnp.asarray(a, dtype=dtype
                                 if np.issubdtype(a.dtype, np.floating)
                                 else None)
    return out


def save_checkpoint(filename: str, state: Dict[str, Any]):
    """Full solver-state checkpoint (exact restart).

    Includes the frozen preconditioner data (``state["pc"]``) when present:
    the two-level coarse/deflation data is built from the *attach-time*
    operator (incl. a state-dependent Ritz harvest, solvers/twolevel.py),
    so rebuilding it from the restored mid-run state would give a slightly
    different preconditioner and solver-tolerance-level trajectory spread;
    restoring it makes resume exact."""
    with h5py.File(filename, "w") as f:
        f.create_dataset("c", data=np.asarray(state["c"]))
        f.create_dataset("c_elim", data=np.asarray(state["c_elim"]))
        f.create_dataset("phi", data=np.asarray(state["phi"]))
        if "phi_prev" in state:       # EMI predictor base (exact resume)
            f.create_dataset("phi_prev", data=np.asarray(state["phi_prev"]))
        f.create_dataset("phi_M", data=np.asarray(state["phi_M"]))
        f.create_dataset("I_ch", data=np.asarray(state["I_ch"]))
        f.create_dataset("t", data=np.asarray(state["t"]))
        for tag, mm in state.get("mem", {}).items():
            grp = f.create_group(f"mem_{tag}")
            grp.create_dataset("states", data=np.asarray(mm.states))
            grp.create_dataset("params", data=np.asarray(mm.params))
        if isinstance(state.get("pc"), dict):
            _write_tree(f.create_group("pc"), state["pc"])


def load_checkpoint(filename: str, solver) -> Dict[str, Any]:
    """Restore a state dict onto an already set-up solver."""
    import dataclasses
    import jax.numpy as jnp

    with h5py.File(filename, "r") as f:
        state = {
            "c": jnp.asarray(f["c"][()], dtype=solver.dtype),
            "c_elim": jnp.asarray(f["c_elim"][()], dtype=solver.dtype),
            "phi": jnp.asarray(f["phi"][()], dtype=solver.dtype),
            "phi_M": jnp.asarray(f["phi_M"][()], dtype=solver.dtype),
            "I_ch": jnp.asarray(f["I_ch"][()], dtype=solver.dtype),
            "t": jnp.asarray(f["t"][()], dtype=solver.dtype),
            "mem": {},
        }
        if "phi_prev" in f:
            state["phi_prev"] = jnp.asarray(f["phi_prev"][()],
                                            dtype=solver.dtype)
        if "pc" in f:                 # frozen preconditioner (exact resume)
            state["pc"] = _read_tree(f["pc"], solver.dtype)
        for tag, mm in solver.mem_models.items():
            grp = f[f"mem_{tag}"]
            state["mem"][tag] = dataclasses.replace(
                mm,
                states=jnp.asarray(grp["states"][()], dtype=solver.dtype),
                params=jnp.asarray(grp["params"][()], dtype=solver.dtype),
            )
    return state
