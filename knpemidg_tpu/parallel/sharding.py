"""Multi-device domain decomposition via jax.sharding.

The reference scales by MPI domain decomposition of the mesh under
DOLFIN/PETSc with explicit ghost updates (SURVEY.md section 2c, N6).  The
TPU-native equivalent: shard the *cell* axis of every cell-indexed array
(state fields, per-cell geometry, the block-ELL operator rows) and the
*facet* axis of facet-indexed geometry across a 1-D `Mesh(('cells',))`;
the gathers in assembly/SpMV then become XLA-inserted collectives over ICI,
and the Krylov dot products lower to psum.  No explicit halo code: GSPMD
plays the role of the ghost layer in round 1 (an explicit shard_map halo
pipeline is the planned optimization).

Device arrays are cells-LAST (see ops/assembly.py layout notes), so the
sharded axis is always the trailing one.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P


CELL_ARRAYS = {"vol", "G", "diam", "cell_tag", "cell_qp", "cell_mid",
               "cf_idx", "cf_is_plus", "nbr", "GG"}
FACET_ARRAYS = {"f_cp", "f_cm", "f_n", "f_area", "f_havg", "f_Rp", "f_Rm",
                "f_stag", "f_qp", "f_mid",
                "gnp", "gnm", "E_pp", "E_pm", "E_mp", "E_mm"}
MASK_ARRAYS = {"f_sip", "f_mem", "f_memidx"}


def device_mesh(n_devices: int | None = None) -> DeviceMesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return DeviceMesh(np.array(devs), ("cells",))


def _pad_last(a, n_extra, fill):
    pad_shape = a.shape[:-1] + (n_extra,)
    pad = np.full(pad_shape, fill, dtype=a.dtype)
    return np.concatenate([np.asarray(a), pad], axis=-1)


def pad_facet_axis(g: Dict[str, Any], masks: Dict[str, Any], multiple: int,
                   n_mem: int):
    """Pad the interior-facet axis with extra dummy entries (zero area,
    tag -1) so it divides the device count.  Gather maps only ever point at
    entries < nf+1, so the padding is inert."""
    nf1 = g["f_area"].shape[-1]
    target = -(-nf1 // multiple) * multiple
    extra = target - nf1
    if extra == 0:
        return g, masks
    fills = {"f_stag": -1, "f_havg": 1.0}
    g = dict(g)
    for k in FACET_ARRAYS:
        g[k] = jnp.asarray(_pad_last(g[k], extra, fills.get(k, 0)))
    masks = dict(masks)
    masks["f_sip"] = jnp.asarray(_pad_last(masks["f_sip"], extra, False))
    masks["f_mem"] = jnp.asarray(_pad_last(masks["f_mem"], extra, False))
    masks["f_memidx"] = jnp.asarray(_pad_last(masks["f_memidx"], extra, n_mem))
    return g, masks


def _last_axis_spec(mesh, ndim):
    return NamedSharding(mesh, P(*([None] * (ndim - 1)), "cells"))


def shard_solver(S, mesh: DeviceMesh):
    """Place the solver's geometry/mask arrays with cell/facet shardings on
    the trailing axis and return a function that shards a state pytree the
    same way.  Requires n_cells divisible by the device count."""
    n = mesh.devices.size
    nc = S.n_cells
    assert nc % n == 0, f"n_cells={nc} not divisible by {n} devices"

    S.g, S.masks = pad_facet_axis(S.g, S.masks, n, S.n_mem)

    repl = NamedSharding(mesh, P())

    def put(d, keys):
        for k in keys:
            v = d.get(k)
            if v is not None and hasattr(v, "ndim") and v.ndim >= 1:
                d[k] = jax.device_put(v, _last_axis_spec(mesh, v.ndim))

    put(S.g, CELL_ARRAYS | FACET_ARRAYS)
    put(S.masks, MASK_ARRAYS)
    for k in ("w_c", "w_f", "Phi_c", "e_c", "e_n", "e_area", "e_R", "e_qp",
              "e_tag", "M0", "phibar"):
        if k in S.g and hasattr(S.g[k], "ndim"):
            S.g[k] = jax.device_put(S.g[k], repl)
    S.D = jax.device_put(S.D, _last_axis_spec(mesh, 2))
    S.rho = jax.device_put(S.rho, _last_axis_spec(mesh, 1))
    for k in ("fidx", "mem_of_facet", "midpoints"):
        S.mem_dev[k] = jax.device_put(S.mem_dev[k], repl)

    def shard_state(state):
        out = dict(state)
        for key in ("c", "c_elim", "phi"):
            v = state[key]
            out[key] = jax.device_put(v, _last_axis_spec(mesh, v.ndim))
        out["phi_M"] = jax.device_put(state["phi_M"], repl)
        out["I_ch"] = jax.device_put(state["I_ch"], repl)
        if "pc" in state:
            # frozen coarse-level data: small dense matrices, replicate
            out["pc"] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, repl), state["pc"]
            )
        return out

    return shard_state
