"""Multi-device domain decomposition via jax.sharding.

The reference scales by MPI domain decomposition of the mesh under
DOLFIN/PETSc with explicit ghost updates (SURVEY.md section 2c, N6).  The
TPU-native equivalent: shard the *cell* axis of every cell-indexed array
(state fields, per-cell geometry, the block-ELL operator rows) and the
*facet* axis of facet-indexed geometry across a 1-D `Mesh(('cells',))`;
the Krylov dot products lower to psum, the once-per-step assembly gathers
go through GSPMD auto-collectives, and the per-iteration Krylov matvec runs
the explicit shard_map halo pipeline (parallel/halo.py) installed by
shard_solver.

Device arrays are cells-LAST (see ops/assembly.py layout notes), so the
sharded axis is always the trailing one.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P


CELL_ARRAYS = {"vol", "G", "diam", "cell_tag", "cell_qp", "cell_mid",
               "cf_idx", "cf_is_plus", "nbr", "GG", "GG2", "nodes"}
FACET_ARRAYS = {"f_cp", "f_cm", "f_n", "f_area", "f_havg", "f_Rp", "f_Rm",
                "f_stag", "f_qp", "f_mid", "f_gnp", "f_gnm",
                "gnp", "gnm", "E_pp", "E_pm", "E_mp", "E_mm"}
MASK_ARRAYS = {"f_sip", "f_mem", "f_memidx"}


def device_mesh(n_devices: int | None = None) -> DeviceMesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return DeviceMesh(np.array(devs), ("cells",))


def _pad_last(a, n_extra, fill):
    pad_shape = a.shape[:-1] + (n_extra,)
    pad = np.full(pad_shape, fill, dtype=a.dtype)
    return np.concatenate([np.asarray(a), pad], axis=-1)


def pad_facet_axis(g: Dict[str, Any], masks: Optional[Dict[str, Any]],
                   multiple: int, n_mem: int):
    """Pad the interior-facet axis with extra dummy entries (zero area,
    tag -1) so it divides the device count.  Gather maps only ever point at
    entries < nf+1, so the padding is inert.  `masks` may be None (the
    mixed-degree second geometry dict shares the solver's one mask set)."""
    nf1 = g["f_area"].shape[-1]
    target = -(-nf1 // multiple) * multiple
    extra = target - nf1
    if extra == 0:
        return g, masks
    fills = {"f_stag": -1, "f_havg": 1.0}
    g = dict(g)
    for k in FACET_ARRAYS:
        if k in g and g[k] is not None:
            g[k] = jnp.asarray(_pad_last(g[k], extra, fills.get(k, 0)))
    if masks is None:
        return g, None
    masks = dict(masks)
    masks["f_sip"] = jnp.asarray(_pad_last(masks["f_sip"], extra, False))
    masks["f_mem"] = jnp.asarray(_pad_last(masks["f_mem"], extra, False))
    masks["f_memidx"] = jnp.asarray(_pad_last(masks["f_memidx"], extra, n_mem))
    return g, masks


def _last_axis_spec(mesh, ndim):
    return NamedSharding(mesh, P(*([None] * (ndim - 1)), "cells"))


def shard_partition(S, n_devices: int, align: int = 128):
    """Geometric shard partition: cut the PURE-Morton order of cell
    midpoints into `n_devices` equal contiguous blocks, then re-sort each
    block by (compartment, original order).

    The solver's global numbering is (compartment, Morton) -- ideal for the
    contiguous-chunk coarse space, terrible for contiguous-range sharding:
    an ICS cell's ECS neighbor lives in a far-away compartment block, so
    every membrane facet becomes a remote reference (measured boundary
    ~= half the shard on the EMIx brain mesh).  Sharding by spatial Morton
    blocks keeps both sides of a membrane in one shard; re-sorting within
    the shard preserves the never-straddle-a-membrane property of the
    preconditioner's coarse chunks (solvers/twolevel.py) shard-locally.

    Returns (perm, S_size): global permutation (new position -> old cell)
    and the per-shard size before padding."""
    from ..mesh.core import morton_order

    mesh, comp = S.mesh, S._comp_np
    mids = mesh.vertices[mesh.cells].mean(axis=1)
    morton_perm = morton_order(mids)
    nc = mesh.num_cells
    size = _round_up(-(-nc // n_devices), align)
    parts = []
    for p in range(n_devices):
        part = morton_perm[p * size: min((p + 1) * size, nc)]
        parts.append(part[np.lexsort((part, comp[part]))])
    return np.concatenate(parts), size


def _permute_cell_dict(g, perm, inv):
    """Permute one geometry dict's cell axis and remap its cell-id-valued
    arrays (neighbor table, facet->cell and exterior-facet->cell maps)."""
    import jax.numpy as jnp

    g = dict(g)
    for k in CELL_ARRAYS:
        if k == "nbr" or g.get(k) is None:
            continue
        g[k] = jnp.asarray(np.asarray(g[k])[..., perm])
    nbr = np.asarray(g["nbr"])
    g["nbr"] = jnp.asarray(inv[nbr][:, perm])
    for k in ("f_cp", "f_cm", "e_c"):
        g[k] = jnp.asarray(inv[np.asarray(g[k])])
    return g


def permute_cells(S, perm: np.ndarray):
    """Renumber the solver's cell axis by `perm` (new position -> old id):
    permutes every cell-indexed array and remaps every array whose VALUES
    are cell ids (neighbor table, facet->cell and exterior-facet->cell
    maps).  Records ``S._cell_perm`` so states can be mapped in
    (shard_state) and out (unpad_state) of the sharded numbering."""
    import jax.numpy as jnp

    nc = perm.size
    inv = np.empty(nc, dtype=np.int64)
    inv[perm] = np.arange(nc)
    S.g = _permute_cell_dict(S.g, perm, inv)
    if getattr(S, "g2", None) is not None:   # mixed degree_emi != degree_knp
        S.g2 = _permute_cell_dict(S.g2, perm, inv)
    for k in ("cp", "cm"):                 # membrane-presliced cell maps
        if k in getattr(S, "mem_dev", {}):
            S.mem_dev[k] = jnp.asarray(inv[np.asarray(S.mem_dev[k])])
            if getattr(S, "mem_dev2", None) is not None:
                S.mem_dev2[k] = S.mem_dev[k]
    S.D = jnp.asarray(np.asarray(S.D)[:, perm])
    S.rho = jnp.asarray(np.asarray(S.rho)[perm])
    S._comp_np = S._comp_np[perm]
    S._cell_perm = perm
    S._cell_perm_inv = inv


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pad_cell_axis(S, extra: int):
    """Append `extra` inert cells to every cell-indexed array of solver `S`.

    Padded cells are isolated unit cells: mean volume (so the KNP mass
    diagonal and the coarse-level equilibration stay well-scaled), zero
    gradients (no stiffness/convection -> decoupled rows), subdomain tag 0,
    self-referential neighbors, quadrature points far outside the domain
    (so spatial source/stimulus locators never select them), and a dummy
    exterior facet in the cell->facet map.  Their EMI rows are zero (the
    padded constant modes are removed by the masked nullspace projection,
    solvers/krylov.pcg) and their KNP rows are pure mass (increments stay
    ~0).  Replaces the round-1 ``n_cells % n_devices == 0`` restriction."""
    if extra == 0:
        return
    import jax.numpy as jnp

    nc = S.n_cells
    far = float(np.abs(np.asarray(S.mesh.vertices)).max()) * 2.0 + 1.0

    def pad_dict(g):
        g = dict(g)
        nf_dummy = int(g["f_area"].shape[-1]) - 1  # the padded dummy facet
        fills = {"vol": float(np.asarray(g["vol"]).mean()), "diam": 1.0,
                 "cell_tag": 0, "cell_qp": far, "cell_mid": far,
                 "cf_idx": nf_dummy, "cf_is_plus": True}
        for k in CELL_ARRAYS:
            if k == "nbr" or g.get(k) is None:
                continue
            g[k] = jnp.asarray(_pad_last(g[k], extra, fills.get(k, 0)))
        nbr = np.asarray(g["nbr"])
        nc = nbr.shape[1]
        self_idx = np.arange(nc, nc + extra, dtype=nbr.dtype)
        g["nbr"] = jnp.asarray(np.concatenate(
            [nbr, np.broadcast_to(self_idx, (nbr.shape[0], extra))], axis=1))
        return g

    S.g = pad_dict(S.g)
    if getattr(S, "g2", None) is not None:   # mixed degree_emi != degree_knp
        S.g2 = pad_dict(S.g2)
    # D must stay positive at pads: kappa = F psi sum z^2 D c feeds the EMI
    # preconditioner diagonal (assembly.py:320) -- a zero kappa row would
    # make the block-Jacobi inverse singular
    D = np.asarray(S.D)
    S.D = jnp.asarray(np.concatenate(
        [D, np.broadcast_to(D.mean(axis=1, keepdims=True),
                            (D.shape[0], extra))], axis=1))
    S.rho = jnp.asarray(_pad_last(S.rho, extra, 0.0))
    oh, ids = S._comp_arrays()                    # built at the real size
    S._comp_onehot = np.pad(oh, ((0, 0), (0, extra)))      # zero columns:
    S._comp_ids = np.pad(ids, (0, extra))         # pads deflation-invisible
    S._pad_mask = jnp.asarray(np.arange(nc + extra) < nc)


def _geom_view(S):
    """Lightweight host view of the (possibly permuted) device geometry in
    the pre-to_device convention build_pair_maps reads (cells-first)."""
    import types

    g = S.g
    return types.SimpleNamespace(
        nbr=np.asarray(g["nbr"]).T,
        cf_idx=np.asarray(g["cf_idx"]).T,
        cf_is_plus=np.asarray(g["cf_is_plus"]).T,
        cell_tag=np.asarray(g["cell_tag"]),
        f_cp=np.asarray(g["f_cp"]),
    )


def shard_solver(S, mesh: DeviceMesh, pair: bool = False):
    """Shard solver `S` over the device mesh's 'cells' axis with explicit
    halo exchange (parallel/halo.py) for the Krylov matvecs.

    * pads the cell axis with inert cells to a per-shard size aligned to
      128 (any device count / cell count combination works);
    * builds the static send-list/halo metadata and installs the shard_map
      matvec on the solver (``S._halo_mv``, used by ``Solver._matvec``);
    * places geometry/mask arrays with trailing-axis shardings; assembly
      and preconditioner applies stay GSPMD (they run once per step --
      only the per-Krylov-iteration matvec needs the explicit ghost layer,
      mirroring the reference's ghost_updates around each solve,
      solver.py:529,789).

    ``pair=True``: shard the PAIR-block Krylov path instead -- the greedy
    matching is redone per shard (build_pair_maps block constraint, so
    pairs never straddle shard boundaries), the cell axis is renumbered to
    the interleaved (pair, half) order with per-shard pair padding, and
    the per-iteration matvec runs the pair halo exchange
    (halo.build_halo_pair: pair-granular send lists, ~25% fewer gather
    indices per shard, the same boundary collective volume).  Works under
    multi-process meshes too: the Ritz-harvest host pulls go through
    twolevel._host (process_allgather) and the pair<->cell deflation-field
    conversions run on host numpy (solver._pair_W_to_cell /
    _ritz_W_to_pair), so no eager op ever mixes local and global arrays.

    Returns ``shard_state``: pads + places a state pytree (call BEFORE
    ``attach_pc`` so the frozen preconditioner is built at padded shapes)."""
    from .halo import build_halo, build_halo_pair, halo_pair_spmv_fn, \
        halo_spmv_fn

    if getattr(S, "pair_layout", False) or getattr(S, "pairs", None):
        raise NotImplementedError(
            "enable_pair_layout() before shard_solver is unsupported: pass "
            "shard_solver(S, mesh, pair=True) instead (the matching must "
            "be redone per shard so pairs never straddle shard boundaries)")
    n = mesh.devices.size
    nc = S.n_cells
    S._invalidate_caches()
    perm, size = shard_partition(S, n)       # geometric Morton blocks
    permute_cells(S, perm)
    if pair:
        from ..ops.pairs import build_pair_maps, interleave_pair_maps

        block = np.arange(nc) // size
        pm0 = build_pair_maps(_geom_view(S), block=block)
        vol = np.asarray(S.g["vol"])
        pmh, perm2 = interleave_pair_maps(
            pm0, nc, n_shards=n, shard_size=size,
            align=64)                         # 2P cells per shard % 128 == 0
        S._apply_interleave(perm2)            # pads + composes permutations
        # pair mass on the padded pair axis from the live halves
        c0, c1 = pmh["cop"]
        p2 = np.minimum(perm2, nc - 1)
        mass = (np.where(pmh.get("live0", True), vol[p2[c0]], 0.0)
                + np.where(pmh["live1"], vol[p2[c1]], 0.0))
        S._finalize_pair_setup(pmh, mass)
        halo_p = build_halo_pair(pmh["ext_col"], n,
                                 pmh["int_f"].shape[0] // n)
        extra = 0                             # _apply_interleave padded
    else:
        halo = build_halo(np.asarray(S.g["nbr"]), n, align=128)
        extra = int(halo["n_pad"]) - nc
        pad_cell_axis(S, extra)
        S.n_cells_pad = int(halo["n_pad"])

    S.g, S.masks = pad_facet_axis(S.g, S.masks, n, S.n_mem)
    if getattr(S, "g2", None) is not None:
        S.g2, _ = pad_facet_axis(S.g2, None, n, S.n_mem)

    # host snapshot of the permuted+padded node coordinates: the moment-
    # deflation build reads them on host, and the sharded device array is
    # not addressable under a multi-process mesh
    S._nodes_np = np.asarray(S.g["nodes"])

    repl = NamedSharding(mesh, P())

    def put(d, keys):
        # sorted: device_put to a process-spanning sharding is a COLLECTIVE
        # (jax cross-process equality check) -- set iteration order is
        # hash-randomized per process and would misalign the sequences
        for k in sorted(keys):
            v = d.get(k)
            if v is not None and hasattr(v, "ndim") and v.ndim >= 1:
                d[k] = jax.device_put(v, _last_axis_spec(mesh, v.ndim))

    geo_dicts = [S.g] + ([S.g2] if getattr(S, "g2", None) is not None else [])
    for gd in geo_dicts:
        put(gd, CELL_ARRAYS | FACET_ARRAYS)
        for k in ("w_c", "w_f", "Phi_c", "A_c", "e_c", "e_n", "e_area", "e_R",
                  "e_qp", "e_tag", "M0", "phibar"):
            if k in gd and hasattr(gd[k], "ndim"):
                gd[k] = jax.device_put(gd[k], repl)
    put(S.masks, MASK_ARRAYS)
    S.D = jax.device_put(S.D, _last_axis_spec(mesh, 2))
    S.rho = jax.device_put(S.rho, _last_axis_spec(mesh, 1))
    mem_dicts = [S.mem_dev] + ([S.mem_dev2]
                               if getattr(S, "mem_dev2", None) is not None
                               else [])
    for md in mem_dicts:
        for k in ("fidx", "mem_of_facet", "midpoints"):
            md[k] = jax.device_put(md[k], repl)
    # replicate every remaining array leaf: under a multi-process mesh all
    # jit inputs must be global arrays (single-device-committed leftovers
    # would mix addressable domains)
    for d in (*geo_dicts, S.masks, *mem_dicts):
        for k, v in d.items():
            if hasattr(v, "ndim") and not hasattr(v, "sharding"):
                d[k] = jax.device_put(v, repl)
            elif (hasattr(v, "sharding")
                  and getattr(v.sharding, "mesh", None) is not mesh
                  and not isinstance(v.sharding, NamedSharding)):
                d[k] = jax.device_put(v, repl)
    S.z = jax.device_put(S.z, repl)

    if pair:
        # pair maps + masks sharded on the trailing pair axis (npair_t and
        # 2*npair_t are both multiples of n by construction)
        put(S.pairs, set(S.pairs))
        S.pairs["nf"] = jax.device_put(S.pairs["nf"], repl)
        S._pair_mask = jax.device_put(S._pair_mask, _last_axis_spec(mesh, 2))
        S._pair_mass = jax.device_put(S._pair_mass, _last_axis_spec(mesh, 1))
        S._pair_bj_halves = jax.device_put(S._pair_bj_halves, repl)
        S._halo_pair_data, S._halo_pair_mv = halo_pair_spmv_fn(halo_p, mesh)
        pair_src = S._shard_state            # value mapper (_apply_interleave)
    else:
        S._halo_data, S._halo_mv = halo_spmv_fn(halo, mesh)

    perm_j = jnp.asarray(perm)

    def shard_state(state):
        out = dict(state)
        if pair:
            out = pair_src(out)              # orig -> interleaved numbering
        for key in ("c", "c_elim", "phi", "phi_prev"):
            if key not in state:
                continue
            v = out[key] if pair else state[key]
            if not pair and v.shape[-1] == nc:    # original numbering:
                v = v[..., perm_j]                # remap to shard order
                if extra:                         # pad with edge values
                    v = jnp.concatenate(
                        [v, jnp.broadcast_to(v[..., -1:],
                                             v.shape[:-1] + (extra,))],
                        axis=-1)
            out[key] = jax.device_put(v, _last_axis_spec(mesh, v.ndim))
        # everything else (phi_M, I_ch, t, ODE membrane states/params, pc)
        # is replicated -- under a multi-process mesh every jit input must
        # be a global array, so single-device-committed leaves are lifted
        # to an explicit replicated sharding here
        sharded = {"c", "c_elim", "phi", "phi_prev"}
        for key, v in state.items():
            if key in sharded:
                continue
            out[key] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, repl) if hasattr(a, "ndim") else a,
                v,
            )
        return out

    S._shard_state = shard_state
    return shard_state


def unpad_state(S, state):
    """Strip the inert cell padding and undo the shard renumbering of a
    sharded state pytree, returning fields in the solver's original cell
    numbering (for I/O / comparison against single-device results)."""
    import jax.numpy as jnp

    nc = S.n_cells
    out = dict(state)
    # interleaved pair layout: pads are interspersed (dead pair halves),
    # so the one-gather original-id -> padded-slot map applies directly
    idx = getattr(S, "_cell_unpad_idx", None)
    inv = getattr(S, "_cell_perm_inv", None)
    for key in ("c", "c_elim", "phi", "phi_prev"):
        if key not in state:
            continue
        if idx is not None:
            out[key] = state[key][..., jnp.asarray(idx)]
            continue
        v = state[key][..., :nc]
        if inv is not None:
            v = v[..., jnp.asarray(inv)]
        out[key] = v
    return out
