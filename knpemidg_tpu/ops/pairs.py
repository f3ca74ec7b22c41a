"""Pair-block operator layout: 2-cell macro rows for the Krylov hot path.

TPU random gather costs ~2.4 ns per INDEX, independent of payload width
up to >= 64 B -- the block-ELL matvec's neighbor gather (4 slots x nc =
486k indices on the EMIx mesh) is the single most expensive operation in
every Krylov iteration.  Fusing face-adjacent cell pairs into (2*nd)-row
macro blocks moves the pair-internal coupling into the (gather-free)
diagonal block and cuts the external gather to <= 2d slots per PAIR
(<= 6 x 63k = 378k indices): measured 0.856 vs 1.327 ms/apply (-35.5%)
on the EMIx mesh (tools/exp_pair_matvec.py, round 4).  As a bonus the
pair-diagonal block-Jacobi smoother sees the intra-pair coupling.

Design (round 4): the pair layout is an OPERATOR format, not a field
format.  All fields/rhs stay cell-indexed (nd, nc); the iterative solves
convert their vectors once per solve (two ~0.3 ms gathers), run every
Krylov iteration in (2*nd, npair), and convert the solution back.  The
assembly emits pair blocks directly from the same per-facet block
tensors (gather count ~equal to the cell-ELL emitter), so there is no
per-step format conversion.  Replaces nothing in the reference -- this
is a TPU-specific bandwidth optimization (the reference's PETSc AIJ has
no analog; closest is BAIJ blocking, PETSc manual ch. 3).

Matching: greedy first-fit over the Morton cell order, restricted to
SAME-TAG neighbors so every pair lives inside one compartment (keeps the
compartment deflation's pair-column sums exact).  Unmatched cells become
self-pairs whose second half is dead: identity diagonal, zero rhs/x0 --
the same inert-slot convention parallel/sharding.pad_cell_axis uses.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def build_pair_maps(geom, block: np.ndarray | None = None
                    ) -> Dict[str, np.ndarray]:
    """Host-side pair maps from a fem.tabulation.Geometry (numpy, pre-
    to_device).  Returns a dict of numpy arrays; ship to device with
    :func:`pair_maps_to_device`.

    ``block`` (nc,) optional group ids (shard assignment): matching is
    additionally restricted to same-block neighbors so pairs never
    straddle shard boundaries (parallel/sharding pair mode).

    Keys:
      cop      (2, npair) int32   cells of pair (self-pair: both equal)
      pid      (nc,)      int32   pair id of cell
      pos      (nc,)      int32   half index of cell within its pair
      live1    (npair,)   bool    second half is a real cell
      int_f    (npair,)   int32   internal facet id (dummy nf for self)
      int_p0   (npair,)   bool    cell0 is the PLUS side of int_f
      ext_f    (S, npair) int32   external facet ids (dummy nf), S = 2d
      ext_isp  (S, npair) bool    owner cell is the PLUS side
      ext_h    (S, npair) int32   owner half (0/1)
      ext_col  (S, npair) int32   gather column pos*npair + pid of the
                                  external cell (dummy -> own pair)
      cell_col (nc,)      int32   pos*npair + pid of each cell (for the
                                  pair->cell conversion gather)
    """
    nbr = np.asarray(geom.nbr)                     # (nc, d+2), col 0 = self
    cf = np.asarray(geom.cf_idx)                   # (nc, d+1)
    isp = np.asarray(geom.cf_is_plus)              # (nc, d+1)
    tag = np.asarray(geom.cell_tag)
    nc, K1 = cf.shape                              # K1 = d+1 local facets
    nf = int(np.asarray(geom.f_cp).shape[0]) - 1   # dummy facet index
    if block is not None:
        # fold the block constraint into the tag comparison
        tag = tag.astype(np.int64) + np.asarray(block, dtype=np.int64) * (
            int(tag.max()) + 1)

    # --- greedy same-tag matching over the (Morton) cell order ----------
    mate = np.full(nc, -1, dtype=np.int64)
    order_nbr = nbr[:, 1:]                         # (nc, d+1)
    for c in range(nc):
        if mate[c] >= 0:
            continue
        tc = tag[c]
        for o in order_nbr[c]:
            if o != c and o > c and mate[o] < 0 and tag[o] == tc:
                mate[c] = o
                mate[o] = c
                break
        else:
            mate[c] = c                            # self-pair

    first = np.flatnonzero(mate >= np.arange(nc))  # representative cells
    # (c <= mate[c]: matched pairs keyed by the lower id, self-pairs by c)
    c0 = first
    c1 = mate[first]
    npair = len(first)
    cop = np.stack([c0, c1]).astype(np.int32)
    live1 = c1 != c0
    pid = np.empty(nc, dtype=np.int32)
    pos = np.empty(nc, dtype=np.int32)
    # c1 first, c0 second: a self-pair (c1 == c0) must end at pos 0
    pid[c1] = np.arange(npair)
    pos[c1] = 1
    pid[c0] = np.arange(npair)
    pos[c0] = 0

    # --- internal facet of each matched pair -----------------------------
    int_f = np.full(npair, nf, dtype=np.int32)
    int_p0 = np.zeros(npair, dtype=bool)
    for l in range(K1):
        hit = live1 & (order_nbr[c0, l] == c1) & (int_f == nf)
        int_f[hit] = cf[c0[hit], l]
        int_p0[hit] = isp[c0[hit], l]

    # internal local-facet index per half (for cell-ELL -> pair conversion)
    int_l = np.zeros((2, npair), dtype=np.int32)
    for l in range(K1):
        hit0 = live1 & (order_nbr[c0, l] == c1)
        int_l[0][hit0] = l
        hit1 = live1 & (order_nbr[c1, l] == c0)
        int_l[1][hit1] = l

    # --- external slots: fixed (h, l) scan order, compacted per pair -----
    d = K1 - 1
    S = 2 * d
    ext_f = np.full((S, npair), nf, dtype=np.int32)
    ext_isp = np.zeros((S, npair), dtype=bool)
    ext_h = np.zeros((S, npair), dtype=np.int32)
    ext_l = np.zeros((S, npair), dtype=np.int32)
    ext_other = np.tile(c0, (S, 1))                # dummy -> own cell
    fill = np.zeros(npair, dtype=np.int64)
    for h, ch in enumerate((c0, c1)):
        hlive = live1 if h == 1 else np.ones(npair, dtype=bool)
        for l in range(K1):
            f = cf[ch, l]
            other = order_nbr[ch, l]
            real = hlive & (f != nf) & (other != ch) & (other != (c1 if h == 0 else c0))
            idx = np.flatnonzero(real)
            s = fill[idx]
            assert s.max(initial=0) < S, "more external facets than slots"
            ext_f[s, idx] = f[idx]
            ext_isp[s, idx] = isp[ch[idx], l]
            ext_h[s, idx] = h
            ext_l[s, idx] = l
            ext_other[s, idx] = other[idx]
            fill[idx] += 1

    ext_col = (pos[ext_other].astype(np.int64) * npair
               + pid[ext_other]).astype(np.int32)
    cell_col = (pos.astype(np.int64) * npair + pid).astype(np.int32)

    return {
        "cop": cop, "pid": pid, "pos": pos, "live1": live1,
        "int_f": int_f, "int_p0": int_p0, "int_l": int_l,
        "ext_f": ext_f, "ext_isp": ext_isp, "ext_h": ext_h,
        "ext_l": ext_l, "ext_col": ext_col, "cell_col": cell_col,
        "nf": np.int32(nf),
    }


def interleave_pair_maps(pm: Dict[str, np.ndarray], nc: int,
                         n_shards: int = 1, shard_size: int | None = None,
                         align: int = 64):
    """Rewrite pair maps for the INTERLEAVED cell order: pair p occupies
    cell slots (2p, 2p+1), with fresh inert pad cells (ids nc..) as the
    dead second halves of self-pairs.

    Why: with cells renumbered this way, (a) the cell<->pair vector
    conversions become pure reshapes (the gather version costs ~0.3 ms per
    stacked conversion on the EMIx mesh), and (b) the preconditioner's
    contiguous pair chunks (agg_size/2 pairs) cover exactly the same
    contiguous (compartment, Morton) cell ranges as the cell layout's
    chunks -- the shifted chunk boundaries of the order-by-representative
    pair sequence cost +11% KNP window iterations (ROADMAP round-4
    item 10).

    ``n_shards > 1`` (cells already in shard-blocked order of block size
    ``shard_size``, and the matching built with the matching ``block``
    constraint): every shard's pair range is padded to a common P
    (multiple of ``align``) with fully-inert pad PAIRS (both halves pad
    cells), so the interleaved cell axis splits into n_shards equal
    contiguous blocks of 2P slots.  The maps then carry ``live0`` (half 0
    liveness) alongside ``live1``.

    Returns ``(new_maps, perm)``: maps valid in the new numbering (with
    ``cell_col`` REMOVED -- its absence is the static marker to_pair /
    from_pair branch on), and the permutation ``perm`` (new slot -> old
    cell id, pad ids >= nc) to apply to every cell-indexed solver array
    (parallel.sharding.permute_cells after pad_cell_axis)."""
    cop, live1 = pm["cop"], pm["live1"]
    npair = cop.shape[1]
    nf = int(pm["nf"])
    S = pm["ext_f"].shape[0]

    if n_shards == 1:
        P = npair
        dst = np.arange(npair)
    else:
        shard_of = cop[0] // shard_size
        assert np.array_equal(shard_of, cop[1] // shard_size), \
            "pairs straddle shards: build_pair_maps needs the block arg"
        counts = np.bincount(shard_of, minlength=n_shards)
        P = max(align, -(-int(counts.max()) // align) * align)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # pairs arrive sorted by c0, hence shard-major: within-shard
        # ordinal = global ordinal - shard start
        dst = shard_of * P + (np.arange(npair) - starts[shard_of])
    npair_t = n_shards * P

    # --- the cell permutation: new slot -> old id (pads >= nc) ----------
    perm = np.full(2 * npair_t, -1, dtype=np.int64)
    perm[2 * dst] = cop[0]
    perm[2 * dst + 1] = np.where(live1, cop[1], -1)
    need = np.flatnonzero(perm < 0)
    perm[need] = nc + np.arange(len(need))

    # --- rebuild the maps on the padded pair axis ------------------------
    def place(old, fill, dtype=None):
        out = np.full((*old.shape[:-1], npair_t), fill,
                      dtype=dtype or old.dtype)
        out[..., dst] = old
        return out

    new = {
        "cop": np.stack([np.arange(0, 2 * npair_t, 2, dtype=np.int32),
                         np.arange(1, 2 * npair_t, 2, dtype=np.int32)]),
        "pid": (np.arange(2 * npair_t, dtype=np.int32) // 2),
        "pos": (np.arange(2 * npair_t, dtype=np.int32) % 2),
        "live1": place(live1, False),
        "int_f": place(pm["int_f"], nf),
        "int_p0": place(pm["int_p0"], False),
        "int_l": place(pm["int_l"], 0),
        "ext_f": place(pm["ext_f"], nf),
        "ext_isp": place(pm["ext_isp"], False),
        "ext_h": place(pm["ext_h"], 0),
        "ext_l": place(pm["ext_l"], 0),
        "nf": pm["nf"],
    }
    if n_shards > 1:
        live0 = np.zeros(npair_t, dtype=bool)
        live0[dst] = True
        new["live0"] = live0

    # external gather columns: (h * npair + pid) -> (h * npair_t + dst);
    # the halves of the referenced cell are preserved by the interleave.
    # Dummy slots keep pointing at the own pair (their blocks are zero).
    h_old = pm["ext_col"] // npair
    p_old = pm["ext_col"] % npair
    ecol = (h_old * npair_t + dst[p_old]).astype(np.int32)
    self_col = np.broadcast_to(np.arange(npair_t, dtype=np.int32),
                               (S, npair_t))
    new["ext_col"] = place(ecol, 0)
    pad_pairs = np.ones(npair_t, dtype=bool)
    pad_pairs[dst] = False
    new["ext_col"][:, pad_pairs] = self_col[:, pad_pairs]
    return new, perm


def pair_maps_to_device(pm: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in pm.items():
        if np.ndim(v) == 0:
            out[k] = jnp.int32(v)
        elif v.dtype == bool:
            out[k] = jnp.asarray(v)
        else:
            out[k] = jnp.asarray(v, dtype=jnp.int32)
    return out


# ---------------------------------------------------------------------------
# vector conversions (once per SOLVE, not per apply)
# ---------------------------------------------------------------------------

def to_pair(pm, x):
    """(..., nd, nc) -> (..., 2*nd, npair); dead halves zeroed.

    Interleaved maps (no ``cell_col`` -- see interleave_pair_maps): a pure
    reshape/transpose at HBM-copy cost instead of an nc-index gather."""
    if "cell_col" not in pm:
        *lead, nd, nc2 = x.shape
        npair = nc2 // 2
        xr = jnp.moveaxis(x.reshape(*lead, nd, npair, 2), -1, -3)
        out = xr.reshape(*lead, 2 * nd, npair)
        live1 = pm["live1"].astype(x.dtype)
        live0 = (pm["live0"].astype(x.dtype) if "live0" in pm
                 else jnp.ones((), dtype=x.dtype))
        mask = jnp.concatenate(
            [jnp.broadcast_to(live0, (nd, npair)),
             jnp.broadcast_to(live1, (nd, npair))])
        return out * mask
    xg = x[..., :, pm["cop"]]                       # (..., nd, 2, npair)
    h1 = xg[..., :, 1, :] * pm["live1"].astype(x.dtype)
    return jnp.concatenate([xg[..., :, 0, :], h1], axis=-2)


def to_pair_host(pmh, x):
    """Numpy mirror of :func:`to_pair` on the HOST maps (interleaved form
    only).  Used where the conversion must not touch device arrays: under a
    multi-process mesh the pair maps are globally sharded and an eager
    (outside-jit) mixed local/global op raises -- e.g. converting the
    host-f64 Ritz deflation fields (solver._build_pc)."""
    assert "cell_col" not in pmh, "host conversion: interleaved maps only"
    x = np.asarray(x)
    *lead, nd, nc2 = x.shape
    npair = nc2 // 2
    xr = np.moveaxis(x.reshape(*lead, nd, npair, 2), -1, -3)
    out = xr.reshape(*lead, 2 * nd, npair)
    live1 = np.asarray(pmh["live1"], dtype=x.dtype)
    live0 = (np.asarray(pmh["live0"], dtype=x.dtype) if "live0" in pmh
             else np.ones((), dtype=x.dtype))
    mask = np.concatenate([np.broadcast_to(live0, (nd, npair)),
                           np.broadcast_to(live1, (nd, npair))])
    return out * mask


def from_pair_host(pmh, xp):
    """Numpy mirror of :func:`from_pair` (interleaved form only); see
    :func:`to_pair_host`."""
    assert "cell_col" not in pmh, "host conversion: interleaved maps only"
    xp = np.asarray(xp)
    *lead, nd2, npair = xp.shape
    nd = nd2 // 2
    a = np.moveaxis(xp.reshape(*lead, 2, nd, npair), -3, -1)
    return a.reshape(*lead, nd, 2 * npair)


def from_pair(pm, xp):
    """(..., 2*nd, npair) -> (..., nd, nc) (reads each cell's live half;
    interleaved maps: inverse reshape, dead halves land on the pad cells)."""
    nd2 = xp.shape[-2]
    nd = nd2 // 2
    npair = xp.shape[-1]
    if "cell_col" not in pm:
        *lead, _, _ = xp.shape
        a = jnp.moveaxis(xp.reshape(*lead, 2, nd, npair), -3, -1)
        return a.reshape(*lead, nd, 2 * npair)
    xv = jnp.concatenate([xp[..., :nd, :], xp[..., nd:, :]], axis=-1)
    return xv.at[..., :, pm["cell_col"]].get(mode="promise_in_bounds")


# ---------------------------------------------------------------------------
# pair matvecs
# ---------------------------------------------------------------------------

def pair_matvec(pd, pe, pm, xp):
    """y = A_pair @ xp.  pd (2nd, 2nd, npair); pe (S, 2nd, nd, npair);
    xp (2nd, npair).  One external gather of S*npair indices."""
    nd = pe.shape[2]
    y = jnp.einsum("ijp,jp->ip", pd, xp)
    xv = jnp.concatenate([xp[:nd], xp[nd:]], axis=1)      # (nd, 2*npair)
    xe = xv.at[:, pm["ext_col"]].get(mode="promise_in_bounds")
    return y + jnp.einsum("sijp,jsp->ip", pe, xe)


def pair_matvec_multi(pd, pe, pm, xp):
    """Batched over m systems sharing ONE external gather.
    pd (m, 2nd, 2nd, npair); pe (m, S, 2nd, nd, npair); xp (m, 2nd, npair)."""
    m, nd2, npair = xp.shape
    nd = nd2 // 2
    y = jnp.einsum("mijp,mjp->mip", pd, xp)
    xv = jnp.concatenate([xp[:, :nd], xp[:, nd:]], axis=2)
    xv = xv.reshape(m * nd, 2 * npair)
    xe = xv.at[:, pm["ext_col"]].get(mode="promise_in_bounds")
    xe = xe.reshape(m, nd, *pm["ext_col"].shape)
    return y + jnp.einsum("msijp,mjsp->mip", pe, xe)


def pair_matvec_fan(pd, pe, pm, X):
    """One operator applied to m vectors (moment/Ritz Galerkin builds):
    X (m, 2nd, npair) -> (m, 2nd, npair), one shared external gather."""
    m, nd2, npair = X.shape
    nd = nd2 // 2
    y = jnp.einsum("ijp,mjp->mip", pd, X)
    xv = jnp.concatenate([X[:, :nd], X[:, nd:]], axis=2).reshape(
        m * nd, 2 * npair)
    xe = xv.at[:, pm["ext_col"]].get(mode="promise_in_bounds")
    xe = xe.reshape(m, nd, *pm["ext_col"].shape)
    return y + jnp.einsum("sijp,mjsp->mip", pe, xe)


# ---------------------------------------------------------------------------
# pair-ELL assembly emitters (mirror ops.assembly.gather_blocks)
# ---------------------------------------------------------------------------

def gather_blocks_pair(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm,
                       dead_identity: float = 1.0):
    """Assemble the pair-block operator from per-facet blocks.

    Same inputs as ops.assembly.gather_blocks plus the pair maps; returns
    (pd (2nd, 2nd, npair), pe (S, 2nd, nd, npair)).  Gather budget:
    nc (A_cell halves) + npair (internal facet) + S*npair (external) --
    ~563k vs the cell emitter's 486k on the EMIx mesh; the savings are in
    the per-ITERATION matvec (378k vs 486k indices), not here.

    ``dead_identity``: value placed on the dead half's diagonal of
    self-pairs (keeps the block-Jacobi inverse nonsingular; the dead
    rows/rhs are zero so the Krylov iterates stay zero there, the same
    invariant parallel/sharding's inert cell padding relies on)."""
    nd = A_cell.shape[0]
    nf1 = Mpp.shape[-1]
    npair = pm["int_f"].shape[0]
    M = jnp.stack([Mpp, Mmm, Mpm, Mmp]).reshape(4 * nd * nd, nf1)

    live1 = pm["live1"].astype(A_cell.dtype)
    live0 = pm["live0"].astype(A_cell.dtype) if "live0" in pm else None
    A2 = A_cell.reshape(nd * nd, -1)
    Ah = A2.at[:, pm["cop"]].get(mode="promise_in_bounds")  # (nd*nd, 2, np)
    B00 = Ah[:, 0].reshape(nd, nd, npair)
    B11 = Ah[:, 1].reshape(nd, nd, npair) * live1
    if live0 is not None:                          # fully-inert pad pairs
        B00 = B00 * live0

    gi = M.at[:, pm["int_f"]].get(mode="promise_in_bounds")
    gi = gi.reshape(4, nd, nd, npair)
    p0 = pm["int_p0"][None, None, :]
    B00 = B00 + jnp.where(p0, gi[0], gi[1])
    B11 = B11 + jnp.where(p0, gi[1], gi[0])
    B01 = jnp.where(p0, gi[2], gi[3])
    B10 = jnp.where(p0, gi[3], gi[2])

    pes = []
    for s in range(pm["ext_f"].shape[0]):
        gs = M.at[:, pm["ext_f"][s]].get(mode="promise_in_bounds")
        gs = gs.reshape(4, nd, nd, npair)
        sel = pm["ext_isp"][s][None, None, :]
        dg = jnp.where(sel, gs[0], gs[1])
        off = jnp.where(sel, gs[2], gs[3])
        h0 = (pm["ext_h"][s] == 0)[None, None, :]
        B00 = B00 + jnp.where(h0, dg, 0.0)
        B11 = B11 + jnp.where(h0, 0.0, dg)
        pes.append(jnp.concatenate([jnp.where(h0, off, 0.0),
                                    jnp.where(h0, 0.0, off)], axis=0))

    eye = jnp.eye(nd, dtype=A_cell.dtype)[:, :, None]
    B11 = B11 + eye * (dead_identity * (1.0 - live1))
    if live0 is not None:
        B00 = B00 + eye * (dead_identity * (1.0 - live0))
    pd = jnp.concatenate(
        [jnp.concatenate([B00, B01], axis=1),
         jnp.concatenate([B10, B11], axis=1)], axis=0)
    return pd, jnp.stack(pes)


def gather_blocks_pair_multi(g, pm, A_cell, Mpp, Mpm, Mmp, Mmm,
                             dead_identity: float = 1.0):
    """Batched emitter: leading m (ion) axis on every input; all m systems
    share each gather (payload rides free).  A_cell (m, nd, nd, nc),
    M** (m, nd, nd, nf+1) -> pd (m, 2nd, 2nd, np), pe (m, S, 2nd, nd, np)."""
    m, nd = A_cell.shape[0], A_cell.shape[1]
    nf1 = Mpp.shape[-1]
    npair = pm["int_f"].shape[0]
    M = jnp.stack([Mpp, Mmm, Mpm, Mmp], axis=1).reshape(
        m * 4 * nd * nd, nf1)

    live1 = pm["live1"].astype(A_cell.dtype)
    live0 = pm["live0"].astype(A_cell.dtype) if "live0" in pm else None
    A2 = A_cell.reshape(m * nd * nd, -1)
    Ah = A2.at[:, pm["cop"]].get(mode="promise_in_bounds")
    Ah = Ah.reshape(m, nd, nd, 2, npair)
    B00 = Ah[..., 0, :]
    B11 = Ah[..., 1, :] * live1
    if live0 is not None:                          # fully-inert pad pairs
        B00 = B00 * live0

    gi = M.at[:, pm["int_f"]].get(mode="promise_in_bounds")
    gi = gi.reshape(m, 4, nd, nd, npair)
    p0 = pm["int_p0"][None, None, None, :]
    B00 = B00 + jnp.where(p0, gi[:, 0], gi[:, 1])
    B11 = B11 + jnp.where(p0, gi[:, 1], gi[:, 0])
    B01 = jnp.where(p0, gi[:, 2], gi[:, 3])
    B10 = jnp.where(p0, gi[:, 3], gi[:, 2])

    pes = []
    for s in range(pm["ext_f"].shape[0]):
        gs = M.at[:, pm["ext_f"][s]].get(mode="promise_in_bounds")
        gs = gs.reshape(m, 4, nd, nd, npair)
        sel = pm["ext_isp"][s][None, None, None, :]
        dg = jnp.where(sel, gs[:, 0], gs[:, 1])
        off = jnp.where(sel, gs[:, 2], gs[:, 3])
        h0 = (pm["ext_h"][s] == 0)[None, None, None, :]
        B00 = B00 + jnp.where(h0, dg, 0.0)
        B11 = B11 + jnp.where(h0, 0.0, dg)
        pes.append(jnp.concatenate([jnp.where(h0, off, 0.0),
                                    jnp.where(h0, 0.0, off)], axis=1))

    eye = jnp.eye(nd, dtype=A_cell.dtype)[None, :, :, None]
    B11 = B11 + eye * (dead_identity * (1.0 - live1))
    if live0 is not None:
        B00 = B00 + eye * (dead_identity * (1.0 - live0))
    pd = jnp.concatenate(
        [jnp.concatenate([B00, B01], axis=2),
         jnp.concatenate([B10, B11], axis=2)], axis=1)
    return pd, jnp.stack(pes, axis=1)


def pair_block_diag_embed(pm, D_cell, dead_identity: float = 0.0):
    """Embed per-cell (nd, nd, nc) diagonal blocks into the pair diagonal
    (2nd, 2nd, npair) -- zero off-halves.  Used for the EMI mass
    regularization (P_diag - blocks[0]) and any per-cell diag payload."""
    nd = D_cell.shape[0]
    npair = pm["int_f"].shape[0]
    live1 = pm["live1"].astype(D_cell.dtype)
    A2 = D_cell.reshape(nd * nd, -1)
    Ah = A2.at[:, pm["cop"]].get(mode="promise_in_bounds")
    B00 = Ah[:, 0].reshape(nd, nd, npair)
    B11 = Ah[:, 1].reshape(nd, nd, npair) * live1
    eye = jnp.eye(nd, dtype=D_cell.dtype)[:, :, None]
    B11 = B11 + eye * (dead_identity * (1.0 - live1))
    if "live0" in pm:                              # fully-inert pad pairs
        live0 = pm["live0"].astype(D_cell.dtype)
        B00 = B00 * live0 + eye * (dead_identity * (1.0 - live0))
    z = jnp.zeros_like(B00)
    return jnp.concatenate(
        [jnp.concatenate([B00, z], axis=1),
         jnp.concatenate([z, B11], axis=1)], axis=0)


def pair_v_sums(pd, pe):
    """Block value sums in the (K, nc)-convention build_two_level consumes:
    slot 0 = pair diagonal, slots 1.. = external.  Returns (1+S, npair)."""
    v0 = pd.sum(axis=(0, 1))
    vs = pe.sum(axis=(1, 2))
    return jnp.concatenate([v0[None], vs], axis=0)


def pair_nbr(pm):
    """(1+S, npair) neighbor-PAIR table (slot 0 = self) for
    build_two_level's chunk-crossing detection."""
    self_row = jnp.arange(pm["int_f"].shape[0], dtype=jnp.int32)[None]
    ext_pid = pm["ext_col"] % pm["int_f"].shape[0]
    return jnp.concatenate([self_row, ext_pid], axis=0)


def cell_bell_to_pair(pm, blocks, dead_identity: float = 0.0):
    """One-time cell block-ELL -> pair format conversion (used for the
    cached STATIC KNP operator at setup; the per-step assemblies emit pair
    format directly).  blocks (..., K, nd, nd, nc) with slot l+1 = local
    facet l (the gather_blocks slot convention); leading axes broadcast.

    (2 + S) gathers of npair indices each -- ~1.2 ms on the EMIx mesh,
    acceptable once per setup, NOT per step."""
    *lead, K, nd, _, nc = blocks.shape
    npair = pm["int_f"].shape[0]
    live1 = pm["live1"].astype(blocks.dtype)
    live0 = pm["live0"].astype(blocks.dtype) if "live0" in pm else None
    c0, c1 = pm["cop"][0], pm["cop"][1]

    B00 = blocks[..., 0, :, :, :][..., c0]
    B11 = blocks[..., 0, :, :, :][..., c1] * live1
    if live0 is not None:                          # fully-inert pad pairs
        B00 = B00 * live0

    # flatten (K, nc) into one gather axis: column = l * nc + c
    Bf = jnp.moveaxis(blocks, -4, -1)               # (..., nd, nd, nc, K)
    Bf = jnp.swapaxes(Bf, -1, -2)                   # (..., nd, nd, K, nc)
    Bf = Bf.reshape(*lead, nd, nd, K * nc)

    def slot_at(l_arr, cells):                      # l_arr, cells (npair,)
        col = (l_arr.astype(jnp.int32) + 1) * nc + cells
        return Bf[..., col]                         # (..., nd, nd, npair)

    B01 = slot_at(pm["int_l"][0], c0) * live1
    B10 = slot_at(pm["int_l"][1], c1) * live1
    eye = jnp.eye(nd, dtype=blocks.dtype)[:, :, None]
    B11 = B11 + eye * (dead_identity * (1.0 - live1))
    if live0 is not None:
        B00 = B00 + eye * (dead_identity * (1.0 - live0))
    pd = jnp.concatenate(
        [jnp.concatenate([B00, B01], axis=-2),
         jnp.concatenate([B10, B11], axis=-2)], axis=-3)

    pes = []
    z = jnp.zeros((*lead, nd, nd, npair), dtype=blocks.dtype)
    for s in range(pm["ext_f"].shape[0]):
        owner = jnp.where(pm["ext_h"][s] == 0, c0, c1)
        blk = slot_at(pm["ext_l"][s], owner)
        # dummy slots point at the owner's own local facet 0 -- mask them
        mask = (pm["ext_f"][s] != pm["nf"]).astype(blocks.dtype)
        blk = blk * mask
        h0 = (pm["ext_h"][s] == 0)
        top = jnp.where(h0, blk, z)
        bot = jnp.where(h0, z, blk)
        pes.append(jnp.concatenate([top, bot], axis=-3))   # row halves
    return pd, jnp.stack(pes, axis=-4)


def mass_to_pair(pm, mass):
    """(nc,) per-cell scalar -> (npair,) per-pair sum over live halves."""
    c0, c1 = pm["cop"][0], pm["cop"][1]
    return mass[c0] + mass[c1] * pm["live1"].astype(mass.dtype)


def onehot_to_pair(pm, onehot):
    """(n_comp, nc) compartment indicator -> (n_comp, npair).  Pairs are
    same-tag by construction, hence same-compartment; take cell0's row."""
    return onehot[:, pm["cop"][0]]
