"""Explicit halo exchange for the cell-axis domain decomposition.

The reference scales by MPI domain decomposition with DOLFIN ghost layers
(ghost updates around every parallel solve: solver.py:529,789; ghost-aware
facet bookkeeping: dlt_dof_extraction.py:41-46).  Round 1 instead relied on
GSPMD auto-collectives around the unstructured neighbor gather, which for a
cell-sharded ``x[:, nbr]`` materializes an all-gather of the FULL state per
matvec.  This module is the TPU-native ghost layer:

* cells are split into ``n_devices`` contiguous shards (cells are already
  (compartment, Morton)-ordered, so contiguous chunks are compact);
* at setup, each shard gets a static SEND LIST -- the local cells any other
  shard's stencil touches -- and a neighbor table remapped to
  ``[local | halo-pool]`` indices;
* per matvec, inside ``shard_map``: gather the send values (a small local
  gather), ``all_gather`` ONLY that boundary block over the mesh axis, and
  run the block-ELL matvec against ``concat([x_local, pool])``.

Collective volume per matvec: ``n_devices * B * rows`` values (B = max
boundary-cell count over shards, ~ the surface of a Morton chunk) instead
of the full ``nc * rows`` of a state all-gather (ratio measured in
tests/test_halo.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def build_halo(nbr: np.ndarray, n_devices: int, align: int = 128
               ) -> Dict[str, np.ndarray]:
    """Build the static halo-exchange metadata for a block-ELL operator.

    ``nbr`` (K, nc) with slot 0 = self.  Returns:

    - ``n_pad``: padded cell count (= n_devices * S, S a multiple of
      `align`); padded cells are self-coupled only (inert);
    - ``send_idx`` (n_devices, B): per-shard *local* indices of the cells
      that shard contributes to the global halo pool (padded by repeating
      index 0 -- duplicate pool entries are harmless);
    - ``nbr_local`` (n_devices, K, S): neighbor table remapped to local
      indices; entries >= S address the halo pool at
      ``S + owner * B + rank_in_send_list``;
    - ``counts`` (n_devices,): true boundary-cell counts (diagnostics).
    """
    K, nc = np.asarray(nbr).shape
    nbr = np.asarray(nbr)
    S = _round_up(_round_up(nc, n_devices) // n_devices, align)
    n_pad = S * n_devices
    pad = n_pad - nc
    idx_pad = np.arange(nc, n_pad, dtype=nbr.dtype)
    nbr_p = np.concatenate([nbr, np.broadcast_to(idx_pad, (K, pad))], axis=1)
    owner_of = nbr_p // S                                 # (K, n_pad)
    row_owner = np.arange(n_pad, dtype=nbr.dtype) // S

    remote = owner_of != row_owner[None, :]
    send_lists = []
    for q in range(n_devices):
        need = np.unique(nbr_p[remote & (owner_of == q)])
        send_lists.append(need - q * S)                   # local indices
    B = max(8, _round_up(max(len(s) for s in send_lists), 8))
    send_idx = np.zeros((n_devices, B), dtype=np.int32)
    counts = np.zeros(n_devices, dtype=np.int32)
    pool_pos = np.full(n_pad, -1, dtype=np.int64)         # global id -> pool
    for q, s in enumerate(send_lists):
        send_idx[q, : len(s)] = s
        counts[q] = len(s)
        pool_pos[q * S + s] = q * B + np.arange(len(s))

    local = nbr_p - row_owner[None, :] * S
    remapped = np.where(remote, S + pool_pos[nbr_p], local)
    assert (remapped >= 0).all(), "halo remap missed an entry"
    nbr_local = (
        remapped.reshape(K, n_devices, S).transpose(1, 0, 2).astype(np.int32)
    )
    return {
        "n_pad": n_pad, "S": S, "B": B,
        "send_idx": send_idx, "nbr_local": nbr_local, "counts": counts,
    }


def build_halo_pair(ext_col: np.ndarray, n_devices: int, P: int
                    ) -> Dict[str, np.ndarray]:
    """Static halo metadata for the PAIR-block matvec (ops/pairs.py).

    ``ext_col`` (S, npair_t): h-major half columns (h * npair_t + p) of
    the external gather, with pairs already shard-blocked into
    ``n_devices`` contiguous ranges of ``P`` (interleave_pair_maps with
    n_shards > 1).  The exchange unit is a PAIR -- both halves of a
    boundary pair ride one pool entry, so the collective volume is the
    same per-cell volume as the cell halo at half the entry count.

    Returns ``send_idx`` (n_devices, B) local PAIR indices,
    ``ext_local`` (n_devices, S, P): gather columns into the per-shard
    source ``concat([local h-major (nd, 2P), pool (nd, 2 n B)], axis=-1)``
    with pool columns ``2P + 2*(owner*B + rank) + h``."""
    ext_col = np.asarray(ext_col)
    S_, npair_t = ext_col.shape
    assert npair_t == n_devices * P
    pid = ext_col % npair_t
    h = ext_col // npair_t
    owner = pid // P
    row_owner = np.broadcast_to(np.arange(npair_t) // P, pid.shape)
    remote = owner != row_owner
    send_lists = [np.unique(pid[remote & (owner == q)]) - q * P
                  for q in range(n_devices)]
    B = max(8, _round_up(max(len(s) for s in send_lists), 8))
    send_idx = np.zeros((n_devices, B), dtype=np.int32)
    counts = np.zeros(n_devices, dtype=np.int32)
    pool_pos = np.full(npair_t, -1, dtype=np.int64)
    for q, s in enumerate(send_lists):
        send_idx[q, : len(s)] = s
        counts[q] = len(s)
        pool_pos[q * P + s] = q * B + np.arange(len(s))
    local_col = h * P + (pid - row_owner * P)
    remote_col = 2 * P + 2 * pool_pos[pid] + h
    ext_local = np.where(remote, remote_col, local_col)
    assert (ext_local >= 0).all(), "pair halo remap missed an entry"
    ext_local = ext_local.reshape(S_, n_devices, P).transpose(1, 0, 2)
    return {"P": P, "B": B, "send_idx": send_idx,
            "ext_local": ext_local.astype(np.int32), "counts": counts}


def halo_pair_spmv_fn(halo, mesh: DeviceMesh, axis: str = "cells"):
    """Pair-block matvec with explicit halo exchange under shard_map:
    ``mv(arrays, pd, pe, xp) -> y`` for ``pd`` (m?, 2nd, 2nd, npair_t),
    ``pe`` (m?, S, 2nd, nd, npair_t), ``xp`` (m?, 2nd, npair_t), all
    sharded on the trailing pair axis.  See halo_spmv_fn for why the
    metadata travels as arrays."""
    Pp = int(halo["P"])
    arrays = {
        "send_idx": jax.device_put(
            jnp.asarray(halo["send_idx"]), NamedSharding(mesh, P(axis, None))),
        "ext_local": jax.device_put(
            jnp.asarray(halo["ext_local"]),
            NamedSharding(mesh, P(axis, None, None))),
    }

    def body(ext_p, send_p, pd, pe, xp):
        # local shapes: ext_p (1, S, P), send_p (1, B), pd (m, 2nd, 2nd, P),
        # pe (m, S, 2nd, nd, P), xp (m, 2nd, P)
        ext_p, send_p = ext_p[0], send_p[0]
        m, nd2, _ = xp.shape
        nd = nd2 // 2
        y = jnp.einsum("mijp,mjp->mip", pd, xp)
        send = xp[:, :, send_p]                           # (m, 2nd, B)
        pool = jax.lax.all_gather(send, axis, axis=0, tiled=False)
        n, _, _, B = pool.shape
        pool = pool.reshape(n, m, 2, nd, B)
        pool = jnp.transpose(pool, (1, 3, 0, 4, 2)).reshape(m, nd, n * B * 2)
        xv = xp.reshape(m, 2, nd, Pp).transpose(0, 2, 1, 3).reshape(
            m, nd, 2 * Pp)
        xcat = jnp.concatenate([xv, pool], axis=2)
        xe = xcat.at[:, :, ext_p].get(mode="promise_in_bounds")
        return y + jnp.einsum("msijp,mjsp->mip", pe, xe)

    def mv(arrays, pd, pe, xp):
        batched = xp.ndim == 3
        if not batched:
            pd, pe, xp = pd[None], pe[None], xp[None]
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None),
                      P(None, None, None, axis),
                      P(None, None, None, None, axis),
                      P(None, None, axis)),
            out_specs=P(None, None, axis),
        )
        y = f(arrays["ext_local"], arrays["send_idx"], pd, pe, xp)
        return y if batched else y[0]

    return arrays, mv


def halo_spmv_fn(halo, mesh: DeviceMesh, axis: str = "cells"):
    """Return ``(halo_arrays, mv)``: the block-ELL matvec with explicit
    halo exchange under ``shard_map``, called as
    ``mv(halo_arrays, blocks, x) -> y``.

    ``halo_arrays`` holds the device-placed static metadata (send lists +
    remapped neighbor table); it must be passed as an ARGUMENT through
    every jit boundary -- under a multi-process mesh, closing over a
    process-spanning array inside a jitted function is an error (and on
    single-process it would bake multi-MB constants into the program).

    ``blocks`` is (K, nd, nd, n_pad) or batched (m, K, nd, nd, n_pad);
    ``x`` correspondingly (nd, n_pad) or (m, nd, n_pad), both sharded on
    the LAST axis over the mesh axis `axis`.  The gathered rows stack the
    batch and nd axes, so the halo exchange (like the TPU gather itself)
    is paid once for all batched systems."""
    S = int(halo["S"])
    K = int(halo["nbr_local"].shape[1])
    halo_arrays = {
        "send_idx": jax.device_put(
            jnp.asarray(halo["send_idx"]), NamedSharding(mesh, P(axis, None))),
        "nbr_local": jax.device_put(
            jnp.asarray(halo["nbr_local"]),
            NamedSharding(mesh, P(axis, None, None))),
    }

    def body(nbr_p, send_p, blocks, x):
        # per-shard shapes: nbr_p (1, K, S), send_p (1, B),
        # blocks (m, K, nd, nd, S), x (m, nd, S)
        nbr_p, send_p = nbr_p[0], send_p[0]
        m, nd, _ = x.shape
        xf = x.reshape(m * nd, S)
        send = xf.at[:, send_p].get(mode="promise_in_bounds")   # (rows, B)
        pool = jax.lax.all_gather(send, axis, axis=0, tiled=False)
        pool = jnp.moveaxis(pool, 0, 1).reshape(m * nd, -1)
        xcat = jnp.concatenate([xf, pool], axis=1)
        xg = xcat.at[:, nbr_p[1:]].get(mode="promise_in_bounds")
        xg = xg.reshape(m, nd, K - 1, S)
        y = jnp.einsum("mijc,mjc->mic", blocks[:, 0], x)
        return y + jnp.einsum("mkijc,mjkc->mic", blocks[:, 1:], xg)

    def mv(arrays, blocks, x):
        batched = x.ndim == 3
        if not batched:
            blocks, x = blocks[None], x[None]
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None),
                      P(None, None, None, None, axis), P(None, None, axis)),
            out_specs=P(None, None, axis),
        )
        y = f(arrays["nbr_local"], arrays["send_idx"], blocks, x)
        return y if batched else y[0]

    return halo_arrays, mv
