"""Banded one-hot MXU gather: can the 2.4 ns/index gather floor be beaten?

The pair-layout Krylov matvec (ops/pairs.pair_matvec) spends ~all of its
0.86 ms in one per-index gather of S*npair ~ 382k indices.  Morton pair
ordering makes most external columns LOCAL: if, for each 128-pair output
block and slot, the gathered pids fit a static window [start, start+W),
the gather can be reformulated as

  (a) S*nblocks contiguous slice-gathers of (nd, 2, W) windows   (cheap:
      ~3k slice indices instead of 382k element indices), plus
  (b) a block-batched matmul against a PRECOMPUTED one-hot
      O (S*nblocks, 2W, 128) bf16 -- MXU work, HBM cost = sizeof(O), plus
  (c) a tiny per-index fix-up gather+scatter for out-of-band exceptions.

Phase 1 (host): window-fit statistics on the real EMIx ext_col for
W in {32..512}.  Phase 2 (device): exact-parity banded matvec vs
pair_matvec / pair_matvec_multi, timed.

Run: python tools/exp_onehot_gather.py  (TPU default platform).

RESULT (v5e, 121,617-tet EMIx pair layout, round 4): **BURIED**.
  - The band does not exist: per-(slot, 128-pair-block) median-anchored
    windows leave 82% of indices out-of-band at W=32 and still 22.65%
    at W=512 (whose one-hot would be 783 MB).  The fixed (h, l) external
    slot scan order spreads each slot's columns across arbitrary
    neighbor directions, and unstructured-tet Morton adjacency has a
    long tail -- locality is nowhere near lane-tile tight.
  - Even ignoring exceptions, the mechanics lose: banded matvec measures
    13.4 ms (W=64) / 8.8 ms (W=128) vs 2.6/1.7 ms for the plain gather
    form (same tunnel-noise envelope as the 0.86 ms trace figure) --
    the S*nblocks ~ 3k batch of (4 x 2W) @ (2W x 128) matmuls is
    MXU-setup/latency bound, and the one-hot HBM traffic (98-196 MB)
    exceeds the entire gather's cost by itself.  Exact parity (rel err
    0.0) confirms the formulation; the economics are unfixable.
    Measurement caveat: the one-hot is STORED bf16 but banded_ext_gather
    casts it to the vector dtype (f32) before dot_general, so the timed
    contractions ran in f32 -- somewhat pessimistic for a true-bf16 MXU
    path, but the independent no-band finding (22.65% exceptions at
    W=512) buries the idea regardless of contraction dtype.
The 2.4 ns/index XLA gather stands as the floor in this image (with
Mosaic lane-gather lowering dead, ROADMAP round-2/3 notes).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax
import jax.numpy as jnp

B = 128          # output block = one lane tile of pairs


def window_stats(pm):
    """Per-(slot, block) window fit of ext_col pids; returns starts and
    exception masks for a chosen W plus a printed W-sweep."""
    ext_col = np.asarray(pm["ext_col"])          # (S, npair), col = pos*npair + pid
    S, npair = ext_col.shape
    pid = ext_col % npair
    nblocks = (npair + B - 1) // B
    pad = nblocks * B - npair
    if pad:
        pid = np.concatenate([pid, np.repeat(pid[:, -1:], pad, axis=1)], axis=1)
    pidb = pid.reshape(S, nblocks, B)
    total = S * npair
    print(f"S={S} npair={npair} nblocks={nblocks} total idx={total}")
    results = {}
    for W in (32, 64, 128, 256, 512):
        # best static start per tile: median-anchored then clamped
        med = np.median(pidb, axis=2).astype(np.int64)
        start = np.clip(med - W // 2, 0, max(npair - W, 0))
        rel = pidb - start[:, :, None]
        inband = (rel >= 0) & (rel < W)
        # count only real lanes: pad lanes duplicate the last column's pid
        # and can themselves be in-band, so a blanket pad*S subtraction
        # understates (and can sign-flip) the exception count
        exc = int((~inband.reshape(S, nblocks * B)[:, :npair]).sum())
        results[W] = (start, inband)
        ohot_mb = S * nblocks * 2 * W * B * 2 / 1e6
        print(f"W={W:4d}: exceptions {exc:7d} ({100*exc/total:5.2f}%)  "
              f"one-hot bf16 {ohot_mb:7.1f} MB")
    return results


def build_banded(pm, W, dtype=jnp.float32):
    """Static arrays for the banded gather at width W."""
    ext_col = np.asarray(pm["ext_col"])
    S, npair = ext_col.shape
    pos = (ext_col // npair).astype(np.int64)
    pid = (ext_col % npair).astype(np.int64)
    nblocks = (npair + B - 1) // B
    pad = nblocks * B - npair
    pid_p = np.concatenate([pid, np.zeros((S, pad), np.int64)], axis=1) if pad else pid
    pos_p = np.concatenate([pos, np.zeros((S, pad), np.int64)], axis=1) if pad else pos
    pidb = pid_p.reshape(S, nblocks, B)
    posb = pos_p.reshape(S, nblocks, B)
    med = np.median(pidb, axis=2).astype(np.int64)
    start = np.clip(med - W // 2, 0, max(npair - W, 0))
    rel = pidb - start[:, :, None]
    inband = (rel >= 0) & (rel < W)
    if pad:
        inband.reshape(S, nblocks * B)[:, npair:] = False   # pad lanes: no write
    # one-hot (S*nblocks, 2W, B): window axis v = pos*W + rel
    v = (posb * W + np.clip(rel, 0, W - 1)).reshape(S * nblocks, B)
    O = np.zeros((S * nblocks, 2 * W, B), dtype=np.float32)
    bb, ll = np.meshgrid(np.arange(S * nblocks), np.arange(B), indexing="ij")
    m = inband.reshape(S * nblocks, B)
    O[bb[m], v[m], ll[m]] = 1.0
    # exceptions: flat output position (s*npair + p) and source column
    es, eb, el = np.nonzero(~inband)
    p_out = eb * B + el
    keep = p_out < npair
    es, p_out = es[keep], p_out[keep]
    exc_dst = (es * npair + p_out).astype(np.int32)
    exc_src = ext_col[es, p_out].astype(np.int32)
    n_exc = len(exc_dst)
    # pad exceptions to a lane multiple with self-consistent dummies
    padn = (-n_exc) % B or 0
    if padn:
        exc_dst = np.concatenate([exc_dst, np.zeros(padn, np.int32)])
        exc_src = np.concatenate([exc_src, np.full(padn, ext_col[0, 0], np.int32)])
        # dummy writes land on dst 0 repeatedly with the TRUE value of dst 0
        exc_src[n_exc:] = ext_col[0, 0]
        exc_dst[n_exc:] = 0
    return dict(
        S=S, npair=npair, nblocks=nblocks, W=W, n_exc=n_exc,
        start=jnp.asarray(start.astype(np.int32).reshape(S * nblocks, 1)),
        O=jnp.asarray(O, dtype=jnp.bfloat16),
        exc_dst=jnp.asarray(exc_dst), exc_src=jnp.asarray(exc_src),
    )


def banded_ext_gather(bd, xv2):
    """xv2 (R, 2, npair) -> xe (R, S, npair) == xv.at[:, ext_col].get().

    R = payload rows (nd for single, m*nd for the batched KNP matvec)."""
    R = xv2.shape[0]
    S, npair, nblocks, W = bd["S"], bd["npair"], bd["nblocks"], bd["W"]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(2,), operand_batching_dims=(),
        start_indices_batching_dims=())
    Xw = jax.lax.gather(xv2, bd["start"], dn, (R, 2, W),
                        mode=jax.lax.GatherScatterMode.CLIP)  # (S*nb, R, 2, W)
    Xw = Xw.reshape(S * nblocks, R, 2 * W)
    xe = jax.lax.dot_general(
        Xw, bd["O"].astype(xv2.dtype), (((2,), (1,)), ((0,), (0,))))
    # (S*nb, R, B) -> (R, S, npair)
    xe = jnp.moveaxis(xe, 1, 0).reshape(R, S, nblocks * B)[:, :, :npair]
    if bd["n_exc"]:
        vals = xv2.reshape(R, -1)[:, bd["exc_src"]]
        xef = xe.reshape(R, S * npair)
        xef = xef.at[:, bd["exc_dst"]].set(vals, mode="promise_in_bounds",
                                           unique_indices=False)
        xe = xef.reshape(R, S, npair)
    return xe


def pair_matvec_banded(pd, pe, bd, xp):
    nd = pe.shape[2]
    y = jnp.einsum("ijp,jp->ip", pd, xp)
    xv2 = jnp.stack([xp[:nd], xp[nd:]], axis=1)          # (nd, 2, npair)
    xe = banded_ext_gather(bd, xv2)
    return y + jnp.einsum("sijp,jsp->ip", pe, xe)


def pair_matvec_multi_banded(pd, pe, bd, xp):
    m, nd2, npair = xp.shape
    nd = nd2 // 2
    y = jnp.einsum("mijp,mjp->mip", pd, xp)
    xv2 = jnp.stack([xp[:, :nd], xp[:, nd:]], axis=2).reshape(m * nd, 2, npair)
    xe = banded_ext_gather(bd, xv2).reshape(m, nd, pe.shape[1], npair)
    return y + jnp.einsum("msijp,mjsp->mip", pe, xe)


def timeit(fn, *args, reps=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    S_, sp = bench.build(pair=True)
    pm = S_.pairs_host
    print("== phase 1: window-fit statistics ==")
    window_stats(pm)

    from knpemidg_tpu.ops import pairs as P
    # random operator blocks with the TRUE pair maps: gather timing and
    # parity only depend on the maps, not on the assembled values
    key = jax.random.PRNGKey(0)
    pmd = S_.pairs
    npair_ = int(np.asarray(pm["ext_col"]).shape[1])
    nd = S_.nd
    Sslots = int(np.asarray(pm["ext_col"]).shape[0])
    pd = jax.random.normal(key, (2 * nd, 2 * nd, npair_), jnp.float32)
    pe = jax.random.normal(key, (Sslots, 2 * nd, nd, npair_), jnp.float32)
    npair = pe.shape[-1]
    xp = jax.random.normal(key, (2 * nd, npair), jnp.float32)

    base = jax.jit(lambda a, b, x: P.pair_matvec(a, b, pmd, x))
    y0 = base(pd, pe, xp)
    print("\n== phase 2: parity + timing ==")
    for W in (64, 128, 256):
        bd = build_banded(pm, W)
        band = jax.jit(lambda a, b, x, bd=bd: pair_matvec_banded(a, b, bd, x))
        y1 = band(pd, pe, xp)
        err = float(jnp.max(jnp.abs(y1 - y0)) / (jnp.max(jnp.abs(y0)) + 1e-30))
        t_base = timeit(base, pd, pe, xp)
        t_band = timeit(band, pd, pe, xp)
        print(f"W={W:4d}: exc={bd['n_exc']:6d}  rel err {err:.2e}  "
              f"base {t_base:7.3f} ms  banded {t_band:7.3f} ms  "
              f"({100*(t_band/t_base-1):+.1f}%)")

    # batched (KNP-shaped) variant: m=2 systems
    m = 2
    pdm = jnp.stack([pd, pd * 0.5])
    pem = jnp.stack([pe, pe * 0.5])
    xpm = jax.random.normal(key, (m, 2 * nd, npair), jnp.float32)
    basem = jax.jit(lambda a, b, x: P.pair_matvec_multi(a, b, pmd, x))
    y0m = basem(pdm, pem, xpm)
    for W in (64, 128, 256):
        bd = build_banded(pm, W)
        bandm = jax.jit(lambda a, b, x, bd=bd: pair_matvec_multi_banded(a, b, bd, x))
        y1m = bandm(pdm, pem, xpm)
        err = float(jnp.max(jnp.abs(y1m - y0m)) / (jnp.max(jnp.abs(y0m)) + 1e-30))
        t_base = timeit(basem, pdm, pem, xpm)
        t_band = timeit(bandm, pdm, pem, xpm)
        print(f"multi W={W:4d}: rel err {err:.2e}  base {t_base:7.3f} ms  "
              f"banded {t_band:7.3f} ms  ({100*(t_band/t_base-1):+.1f}%)")


if __name__ == "__main__":
    main()
