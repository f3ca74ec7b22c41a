#!/usr/bin/env python3
"""Prototype: cell-PAIR blocked matvec on the real EMIx EMI operator.

TPU gather cost is per-index (~2.4 ns); the block-ELL matvec pays
(K-1)*nc = 486k indices = ~1.17 ms.  Pairing adjacent cells (greedy
matching along the Morton order) folds the paired coupling into the
diagonal block and leaves <= 6 EXTERNAL cell-neighbor slots per pair =
3 indices/cell instead of 4 -- a 25% index cut, with blocks stored as
(slot, 8, 4, npairs) so no zero-padding bandwidth is wasted.

Measures: pairing quality (external slot count), matvec parity vs
bell_matvec, and the timed cost of both (slope between chained-apply
counts inside one jit).
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def build_pairing(nbr):
    """Greedy matching: pair each unmatched cell with its first unmatched
    facet-neighbor (Morton order keeps pairs local).  Returns pair id per
    cell (-1 = unpaired -> becomes a singleton pair)."""
    K, nc = nbr.shape
    mate = np.full(nc, -1, dtype=np.int64)
    for c in range(nc):
        if mate[c] >= 0:
            continue
        for k in range(1, K):
            nb = nbr[k, c]
            if nb != c and mate[nb] < 0 and nb != c:
                mate[c] = nb
                mate[nb] = c
                break
    pairs = []
    pid = np.full(nc, -1, dtype=np.int64)
    pos = np.zeros(nc, dtype=np.int64)          # 0 or 1 within pair
    for c in range(nc):
        if pid[c] >= 0:
            continue
        m = mate[c]
        if m >= 0 and pid[m] < 0:
            pid[c] = pid[m] = len(pairs)
            pos[c], pos[m] = 0, 1
            pairs.append((c, m))
        else:
            pid[c] = len(pairs)
            pos[c] = 0
            pairs.append((c, c))                # singleton (duplicated)
    return np.array(pairs), pid, pos


def main():
    from run_EMIx_simulation import build_solver, DEFAULT_MESH
    from knpemidg_tpu.mesh.io import load_emix_mesh
    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.ops.spmv import bell_matvec

    mesh = load_emix_mesh(DEFAULT_MESH)
    S = build_solver(mesh=mesh)
    state = S._initial_state(0.0)
    pads = S._pads(state)
    asm = S._jit(("asm_emi", True), S._assemble_emi)
    blocks, rhs, Pd = asm(state["c"], state["c_elim"], pads[0], pads[2],
                          state["t"])
    blocks = np.asarray(jax.block_until_ready(blocks))
    nbr = np.asarray(S.g["nbr"])
    K, nd, _, nc = blocks.shape

    pairs, pid, pos = build_pairing(nbr)
    npair = len(pairs)
    matched = int((pairs[:, 0] != pairs[:, 1]).sum())
    print(f"# nc={nc} npairs={npair} matched={matched} "
          f"({100*2*matched/nc:.1f}% of cells)", flush=True)

    # external neighbor slots per pair
    ext_sets = []
    max_ext = 0
    for (a, b) in pairs:
        ext = []
        for c in (a, b) if a != b else (a,):
            for k in range(1, K):
                nb = nbr[k, c]
                if nb != a and nb != b and nb != c:
                    ext.append((c, int(nb)))
        ext_sets.append(ext)
        max_ext = max(max_ext, len(ext))
    n_idx = sum(len(e) for e in ext_sets)
    print(f"# external slots: max {max_ext}, total indices {n_idx} "
          f"(vs {(K-1)*nc} block-ELL; {100*n_idx/((K-1)*nc):.0f}%)",
          flush=True)

    # paired tensors: diag (2nd, 2nd, npair); ext blocks (S, 2nd, nd, npair)
    Smax = max_ext
    diag = np.zeros((2 * nd, 2 * nd, npair), dtype=np.float32)
    ext_blocks = np.zeros((Smax, 2 * nd, nd, npair), dtype=np.float32)
    ext_idx = np.zeros((Smax, npair), dtype=np.int32)

    # helper: find the block of (row_cell -> col_cell) in block-ELL
    def find_block(rc, cc):
        for k in range(K):
            if nbr[k, rc] == cc:
                return blocks[k, :, :, rc]
        return None

    for p, (a, b) in enumerate(pairs):
        cells = (a, b)
        for i, rc in enumerate(cells):
            d = blocks[0, :, :, rc]
            diag[i * nd:(i + 1) * nd, i * nd:(i + 1) * nd, p] += d if not (
                a == b and i == 1) else 0.0
        if a != b:
            ab = find_block(a, b)
            ba = find_block(b, a)
            if ab is not None:
                diag[0:nd, nd:2 * nd, p] = ab
            if ba is not None:
                diag[nd:2 * nd, 0:nd, p] = ba
        for s, (rc, cc) in enumerate(ext_sets[p]):
            row = 0 if rc == a else 1
            blk = find_block(rc, cc)
            ext_blocks[s, row * nd:(row + 1) * nd, :, p] = blk
            ext_idx[s, p] = cc
        for s in range(len(ext_sets[p]), Smax):
            ext_idx[s, p] = pairs[p][0]         # self-index, zero block

    cell_of = np.zeros((2, npair), dtype=np.int32)
    cell_of[0] = pairs[:, 0]
    cell_of[1] = pairs[:, 1]

    dgj = jnp.asarray(diag)
    ebj = jnp.asarray(ext_blocks)
    eij = jnp.asarray(ext_idx)
    coj = jnp.asarray(cell_of)
    singles = jnp.asarray((pairs[:, 0] == pairs[:, 1]).astype(np.float32))

    def pair_matvec(x):
        # x (nd, nc) cells layout -> xp (2nd, npair)
        xg = x[:, coj.reshape(-1)].reshape(nd, 2, npair)
        xp = jnp.concatenate([xg[:, 0], xg[:, 1]], axis=0)       # (2nd, np)
        y = jnp.einsum("ijp,jp->ip", dgj, xp)
        xe = x.at[:, eij].get(mode="promise_in_bounds")          # (nd,S,np)
        y = y + jnp.einsum("sijp,jsp->ip", ebj, xe)
        # scatter halves back to cells: both positions write; singleton's
        # second half is zero-blocked
        y0, y1 = y[:nd], y[nd:]
        out = jnp.zeros_like(x)
        out = out.at[:, coj[0]].add(y0)
        out = out.at[:, coj[1]].add(y1 * (1.0 - singles)[None, :])
        return out

    x = jnp.asarray(np.asarray(rhs))
    y_ref = bell_matvec(jnp.asarray(blocks), jnp.asarray(nbr), x)
    y_new = jax.jit(pair_matvec)(x)
    err = float(jnp.abs(y_new - y_ref).max() / jnp.abs(y_ref).max())
    print(f"# parity max rel err: {err:.2e}", flush=True)

    def timed(name, fn, reps=60):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, reps, lambda i, u: fn(u) * 1e-3, v)
        r = loop(x); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter(); r = loop(x)
        float(np.asarray(r).ravel()[0])
        t1 = (time.perf_counter() - t0)
        @jax.jit
        def loop2(v):
            return jax.lax.fori_loop(0, reps * 3, lambda i, u: fn(u) * 1e-3, v)
        r = loop2(x); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter(); r = loop2(x)
        float(np.asarray(r).ravel()[0])
        t2 = (time.perf_counter() - t0)
        per = (t2 - t1) / (2 * reps)
        print(f"{name:28s} {per*1e3:7.3f} ms/apply", flush=True)

    nbrj = jnp.asarray(nbr)
    bj = jnp.asarray(blocks)
    timed("bell_matvec (K=5, cells)", lambda v: bell_matvec(bj, nbrj, v))
    timed("pair matvec (prototype)", pair_matvec)

    # ---- NATIVE pair layout (VERDICT r3 item 3): the Krylov vector LIVES
    # as (2nd, npair); no cell<->pair conversion per apply.  This measures
    # what a full mesh-build-time relayout would actually pay per matvec.
    # (a) per-slot external gather: same Smax*npair indices as above, but
    #     indices point into the pair axis (column = pid of the ext cell).
    ext_pid = pid[ext_idx]                        # (Smax, npair)
    ext_pos = pos[ext_idx]                        # which half of that pair
    # gather from xp viewed as (nd, 2*npair): column = pos*npair + pid
    ext_col = (ext_pos.astype(np.int64) * npair + ext_pid).astype(np.int32)
    ecj = jnp.asarray(ext_col)

    def pair_matvec_native(xp):                   # (2nd, npair)
        y = jnp.einsum("ijp,jp->ip", dgj, xp)
        xv = jnp.concatenate([xp[:nd], xp[nd:]], axis=1)     # (nd, 2*npair)
        xe = xv.at[:, ecj].get(mode="promise_in_bounds")     # (nd,S,np)
        return y + jnp.einsum("sijp,jsp->ip", ebj, xe)

    # (b) pair-granular dedup: gather each distinct external PAIR once
    #     (both halves ride along -- payload is ~free, indices cost), then
    #     blocks address the (2nd) pair vector directly.
    ext_pairs = [sorted({int(ext_pid[s, p]) for s in range(len(ext_sets[p]))})
                 for p in range(npair)]
    Pmax = max(len(e) for e in ext_pairs)
    n_pair_idx = sum(len(e) for e in ext_pairs)
    print(f"# dedup external PAIR indices: max {Pmax}/pair, total "
          f"{n_pair_idx} (vs {Smax * npair} slot indices)", flush=True)
    ext_qid = np.zeros((Pmax, npair), dtype=np.int32)
    eblk2 = np.zeros((Pmax, 2 * nd, 2 * nd, npair), dtype=np.float32)
    for p, (a, b) in enumerate(pairs):
        lut = {q: j for j, q in enumerate(ext_pairs[p])}
        for q, j in lut.items():
            ext_qid[j, p] = q
        for j in range(len(ext_pairs[p]), Pmax):
            ext_qid[j, p] = p                     # self, zero block
        for s, (rc, cc) in enumerate(ext_sets[p]):
            row = 0 if rc == a else 1
            j = lut[int(pid[cc])]
            col = int(pos[cc])
            blk = find_block(rc, cc)
            eblk2[j, row * nd:(row + 1) * nd, col * nd:(col + 1) * nd, p] = blk
    eqj = jnp.asarray(ext_qid)
    eb2j = jnp.asarray(eblk2)

    def pair_matvec_dedup(xp):                    # (2nd, npair)
        y = jnp.einsum("ijp,jp->ip", dgj, xp)
        xe = xp.at[:, eqj].get(mode="promise_in_bounds")     # (2nd,P,np)
        return y + jnp.einsum("sijp,jsp->ip", eb2j, xe)

    # parity of both native forms (convert once outside the timed loop)
    xg = x[:, coj.reshape(-1)].reshape(nd, 2, npair)
    xp0 = jnp.concatenate([xg[:, 0], xg[:, 1]], axis=0)
    for name, fn in (("native", pair_matvec_native),
                     ("dedup", pair_matvec_dedup)):
        yp = jax.jit(fn)(xp0)
        y0, y1 = yp[:nd], yp[nd:]
        back = jnp.zeros_like(x)
        back = back.at[:, coj[0]].add(y0)
        back = back.at[:, coj[1]].add(y1 * (1.0 - singles)[None, :])
        err = float(jnp.abs(back - y_ref).max() / jnp.abs(y_ref).max())
        print(f"# {name} parity max rel err: {err:.2e}", flush=True)

    def timed_p(name, fn, reps=60):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, reps, lambda i, u: fn(u) * 1e-3, v)
        r = loop(xp0); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter(); r = loop(xp0)
        float(np.asarray(r).ravel()[0])
        t1 = (time.perf_counter() - t0)
        @jax.jit
        def loop2(v):
            return jax.lax.fori_loop(0, reps * 3, lambda i, u: fn(u) * 1e-3, v)
        r = loop2(xp0); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter(); r = loop2(xp0)
        float(np.asarray(r).ravel()[0])
        t2 = (time.perf_counter() - t0)
        per = (t2 - t1) / (2 * reps)
        print(f"{name:28s} {per*1e3:7.3f} ms/apply", flush=True)

    timed_p("pair matvec (native layout)", pair_matvec_native)
    timed_p("pair matvec (native dedup)", pair_matvec_dedup)


if __name__ == "__main__":
    main()
