#!/usr/bin/env python3
"""Does the fixed 1e-5 coarse ridge cap GENUINE coarse modes at large
chunk counts?  (VERDICT r4 item 1 / ROADMAP round-5 item 2.)

Direct offline measurement, no TPU needed: build the EMI two-level
coarse matrix As (equilibrated, ridge=0, f64 end-to-end) at increasing
chunk counts with identical physics and print the bottom of the
spectrum against the 1e-5 shift.

Interpretation:
  * smallest nonzero eigenvalues >> 1e-5 at both sizes  -> the ridge is
    innocent; the 995k blowup is deflation-budget (bury the hypothesis);
  * eigenvalues migrating below/near 1e-5 as chunks grow -> the ridge
    caps exactly the modes the coarse exists to treat; fix = f64 host
    coarse factorization with a ~1e-7 ridge + the NaN ladder.

MEASURED (2026-08-19, this image): exactly 5 modes < 1e-5 at every
size -- the compartment constants (4e-7..9e-7 at 972 chunks, shrinking
to 9e-8..3.9e-7 at 1,944), which exact compartment deflation already
removes; the smallest GENUINE modes are 1.1e-3..3.8e-3, two orders
above the ridge, shrinking only ~2x per chunk doubling.  Hypothesis
BURIED -- see ROADMAP round-5 item 2.

Run anywhere (CPU):  python tools/exp_coarse_spectrum.py [sizes ...]
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import bench

SIZES = {
    # name -> (box_3d_axons args, agg_size)
    "62k/agg64": ((1, 1), 64),    # 972 chunks
    "124k/agg64": ((1, 2), 64),   # 1,944 chunks
    "62k/agg32": ((1, 1), 32),    # 1,944 chunks at the SMALL mesh: splits
    #              chunk-count from mesh-resolution effects
}


def spectrum(name):
    (res, lf), agg = SIZES[name]
    from knpemidg_tpu.mesh.generators import box_3d_axons

    t0 = time.perf_counter()
    mesh = box_3d_axons(res, length_factor=lf)
    mesh.vertices *= 1e2
    S, sp = bench.build(mesh=mesh, dtype=jnp.float64)
    sp = dataclasses.replace(sp, coarse_ridge=0.0, emi_ritz=0, agg_size=agg)
    state = S.attach_pc(S._initial_state(0.0), sp)
    As = np.asarray(state["pc"]["emi"]["As"], dtype=np.float64)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    w = np.linalg.eigvalsh(As)
    t_eig = time.perf_counter() - t0
    n_cap = int((w < 1e-5).sum())
    print(f"{name:12s}: {len(mesh.cells):>7d} tets, n_agg={As.shape[0]:>5d}  "
          f"eig[0:8]={np.array2string(w[:8], precision=2)}  "
          f"lam_max={w[-1]:.3f}  modes<1e-5: {n_cap}  "
          f"(build {t_build:.0f} s, eig {t_eig:.0f} s)", flush=True)
    return w


def main():
    names = sys.argv[1:] or list(SIZES)
    for n in names:
        spectrum(n)


if __name__ == "__main__":
    main()
