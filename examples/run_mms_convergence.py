#!/usr/bin/env python3
"""Full MMS convergence studies (reference: tests/run_MMS_space.py over
resolutions 2..7 and tests/run_MMS_time.py over 7 dt halvings).

The pytest gates (tests/test_mms_*.py) assert rates on a subset; this
script prints the complete tables like the reference drivers.  Run on CPU
with float64:

    python examples/run_mms_convergence.py space
    python examples/run_mms_convergence.py time
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

GREEN = "\033[1;37;32m%s\033[0m"


def space(resolutions=range(2, 8)):
    from test_mms_space import run_resolution

    hs, errors = [], []
    for r in resolutions:
        h, e = run_resolution(r)
        hs.append(h)
        errors.append(e)
        line = f"res {r} (h={h:.4e}): " + "  ".join(
            f"|{k}|_0={v:.4e}" for k, v in e.items()
        )
        print(GREEN % line)
    for key in ("a", "b", "c", "phi"):
        es = np.array([e[key] for e in errors])
        rates = np.log(es[1:] / es[:-1]) / np.log(np.array(hs[1:]) / np.array(hs[:-1]))
        print(f"{key}: errors {es}")
        print(f"{key}: rates  {rates}")


def time_study(n_halvings=7, resolution=5):
    from test_mms_time import run_dt
    from knpemidg_tpu.mesh.generators import mms_square

    mesh = mms_square(resolution)
    dts = [1e-2 / 2**i for i in range(1, n_halvings + 1)]
    errors = []
    for dt in dts:
        e = run_dt(mesh, dt)
        errors.append(e)
        print(GREEN % (f"dt={dt:.3e}: " + "  ".join(
            f"|{k}|_0={v:.4e}" for k, v in e.items())))
    for key in ("a", "b", "c", "phi"):
        es = np.array([e[key] for e in errors])
        rates = np.log(es[1:] / es[:-1]) / np.log(np.array(dts[1:]) / np.array(dts[:-1]))
        print(f"{key}: errors {es}")
        print(f"{key}: rates  {rates}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "space"
    (space if which == "space" else time_study)()
