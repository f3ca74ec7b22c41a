#!/usr/bin/env python3
"""Long-horizon trajectory trust at f32 (VERDICT r4 item 6).

The pair-vs-cell solution deviation at production tolerance is 5.4e-3
(ROADMAP item 10), explained as phi_M/HH knife-edge trajectory spread.
This quantifies the spread that matters physically: a 100-step 3D
axon-bundle run (one stimulated HH axon, an AP fires and propagates)
comparing

  (a) f32 at production tolerances (rtol 1e-5 EMI / 1e-7 KNP) -- the
      TPU production configuration, and
  (b) f64 at tight tolerances (rtol 1e-9 / 1e-10) -- the trusted
      trajectory,

on the observables the splitting paper's trajectory claims rest on
(Ellingsrud et al. SISC 2025, SURVEY.md section 0): AP threshold-crossing
times at two membrane sites (conduction timing), peak phi_M, and per-ion
TOTAL MASS conservation (the DG membrane coupling is antisymmetric, so
sum_cells vol*mean(c_k) must be constant up to solver tolerance; the
eliminated ion inherits it through electroneutrality).

Each leg runs in a subprocess (the f64 leg needs x64, which must be set
before jax initializes; the f32 leg runs on whatever platform is default).

Run: python tools/exp_f32_trust.py [n_steps=100]
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def leg(dtype: str, n_steps: int, out_json: str, platform: str | None):
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    cmd = [sys.executable, os.path.abspath(__file__), "worker", dtype,
           str(n_steps), out_json]
    rc = subprocess.run(cmd, env=env).returncode
    if rc != 0:
        raise RuntimeError(f"{dtype} leg rc={rc}")
    with open(out_json) as f:
        return json.load(f)


def run_worker(dtype: str, n_steps: int, out_json: str):
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "examples"))
    import jax

    if dtype == "f64":
        # must precede any jax array op; the sitecustomize TPU platform has
        # no x64, so the f64 leg forces CPU
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif os.environ.get("JAX_PLATFORMS"):
        # the image's sitecustomize overrides the env var at interpreter
        # start (ROADMAP item 11) -- honor an explicit request here
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import numpy as np

    from knpemidg_tpu.config import SolverParams
    from knpemidg_tpu.utils.trust import trajectory_metrics
    from run_3D import build_solver

    if dtype == "f64":
        S = build_solver(resolution=0, length_factor=1, dtype="float64")
        sp = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-9, atol_emi=1e-40,
                          rtol_knp=1e-10, atol_knp=1e-40,
                          max_it_emi=2000, max_it_knp=2000,
                          gmres_restart=30)
    else:
        S = build_solver(resolution=0, length_factor=1)
        sp = SolverParams(direct_emi=False, direct_knp=False,
                          rtol_emi=1e-5, atol_emi=1e-40,
                          rtol_knp=1e-7, atol_knp=2e-40,
                          max_it_emi=1000, max_it_knp=1000,
                          gmres_restart=30)

    m = trajectory_metrics(S, sp, n_steps)
    m["dtype"] = dtype
    with open(out_json, "w") as f:
        json.dump(m, f)
    print(f"{dtype}: {json.dumps(m)}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    a = leg("f32", n_steps, "/tmp/trust_f32.json", None)
    b = leg("f64", n_steps, "/tmp/trust_f64.json", "cpu")
    dt_ms = a["dt"] * (1e3 if a["dt"] < 1e-2 else 1.0)
    print("\n=== f32 production vs f64 tight, "
          f"{n_steps} steps (dt {a['dt']:g}) ===")
    for site in ("t_ap_near", "t_ap_far"):
        d = abs(a[site] - b[site])
        print(f"{site}: f32 {a[site]:.6g}  f64 {b[site]:.6g}  "
              f"|diff| = {d:.3g} ({d / a['dt']:.2f} dt)")
    print(f"peak phi_M: f32 {a['peak_phi_M']:.6g}  f64 {b['peak_phi_M']:.6g}"
          f"  |diff| = {abs(a['peak_phi_M'] - b['peak_phi_M']):.3g}")
    for k in a["mass_drift"]:
        print(f"mass drift {k}: f32 {a['mass_drift'][k]:.3e}  "
              f"f64 {b['mass_drift'][k]:.3e}")
    _ = dt_ms


if __name__ == "__main__":
    main()
