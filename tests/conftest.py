"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Verification (MMS convergence, ODE trajectories) needs f64; production TPU
runs use f32/bf16.  The 8 virtual CPU devices let sharding tests exercise the
multi-chip path without hardware (see __graft_entry__.dryrun_multichip).

Note: the environment's sitecustomize registers the remote TPU ('axon')
platform and forces JAX_PLATFORMS at interpreter start, so plain env vars in
this file are too late -- override the jax config directly instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
