"""Multi-host (multi-process) execution over DCN via jax.distributed.

The reference runs MPI across nodes (environment.yml:12, mpich; ghost
modes src/knpemidg/solver.py:16).  The TPU-native equivalent is a
process-spanning ``jax.sharding.Mesh``: every process calls
:func:`initialize`, builds the SAME solver (mesh construction is
deterministic), and shards it with :func:`knpemidg_tpu.parallel.sharding.
shard_solver` over :func:`global_mesh` -- the halo matvec's ``all_gather``
then rides ICI within a host's devices and DCN between hosts, inserted by
the compiler from the same shard_map program.  Host-side orchestration is
SPMD: all processes step identically; replicated scalars (iteration
counts, convergence flags) are addressable everywhere, while sharded
fields must be pulled through :func:`allgather`.

On real TPU pods, ``jax.distributed.initialize()`` picks up the cluster
environment automatically; the explicit coordinator form below is for CPU
dryruns (2 processes x N virtual devices, Gloo collectives) and manual
clusters.
"""
from __future__ import annotations

import numpy as np
import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Join the process-spanning runtime (jax.distributed).

    With no arguments, defers to the cluster auto-detection (TPU pods).
    Returns (process_id, num_processes)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "cells"):
    """1-D device mesh over ALL global devices (every process's chips)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def allgather(tree, tiled: bool = True):
    """Pull a (possibly sharded) pytree to every host as numpy arrays."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=tiled)


def is_primary() -> bool:
    return jax.process_index() == 0
