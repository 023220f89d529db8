"""Multi-host initialization and cross-host utilities.

TPU-native replacement for the reference's cluster plumbing (SURVEY §2.10):
``train.sh``'s MASTER_ADDR/NODE_RANK/NCCL-IB env dance and the
``BDEnvironment`` cluster plugin (``src/plugins/bd_env.py:9-70``) collapse to
``jax.distributed.initialize()`` — on TPU pods the coordinator and process
ids come from the platform. ``barrier``/``process_allgather`` replace
``trainer.strategy.barrier()`` and ``pl_module.all_gather``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize multi-host JAX.

    On real TPU pods all arguments auto-detect. For CPU/GPU clusters, the env
    vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID act as
    the MASTER_ADDR / NNODES / NODE_RANK equivalents.
    """
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process run


def barrier(name: str = "barrier"):
    """Cross-host sync (reference trainer.strategy.barrier())."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_allgather(x):
    """Gather host-local arrays across processes (SaveImagesHook all_gather)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))
