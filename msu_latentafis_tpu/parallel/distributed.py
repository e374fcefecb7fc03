"""Multi-host runtime initialization and gallery distribution.

The reference has no distributed runtime (inter-stage transport is the
filesystem — SURVEY.md §2.4); the TPU-native equivalent initializes
jax.distributed across hosts, builds a global mesh, and assembles
host-local gallery shards into one global sharded array so a 1M-template
gallery spans a pod slice with collectives over ICI/DCN.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when single
    process."""
    n = num_processes if num_processes is not None else int(
        os.environ.get("AFIS_NUM_PROCESSES", "1"))
    if n <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ["AFIS_COORDINATOR"],
        num_processes=n,
        process_id=process_id if process_id is not None else int(
            os.environ["AFIS_PROCESS_ID"]))


def global_gallery_from_local(local_arrays: dict, mesh,
                              axis: str = "gallery") -> dict:
    """Assemble per-host gallery shards into globally sharded arrays.

    Each process passes its host-local shard of every gallery plane (equal
    shapes across processes); the result is one logical array per plane,
    sharded along the gallery axis across all devices, ready for
    parallel.match_sharded.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = {}
    n_proc = jax.process_count()
    for k, local in local_arrays.items():
        global_shape = (local.shape[0] * n_proc,) + local.shape[1:]
        sharding = NamedSharding(mesh, P(axis))
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(local), global_shape)
    return out
