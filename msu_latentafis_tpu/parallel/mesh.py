"""Device mesh helpers.

The reference's only parallelism is an 8-thread OpenMP loop over the gallery
(/root/reference/matching/matcher.cpp:168, :273). The TPU equivalent is a
1-D (or 2-D for multi-host) device mesh with the gallery sharded along a
``"gallery"`` axis; collectives ride ICI within a slice and DCN across
slices. Latent batches can additionally shard along a ``"latent"`` axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GALLERY_AXIS = "gallery"
LATENT_AXIS = "latent"


def make_mesh(n_gallery: Optional[int] = None, n_latent: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (latent, gallery) mesh; defaults to all devices on the gallery axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_gallery is None:
        n_gallery = len(devices) // n_latent
    assert n_gallery * n_latent == len(devices), \
        f"{n_gallery} x {n_latent} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_latent, n_gallery)
    return Mesh(arr, (LATENT_AXIS, GALLERY_AXIS))


def gallery_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the gallery axis) across the mesh's gallery dimension."""
    return NamedSharding(mesh, P(GALLERY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
