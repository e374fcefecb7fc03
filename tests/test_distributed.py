"""Distributed helpers on the single-process virtual mesh."""
import numpy as np
import pytest


def test_global_gallery_from_local_single_process():
    import jax
    from msu_latentafis_tpu.parallel.mesh import make_mesh
    from msu_latentafis_tpu.parallel.distributed import (
        global_gallery_from_local, initialize_multihost)
    initialize_multihost()          # no-op single process
    mesh = make_mesh()
    local = {"a": np.arange(16, dtype=np.float32).reshape(16, 1),
             "b": np.ones((16, 4), np.float32)}
    out = global_gallery_from_local(local, mesh)
    assert out["a"].shape == (16, 1)
    np.testing.assert_allclose(np.asarray(out["a"]), local["a"])
    # sharded along the gallery axis over 8 devices
    assert len(out["a"].sharding.device_set) == 8
