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


def test_gallery_manifest_lifecycle(tmp_path):
    """Manifest build/save/load, drift detection, deterministic sharding,
    and the re-shard recovery plan (SURVEY §5 failure handling)."""
    from msu_latentafis_tpu.parallel import (assign_shard, build_manifest,
                                             load_manifest, reshard_plan,
                                             save_manifest, verify_manifest)
    gal = tmp_path / "gal"
    gal.mkdir()
    for i in range(10):
        (gal / f"t{i:02d}.dat").write_bytes(b"x" * (100 + i))
    m = build_manifest(str(gal))
    assert len(m) == 10 and m.names[0] == "t00"

    p = str(tmp_path / "manifest.json")
    save_manifest(m, p)
    m2 = load_manifest(p)
    assert m2.entries == m.entries

    # full coverage, no overlap, deterministic
    shards = [assign_shard(m, 4, h) for h in range(4)]
    names = [e["name"] for s in shards for e in s]
    assert sorted(names) == sorted(m.names) and len(set(names)) == 10
    assert shards == [assign_shard(m, 4, h) for h in range(4)]

    # drift detection
    (gal / "t03.dat").unlink()
    (gal / "t05.dat").write_bytes(b"y" * 500)
    (gal / "t99.dat").write_bytes(b"z")
    drift = verify_manifest(m)
    assert drift["missing"] == ["t03"]
    assert drift["changed"] == ["t05"]
    assert drift["new"] == ["t99"]

    # host 2 of 4 dies: survivors re-cover everything exactly once
    plan = reshard_plan(m, 4, surviving=[0, 1, 3])
    renames = [e["name"] for s in plan.values() for e in s]
    assert sorted(renames) == sorted(m.names)
