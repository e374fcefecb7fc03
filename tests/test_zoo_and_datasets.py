"""Model zoo forwards, datasets, checkpoint manager."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_zoo_forward_shapes():
    from msu_latentafis_tpu.models.zoo import (ResNet, PreActResNet,
                                               SphereFaceNet, BCNN,
                                               DropoutMLP, StackedHourglass)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 1))
    for cls, kwargs, out in [
        (ResNet, dict(stage_sizes=(1, 1), width=8, num_outputs=16), (2, 16)),
        (PreActResNet, dict(stage_sizes=(1, 1), width=8, num_outputs=16), (2, 16)),
        (SphereFaceNet, dict(widths=(8, 16), embedding_size=32), (2, 32)),
        (BCNN, dict(widths=(4, 8), num_outputs=16), (2, 16)),
        (DropoutMLP, dict(hidden=(32,), num_outputs=16), (2, 16)),
    ]:
        m = cls(**kwargs)
        v = m.init(rng, x, train=False)
        assert m.apply(v, x, train=False).shape == out, cls.__name__

    m = StackedHourglass(n_stacks=1, features=8, num_outputs=12)
    v = m.init(rng, x, train=False)
    assert m.apply(v, x, train=False).shape == (2, 32, 32, 12)


def test_inception_resnet_v1_forward():
    from msu_latentafis_tpu.models.zoo import InceptionResnetV1
    rng = jax.random.PRNGKey(0)
    m = InceptionResnetV1(embedding_size=64, n35=1, n17=1, n8=1)
    x = jnp.zeros((1, 96, 96, 1))
    v = m.init(rng, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 64)


def test_datasets_and_transforms(tmp_path, rng):
    import imageio.v2 as imageio
    from msu_latentafis_tpu.training.datasets import (
        FolderListDataset, FileListDataset, CsvListDataset, FeatArrayDataset,
        TripletDataset, batches, normalize, compose, random_crop)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            imageio.imwrite(str(d / f"{i}.png"),
                            rng.integers(0, 255, (16, 16), np.uint8))
    folder = FolderListDataset(str(tmp_path))
    assert len(folder) == 6
    img, label = folder[0]
    assert img.shape == (16, 16) and label in (0, 1)

    listfile = tmp_path / "list.txt"
    listfile.write_text("a/0.png 0\nb/1.png 1\n")
    fl = FileListDataset(str(listfile), root=str(tmp_path))
    assert len(fl) == 2 and fl[1][1] == 1

    csvfile = tmp_path / "list.csv"
    csvfile.write_text("a/0.png,0\nb/2.png,1\n")
    cl = CsvListDataset(str(csvfile), root=str(tmp_path))
    assert cl[1][1] == 1

    feats = FeatArrayDataset(rng.standard_normal((10, 4)))
    batch = next(batches(feats, 4, rng=rng))
    assert batch.shape == (4, 4)

    import random as pyrandom
    trip = TripletDataset(folder)
    a, p, n = trip.sample(pyrandom.Random(0))
    assert a.shape == p.shape == n.shape

    t = compose(random_crop(rng, 8), normalize)
    assert t(img).shape == (8, 8)


def test_checkpoint_manager(tmp_path):
    from msu_latentafis_tpu.training.checkpoints import CheckpointManager
    from msu_latentafis_tpu.models import CompNet
    m = CompNet()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 192)), train=False)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 6.0)]:
        mgr.save(step, v, metric=metric)
    assert mgr.latest_step() == 4
    blank = jax.tree.map(jnp.zeros_like, v)
    restored = mgr.restore(blank)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    best = mgr.restore_best(blank)   # step 2 still retained
    assert best is not None
