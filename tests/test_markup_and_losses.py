"""Markup converters, loss-zoo additions, ClassPairsDataset, PlainNet."""
import os

import numpy as np
import pytest


def test_parse_markup_text(tmp_path):
    from msu_latentafis_tpu.training.markup import parse_markup
    p = tmp_path / "m.txt"
    p.write_text("# x y ori\n10 20 1.5 extra\n30,40,0.5\nbadline\n")
    m = parse_markup(str(p))
    np.testing.assert_allclose(m, [[10, 20, 1.5], [30, 40, 0.5]])


def test_parse_markup_mat(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    from msu_latentafis_tpu.training.markup import parse_markup
    p = tmp_path / "m.mat"
    arr = np.array([[5.0, 6.0, 0.25, 9.0]])
    scipy_io.savemat(str(p), {"minutiae": arr})
    m = parse_markup(str(p))
    np.testing.assert_allclose(m, arr[:, :3])


def test_rotate_sample_cylinder_consistency():
    """Rotating (img, minutiae) by 90 deg must rotate the rasterized
    cylinder spatially and roll its orientation channels by -90 deg."""
    from msu_latentafis_tpu.training.markup import (build_training_tensor,
                                                    rotate_sample)
    rng = np.random.default_rng(0)
    h, w, num_ori = 32, 48, 12
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    minutiae = np.array([[10.0, 20.0, 2 * np.pi * 3 / 12],
                         [40.0, 5.0, 2 * np.pi * 7 / 12]], np.float32)
    base = build_training_tensor(img, minutiae, num_ori=num_ori)

    img_r, m_r, _ = rotate_sample(img, minutiae, None, 1)
    assert img_r.shape == (w, h)
    rot = build_training_tensor(img_r, m_r, num_ori=num_ori)

    np.testing.assert_allclose(rot[..., 0], np.rot90(img), atol=1e-5)
    # ori' = ori - pi/2 -> channel j of the rotated cylinder holds what
    # channel j+3 held before (num_ori=12 -> pi/2 = 3 channels)
    want = np.roll(np.rot90(base[..., 2:], axes=(0, 1)), -3, axis=2)
    np.testing.assert_allclose(rot[..., 2:], want, atol=1e-4)


def test_convert_markup_dataset(tmp_path):
    imageio = pytest.importorskip("imageio.v2")
    from msu_latentafis_tpu.training.markup import convert_markup_dataset
    img = (np.random.default_rng(0).uniform(0, 255, (40, 40))
           .astype(np.uint8))
    ip = tmp_path / "a.png"
    imageio.imwrite(str(ip), img)
    mp = tmp_path / "a.txt"
    mp.write_text("12 18 0.4\n")
    out = convert_markup_dataset([(str(ip), str(mp))], str(tmp_path / "o"),
                                 rotate_augment=True)
    assert len(out) == 4
    t = np.load(out[0])
    assert t.shape == (40, 40, 14)
    # resume-by-skip: second run rewrites nothing but returns same list
    again = convert_markup_dataset([(str(ip), str(mp))],
                                   str(tmp_path / "o"), rotate_augment=True)
    assert again == out


def test_new_losses_shapes_and_sanity():
    import jax.numpy as jnp
    from msu_latentafis_tpu.training.losses import (batch_hard_pair_l2norm,
                                                    l2norm_pair_loss,
                                                    regression_loss,
                                                    uncertainty_loss)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(8, 192)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(8, 192)), jnp.float32)
    y1 = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
    y2 = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
    assert float(l2norm_pair_loss(x1, x2, x1[:, :96], x2[:, :96])) >= 0
    # perfectly distance-preserving map -> zero loss
    assert float(l2norm_pair_loss(x1, x2, x1, x2)) == 0.0
    assert float(batch_hard_pair_l2norm(x1, x2, y1, y2)) >= 0
    assert float(batch_hard_pair_l2norm(x1, x2, x1, x2,
                                        metric="euclidean")) == 0.0
    assert float(regression_loss(y1, y1)) == 0.0
    # calibrated log-variance lowers the loss vs overconfident one for
    # large errors
    t = y1 + 3.0
    lo = uncertainty_loss(y1, jnp.full_like(y1, np.log(9.0)), t)
    hi = uncertainty_loss(y1, jnp.full_like(y1, np.log(0.01)), t)
    assert float(lo) < float(hi)


def test_class_pairs_dataset(tmp_path):
    from msu_latentafis_tpu.training.datasets import ClassPairsDataset
    rng = np.random.default_rng(0)
    for cls in ["a", "b"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            np.save(str(d / f"f{i}.npy"), rng.normal(size=(16,)))
    ds = ClassPairsDataset(str(tmp_path), batch_size_per_class=2)
    assert len(ds) == 2
    feats, label = ds[0]
    assert feats.shape == (2, 16) and label == 0
    # cycling iterator visits every file before repeating
    seen = set()
    for _ in range(3):
        f, _ = ds[1]
        seen.add(round(float(f[1, 0]), 6))
    assert len(seen) == 3


def test_plainnet_forward():
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.models.zoo import PlainNet
    net = PlainNet(num_classes=5)
    x = jnp.zeros((2, 32, 32, 1))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vars_, x)
    assert out.shape == (2, 5)
