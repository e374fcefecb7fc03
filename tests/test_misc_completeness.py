"""Legacy codec round-trip, classification metric, tiled inference."""
import numpy as np
import pytest


def test_legacy_codec_roundtrip(rng, tmp_path):
    from msu_latentafis_tpu.templates.legacy_codec import (
        read_template_legacy, write_template_legacy)
    from msu_latentafis_tpu.utils.synthetic import make_latent_template
    t = make_latent_template(rng, n_minu=9, n_tex=12, n_minu_templates=2)
    # legacy texture descriptors are u16-quantized
    t.texture_template[0].des = rng.integers(0, 65535, (12, 16)).astype(np.uint16)
    path = str(tmp_path / "legacy.dat")
    write_template_legacy(path, t, is_latent=True)
    back = read_template_legacy(path, is_latent=True)
    assert len(back.minu_template) == 2
    a, b = t.minu_template[0], back.minu_template[0]
    np.testing.assert_array_equal(np.floor(a.minutiae[:, 0]), b.minutiae[:, 0])
    # descriptors are L2-normalized on read (legacy semantics)
    norm = a.des / np.linalg.norm(a.des, axis=1, keepdims=True)
    np.testing.assert_allclose(b.des[0], norm, rtol=1e-5)
    np.testing.assert_array_equal(back.texture_template[0].des[0],
                                  t.texture_template[0].des.astype(np.float32))


def test_classification_topk(rng):
    from msu_latentafis_tpu.evaluate.classification import topk_accuracy
    logits = rng.standard_normal((50, 10))
    labels = np.argmax(logits, axis=1)
    acc = topk_accuracy(logits, labels)
    assert acc["top1"] == 1.0 and acc["top5"] == 1.0


def test_tiled_inference_matches_scale(rng):
    """Tiled enhancement/minutiae inference runs and produces outputs of
    the right shape / range on a non-multiple-of-64 image."""
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.models import EnhancementAEC, MinutiaeAEC
    from msu_latentafis_tpu.models.enhancement import enhance_tiled
    from msu_latentafis_tpu.models.minutiae_net import detect_minutiae_tiled

    key = jax.random.PRNGKey(0)
    img = rng.random((192, 256)).astype(np.float32) * 255

    enh = EnhancementAEC(nf=4)
    v = enh.init(key, jnp.zeros((1, 128, 128, 1)), train=False)
    apply_fn = jax.jit(lambda v, x: enh.apply(v, x, train=False))
    out = enhance_tiled(apply_fn, v, img)
    assert out.shape == img.shape and 0 <= out.min() and out.max() <= 255

    mn = MinutiaeAEC(nf=4)
    v2 = mn.init(key, jnp.zeros((1, 128, 128, 1)), train=False)
    apply2 = jax.jit(lambda v, x: mn.apply(v, x, train=False))
    mnt = detect_minutiae_tiled(apply2, v2, img, minu_thr=0.01)
    assert mnt.ndim == 2 or len(mnt) == 0
