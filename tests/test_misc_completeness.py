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


def test_byte_and_tf_codec_roundtrip(rng, tmp_path):
    """The two oldest formats (template.py:79-285 Byte and :287-497 TF):
    u16 row quantization + mandatory mask vs f32 descriptors + optional
    mask; both carry the latent texture distance-to-border column."""
    from msu_latentafis_tpu.templates.legacy_codec import (
        read_template_byte, read_template_tf, write_template_byte,
        write_template_tf)
    from msu_latentafis_tpu.utils.synthetic import make_latent_template

    t = make_latent_template(rng, n_minu=7, n_tex=10, n_minu_templates=2)
    # descriptors must be positive for the Byte rowmax quantization to
    # round-trip direction (normalized-on-read semantics)
    for i, mt in enumerate(t.minu_template):
        mt.des = np.abs(mt.des) + 1e-3
        mt.mask = np.zeros((mt.h, mt.w), np.uint8)    # blocky real-ish mask
        mt.mask[40:300, 60 + i * 10:400] = 1
    t.texture_template[0].des = np.abs(t.texture_template[0].des) + 1e-3
    t.texture_template[0].minutiae[:, 3] = rng.random(10) * 100

    p = str(tmp_path / "byte.dat")
    write_template_byte(p, t, is_latent=True)
    back = read_template_byte(p, is_latent=True)
    assert len(back.minu_template) == 2
    a, b = t.minu_template[1], back.minu_template[1]
    np.testing.assert_array_equal(np.floor(a.minutiae[:, 0]),
                                  b.minutiae[:, 0])
    np.testing.assert_array_equal(a.mask, b.mask)        # RLE mask section
    # u16 row quantization then L2 normalization ~ normalized original
    norm = a.des / np.linalg.norm(a.des, axis=1, keepdims=True)
    np.testing.assert_allclose(b.des[0], norm, atol=2e-4)
    np.testing.assert_allclose(back.texture_template[0].minutiae[:, 3],
                               t.texture_template[0].minutiae[:, 3],
                               rtol=1e-6)

    for save_mask in (True, False):
        p = str(tmp_path / f"tf_{save_mask}.dat")
        write_template_tf(p, t, is_latent=True, save_mask=save_mask)
        back = read_template_tf(p, is_latent=True, with_mask=save_mask)
        a, b = t.minu_template[0], back.minu_template[0]
        np.testing.assert_allclose(b.minutiae[:, 3], a.minutiae[:, 3],
                                   rtol=1e-6)            # reliability col
        norm = a.des / np.linalg.norm(a.des, axis=1, keepdims=True)
        np.testing.assert_allclose(b.des[0], norm, rtol=1e-5)
        if save_mask:
            np.testing.assert_array_equal(a.mask, b.mask)


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

    from msu_latentafis_tpu.models import MinutiaeAEC64
    from msu_latentafis_tpu.models.minutiae_net import \
        detect_minutiae_whole_image
    m64 = MinutiaeAEC64(nf=4)
    v64 = m64.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1)),
                   train=False)
    apply64 = jax.jit(lambda v, x: m64.apply(v, x, train=False))
    # patch-64 tiled inference decodes minutiae from the modified variant
    mnt64 = detect_minutiae_tiled(apply64, v64, img, minu_thr=0.01, patch=64)
    assert mnt64.ndim == 2 and (len(mnt64) == 0 or mnt64.shape[1] >= 4)
    mnt64w = detect_minutiae_whole_image(apply64, v64, img, minu_thr=0.01,
                                         multiple=16, refine_dist_thr=10.0)
    assert mnt64w.ndim == 2

    mn = MinutiaeAEC(nf=4)
    v2 = mn.init(key, jnp.zeros((1, 128, 128, 1)), train=False)
    apply2 = jax.jit(lambda v, x: mn.apply(v, x, train=False))
    mnt = detect_minutiae_tiled(apply2, v2, img, minu_thr=0.01)
    assert mnt.ndim == 2 or len(mnt) == 0


def test_dataset_layout_enumerators(tmp_path):
    """The reference batch modes' file enumeration semantics
    (extraction_rolled.py:146-262)."""
    from msu_latentafis_tpu.pipeline.rolled import enumerate_rolled_dataset

    # flat
    flat = tmp_path / "flat"
    flat.mkdir()
    for n in ["b.bmp", "a.bmp", "c.png", "d.txt"]:
        (flat / n).touch()
    got = list(enumerate_rolled_dataset(str(flat), "flat"))
    assert [g[1] for g in got] == ["a", "b", "c"]
    assert all(g[2] == 500 for g in got)

    # longitudinal: subject dirs, fingers with >=5 impressions only
    lng = tmp_path / "lng"
    for subj in ["s1", "s0"]:
        (lng / subj).mkdir(parents=True)
        for imp in range(6):
            (lng / subj / f"{imp}_roll_3.bmp").touch()
        (lng / subj / "0_roll_7.bmp").touch()  # finger 7: only one impression
    got = list(enumerate_rolled_dataset(str(lng), "longitudinal"))
    assert len(got) == 10  # 2 subjects x 1 qualifying finger x 5 impressions
    assert got[0][1].startswith("s0_") and got[-1][1].startswith("s1_")

    # msp: numbered files, inclusive range
    msp = tmp_path / "msp"
    msp.mkdir()
    for i in [3, 4, 6]:
        (msp / f"{i}.bmp").touch()
    got = list(enumerate_rolled_dataset(str(msp), "msp", N1=3, N2=6))
    assert [g[1] for g in got] == ["3", "4", "6"]

    # n2n: per-subject pngs at 1200 ppi
    n2n = tmp_path / "n2n"
    (n2n / "p1").mkdir(parents=True)
    (n2n / "p1" / "x.png").touch()
    got = list(enumerate_rolled_dataset(str(n2n), "n2n"))
    assert got == [(str(n2n / "p1" / "x.png"), "x", 1200)]


def test_pairs_verification_protocol(rng, tmp_path):
    """k-fold pairs verification (lfw_verify_torch.py parity): separable
    features give ~100% accuracy; pairs-file parsing round-trips."""
    from msu_latentafis_tpu.evaluate import (kfold_verification,
                                             read_index_dict, read_pairs_file)
    # 40 identities x 2 impressions; same-id features cluster together
    ids = np.repeat(np.arange(40), 2)
    feats = rng.standard_normal((40, 16))[ids] + 0.05 * rng.standard_normal((80, 16))

    paths = tmp_path / "paths.txt"
    names = [f"id{i:02d}_{j + 1:04d}" for i in range(40) for j in range(2)]
    paths.write_text("".join(f"/x/{n}.png\n" for n in names))
    idx = read_index_dict(str(paths))
    assert idx[names[0]] == 0 and idx[names[-1]] == 79

    lines = ["10 300 pairs"]
    for i in range(40):
        lines.append(f"id{i:02d} 1 2")                       # genuine
        j = (i + 1) % 40
        lines.append(f"id{i:02d} 1 id{j:02d} 2")             # impostor
    pf = tmp_path / "pairs.txt"
    pf.write_text("\n".join(lines) + "\n")
    pair_idx, labels = read_pairs_file(str(pf), idx)
    assert len(pair_idx) == 80 and labels.sum() == 40

    for metric in ("cos_dist", "l2_norm"):
        mean, std = kfold_verification(feats, pair_idx, labels, metric=metric)
        assert mean > 0.95, (metric, mean)
        assert std < 0.2
