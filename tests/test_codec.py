"""Template / codebook codec round-trip tests (byte-format parity)."""
import numpy as np
import pytest

from msu_latentafis_tpu.templates import (
    Template, read_template, write_template,
    read_final_template, write_final_latent_template,
    write_final_rolled_pq_template, read_codebook, write_codebook,
    run_length_encode, run_length_decode)
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook,
    random_descriptors, random_minutiae)

REF_CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"


def test_rle_roundtrip(rng):
    mask = (rng.random((64, 48)) > 0.5).astype(int)
    mask[0, 0] = 0  # encoder forces first element to background
    runs = run_length_encode(mask.copy())
    out = run_length_decode(runs, 64, 48)
    np.testing.assert_array_equal(out, mask)


def test_tfc_roundtrip_latent(rng, tmp_path):
    t = make_latent_template(rng, n_minu=17, n_tex=33, n_minu_templates=3)
    # TF_C keeps pixel coordinates; synthetic latents carry quantized tex
    # coords, which still round-trip as u16.
    path = str(tmp_path / "lat.dat")
    write_template(path, t, is_latent=True)
    back = read_template(path, is_latent=True)
    assert len(back.minu_template) == 3
    for a, b in zip(t.minu_template, back.minu_template):
        np.testing.assert_array_equal(np.floor(a.minutiae[:, 0]), b.minutiae[:, 0])
        np.testing.assert_allclose(a.minutiae[:, 2], b.minutiae[:, 2], rtol=1e-6)
        np.testing.assert_allclose(a.des, b.des, rtol=1e-6)
        assert b.oimg.shape == a.oimg.shape
    tt_a, tt_b = t.texture_template[0], back.texture_template[0]
    np.testing.assert_allclose(tt_a.des, tt_b.des, rtol=1e-6)
    np.testing.assert_array_equal(tt_a.minutiae[:, 0], tt_b.minutiae[:, 0])


def test_tfc_oimg_column_major(rng, tmp_path):
    """The orientation field is stored transposed (column-major) on disk."""
    t = make_latent_template(rng, n_minu=4, n_tex=4, n_minu_templates=1)
    oimg = np.arange(t.minu_template[0].blkH * t.minu_template[0].blkW,
                     dtype=np.float32).reshape(t.minu_template[0].oimg.shape)
    t.minu_template[0].oimg = oimg
    path = str(tmp_path / "o.dat")
    write_template(path, t)
    back = read_template(path)
    np.testing.assert_allclose(back.minu_template[0].oimg, oimg)


def test_final_latent_roundtrip(rng, tmp_path):
    t = make_latent_template(rng, n_minu=12, n_tex=20, n_minu_templates=28)
    # final writer quantizes texture coords; feed pixel-space coords
    t.texture_template[0].minutiae[:, 0] = rng.integers(24, 400, 20)
    t.texture_template[0].minutiae[:, 1] = rng.integers(24, 400, 20)
    path = str(tmp_path / "final.dat")
    write_final_latent_template(path, t)
    back = read_final_template(path, kind="latent")
    assert len(back.minu_template) == 28
    assert len(back.texture_template) == 1
    expect_q = np.floor((t.texture_template[0].minutiae[:, 0] - 24) / 16)
    np.testing.assert_array_equal(back.texture_template[0].minutiae[:, 0], expect_q)
    np.testing.assert_allclose(back.texture_template[0].des,
                               t.texture_template[0].des, rtol=1e-6)


def test_final_rolled_pq_roundtrip(rng, tmp_path):
    t = make_rolled_template(rng, n_minu=40, n_tex=100)
    t.texture_template[0].minutiae[:, 0] = rng.integers(24, 400, 100)
    t.texture_template[0].minutiae[:, 1] = rng.integers(24, 400, 100)
    path = str(tmp_path / "rolled.dat")
    write_final_rolled_pq_template(path, t)
    back = read_final_template(path, kind="rolled")
    assert back.texture_template[0].des.dtype == np.uint8
    np.testing.assert_array_equal(back.texture_template[0].des,
                                  t.texture_template[0].des)
    np.testing.assert_allclose(back.minu_template[0].des,
                               t.minu_template[0].des, rtol=1e-6)


def test_empty_template_roundtrip(tmp_path):
    path = str(tmp_path / "empty.dat")
    write_final_latent_template(path, Template())
    back = read_final_template(path, kind="latent")
    assert not back.minu_template and not back.texture_template


def test_codebook_roundtrip(rng, tmp_path):
    cb = random_codebook(rng)
    path = str(tmp_path / "cb.dat")
    write_codebook(path, cb)
    back = read_codebook(path)
    np.testing.assert_array_equal(back, cb.astype(np.float32))


def test_reference_codebook_loads():
    """The shipped reference codebook parses with the expected geometry."""
    cb = read_codebook(REF_CODEBOOK)
    assert cb.shape == (16, 256, 6)
    assert np.isfinite(cb).all()
    # write-back must be byte-identical
    import io, os, tempfile
    with tempfile.NamedTemporaryFile(delete=False) as f:
        tmp = f.name
    try:
        write_codebook(tmp, cb)
        with open(tmp, "rb") as f1, open(REF_CODEBOOK, "rb") as f2:
            assert f1.read() == f2.read()
    finally:
        os.unlink(tmp)
