"""JAX gallery engine vs the NumPy executable spec of the native matcher.

Shapes are shared across tests (one engine, fixed packing caps) so the
engine compiles once per session.
"""
import numpy as np
import pytest

from msu_latentafis_tpu.matcher import reference_impl as spec
from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.templates.data_model import Template
from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook,
    random_descriptors, random_minutiae)

CAPS = dict(minu_cap=48, tex_cap=112)
# Engine vs spec differ only by float reassociation (the ADC matmul identity
# and batched reductions); selection flips would show up as >0.1 jumps.
TOL = dict(rtol=5e-3, atol=5e-3)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    codebook = random_codebook(rng)
    engine = MatchEngine(codebook, block_size=2)
    return rng, codebook, engine


def _spec_scores(latent, gallery, codebook):
    out = []
    for rolled in gallery:
        s = spec.one2one_fused_score(latent, rolled, codebook)
        out.append(-1.0 if s is None else s)
    return np.array(out)


def _engine_scores(engine, codebook, latent, gallery):
    packed_gal = pack_gallery(gallery, codebook, **CAPS)
    packed_lat = pack_latent(latent, quantize_tex_xy=False, **CAPS)
    return engine.one_to_list(packed_lat, engine.load_gallery(packed_gal))


def test_minutiae_matching_spec_properties(rng):
    """Spec sanity: identical templates score higher than random pairs."""
    des = random_descriptors(rng, 30)
    minu = random_minutiae(rng, 30)
    self_score = spec.one2one_minutiae_matching(
        des, minu[:, :2], minu[:, 2], des, minu[:, :2], minu[:, 2])
    des2 = random_descriptors(rng, 30)
    minu2 = random_minutiae(rng, 30)
    cross = spec.one2one_minutiae_matching(
        des, minu[:, :2], minu[:, 2], des2, minu2[:, :2], minu2[:, 2])
    assert self_score > cross
    assert self_score > 10  # ~30 perfect correspondences with simi ~2.99


def test_engine_matches_spec(setup):
    """Random gallery + one mate + one empty entry, all against the spec."""
    rng, codebook, engine = setup
    latent = make_latent_template(rng, n_minu=20, n_tex=60)
    mate = make_rolled_template(rng, n_minu=40, n_tex=100, mated_latent=latent, codebook=codebook)
    gallery = [make_rolled_template(rng, n_minu=25 + i, n_tex=40 + 3 * i)
               for i in range(3)] + [mate, Template()]

    expected = _spec_scores(latent, gallery, codebook)
    result = _engine_scores(engine, codebook, latent, gallery)

    np.testing.assert_allclose(result.scores, expected, **TOL)
    assert result.scores[-1] == -1.0          # empty rolled entry skipped
    assert int(np.argmax(result.scores)) == 3  # the mate wins rank-1
    assert result.ranked(1)[0][0] == "3"


def test_engine_second_latent_same_shapes(setup):
    """A different latent reuses the compiled engine and still matches."""
    rng, codebook, engine = setup
    latent = make_latent_template(rng, n_minu=31, n_tex=90)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=70) for _ in range(4)]
    gallery.append(make_rolled_template(rng, n_minu=44, n_tex=110,
                                        mated_latent=latent, codebook=codebook))
    expected = _spec_scores(latent, gallery, codebook)
    result = _engine_scores(engine, codebook, latent, gallery)
    np.testing.assert_allclose(result.scores, expected, **TOL)
    assert int(np.argmax(result.scores)) == 4


def test_selected_scores_and_corr_files(setup, tmp_path):
    """Selected-template score vector + save_corr output
    (matcher.cpp:376-417, :497-506)."""
    from msu_latentafis_tpu.matcher.engine import write_corr_files

    rng, codebook, engine = setup
    latent = make_latent_template(rng, n_minu=20, n_tex=60)
    mate = make_rolled_template(rng, n_minu=40, n_tex=100,
                                mated_latent=latent, codebook=codebook)

    scores, corrs = spec.one2one_selected_scores(latent, mate, codebook,
                                                 return_corr=True)
    fused = spec.one2one_fused_score(latent, mate, codebook)
    assert np.isclose(sum(scores[:-1]) + 0.3 * scores[-1], fused)

    # each corr list re-sums to its template score (score = sum of surviving
    # similarities; coordinates must come from the actual minutiae)
    lat_sets = {(float(m[0]), float(m[1]))
                for t in latent.minu_template for m in np.asarray(t.minutiae)}
    for corr in corrs:
        for lx, ly, rx, ry in corr:
            assert (lx, ly) in lat_sets

    prefix = str(tmp_path / "corr_good_mate")
    files = write_corr_files(latent, mate, codebook, prefix)
    assert files == [f"{prefix}_{i}.csv" for i in range(3)]
    for f, corr in zip(files, corrs):
        rows = [line.split(",") for line in open(f).read().splitlines()]
        assert len(rows) == len(corr)
        for row, expect in zip(rows, corr):
            # %g == C++ operator<< default 6-sig-digit precision
            np.testing.assert_allclose([float(v) for v in row], expect,
                                       rtol=1e-5)


def test_all_templates_scores(setup):
    """One2One_matching_all_templates (matcher.cpp:339-374): per-template
    vector whose selected entries agree with the selected-template path."""
    rng, codebook, engine = setup
    latent = make_latent_template(rng, n_minu=16, n_tex=40, n_minu_templates=28)
    mate = make_rolled_template(rng, n_minu=30, n_tex=80,
                                mated_latent=latent, codebook=codebook)
    all_scores = spec.one2one_all_templates_scores(latent, mate, codebook)
    assert len(all_scores) == len(latent.minu_template) + len(latent.texture_template)
    sel, _ = spec.one2one_selected_scores(latent, mate, codebook)
    from msu_latentafis_tpu.templates.data_model import MatcherConstants as MC
    for i, idx in enumerate(MC.SELECTED_MINU_TEMPLATES):
        assert np.isclose(all_scores[idx], sel[i])
    assert np.isclose(all_scores[len(latent.minu_template)], sel[-1])


def test_texture_matmul_equals_lut(rng):
    """The matmul ADC reformulation reproduces the LUT similarity exactly."""
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.texture_match import (
        decode_pq, texture_similarity)

    codebook = random_codebook(rng)
    lat_des = random_descriptors(rng, 40)
    codes = rng.integers(0, 256, (1, 50, 16)).astype(np.uint8)

    luts = spec.compute_dist_to_codewords(lat_des, codebook)
    gathered = luts[:, np.arange(16)[None, :], codes[0].astype(int)]
    simi_spec = 6.0 - gathered.sum(axis=2)

    flat = jnp.asarray(codebook.reshape(16 * 256, 6))
    decoded = decode_pq(jnp.asarray(codes), flat, 256)
    sq = np.asarray(decoded[0]) ** 2
    rol_sqnorm = jnp.asarray(sq.sum(axis=1, keepdims=True).T)
    lat_sq = jnp.asarray((lat_des ** 2).sum(axis=1))
    decoded_t = jnp.swapaxes(decoded, 1, 2)          # [1, D, Rt] device layout
    simi = texture_similarity(jnp.asarray(lat_des), lat_sq,
                              jnp.ones(40, bool), decoded_t, rol_sqnorm,
                              jnp.ones((1, 50), bool))
    np.testing.assert_allclose(np.asarray(simi[0]), simi_spec, rtol=1e-4, atol=1e-4)


def test_engine_codes_resident_mode(setup):
    """Codes-resident gallery (in-VMEM PQ decode kernel) matches the spec
    scores like the pre-decoded path does."""
    rng, codebook, engine = setup
    cengine = MatchEngine(codebook, block_size=2, codes_resident=True)
    latent = make_latent_template(rng, n_minu=18, n_tex=50)
    gallery = [make_rolled_template(rng, n_minu=22, n_tex=60) for _ in range(2)]
    gallery.append(make_rolled_template(rng, n_minu=30, n_tex=80,
                                        mated_latent=latent, codebook=codebook))
    expected = _spec_scores(latent, gallery, codebook)
    result = _engine_scores(cengine, codebook, latent, gallery)
    np.testing.assert_allclose(result.scores, expected, **TOL)
    assert int(np.argmax(result.scores)) == 2


def test_engine_all_templates_matches_spec(setup):
    """Engine One2One_matching_all_templates surface == NumPy spec."""
    rng, codebook, engine = setup
    latent = make_latent_template(rng, n_minu=14, n_tex=36,
                                  n_minu_templates=28)
    mate = make_rolled_template(rng, n_minu=24, n_tex=60,
                                mated_latent=latent, codebook=codebook)
    imp = make_rolled_template(rng, n_minu=24, n_tex=60)
    for rolled in (mate, imp):
        want = np.asarray(spec.one2one_all_templates_scores(
            latent, rolled, codebook), np.float32)
        got = engine.one_to_one_all_templates(latent, rolled)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, **TOL)
