"""Batched-latent matching + checkpoint round-trips."""
import numpy as np
import pytest

from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook)

CAPS = dict(minu_cap=32, tex_cap=48)


def test_batched_latents_match_individual(rng):
    codebook = random_codebook(rng)
    engine = MatchEngine(codebook, block_size=2)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40) for _ in range(6)]
    pg = engine.load_gallery(pack_gallery(gallery, codebook, **CAPS))
    latents = [pack_latent(make_latent_template(rng, n_minu=12, n_tex=30),
                           quantize_tex_xy=False, **CAPS) for _ in range(3)]
    individual = [engine.one_to_list(l, pg).scores for l in latents]
    batched = engine.list_to_list(latents, pg)
    for ind, b in zip(individual, batched):
        np.testing.assert_allclose(b.scores, ind, rtol=1e-5, atol=1e-5)


def test_predecoded_gallery_matches_codes(rng):
    import jax.numpy as jnp
    codebook = random_codebook(rng)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40) for _ in range(4)]
    latent = pack_latent(make_latent_template(rng, n_minu=12, n_tex=30),
                         quantize_tex_xy=False, **CAPS)
    packed = pack_gallery(gallery, codebook, **CAPS)
    e_codes = MatchEngine(codebook, block_size=2, predecode=False)
    e_dec = MatchEngine(codebook, block_size=2, predecode=True)
    s1 = e_codes.one_to_list(latent, e_codes.load_gallery(packed)).scores
    s2 = e_dec.one_to_list(latent, e_dec.load_gallery(packed)).scores
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_split_serving_equals_fused(rng):
    """split_serving (3-dispatch screen/gather/exact — the 400K path) must
    return identical indices, exact scores, and margins to the fused
    single-dispatch rerank, both plain and under truncated prescreen."""
    codebook = random_codebook(rng)
    engine = MatchEngine(codebook, block_size=4)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40)
               for _ in range(12)]
    pg = engine.load_gallery(pack_gallery(gallery, codebook, **CAPS))
    lats = [pack_latent(make_latent_template(rng, n_minu=12, n_tex=30),
                        quantize_tex_xy=False, **CAPS) for _ in range(3)]
    i1, e1, m1, t1 = engine.match_scores_batch_reranked(
        lats, pg, m=8, split_serving=False)
    i2, e2, m2, t2 = engine.match_scores_batch_reranked(
        lats, pg, m=8, split_serving=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m1, m2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(t1, t2, rtol=1e-5, atol=1e-5)
    i3, e3, _, _ = engine.match_scores_batch_reranked(
        lats, pg, m=8, prescreen_k=8, prescreen_lt=16, prescreen_t=1,
        split_serving=True)
    i4, e4, _, _ = engine.match_scores_batch_reranked(
        lats, pg, m=8, prescreen_k=8, prescreen_lt=16, prescreen_t=1,
        split_serving=False)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e4),
                               rtol=1e-5, atol=1e-5)


def test_graded_near_mates_score_monotonically(rng):
    """make_rolled_template's noise/tex_noise grades (the structured-
    impostor parity protocol's ladder) must produce near-mates whose
    exact fused scores decrease with the noise strength."""
    codebook = random_codebook(rng)
    engine = MatchEngine(codebook, block_size=4)
    lat_t = make_latent_template(rng, n_minu=24, n_tex=40)
    lat = pack_latent(lat_t, quantize_tex_xy=False, **CAPS)
    grades = [(0.25, 0.0), (0.8, 0.8), (2.0, 3.0)]
    mates = [make_rolled_template(rng, n_minu=24, n_tex=40,
                                  mated_latent=lat_t, codebook=codebook,
                                  noise=n, tex_noise=t)
             for n, t in grades]
    fillers = [make_rolled_template(rng, n_minu=24, n_tex=40)
               for _ in range(5)]
    pg = engine.load_gallery(pack_gallery(mates + fillers, codebook, **CAPS))
    s = engine.one_to_list(lat, pg).scores
    assert s[0] > s[1] > s[2], s[:3]
    assert s[2] > max(s[3:8]) or s[1] > max(s[3:8]), s


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.models import CompNet
    from msu_latentafis_tpu.pipeline.models_bundle import (save_checkpoint,
                                                           _try_restore)
    model = CompNet()
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((2, 192)), train=False)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, v)
    blank = jax.tree.map(jnp.zeros_like, v)
    restored = _try_restore(path, blank)
    leaves_a = jax.tree.leaves(v)
    leaves_b = jax.tree.leaves(restored)
    assert any(np.abs(np.asarray(b)).sum() > 0 for b in leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
