"""Sharded gallery matching on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.parallel import (make_mesh, shard_gallery,
                                         match_sharded, topk_collective)
from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook)

CAPS = dict(minu_cap=32, tex_cap=48)


@pytest.fixture(scope="module")
def setup():
    import jax
    assert len(jax.devices()) == 8, "tests expect the virtual 8-device mesh"
    rng = np.random.default_rng(11)
    codebook = random_codebook(rng)
    engine = MatchEngine(codebook, block_size=2)
    mesh = make_mesh()
    return rng, codebook, engine, mesh


def test_sharded_matches_local(setup):
    rng, codebook, engine, mesh = setup
    latent = make_latent_template(rng, n_minu=16, n_tex=40)
    mate = make_rolled_template(rng, n_minu=24, n_tex=44, mated_latent=latent,
                                codebook=codebook)
    gallery = [make_rolled_template(rng, n_minu=24, n_tex=44)
               for _ in range(20)] + [mate]

    packed_gal = pack_gallery(gallery, codebook, **CAPS)
    packed_lat = pack_latent(latent, quantize_tex_xy=False, **CAPS)

    local = engine.one_to_list(packed_lat, engine.load_gallery(packed_gal))

    sharded_gal = shard_gallery(engine, packed_gal, mesh)
    scores = np.asarray(match_sharded(engine, packed_lat, sharded_gal, mesh))
    np.testing.assert_allclose(scores[:len(gallery)], local.scores,
                               rtol=1e-5, atol=1e-5)
    assert int(np.argmax(scores[:len(gallery)])) == 20

    v, i = topk_collective(match_sharded(engine, packed_lat, sharded_gal, mesh),
                           5, mesh)
    assert int(np.asarray(i)[0]) == 20
    np.testing.assert_allclose(np.asarray(v)[0], local.scores[20], rtol=1e-5)


def test_sharded_path_does_not_retrace(setup):
    """Serving-path regression: a second match_sharded / topk_collective /
    maybe_predecode call with the same shapes must hit the cached jitted
    callable (one compiled variant, no fresh closure per call)."""
    from msu_latentafis_tpu.parallel.sharding import _sharded_match_fn, _topk_fn

    rng, codebook, engine, mesh = setup
    latent = make_latent_template(rng, n_minu=16, n_tex=40)
    gallery = [make_rolled_template(rng, n_minu=24, n_tex=44)
               for _ in range(16)]
    packed_gal = pack_gallery(gallery, codebook, **CAPS)
    packed_lat = pack_latent(latent, quantize_tex_xy=False, **CAPS)
    sharded_gal = shard_gallery(engine, packed_gal, mesh)

    s1 = match_sharded(engine, packed_lat, sharded_gal, mesh)
    gal_keys = tuple(sorted(engine._gallery_dict(sharded_gal)))
    lat_keys = tuple(sorted(engine._latent_dict([packed_lat])))
    fn = _sharded_match_fn(engine, mesh, lat_keys, gal_keys)
    n0 = fn._cache_size()
    s2 = match_sharded(engine, packed_lat, sharded_gal, mesh)
    assert fn is _sharded_match_fn(engine, mesh, lat_keys, gal_keys)
    assert fn._cache_size() == n0    # no new compiled variant
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

    topk_collective(s1, 5, mesh)
    tf = _topk_fn(mesh, 5, 5, s1.shape[0] // mesh.shape["gallery"])
    t0 = tf._cache_size()
    topk_collective(s2, 5, mesh)
    assert tf._cache_size() == t0

    # maybe_predecode: same decode callable object across galleries with
    # the same chunking configuration
    d1 = engine._decode_all_fn(4, 2, 48, codebook.shape[0])
    d2 = engine._decode_all_fn(4, 2, 48, codebook.shape[0])
    assert d1 is d2


def test_list_to_list_heterogeneous(setup):
    """-ldir over ragged latents: bucketed matching returns per-latent
    scores identical to the one-at-a-time path, in input order."""
    rng, codebook, engine, mesh = setup
    gallery = [make_rolled_template(rng, n_minu=24, n_tex=44)
               for _ in range(8)]
    packed_gal = pack_gallery(gallery, codebook, **CAPS)
    dev_gal = engine.load_gallery(packed_gal)

    sizes = [(5, 17), (16, 40), (9, 40), (16, 23)]
    lats = [pack_latent(make_latent_template(rng, n_minu=a, n_tex=b),
                        quantize_tex_xy=False)
            for a, b in sizes]
    results = engine.list_to_list(lats, dev_gal, lm_bucket=8, lt_bucket=16,
                                  max_batch=2)
    assert len(results) == len(lats)
    for lat, res in zip(lats, results):
        from msu_latentafis_tpu.templates.packing import repad_latent
        solo = engine.one_to_list(
            repad_latent(lat, CAPS["minu_cap"], CAPS["tex_cap"]), dev_gal)
        np.testing.assert_allclose(res.scores, solo.scores,
                                   rtol=2e-4, atol=2e-4)
