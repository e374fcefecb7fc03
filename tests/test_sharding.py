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
