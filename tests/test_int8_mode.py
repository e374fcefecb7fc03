"""int8 texture-scoring mode vs the exact f32 path."""
import numpy as np
import pytest

from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook)

CAPS = dict(minu_cap=32, tex_cap=64)


def test_int8_scores_close_to_f32(rng):
    codebook = random_codebook(rng)
    latent = make_latent_template(rng, n_minu=16, n_tex=50)
    mate = make_rolled_template(rng, n_minu=24, n_tex=60, mated_latent=latent,
                                codebook=codebook)
    gallery = [make_rolled_template(rng, n_minu=24, n_tex=60)
               for _ in range(5)] + [mate]
    pl = pack_latent(latent, quantize_tex_xy=False, **CAPS)
    packed = pack_gallery(gallery, codebook, **CAPS)

    e32 = MatchEngine(codebook, block_size=2, predecode=True)
    e8 = MatchEngine(codebook, block_size=2, predecode=True, tex_int8=True)
    s32 = e32.one_to_list(pl, e32.load_gallery(packed)).scores
    s8 = e8.one_to_list(pl, e8.load_gallery(packed)).scores

    assert np.argmax(s8) == np.argmax(s32) == 5      # same rank-1
    # int8 quantizes only the texture dot products; scores track closely
    np.testing.assert_allclose(s8, s32, rtol=0.05, atol=0.3)


def test_minu_int8_mode_matches_f32(rng):
    """int8-stored gallery minutiae descriptors track the f32 engine."""
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template,
                                                    random_codebook)
    codebook = random_codebook(rng)
    caps = dict(minu_cap=48, tex_cap=64)
    latent = make_latent_template(rng, n_minu=20, n_tex=40)
    gallery = [make_rolled_template(rng, n_minu=25, n_tex=50) for _ in range(3)]
    gallery.append(make_rolled_template(rng, n_minu=40, n_tex=60,
                                        mated_latent=latent, codebook=codebook))
    packed_gal = pack_gallery(gallery, codebook, **caps)
    packed_lat = pack_latent(latent, quantize_tex_xy=False, **caps)

    f32 = MatchEngine(codebook, block_size=2)
    q = MatchEngine(codebook, block_size=2, minu_int8=True)
    want = f32.one_to_list(packed_lat, f32.load_gallery(packed_gal)).scores
    got = q.one_to_list(packed_lat, q.load_gallery(packed_gal)).scores
    assert int(np.argmax(got)) == int(np.argmax(want)) == 3
    # the mate score tracks tightly; impostor scores are tiny sums of
    # borderline correspondences where quantization may flip a selection
    np.testing.assert_allclose(got[3], want[3], rtol=0.02)
    assert np.all(got[:3] < 0.1 * got[3])
