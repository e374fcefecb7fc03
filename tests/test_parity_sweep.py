"""Strict randomized parity sweep: engine (f32 + HIGHEST) vs the NumPy
executable spec of matcher.cpp, through ACTUAL final .dat files.

200 latent/rolled pairs (8 latents x 25-entry gallery), every template
written to its on-disk format and read back before matching, so the
quantized texture-coordinate path (descriptor_PQ.py:152-158 semantics) is
exercised end-to-end through real bytes. The tolerance is tight enough that
any greedy-selection flip (score jumps ~0.1+) or threshold-crossing
disagreement fails loudly; pure float-reassociation noise sits around 1e-6
relative on scores of order 10-100.

The small quantized coordinate grid (0..30) makes duplicate coordinates and
exactly-tied pairwise distances common — precisely the tie territory where
greedy order bugs would hide at the 5-entry/5e-3 tests' tolerance.
"""
import os

import numpy as np
import pytest

from msu_latentafis_tpu.matcher import reference_impl as spec
from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.templates import (read_final_template,
                                          write_final_latent_template,
                                          write_final_rolled_pq_template)
from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
from msu_latentafis_tpu.utils.synthetic import (
    make_latent_template, make_rolled_template, random_codebook)

N_LATENTS = 8
N_GALLERY = 25
CAPS = dict(minu_cap=32, tex_cap=48)


def _dequantize_tex(t):
    """Writers quantize texture coords (x-24)/16; synthetic templates carry
    already-quantized coords, so map them to pixel space before writing."""
    for tt in t.texture_template:
        if tt.minutiae is not None and len(tt.minutiae):
            m = np.asarray(tt.minutiae, np.float64)
            m[:, :2] = m[:, :2] * 16.0 + 24.0
            tt.minutiae = m
    return t


@pytest.fixture(scope="module")
def sweep(tmp_path_factory):
    rng = np.random.default_rng(20270820)
    cb = random_codebook(rng)
    root = tmp_path_factory.mktemp("sweep")

    latents = []
    for i in range(N_LATENTS):
        t = make_latent_template(rng, n_minu=int(rng.integers(8, 33)),
                                 n_tex=int(rng.integers(16, 49)))
        fn = os.path.join(root, f"lat{i}.dat")
        write_final_latent_template(fn, _dequantize_tex(t))
        latents.append(read_final_template(fn, kind="latent"))

    gallery = []
    for j in range(N_GALLERY):
        mate_of = j % N_LATENTS if j < 2 * N_LATENTS else None
        t = make_rolled_template(
            rng, n_minu=int(rng.integers(10, 33)),
            n_tex=int(rng.integers(16, 49)),
            mated_latent=latents[mate_of] if mate_of is not None else None,
            codebook=cb if mate_of is not None else None)
        fn = os.path.join(root, f"rol{j}.dat")
        write_final_rolled_pq_template(fn, _dequantize_tex(t))
        gallery.append(read_final_template(fn, kind="rolled"))

    return cb, latents, gallery


def test_strict_parity_200_pairs(sweep):
    cb, latents, gallery = sweep
    engine = MatchEngine(cb, block_size=8)   # f32 compute on CPU
    packed_gal = pack_gallery(gallery, cb, **CAPS)
    dev_gal = engine.load_gallery(packed_gal)

    n_checked = 0
    for li, lat in enumerate(latents):
        packed = pack_latent(lat, quantize_tex_xy=False, **CAPS)
        got = engine.one_to_list(packed, dev_gal).scores
        want = np.array([
            (lambda s: -1.0 if s is None else s)(
                spec.one2one_fused_score(lat, rolled, cb))
            for rolled in gallery])
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=2e-5,
            err_msg=f"latent {li}: engine vs spec mismatch")
        n_checked += len(gallery)
    assert n_checked == N_LATENTS * N_GALLERY
