"""Pallas kernel equivalence (interpret mode on CPU) vs the XLA reference
formulations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msu_latentafis_tpu.matcher import pallas_kernels as pk
from msu_latentafis_tpu.matcher.graph_filter import filter_correspondences
from msu_latentafis_tpu.matcher.texture_match import texture_similarity


def _random_corr(rng, NP, K, quantized=True):
    hi = 30 if quantized else 480
    val = jnp.asarray(rng.uniform(0.5, 3.0, (NP, K)), jnp.float32)
    lxy = jnp.asarray(rng.integers(0, hi, (NP, K, 2)), jnp.float32)
    rxy = jnp.asarray(rng.integers(0, hi, (NP, K, 2)), jnp.float32)
    lori = jnp.asarray(rng.uniform(-np.pi, np.pi, (NP, K)), jnp.float32)
    rori = jnp.asarray(rng.uniform(-np.pi, np.pi, (NP, K)), jnp.float32)
    li = jnp.asarray(rng.integers(0, K, (NP, K)), jnp.int32)
    ri = jnp.asarray(rng.integers(0, K // 2, (NP, K)), jnp.int32)
    valid = jnp.asarray(rng.random((NP, K)) > 0.15)
    return val, lxy, lori, rxy, rori, li, ri, valid


@pytest.mark.parametrize("lookup,iters", [(True, 3), (False, 5)])
def test_fused_graph_filter_matches_reference(rng, lookup, iters):
    NP, K = 6, 48
    val, lxy, lori, rxy, rori, li, ri, valid = _random_corr(
        rng, NP, K, quantized=lookup)

    got = pk.fused_graph_filter(val, lxy, lori, rxy, rori, li, ri, valid,
                                lookup=lookup, dist_iters=iters, tile=2,
                                interpret=True)

    def one(v, lx, lo, rx, ro, a, b, vd):
        return filter_correspondences(v, a, b, lx[a] * 0 + lx, lo, rx, ro,
                                      vd, lookup=lookup, dist_iters=iters)
    # the reference path expects coords gathered at the correspondence
    # slots; our random fixture already treats each slot as its own minutia
    want = jax.vmap(lambda v, lx, lo, rx, ro, a, b, vd: filter_correspondences(
        v, a, b, lx, lo, rx, ro, vd, lookup=lookup, dist_iters=iters))(
        val, lxy, lori, rxy, rori, li, ri, valid)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_adc_rowmax_matches_einsum(rng):
    NL, Lt, D, B, Rt = 2, 16, 96, 3, 24
    x = jnp.asarray(rng.standard_normal((NL, Lt, D)), jnp.float32)
    lsq = jnp.sum(x ** 2, -1)
    dect = jnp.asarray(rng.standard_normal((B, D, Rt)), jnp.float32)
    rsq = jnp.sum(dect ** 2, 1)
    valid = jnp.asarray(rng.random((B, Rt)) > 0.2, jnp.float32)
    best, bestj = pk.fused_adc_rowmax(x, lsq, dect, rsq, valid,
                                      interpret=True)
    dots = jnp.einsum("nld,bdr->nblr", x, dect)
    simi = 2 * dots + (6 - lsq[:, None, :, None] - rsq[None, :, None, :])
    simi = jnp.where(valid[None, :, None, :] > 0, simi, -jnp.inf)
    np.testing.assert_allclose(np.asarray(best), np.asarray(jnp.max(simi, -1)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bestj),
                                  np.asarray(jnp.argmax(simi, -1)))


def test_fused_adc_rowmax_codes_matches_decode(rng):
    """In-VMEM PQ decode + ADC row-max == decode-then-fused_adc_rowmax."""
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.texture_match import block_diag_codebook
    from msu_latentafis_tpu.utils.synthetic import random_codebook

    NL, Lt, B, Rt = 2, 16, 3, 24
    cb = random_codebook(rng)                      # [16, 256, 6]
    S, C, d = cb.shape
    D = S * d
    x = jnp.asarray(rng.standard_normal((NL, Lt, D)), jnp.float32)
    lsq = jnp.sum(x ** 2, -1)
    codes = rng.integers(0, C, (B, Rt, S)).astype(np.uint8)
    decoded = cb[np.arange(S)[None, None], codes]              # [B, Rt, S, d]
    decoded = decoded.reshape(B, Rt, D)
    dect = jnp.asarray(np.swapaxes(decoded, 1, 2), jnp.float32)  # [B, D, Rt]
    rsq = jnp.sum(dect ** 2, 1)
    valid = jnp.asarray(rng.random((B, Rt)) > 0.2, jnp.float32)

    want_best, want_j = pk.fused_adc_rowmax(x, lsq, dect, rsq, valid,
                                            interpret=True)

    codes_t = jnp.asarray(np.swapaxes(codes, 1, 2))            # [B, S, Rt]
    tdec = jnp.asarray(
        np.asarray(block_diag_codebook(cb)).reshape(S * C, D).T)  # [D, S*C]
    best, bestj = pk.fused_adc_rowmax_codes(x, lsq, codes_t, tdec, rsq,
                                            valid, n_clusters=C,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(best), np.asarray(want_best),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bestj), np.asarray(want_j))
