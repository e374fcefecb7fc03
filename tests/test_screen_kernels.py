"""Screening kernels: interpret-mode correctness vs NumPy + the
upper-bound property vs the exact engine scores.

Screen-then-rerank (docs/PERF.md): serving computes a cheap MXU-only
screening score for every pair and runs the exact VPU-heavy graph filters
only on the top-M screened candidates. With tau=0 / normalize=False the
screens are STRICT upper bounds on the exact fused-score components, which
the property test pins on random problems.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msu_latentafis_tpu.matcher import pallas_kernels as pk


def _np_adc_screen(x, lsq, lval, dect, rsq, rval, tau):
    NL, Lt, D = x.shape
    B = dect.shape[0]
    out = np.zeros((NL, B), np.float32)
    for n in range(NL):
        for b in range(B):
            simi = 2.0 * (x[n].astype(np.float64) @ dect[b].astype(np.float64)) \
                + (6.0 - lsq[n][:, None] - rsq[b][None, :])
            simi = np.where(rval[b][None, :] > 0, simi, -np.inf)
            row = simi.max(axis=1)
            contrib = np.maximum(row + -tau, 0.0) * (lval[n] > 0)
            contrib = np.where(np.isfinite(row), contrib, 0.0)
            out[n, b] = contrib.sum()
    return out


def test_adc_screen_matches_numpy(rng):
    NL, Lt, D, B, Rt = 2, 16, 8, 4, 24
    x = rng.standard_normal((NL, Lt, D)).astype(np.float32)
    lsq = np.sum(x ** 2, -1)
    lval = (np.arange(Lt)[None, :] < np.array([[12], [16]])[:, 0:1]).astype(np.float32)
    dect = rng.standard_normal((B, D, Rt)).astype(np.float32)
    rsq = rng.uniform(0, 6, (B, Rt)).astype(np.float32)
    rval = (np.arange(Rt)[None, :] < 20).astype(np.float32) * np.ones((B, 1), np.float32)
    for tau in (0.0, 2.0):
        got = np.asarray(pk.fused_adc_screen(
            jnp.asarray(x), jnp.asarray(lsq), jnp.asarray(lval),
            jnp.asarray(dect), jnp.asarray(rsq), jnp.asarray(rval),
            tau=tau, interpret=True))
        want = _np_adc_screen(x, lsq, lval, dect, rsq, rval, tau)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _np_minu_screen(lat, lval, rol_t, rval, normalize):
    NT, P, D = lat.shape
    B = rol_t.shape[0]
    out = np.zeros((NT, B), np.float32)
    for t in range(NT):
        for b in range(B):
            s = np.maximum(lat[t] @ rol_t[b], 0.0)
            s = s * lval[t][:, None] * rval[b][None, :]
            if normalize:
                row = s.sum(1, keepdims=True)
                col = s.sum(0, keepdims=True)
                s = s / (row + col - s + 1e-6)
                s = s * lval[t][:, None] * rval[b][None, :]
            out[t, b] = min(s.max(1).sum(), s.max(0).sum())
    return out


@pytest.mark.parametrize("normalize", [False, True])
def test_minu_screen_matches_numpy(rng, normalize):
    NT, P, D, B, R = 3, 12, 8, 4, 20
    lat = rng.standard_normal((NT, P, D)).astype(np.float32)
    lval = (np.arange(P)[None, :] < np.array([8, 12, 5])[:, None]).astype(np.float32)
    rol = rng.standard_normal((B, D, R)).astype(np.float32)
    rval = (np.arange(R)[None, :] < np.array([20, 15, 20, 9])[:, None]).astype(np.float32)
    got = np.asarray(pk.fused_minu_screen(
        jnp.asarray(lat), jnp.asarray(lval), jnp.asarray(rol),
        jnp.asarray(rval), normalize=normalize, interpret=True))
    want = _np_minu_screen(lat, lval, rol, rval, normalize)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_screen_upper_bounds_exact_scores(rng):
    """tau=0 / normalize=False screens bound the exact fused score:
    screen_minu(sum over templates) + 0.3 * screen_tex >= exact."""
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template,
                                                    random_codebook)
    cb = random_codebook(rng)
    engine = MatchEngine(cb, block_size=4)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40)
               for _ in range(8)]
    lat_t = make_latent_template(rng, n_minu=12, n_tex=30)
    gallery[3] = make_rolled_template(rng, n_minu=20, n_tex=40,
                                      mated_latent=lat_t, codebook=cb)
    pg = engine.load_gallery(pack_gallery(gallery, cb, minu_cap=32,
                                          tex_cap=48))
    lat = pack_latent(lat_t, quantize_tex_xy=False, minu_cap=32, tex_cap=48)
    exact = np.asarray(engine.match_scores(lat, pg))[:8]
    screen = np.asarray(engine.screen_scores_batch([lat], pg))[0, :8]
    assert (screen + 1e-3 >= exact).all(), (screen, exact)
    # the mate must dominate the screen ordering too
    assert np.argmax(screen) == 3, screen


def test_rerank_preserves_dense_ranking(rng):
    """one_to_list_reranked's candidate list must equal the dense path's
    ranking wherever the certification margin is met (here m covers the
    whole gallery, so equality is unconditional)."""
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template,
                                                    random_codebook)
    cb = random_codebook(rng)
    engine = MatchEngine(cb, block_size=4)
    lat_t = make_latent_template(rng, n_minu=12, n_tex=30)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40)
               for _ in range(12)]
    gallery[7] = make_rolled_template(rng, n_minu=20, n_tex=40,
                                      mated_latent=lat_t, codebook=cb)
    pg = engine.load_gallery(pack_gallery(gallery, cb, minu_cap=32,
                                          tex_cap=48))
    lat = pack_latent(lat_t, quantize_tex_xy=False, minu_cap=32, tex_cap=48)

    dense = engine.one_to_list(lat, pg)

    # truncated rerank: equality is guaranteed ONLY when the certification
    # margin is met — and the margin must honestly flag misses. Verify the
    # contract both ways.
    idx8, exact8, margin8, thr8 = engine.match_scores_batch_reranked(
        [lat], pg, m=8)
    dense_order = [n for n, _ in dense.ranked(8)]
    rer8 = engine.one_to_list_reranked(lat, pg, m=8)
    rer_order = [n for n, _ in rer8.ranked(8)]
    if margin8[0] >= 0:
        assert rer_order == dense_order, (rer_order, dense_order)
    if rer_order != dense_order:
        # a miss is tolerable only if the certificate flagged it
        assert margin8[0] < 0, (margin8, rer_order, dense_order)
    # threshold certification: every EXCLUDED entry's exact score is
    # provably <= the reported threshold (screen upper-bounds exact)
    excluded = set(range(12)) - {int(i) for i in idx8[0]}
    for g in excluded:
        assert dense.scores[g] <= thr8[0] + 1e-3, (g, dense.scores[g], thr8)

    # m = full gallery: unconditional equality + certified margin
    rer = engine.one_to_list_reranked(lat, pg, m=16)
    _, _, margin_full, _ = engine.match_scores_batch_reranked([lat], pg,
                                                              m=16)
    assert margin_full[0] > 0 or np.isinf(margin_full[0])
    for (dn, ds), (rn, rs) in zip(dense.ranked(12), rer.ranked(12)):
        assert dn == rn, (dense.ranked(12), rer.ranked(12))
        np.testing.assert_allclose(ds, rs, rtol=1e-4, atol=1e-4)


def test_adc_screen_codes_matches_decoded(rng):
    """Codes-resident screen == decode + plain screen (interpret mode)."""
    from msu_latentafis_tpu.matcher.texture_match import block_diag_codebook
    from msu_latentafis_tpu.utils.synthetic import random_codebook
    cb = random_codebook(rng, n_subs=4, n_clusters=16, sub_dim=2)
    D = 8
    NL, Lt, B, Rt, S = 2, 16, 4, 24, 4
    x = rng.standard_normal((NL, Lt, D)).astype(np.float32)
    lsq = np.sum(x ** 2, -1)
    lval = np.ones((NL, Lt), np.float32)
    codes = rng.integers(0, 16, (B, Rt, S)).astype(np.uint8)
    codes_t = np.swapaxes(codes, 1, 2).copy()
    dec_tensor = np.asarray(block_diag_codebook(cb), np.float32)
    dec = dec_tensor.reshape(S * 16, D)[
        (np.arange(S) * 16)[None, None, :] + codes].sum(axis=2)  # [B,Rt,D]
    dect = np.swapaxes(dec, 1, 2).copy()
    rsq = np.sum(dec.astype(np.float64) ** 2, -1).astype(np.float32)
    rval = (np.arange(Rt)[None, :] < 20).astype(np.float32) * np.ones((B, 1), np.float32)
    tdec = np.ascontiguousarray(dec_tensor.reshape(S * 16, D).T)

    want = np.asarray(pk.fused_adc_screen(
        jnp.asarray(x), jnp.asarray(lsq), jnp.asarray(lval),
        jnp.asarray(dect), jnp.asarray(rsq), jnp.asarray(rval),
        tau=1.0, interpret=True))
    got = np.asarray(pk.fused_adc_screen_codes(
        jnp.asarray(x), jnp.asarray(lsq), jnp.asarray(lval),
        jnp.asarray(codes_t), jnp.asarray(tdec), jnp.asarray(rsq),
        jnp.asarray(rval), n_clusters=16, tau=1.0, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_two_stage_prescreen_rerank(rng):
    """The two-stage serving path (truncated-latent prescreen -> full
    screen on top-k -> exact rerank) must reproduce the dense ranking for
    a planted mate, and approx_max_k's candidate set must contain it."""
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template,
                                                    random_codebook)
    cb = random_codebook(rng)
    engine = MatchEngine(cb, block_size=4)
    lat_t = make_latent_template(rng, n_minu=12, n_tex=30)
    gallery = [make_rolled_template(rng, n_minu=20, n_tex=40)
               for _ in range(24)]
    gallery[13] = make_rolled_template(rng, n_minu=20, n_tex=40,
                                       mated_latent=lat_t, codebook=cb)
    pg = engine.load_gallery(pack_gallery(gallery, cb, minu_cap=32,
                                          tex_cap=48))
    lat = pack_latent(lat_t, quantize_tex_xy=False, minu_cap=32, tex_cap=48)

    dense = np.asarray(engine.match_scores(lat, pg))[:24]
    idx, exact, margin, thr = engine.match_scores_batch_reranked(
        [lat], pg, m=8, prescreen_k=8, prescreen_lt=16, prescreen_t=1)
    srt = np.argsort(-exact[0], kind="stable")
    top = np.asarray(idx[0])[srt]
    assert top[0] == 13, (top[:5], dense[13], dense.max())
    np.testing.assert_allclose(exact[0][srt[0]], dense[13], rtol=1e-4,
                               atol=1e-4)
