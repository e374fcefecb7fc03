"""Mosaic lowering-legality guard for the TPU matcher path.

Round-2 regression class: every Pallas kernel test runs ``interpret=True``,
which skips Mosaic's ``_check_block_mappings`` — a one-line tile retuning
(entries_per_step 8 -> 4) shipped green on CPU and crashed ``bench.py`` on
the chip (BENCH_r02.json). These tests close that hole WITHOUT TPU
hardware: ``jax.export`` with ``platforms=['tpu']`` runs the real Mosaic
lowering (including the block-shape check) on a CPU host, so any plan the
wrappers emit is validated against the exact rule the chip enforces.

Shapes covered: the bench set (NL=8, B=128, Lm=64, Lt=448, Rm=96, Rt=448,
D=96 — bench.py:24) and the profile/smoke variants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jax_export

from msu_latentafis_tpu.matcher import pallas_kernels as pk
from msu_latentafis_tpu.matcher.engine import MatchEngine
from msu_latentafis_tpu.utils.synthetic import random_codebook

# bench.py shapes (1 chip, 100K gallery): per-block shapes are what Mosaic
# sees, so a 2-block gallery exercises the identical kernel plans.
NL, T, B = 8, 3, 128
LM, RM, LT, RT, D = 64, 96, 448, 448, 96


def _export_tpu(fn, *avals, **kw):
    """Lower ``fn`` for TPU on this (CPU) host — raises on Mosaic
    violations exactly like the chip would."""
    return jax_export.export(jax.jit(fn, **kw), platforms=["tpu"])(*avals)


def test_export_canary_catches_illegal_blocks():
    """Guard the guard: if a JAX upgrade stops running the block check at
    export time, this test fails and the whole file means nothing."""
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        from jax.experimental import pallas as pl
        return pl.pallas_call(
            k, grid=(4, 32),
            in_specs=[pl.BlockSpec((2, 4, 448), lambda i, j: (i, j, 0))],
            out_specs=pl.BlockSpec((2, 4, 448), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128, 448), jnp.float32))(x)

    with pytest.raises(ValueError, match="divisible by 8 and 128"):
        _export_tpu(f, jax.ShapeDtypeStruct((8, 128, 448), jnp.float32))


def test_entries_per_step_always_legal():
    for b in [1, 2, 4, 8, 12, 16, 24, 64, 100, 128, 120, 448, 1000]:
        for req in [1, 2, 4, 8, 16, 32]:
            e = pk._adc_entries_per_step(b, req)
            assert b % e == 0, (b, req, e)
            assert e % 8 == 0 or e == b, (b, req, e)


def test_latent_chunk_legal():
    for nl in [1, 2, 3, 4, 8, 16]:
        for lt in [8, 200, 448, 100]:
            c = pk._adc_latent_chunk(nl, lt, 448)
            assert nl % c == 0
            assert (c * lt) % 8 == 0 or c == nl, (nl, lt, c)


def _aval(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def test_adc_rowmax_lowers_at_bench_shapes():
    # the exact r02 crash site: entries_per_step=4 must now produce a legal
    # plan (clamped up) instead of a Mosaic ValueError on the chip
    for eps in (4, 8):
        _export_tpu(
            lambda x, sq, dect, rsq, rv, eps=eps: pk.fused_adc_rowmax(
                x, sq, dect, rsq, rv, entries_per_step=eps),
            _aval((NL, LT, D), jnp.bfloat16), _aval((NL, LT)),
            _aval((B, D, RT), jnp.int8), _aval((B, RT)), _aval((B, RT)))


def test_adc_rowmax_codes_lowers_at_bench_shapes():
    for eps in (4, 8):
        _export_tpu(
            lambda x, sq, ct, td, rsq, rv, eps=eps: pk.fused_adc_rowmax_codes(
                x, sq, ct, td, rsq, rv, entries_per_step=eps),
            _aval((NL, LT, D), jnp.bfloat16), _aval((NL, LT)),
            _aval((B, 16, RT), jnp.uint8),
            _aval((D, 16 * 256), jnp.bfloat16),
            _aval((B, RT)), _aval((B, RT)))


def test_texture_match_lowers_at_bench_shapes():
    _export_tpu(
        lambda best, bj, lv, lp, rp: pk.fused_texture_match(
            best, bj, lv, lp, rp, top_n=200, lookup=True, dist_iters=3),
        _aval((NL, B, LT)), _aval((NL, B, LT), jnp.int32),
        _aval((NL, LT)), _aval((NL, 4, LT)), _aval((B, 4, RT)))


def test_minutiae_match_lowers_at_bench_shapes():
    _export_tpu(
        lambda ld, lv, rd, rv, lp, rp: pk.fused_minutiae_match(
            ld, lv, rd, rv, lp, rp, top_n=120, lookup=False, dist_iters=5),
        _aval((NL * T, LM, D), jnp.bfloat16), _aval((NL * T, LM)),
        _aval((B, D, RM), jnp.bfloat16), _aval((B, RM)),
        _aval((NL * T, 4, LM)), _aval((B, 4, RM)))


def _bench_engine(**kw):
    rng = np.random.default_rng(0)
    eng = MatchEngine(random_codebook(rng), block_size=B,
                      compute_dtype=jnp.bfloat16, **kw)
    eng.force_tpu_path = True
    return eng


def _lat_avals():
    return dict(minu_des=_aval((NL, T, LM, D)),
                minu_xy=_aval((NL, T, LM, 2)),
                minu_ori=_aval((NL, T, LM)),
                minu_n=_aval((NL, T), jnp.int32),
                tex_des=_aval((NL, LT, D)),
                tex_xy=_aval((NL, LT, 2)),
                tex_ori=_aval((NL, LT)),
                tex_n=_aval((NL,), jnp.int32))


def _gal_avals(G, tex):
    d = dict(minu_des=_aval((G, D, RM), jnp.bfloat16),
             minu_x=_aval((G, RM)), minu_y=_aval((G, RM)),
             minu_ori=_aval((G, RM)), minu_n=_aval((G,), jnp.int32),
             tex_sqnorm=_aval((G, RT)),
             tex_x=_aval((G, RT)), tex_y=_aval((G, RT)),
             tex_ori=_aval((G, RT)), tex_n=_aval((G,), jnp.int32))
    d.update(tex)
    return d


def test_match_all_lowers_tpu_bench_config():
    """bench.py's exact engine config (bf16, int8 predecoded textures)
    through the full scan — covers every kernel with real shape flow."""
    eng = _bench_engine(tex_int8=True)
    G = 2 * B
    _export_tpu(eng._match_all, _lat_avals(),
                _gal_avals(G, dict(tex_dec=_aval((G, D, RT), jnp.int8))))


def test_match_all_lowers_tpu_codes_resident():
    """codes-resident mode (>HBM-budget galleries): in-VMEM PQ decode."""
    eng = _bench_engine()
    G = 2 * B
    _export_tpu(eng._match_all, _lat_avals(),
                _gal_avals(G, dict(tex_codes_t=_aval((G, 16, RT),
                                                     jnp.uint8))))


def test_screen_kernels_lower_at_bench_shapes():
    _export_tpu(
        lambda x, sq, lv, dect, rsq, rv: pk.fused_adc_screen(
            x, sq, lv, dect, rsq, rv, tau=3.0),
        _aval((NL, LT, D), jnp.bfloat16), _aval((NL, LT)), _aval((NL, LT)),
        _aval((B, D, RT), jnp.int8), _aval((B, RT)), _aval((B, RT)))
    for normalize in (False, True):
        _export_tpu(
            lambda ld, lv, rd, rv, n=normalize: pk.fused_minu_screen(
                ld, lv, rd, rv, normalize=n),
            _aval((NL * T, LM, D), jnp.bfloat16), _aval((NL * T, LM)),
            _aval((B, D, RM), jnp.bfloat16), _aval((B, RM)))


def test_screen_all_lowers_tpu_bench_config():
    eng = _bench_engine(tex_int8=True)
    G = 2 * B
    _export_tpu(eng._screen_all, _lat_avals(),
                _gal_avals(G, dict(tex_dec=_aval((G, D, RT), jnp.int8))))


def test_rerank_fn_lowers_tpu_bench_config():
    """Full serving path (screen -> top-k -> per-latent gather + exact
    rerank) lowers for TPU at bench-block shapes."""
    eng = _bench_engine(tex_int8=True)
    G = 2 * B
    fn = eng._rerank_fn(m_pad=B, tau=0.0, normalize=False)
    jax_export.export(fn, platforms=["tpu"])(
        _lat_avals(), _gal_avals(G, dict(tex_dec=_aval((G, D, RT),
                                                       jnp.int8))))


def test_kernels_lower_at_cap_shapes():
    """Reference-cap shapes (Lt=Rt=1000, Lm=Rm=128 — matcher.h:31-32):
    the ladder's spec100k entry runs these; block plans must stay legal.
    (VMEM fit is NOT checkable on CPU — scripts/tpu_smoke.py + the ladder
    cover that on hardware.)"""
    LTc = RTc = 1000
    LMc = RMc = 128
    NLc, Bc = 4, 256
    _export_tpu(
        lambda x, sq, ct, td, rsq, rv: pk.fused_adc_rowmax_codes(
            x, sq, ct, td, rsq, rv),
        _aval((NLc, LTc, D), jnp.bfloat16), _aval((NLc, LTc)),
        _aval((Bc, 16, RTc), jnp.uint8), _aval((D, 16 * 256), jnp.bfloat16),
        _aval((Bc, RTc)), _aval((Bc, RTc)))
    _export_tpu(
        lambda ld, lv, rd, rv, lp, rp: pk.fused_minutiae_match(
            ld, lv, rd, rv, lp, rp, top_n=120, lookup=False, dist_iters=5),
        _aval((NLc * T, LMc, D), jnp.bfloat16), _aval((NLc * T, LMc)),
        _aval((Bc, D, RMc), jnp.int8), _aval((Bc, RMc)),
        _aval((NLc * T, 4, LMc)), _aval((Bc, 4, RMc)))
    _export_tpu(
        lambda best, bj, lv, lp, rp: pk.fused_texture_match(
            best, bj, lv, lp, rp, top_n=200, lookup=True, dist_iters=3),
        _aval((NLc, Bc, LTc)), _aval((NLc, Bc, LTc), jnp.int32),
        _aval((NLc, LTc)), _aval((NLc, 4, LTc)), _aval((Bc, 4, RTc)))
    _export_tpu(
        lambda x, sq, lv, dect, rsq, rv: pk.fused_adc_screen(
            x, sq, lv, dect, rsq, rv, tau=3.0),
        _aval((NLc, LTc, D), jnp.bfloat16), _aval((NLc, LTc)),
        _aval((NLc, LTc)), _aval((Bc, D, RTc), jnp.int8),
        _aval((Bc, RTc)), _aval((Bc, RTc)))


def test_adc_screen_codes_lowers():
    for Bx, LTx, RTx in [(B, LT, RT), (256, 1000, 1000)]:
        _export_tpu(
            lambda x, sq, lv, ct, td, rsq, rv: pk.fused_adc_screen_codes(
                x, sq, lv, ct, td, rsq, rv, tau=3.0),
            _aval((NL, LTx, D), jnp.bfloat16), _aval((NL, LTx)),
            _aval((NL, LTx)), _aval((Bx, 16, RTx), jnp.uint8),
            _aval((D, 16 * 256), jnp.bfloat16),
            _aval((Bx, RTx)), _aval((Bx, RTx)))


def test_rerank_fn_lowers_tpu_cap_shapes_codes_resident():
    """The ladder's spec100k serving mode: codes-resident + int8-minutiae
    engine, reference-cap shapes (Lt=Rt=1000, Lm=Rm=128), m=512 rerank —
    the exact config scripts/bench_ladder.py dispatches on the chip."""
    LTc = RTc = 1000
    LMc = RMc = 128
    NLc, Bc = 4, 256
    eng = MatchEngine(random_codebook(np.random.default_rng(0)),
                      block_size=Bc, compute_dtype=jnp.bfloat16,
                      codes_resident=True, minu_int8=True)
    eng.force_tpu_path = True
    G = 2 * Bc
    lat = dict(minu_des=_aval((NLc, T, LMc, D)),
               minu_xy=_aval((NLc, T, LMc, 2)),
               minu_ori=_aval((NLc, T, LMc)),
               minu_n=_aval((NLc, T), jnp.int32),
               tex_des=_aval((NLc, LTc, D)),
               tex_xy=_aval((NLc, LTc, 2)),
               tex_ori=_aval((NLc, LTc)),
               tex_n=_aval((NLc,), jnp.int32))
    gal = dict(minu_des=_aval((G, D, RMc), jnp.int8),
               minu_scale=_aval((1,)),
               minu_x=_aval((G, RMc)), minu_y=_aval((G, RMc)),
               minu_ori=_aval((G, RMc)), minu_n=_aval((G,), jnp.int32),
               tex_sqnorm=_aval((G, RTc)),
               tex_x=_aval((G, RTc)), tex_y=_aval((G, RTc)),
               tex_ori=_aval((G, RTc)), tex_n=_aval((G,), jnp.int32),
               tex_codes_t=_aval((G, 16, RTc), jnp.uint8))
    fn = eng._rerank_fn(m_pad=Bc, tau=0.0, normalize=False)
    jax_export.export(fn, platforms=["tpu"])(lat, gal)
