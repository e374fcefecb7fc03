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


@pytest.mark.parametrize("lookup,iters,use_simi", [
    (True, 3, False), (False, 5, False), (False, 5, True), (True, 3, True)])
def test_fused_graph_filter_infuse_matches_packed(rng, lookup, iters,
                                                  use_simi):
    """In-kernel one-hot gathers (and optional in-kernel value recovery)
    must reproduce fused_graph_filter_packed fed with XLA-side gathers."""
    NT, B, K, P, R = 2, 4, 32, 16, 24
    hi = 30 if lookup else 480
    lx = rng.integers(0, hi, (NT, P)).astype(np.float32)
    ly = rng.integers(0, hi, (NT, P)).astype(np.float32)
    lo = rng.uniform(-np.pi, np.pi, (NT, P)).astype(np.float32)
    rx = rng.integers(0, hi, (B, R)).astype(np.float32)
    ry = rng.integers(0, hi, (B, R)).astype(np.float32)
    ro = rng.uniform(-np.pi, np.pi, (B, R)).astype(np.float32)
    lpackT = jnp.asarray(np.stack([lx, ly, np.cos(lo), np.sin(lo)], axis=1))
    rpackT = jnp.asarray(np.stack([rx, ry, np.cos(ro), np.sin(ro)], axis=1))
    li = rng.integers(0, P, (NT, B, K)).astype(np.int32)
    ri = rng.integers(0, R, (NT, B, K)).astype(np.int32)
    valid = rng.random((NT, B, K)) > 0.15

    if use_simi:
        simi = rng.uniform(0.0, 3.0, (NT, B, P, R)).astype(np.float32)
        val = np.take_along_axis(
            simi.reshape(NT, B, P * R), li * R + ri, axis=2)
        val_arg, simi_arg = None, jnp.asarray(simi)
    else:
        val = rng.uniform(0.5, 3.0, (NT, B, K)).astype(np.float32)
        val_arg, simi_arg = jnp.asarray(val), None

    got = pk.fused_graph_filter_infuse(
        val_arg, jnp.asarray(li), jnp.asarray(ri), jnp.asarray(valid),
        lpackT, rpackT, lookup=lookup, dist_iters=iters, simi=simi_arg,
        tile_b=2, interpret=True)

    # XLA-side gathers -> packed kernel (already validated vs the reference)
    gl = np.stack([np.take_along_axis(
        np.broadcast_to(lpackT[:, j, None, :], (NT, B, P)).reshape(NT, B, P),
        li, axis=2) for j in range(4)], axis=-1)           # [NT, B, K, 4]
    gr = np.stack([np.take_along_axis(
        np.broadcast_to(np.asarray(rpackT)[None, :, j, :], (NT, B, R)),
        ri, axis=2) for j in range(4)], axis=-1)
    flat = lambda a: jnp.asarray(a.reshape((NT * B,) + a.shape[2:]))
    want = pk.fused_graph_filter_packed(
        flat(val), flat(np.asarray(gl)), flat(gr), flat(li), flat(ri),
        flat(valid), lookup=lookup, dist_iters=iters, tile=2,
        interpret=True).reshape(NT, B)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_minutiae_match_matches_composed(rng):
    """The end-to-end minutiae kernel (similarity + mutual norm + top-K
    threshold selection + filter) must reproduce the composed XLA path
    (minutiae_similarity -> exact top_k correspondences -> filter) whenever
    no latent row holds more than row_cap of the true top-K."""
    from msu_latentafis_tpu.matcher.minutiae_match import (
        minutiae_correspondences, minutiae_similarity)
    NT, B, P, R, D, K = 2, 4, 16, 24, 32, 20
    lat_des = rng.standard_normal((NT, P, D)).astype(np.float32)
    lat_des /= np.linalg.norm(lat_des, axis=-1, keepdims=True)
    rol_des = rng.standard_normal((B, R, D)).astype(np.float32)
    rol_des /= np.linalg.norm(rol_des, axis=-1, keepdims=True)
    rol_des_t = jnp.asarray(np.swapaxes(rol_des, 1, 2))
    lat_valid = rng.random((NT, P)) > 0.1
    rol_valid = rng.random((B, R)) > 0.1
    lx = rng.integers(0, 480, (NT, P)).astype(np.float32)
    ly = rng.integers(0, 480, (NT, P)).astype(np.float32)
    lo = rng.uniform(-np.pi, np.pi, (NT, P)).astype(np.float32)
    rx = rng.integers(0, 480, (B, R)).astype(np.float32)
    ry = rng.integers(0, 480, (B, R)).astype(np.float32)
    ro = rng.uniform(-np.pi, np.pi, (B, R)).astype(np.float32)
    lpackT = jnp.asarray(np.stack([lx, ly, np.cos(lo), np.sin(lo)], axis=1))
    rpackT = jnp.asarray(np.stack([rx, ry, np.cos(ro), np.sin(ro)], axis=1))

    got = pk.fused_minutiae_match(
        jnp.asarray(lat_des), jnp.asarray(lat_valid, jnp.float32),
        rol_des_t, jnp.asarray(rol_valid, jnp.float32), lpackT, rpackT,
        top_n=K, row_cap=R, tile_b=2, interpret=True)

    simi = minutiae_similarity(
        jnp.asarray(lat_des)[:, None], jnp.asarray(lat_valid)[:, None],
        rol_des_t[None], jnp.asarray(rol_valid)[None])        # [NT,B,P,R]
    corr = jax.vmap(jax.vmap(
        lambda s, lv, rv: minutiae_correspondences(s, lv, rv, top_n=K),
        in_axes=(0, None, 0)), in_axes=(0, 0, None))(
        simi, jnp.asarray(lat_valid), jnp.asarray(rol_valid))
    val, li, ri, valid = corr
    want = pk.fused_graph_filter_infuse(
        val, li, ri, valid, lpackT, rpackT, lookup=False, dist_iters=5,
        tile_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_minutiae_match_row_cap_recall(rng):
    """row_cap=8 must reproduce the uncapped selection on descriptor-like
    data (mutual normalization keeps per-row membership in the top-K
    small); validates the approximation knob actually used on TPU."""
    NT, B, P, R, D, K = 1, 2, 32, 48, 64, 60
    lat_des = rng.standard_normal((NT, P, D)).astype(np.float32)
    lat_des /= np.linalg.norm(lat_des, axis=-1, keepdims=True)
    rol_des = rng.standard_normal((B, R, D)).astype(np.float32)
    rol_des /= np.linalg.norm(rol_des, axis=-1, keepdims=True)
    rol_des_t = jnp.asarray(np.swapaxes(rol_des, 1, 2))
    ones_l = jnp.ones((NT, P), jnp.float32)
    ones_r = jnp.ones((B, R), jnp.float32)
    lpackT = jnp.asarray(
        rng.uniform(0, 480, (NT, 4, P)).astype(np.float32))
    rpackT = jnp.asarray(
        rng.uniform(0, 480, (B, 4, R)).astype(np.float32))
    capped = pk.fused_minutiae_match(
        jnp.asarray(lat_des), ones_l, rol_des_t, ones_r, lpackT, rpackT,
        top_n=K, row_cap=8, tile_b=2, interpret=True)
    full = pk.fused_minutiae_match(
        jnp.asarray(lat_des), ones_l, rol_des_t, ones_r, lpackT, rpackT,
        top_n=K, row_cap=R, tile_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_fused_texture_match_matches_composed(rng):
    """Threshold top-K + filter over ADC row maxima == XLA top_k +
    take_along_axis + packed filter kernel."""
    NL, B, Lt, R, K = 2, 4, 48, 32, 24
    best = rng.uniform(-3, 6, (NL, B, Lt)).astype(np.float32)
    bestj = rng.integers(0, R, (NL, B, Lt)).astype(np.int32)
    lat_valid = rng.random((NL, Lt)) > 0.1
    # some rows with no valid rolled minutiae at all
    best[rng.random((NL, B, Lt)) < 0.05] = pk.NEG_BIG
    lx = rng.integers(0, 30, (NL, Lt)).astype(np.float32)
    ly = rng.integers(0, 30, (NL, Lt)).astype(np.float32)
    lo = rng.uniform(-np.pi, np.pi, (NL, Lt)).astype(np.float32)
    rx = rng.integers(0, 30, (B, R)).astype(np.float32)
    ry = rng.integers(0, 30, (B, R)).astype(np.float32)
    ro = rng.uniform(-np.pi, np.pi, (B, R)).astype(np.float32)
    lpackT = jnp.asarray(np.stack([lx, ly, np.cos(lo), np.sin(lo)], axis=1))
    rpackT = jnp.asarray(np.stack([rx, ry, np.cos(ro), np.sin(ro)], axis=1))

    got = pk.fused_texture_match(
        jnp.asarray(best), jnp.asarray(bestj),
        jnp.asarray(lat_valid, jnp.float32), lpackT, rpackT,
        top_n=K, lookup=True, dist_iters=3, tile_b=2, interpret=True)

    bestm = jnp.where(jnp.asarray(lat_valid)[:, None, :],
                      jnp.asarray(best), pk.NEG_BIG)
    topv, li = jax.lax.top_k(bestm, K)
    ri = jnp.take_along_axis(jnp.asarray(bestj), li, axis=2)
    tvalid = topv > pk.NEG_BIG / 2
    tval = jnp.where(tvalid, topv, 0.0)
    want = pk.fused_graph_filter_infuse(
        tval, li, ri, tvalid, lpackT, rpackT, lookup=True, dist_iters=3,
        tile_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_minutiae_correspondence_indices_matches_full(rng):
    from msu_latentafis_tpu.matcher.minutiae_match import (
        minutiae_correspondence_indices, minutiae_correspondences)
    NT, B, Lm, Rm = 2, 3, 20, 28
    simi = jnp.asarray(rng.uniform(0, 2, (NT, B, Lm, Rm)), jnp.float32)
    lat_valid = jnp.asarray(rng.random((NT, Lm)) > 0.2)
    rol_valid = jnp.asarray(rng.random((B, Rm)) > 0.2)
    simi = jnp.where(lat_valid[:, None, :, None]
                     & rol_valid[None, :, None, :], simi, 0.0)

    li, ri, valid = minutiae_correspondence_indices(
        simi, lat_valid, rol_valid, top_n=40, approx=False)

    want = jax.vmap(jax.vmap(
        lambda s, lv, rv: minutiae_correspondences(s, lv, rv, top_n=40),
        in_axes=(0, None, 0)), in_axes=(0, 0, None))(
        simi, lat_valid, rol_valid)
    _, wli, wri, wvalid = want
    np.testing.assert_array_equal(np.asarray(li), np.asarray(wli))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(wri))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(wvalid))


@pytest.mark.parametrize("lookup", [False, True])
def test_fused_graph_filter_stage2_compaction_exact(rng, lookup):
    """stage2_cap compaction must reproduce the uncompacted filter when
    latent indices take fewer than `cap` distinct values (the production
    invariant: greedy-1 survivors have pairwise-distinct li)."""
    NP, K, CAP = 8, 48, 16
    hi = 30 if lookup else 480
    val = jnp.asarray(rng.uniform(0.5, 3.0, (NP, K)), jnp.float32)
    gl = jnp.asarray(rng.integers(0, hi, (NP, K, 4)), jnp.float32)
    gr = jnp.asarray(rng.integers(0, hi, (NP, K, 4)), jnp.float32)
    gl = gl.at[..., 2:].set(jnp.asarray(
        rng.uniform(-1, 1, (NP, K, 2)), jnp.float32))
    gr = gr.at[..., 2:].set(jnp.asarray(
        rng.uniform(-1, 1, (NP, K, 2)), jnp.float32))
    li = jnp.asarray(rng.integers(0, CAP, (NP, K)), jnp.int32)  # <= CAP ids
    ri = jnp.asarray(rng.integers(0, 400, (NP, K)), jnp.int32)
    valid = jnp.asarray(rng.random((NP, K)) > 0.15)
    base = pk.fused_graph_filter_packed(
        val, gl, gr, li, ri, valid, lookup=lookup,
        dist_iters=3 if lookup else 5, tile=4, interpret=True)
    compact = pk.fused_graph_filter_packed(
        val, gl, gr, li, ri, valid, lookup=lookup,
        dist_iters=3 if lookup else 5, tile=4, stage2_cap=CAP,
        interpret=True)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
