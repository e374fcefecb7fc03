"""Pallas TPU kernels for the matcher's hot path.

``fused_adc_rowmax``: the texture-scoring kernel. The reference's hottest
loop computes a [Lt, Rt] ADC similarity matrix per pair and immediately
reduces it to per-latent-minutia row maxima (matcher.cpp:564-735). The XLA
einsum formulation materializes the [NL, B, Lt, Rt] similarity tensor in
HBM (~0.8 GB per gallery block) just to reduce it — this kernel fuses the
MXU matmul, the similarity correction, the validity masking, and the
row-max/argmax inside VMEM, so only the [NL, B, Lt] maxima ever leave the
chip. Grid is (NL latents x B gallery entries); each step runs one
[Lt, D] x [D, Rt] matmul tile plus VPU reductions.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30
_COS_PI_4 = float(np.cos(np.pi / 4))
_COS_PI_6 = float(np.cos(np.pi / 6))


def _adc_rowmax_kernel(x_ref, lsq_ref, dect_ref, rsq_ref, tvalid_ref,
                       best_ref, bestj_ref):
    # x: [Lt, D] (one latent); dect: [D, Rt] (one gallery entry, transposed)
    # lsq: [1, Lt]; rsq / tvalid: [1, Rt]; outputs: [1, Lt]
    x = x_ref[...]
    dect = dect_ref[...]
    if dect.dtype != x.dtype:        # int8-stored gallery: cast in VMEM
        dect = dect.astype(x.dtype)
    dots = jnp.dot(x, dect, preferred_element_type=jnp.float32)   # [Lt, Rt]
    simi = 2.0 * dots + (6.0 - lsq_ref[0, :][:, None] - rsq_ref[0, :][None, :])
    # invalid rolled minutiae drop out of the row max
    simi = simi + (tvalid_ref[0, :][None, :] - 1.0) * (-NEG_BIG)
    best_ref[0, :] = jnp.max(simi, axis=1)
    bestj_ref[0, :] = jnp.argmax(simi, axis=1).astype(jnp.int32)


def _greedy_rounds(S, blockers, eligible):
    """Parallel greedy-by-priority rounds over a [T, K] tile (see
    graph_filter.greedy_one_to_one for the equivalence argument). Carries
    are f32 masks — Mosaic cannot legalize while_loop over i1 vectors."""
    elig_f = eligible.astype(jnp.float32)

    def cond(state):
        sel, rej = state
        return jnp.sum(elig_f * (1.0 - sel) * (1.0 - rej)) > 0.0

    def body(state):
        sel, rej = state
        undecided = elig_f * (1.0 - sel) * (1.0 - rej)
        blocked_by_sel = (jnp.sum(blockers * sel[:, None, :], axis=2)
                          > 0.5).astype(jnp.float32)
        any_live = (jnp.sum(blockers * (1.0 - rej)[:, None, :], axis=2)
                    > 0.5).astype(jnp.float32)
        sel = jnp.minimum(sel + undecided * (1.0 - any_live), 1.0)
        rej = jnp.minimum(rej + undecided * blocked_by_sel, 1.0)
        return sel, rej

    zeros = jnp.zeros_like(elig_f)
    sel, _ = jax.lax.while_loop(cond, body, (zeros, zeros))
    return sel > 0.5


def _power_iter(H, b0, iters):
    def body(_, b):
        c = jnp.sum(H * b[:, None, :], axis=2)
        s = jnp.sum(c, axis=1, keepdims=True)
        return c / (s + 1e-5)
    return jax.lax.fori_loop(0, iters, body, b0)


def _blockers(S, badf, eligible, idx_f):
    """j blocks i: j outranks i (ties to lower index) and selecting j
    excludes i. [T, K, K] f32. Pairwise logic runs in f32 (Mosaic cannot
    insert dims on 1-bit vectors)."""
    gt = (S[:, None, :] > S[:, :, None]).astype(jnp.float32)
    eq_tie = ((S[:, None, :] == S[:, :, None])
              & (idx_f[None, None, :] < idx_f[None, :, None])).astype(jnp.float32)
    outranks = jnp.minimum(gt + eq_tie, 1.0)
    ef = eligible.astype(jnp.float32)
    return badf * outranks * ef[:, None, :] * ef[:, :, None]


def _filter_body(val, lx, ly, lc, ls, rx, ry, rc, rs, li, ri, vf,
                 lookup: bool, dist_iters: int, K: int):
    """Shared straight-line filter body over a [T, K] tile of correspondence
    sets: distance H + power iterations + greedy rounds + angle H + power +
    greedy. Returns the per-set filtered scores [T]."""
    d_thr = 30.0
    lut_n = 50.0
    valid = vf > 0.5

    idx_f = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)[0] \
        .astype(jnp.float32)
    eyef = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)) \
        .astype(jnp.float32)
    neyef = 1.0 - eyef                                    # [K, K]

    # ---- stage 1: distance-consistency H
    dxl = lx[:, :, None] - lx[:, None, :]
    dyl = ly[:, :, None] - ly[:, None, :]
    dxr = rx[:, :, None] - rx[:, None, :]
    dyr = ry[:, :, None] - ry[:, None, :]
    if lookup:
        adxl, adyl = jnp.abs(dxl), jnp.abs(dyl)
        adxr, adyr = jnp.abs(dxr), jnp.abs(dyr)
        in_rangef = ((adxl < lut_n) & (adyl < lut_n)
                     & (adxr < lut_n) & (adyr < lut_n)) \
            .astype(jnp.float32)
        d1 = 16.0 * jnp.sqrt(adxl * adxl + adyl * adyl)
        d2 = 16.0 * jnp.sqrt(adxr * adxr + adyr * adyr)
    else:
        in_rangef = jnp.ones(dxl.shape, jnp.float32)
        d1 = jnp.sqrt(dxl * dxl + dyl * dyl)
        d2 = jnp.sqrt(dxr * dxr + dyr * dyr)
    dist = jnp.abs(d1 - d2)
    H1 = jnp.clip((30.0 - dist) / 25.0, 0.0, 1.0)
    pairf = vf[:, None, :] * vf[:, :, None] * neyef[None]
    gatef = in_rangef * (dist <= d_thr).astype(jnp.float32) * pairf
    H1 = H1 * gatef

    b0 = jnp.where(valid, val, 0.0)
    S1 = _power_iter(H1, b0, dist_iters)

    conflictf = jnp.minimum(
        (li[:, :, None] == li[:, None, :]).astype(jnp.float32)
        + (ri[:, :, None] == ri[:, None, :]).astype(jnp.float32), 1.0)
    bad1f = jnp.minimum(conflictf
                        + (H1 < 1e-5).astype(jnp.float32), 1.0) * neyef[None]
    elig1 = valid & (S1 >= 1e-4)
    sel1 = _greedy_rounds(S1, _blockers(S1, bad1f, elig1, idx_f), elig1)

    # ---- stage 2: angle-consistency H (trig-free)
    cos_rel_l = lc[:, :, None] * lc[:, None, :] + ls[:, :, None] * ls[:, None, :]
    sin_rel_l = ls[:, :, None] * lc[:, None, :] - lc[:, :, None] * ls[:, None, :]
    cos_rel_r = rc[:, :, None] * rc[:, None, :] + rs[:, :, None] * rs[:, None, :]
    sin_rel_r = rs[:, :, None] * rc[:, None, :] - rc[:, :, None] * rs[:, None, :]
    t1 = (cos_rel_l * cos_rel_r + sin_rel_l * sin_rel_r) >= _COS_PI_4

    r2l = dxl * dxl + dyl * dyl
    zl = r2l == 0.0
    invl = jax.lax.rsqrt(jnp.where(zl, 1.0, r2l))
    cLl = jnp.where(zl, 1.0, dxl * invl)
    sLl = jnp.where(zl, 0.0, -dyl * invl)
    r2r = dxr * dxr + dyr * dyr
    zr = r2r == 0.0
    invr = jax.lax.rsqrt(jnp.where(zr, 1.0, r2r))
    cLr = jnp.where(zr, 1.0, dxr * invr)
    sLr = jnp.where(zr, 0.0, -dyr * invr)

    def cdd(c_a, s_a, c_b, s_b, c_c, s_c, c_d, s_d):
        cab = c_a * c_b + s_a * s_b
        sab = s_a * c_b - c_a * s_b
        ccd = c_c * c_d + s_c * s_d
        scd = s_c * c_d - c_c * s_d
        return cab * ccd + sab * scd

    t2 = cdd(lc[:, :, None], ls[:, :, None], cLl, sLl,
             rc[:, :, None], rs[:, :, None], cLr, sLr) >= _COS_PI_6
    t3 = cdd(lc[:, None, :], ls[:, None, :], cLl, sLl,
             rc[:, None, :], rs[:, None, :], cLr, sLr) >= _COS_PI_6

    s1f = sel1.astype(jnp.float32)
    selpairf = s1f[:, None, :] * s1f[:, :, None] * neyef[None]
    H2f = (t1 & t2 & t3).astype(jnp.float32) * selpairf

    n2 = jnp.sum(s1f, axis=1, keepdims=True)
    b2 = jnp.where(sel1, 1.0 / jnp.maximum(n2, 1.0), 0.0)
    S2 = _power_iter(H2f, b2, 5)

    bad2f = jnp.minimum(conflictf
                        + (H2f < 0.5).astype(jnp.float32), 1.0) * neyef[None]
    elig2 = sel1 & (S2 >= 1e-3)
    sel2 = _greedy_rounds(S2, _blockers(S2, bad2f, elig2, idx_f), elig2)

    return jnp.sum(jnp.where(sel2, val, 0.0), axis=1)


def _make_filter_kernel(lookup: bool, dist_iters: int, K: int):
    def kernel(val_ref, lx_ref, ly_ref, lc_ref, ls_ref, rx_ref, ry_ref,
               rc_ref, rs_ref, li_ref, ri_ref, valid_ref, score_ref):
        score = _filter_body(
            val_ref[...], lx_ref[...], ly_ref[...], lc_ref[...], ls_ref[...],
            rx_ref[...], ry_ref[...], rc_ref[...], rs_ref[...],
            li_ref[...], ri_ref[...], valid_ref[...],
            lookup, dist_iters, K)
        score_ref[...] = score[:, None]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("lookup", "dist_iters", "tile",
                                    "interpret"))
def fused_graph_filter(val, lxy, lori, rxy, rori, li, ri, valid,
                       lookup: bool, dist_iters: int, tile: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """Both graph-consistency stages + greedy selection as one kernel.

    All inputs are per-correspondence-set arrays [NP, K] (coordinates and
    orientations already gathered at the correspondence slots). Returns the
    filtered match scores [NP] f32. Internally: distance H + power
    iterations + parallel-greedy rounds + angle H + power + greedy, all in
    VMEM — the XLA formulation dispatches dozens of small [NP, K, K] ops
    per gallery block, this kernel runs them as straight-line VPU code per
    tile of ``tile`` correspondence sets.
    """
    NP, K = val.shape
    pad = (-NP) % tile
    lx, ly = lxy[..., 0], lxy[..., 1]
    rx, ry = rxy[..., 0], rxy[..., 1]
    lc, ls = jnp.cos(lori), jnp.sin(lori)
    rc, rs = jnp.cos(rori), jnp.sin(rori)
    lif = li.astype(jnp.float32)
    rif = ri.astype(jnp.float32)
    validf = valid.astype(jnp.float32)

    arrays = [val, lx, ly, lc, ls, rx, ry, rc, rs, lif, rif, validf]
    if pad:
        arrays = [jnp.concatenate([a, jnp.zeros((pad, K), jnp.float32)])
                  for a in arrays]
    NPp = NP + pad

    kernel = _make_filter_kernel(lookup, dist_iters, K)
    grid = (NPp // tile,)
    spec = pl.BlockSpec((tile, K), lambda t: (t, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * len(arrays),
        out_specs=pl.BlockSpec((tile, 1), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((NPp, 1), jnp.float32),
        interpret=interpret,
    )(*arrays)
    return out[:NP, 0]


@functools.partial(jax.jit,
                   static_argnames=("lookup", "dist_iters", "tile",
                                    "interpret"))
def fused_graph_filter_packed(val, gl, gr, li, ri, valid, lookup: bool,
                              dist_iters: int, tile: int = 0,
                              interpret: bool = False) -> jnp.ndarray:
    """fused_graph_filter taking packed gathered operands.

    ``gl`` / ``gr`` are [NP, K, 4] = (x, y, cos ori, sin ori) gathered at
    the correspondence slots (one wide gather per side at the call site
    instead of five elementwise ones).
    """
    NP, K = val.shape
    if tile == 0:
        # keep the ~10 live [tile, K, K] f32 arrays within VMEM
        tile = 16 if K <= 128 else 8
    pad = (-NP) % tile
    lx, ly, lc, ls = (gl[..., j] for j in range(4))
    rx, ry, rc, rs = (gr[..., j] for j in range(4))
    arrays = [val, lx, ly, lc, ls, rx, ry, rc, rs,
              li.astype(jnp.float32), ri.astype(jnp.float32),
              valid.astype(jnp.float32)]
    if pad:
        arrays = [jnp.concatenate([a, jnp.zeros((pad, K), jnp.float32)])
                  for a in arrays]
    NPp = NP + pad

    kernel = _make_filter_kernel(lookup, dist_iters, K)
    spec = pl.BlockSpec((tile, K), lambda t: (t, 0))
    out = pl.pallas_call(
        kernel,
        grid=(NPp // tile,),
        in_specs=[spec] * len(arrays),
        out_specs=pl.BlockSpec((tile, 1), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((NPp, 1), jnp.float32),
        interpret=interpret,
    )(*arrays)
    return out[:NP, 0]


def _make_filter_gather_kernel(lookup: bool, dist_iters: int, K: int,
                               tile_b: int, P: int, R: int,
                               recover_val: bool):
    """Filter kernel with IN-KERNEL operand gathers.

    XLA gathers on TPU are per-element slow (~90-400M elements/s); gathering
    the per-correspondence coordinate packs for every (template, gallery)
    pair dominated the match step. Here the kernel receives the raw
    coordinate packs (latent [4, P] — shared by a whole gallery block — and
    rolled [tile_b, 4, R]) plus the correspondence indices, and performs the
    gathers as one-hot MXU matmuls in VMEM: gl = lpackT @ onehot(li).
    With ``recover_val`` the correspondence weights are also recovered from
    the similarity block (val[k] = simi[li_k, ri_k] via two one-hot
    contractions), eliminating the [NP, K] value gather entirely.
    """

    def kernel(*refs):
        if recover_val:
            li_ref, ri_ref, valid_ref, lpackT_ref, rpackT_ref, simi_ref, \
                score_ref = refs
        else:
            val_ref, li_ref, ri_ref, valid_ref, lpackT_ref, rpackT_ref, \
                score_ref = refs
        li, ri = li_ref[...], ri_ref[...]                  # [tile_b, K] f32
        vf = valid_ref[...]
        lpackT = lpackT_ref[...]                           # [4, P]
        iota_pk = jax.lax.broadcasted_iota(jnp.int32, (P, K), 0) \
            .astype(jnp.float32)
        iota_rk = jax.lax.broadcasted_iota(jnp.int32, (R, K), 0) \
            .astype(jnp.float32)
        gls, grs, vals = [], [], []
        for s in range(tile_b):
            oh_lT = (iota_pk == li[s][None, :]).astype(jnp.float32)  # [P, K]
            oh_rT = (iota_rk == ri[s][None, :]).astype(jnp.float32)  # [R, K]
            gls.append(jnp.dot(lpackT, oh_lT,
                               preferred_element_type=jnp.float32))  # [4, K]
            grs.append(jnp.dot(rpackT_ref[s], oh_rT,
                               preferred_element_type=jnp.float32))
            if recover_val:
                simi_s = simi_ref[s].astype(jnp.float32)             # [P, R]
                tmp = jnp.dot(simi_s, oh_rT,
                              preferred_element_type=jnp.float32)    # [P, K]
                vals.append(jnp.sum(tmp * oh_lT, axis=0))            # [K]
        gl = jnp.stack(gls)                                # [tile_b, 4, K]
        gr = jnp.stack(grs)
        val = jnp.stack(vals) if recover_val else val_ref[...]
        score = _filter_body(val, gl[:, 0], gl[:, 1], gl[:, 2], gl[:, 3],
                             gr[:, 0], gr[:, 1], gr[:, 2], gr[:, 3],
                             li, ri, vf, lookup, dist_iters, K)
        score_ref[...] = score[:, None]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("lookup", "dist_iters", "tile_b",
                                    "interpret"))
def fused_graph_filter_infuse(val, li, ri, valid, lpackT, rpackT,
                              lookup: bool, dist_iters: int, simi=None,
                              tile_b: int = 0,
                              interpret: bool = False) -> jnp.ndarray:
    """Graph filter over a [NT, B] grid of correspondence sets with all
    operand gathers fused into the kernel (see _make_filter_gather_kernel).

    val:   [NT, B, K] f32 correspondence weights, or None with ``simi``
           given — then weights are recovered in-kernel from the similarity
           block (val[k] = simi[li_k, ri_k]).
    li/ri: [NT, B, K] int32 correspondence indices into the latent (P) /
           rolled (R) minutiae axes. valid: [NT, B, K] bool.
    lpackT: [NT, 4, P] latent (x, y, cos ori, sin ori) planes.
    rpackT: [B, 4, R] rolled coordinate planes.
    simi:  optional [NT, B, P, R] similarity blocks.
    Returns filtered scores [NT, B] f32.
    """
    NT, B, K = li.shape
    P = lpackT.shape[2]
    R = rpackT.shape[2]
    if tile_b == 0:
        tile_b = 16 if K <= 128 else 8
    assert B % tile_b == 0, (B, tile_b)
    lif = li.astype(jnp.float32)
    rif = ri.astype(jnp.float32)
    validf = valid.astype(jnp.float32)

    recover_val = simi is not None
    kernel = _make_filter_gather_kernel(lookup, dist_iters, K, tile_b, P, R,
                                        recover_val)
    spec_k = pl.BlockSpec((None, tile_b, K), lambda t, b: (t, b, 0))
    in_specs = [spec_k, spec_k, spec_k,
                pl.BlockSpec((None, 4, P), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((tile_b, 4, R), lambda t, b: (b, 0, 0))]
    args = [lif, rif, validf, lpackT, rpackT]
    if recover_val:
        in_specs.append(pl.BlockSpec((None, tile_b, P, R),
                                     lambda t, b: (t, b, 0, 0)))
        args.append(simi)
    else:
        in_specs.insert(0, spec_k)
        args.insert(0, val)
    out = pl.pallas_call(
        kernel,
        grid=(NT, B // tile_b),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, tile_b, 1), lambda t, b: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, B, 1), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[..., 0]


def _adc_rowmax_codes_kernel(n_clusters: int):
    def kernel(x_ref, lsq_ref, codes_ref, tdec_ref, rsq_ref, tvalid_ref,
               best_ref, bestj_ref, dect_ref):
        # x: [Lt, D] (latent n); codes: [S, Rt] u8 (gallery entry b);
        # tdec: [D, S*C] transposed block-diagonal decode tensor;
        # dect_ref: [D, Rt] VMEM scratch holding the decoded entry, built
        # once per gallery entry (grid is (B, NL) with NL innermost) and
        # reused by every latent in the batch.
        C = n_clusters

        @pl.when(pl.program_id(1) == 0)
        def _decode():
            codes = codes_ref[...].astype(jnp.int32)          # [S, Rt]
            S, Rt = codes.shape
            D = tdec_ref.shape[0]
            acc = jnp.zeros((D, Rt), jnp.float32)
            # unrolled one-hot matmuls: decoded = sum_k CB_k^T @ 1hot_k.
            # MXU-shaped ([D, C] x [C, Rt]); no vector gathers on TPU.
            for k in range(S):
                onehot = (codes[k:k + 1, :]
                          == jax.lax.broadcasted_iota(jnp.int32, (C, Rt), 0)
                          ).astype(tdec_ref.dtype)            # [C, Rt]
                acc += jnp.dot(tdec_ref[:, k * C:(k + 1) * C], onehot,
                               preferred_element_type=jnp.float32)
            dect_ref[...] = acc.astype(dect_ref.dtype)

        x = x_ref[...]
        dots = jnp.dot(x, dect_ref[...].astype(x.dtype),
                       preferred_element_type=jnp.float32)    # [Lt, Rt]
        simi = 2.0 * dots + (6.0 - lsq_ref[0, :][:, None]
                             - rsq_ref[0, :][None, :])
        simi = simi + (tvalid_ref[0, :][None, :] - 1.0) * (-NEG_BIG)
        best_ref[0, :] = jnp.max(simi, axis=1)
        bestj_ref[0, :] = jnp.argmax(simi, axis=1).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def fused_adc_rowmax_codes(x: jnp.ndarray, lat_sqnorm: jnp.ndarray,
                           codes_t: jnp.ndarray, tdec: jnp.ndarray,
                           rol_sqnorm: jnp.ndarray, rol_valid: jnp.ndarray,
                           n_clusters: int = 256,
                           interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_adc_rowmax for codes-resident galleries: PQ decode happens in
    VMEM, so HBM holds only the uint8 codes (16 B/minutia — a ~1M-template
    gallery fits one chip, vs ~200K for pre-decoded int8 reconstructions).

    x: [NL, Lt, D]; lat_sqnorm: [NL, Lt] f32
    codes_t: [B, S, Rt] uint8 (transposed code planes)
    tdec: [D, S*C] transposed block-diagonal decode tensor (compute dtype)
    rol_sqnorm / rol_valid: [B, Rt] f32
    Returns best [NL, B, Lt] f32, bestj [NL, B, Lt] i32.
    """
    NL, Lt, D = x.shape
    B, S, Rt = codes_t.shape
    lsq = lat_sqnorm.reshape(NL, 1, Lt)
    rsq = rol_sqnorm.reshape(B, 1, Rt)
    tva = rol_valid.astype(jnp.float32).reshape(B, 1, Rt)

    best, bestj = pl.pallas_call(
        _adc_rowmax_codes_kernel(n_clusters),
        grid=(B, NL),
        in_specs=[
            pl.BlockSpec((None, Lt, D), lambda b, n: (n, 0, 0)),
            pl.BlockSpec((None, 1, Lt), lambda b, n: (n, 0, 0)),
            pl.BlockSpec((None, S, Rt), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((D, S * n_clusters), lambda b, n: (0, 0)),
            pl.BlockSpec((None, 1, Rt), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((None, 1, Rt), lambda b, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, 1, Lt), lambda b, n: (n, b, 0, 0)),
            pl.BlockSpec((None, None, 1, Lt), lambda b, n: (n, b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NL, B, 1, Lt), jnp.float32),
            jax.ShapeDtypeStruct((NL, B, 1, Lt), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((D, Rt), x.dtype)],
        interpret=interpret,
    )(x, lsq, codes_t, tdec, rsq, tva)
    return best[:, :, 0, :], bestj[:, :, 0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_adc_rowmax(x: jnp.ndarray, lat_sqnorm: jnp.ndarray,
                     dect: jnp.ndarray, rol_sqnorm: jnp.ndarray,
                     rol_valid: jnp.ndarray,
                     interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row maxima of the ADC similarity without materializing it.

    x: [NL, Lt, D] latent texture descriptors (compute dtype)
    lat_sqnorm: [NL, Lt] f32; dect: [B, D, Rt]; rol_sqnorm: [B, Rt] f32
    rol_valid: [B, Rt] f32 (1.0 valid / 0.0 invalid)
    Returns best [NL, B, Lt] f32 and argmax bestj [NL, B, Lt] i32; rows with
    no valid rolled minutiae come back <= NEG_BIG.
    """
    NL, Lt, D = x.shape
    B, D2, Rt = dect.shape
    assert D == D2
    lsq = lat_sqnorm.reshape(NL, 1, Lt)
    rsq = rol_sqnorm.reshape(B, 1, Rt)
    tva = rol_valid.astype(jnp.float32).reshape(B, 1, Rt)

    best, bestj = pl.pallas_call(
        _adc_rowmax_kernel,
        grid=(NL, B),
        in_specs=[
            pl.BlockSpec((None, Lt, D), lambda n, b: (n, 0, 0)),
            pl.BlockSpec((None, 1, Lt), lambda n, b: (n, 0, 0)),
            pl.BlockSpec((None, D, Rt), lambda n, b: (b, 0, 0)),
            pl.BlockSpec((None, 1, Rt), lambda n, b: (b, 0, 0)),
            pl.BlockSpec((None, 1, Rt), lambda n, b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, 1, Lt), lambda n, b: (n, b, 0, 0)),
            pl.BlockSpec((None, None, 1, Lt), lambda n, b: (n, b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NL, B, 1, Lt), jnp.float32),
            jax.ShapeDtypeStruct((NL, B, 1, Lt), jnp.int32),
        ],
        interpret=interpret,
    )(x, lsq, dect, rsq, tva)
    return best[:, :, 0, :], bestj[:, :, 0, :]
