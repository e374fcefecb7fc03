"""PQ texture matching as an MXU matmul (asymmetric-distance scoring).

The reference computes, for every (latent virtual minutia i, rolled virtual
minutia j), ``simi[i, j] = 6 - sum_k LUT_i[k, codes[j, k]]`` with a scalar
lookup loop over 16 subquantizers (matcher.cpp:564-714), where
``LUT_i[k, c] = ||x_{i,k} - C_{k,c}||^2`` is precomputed per latent
(include.h:327-359).

On TPU, gathers are slow and matmuls are nearly free, so we use the exact
algebraic identity

    sum_k ||x_ik - c_jk||^2 = ||x_i||^2 + ||c_j||^2 - 2 <x_i, decode(codes_j)>
    simi[i, j] = 2 <x_i, decode(codes_j)> + (6 - ||x_i||^2 - ||decode_j||^2)

which turns ADC scoring into: a tiny codeword gather to decode each rolled
block on the fly (codes stay uint8 in HBM — 16 B/minutia), one big MXU
matmul against the latent descriptor matrix, and a rank-1 correction with
precomputed squared norms. Same scores (modulo float reassociation), ~1000x
the arithmetic throughput of the scalar LUT loop.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..templates.data_model import MatcherConstants as MC
from .graph_filter import filter_correspondences


def decode_pq(codes: jnp.ndarray, codebook_flat: jnp.ndarray,
              n_clusters: int, dtype=jnp.float32) -> jnp.ndarray:
    """Decode uint8 PQ codes [..., S] -> descriptors [..., S*sub_dim].

    ``codebook_flat`` is [S * n_clusters, sub_dim] (row-major over subs).
    Row-gather formulation — fast on CPU, but on TPU both the 3.7M-row
    gather and the [N, 6] output layout (lane dim padded 6 -> 128) are
    pathological; prefer ``decode_pq_matmul`` there.
    """
    S = codes.shape[-1]
    sub_dim = codebook_flat.shape[-1]
    idx = codes.astype(jnp.int32) + jnp.arange(S, dtype=jnp.int32) * n_clusters
    dec = jnp.take(codebook_flat.astype(dtype), idx, axis=0)
    return dec.reshape(codes.shape[:-1] + (S * sub_dim,))


def block_diag_codebook(codebook, dtype=jnp.float32) -> jnp.ndarray:
    """[S, C, d] codebook -> block-diagonal decode tensor [S, C, S*d] with
    codebook[k, c] placed at output slice [k, c, k*d:(k+1)*d]. Built with
    host NumPy (must be a concrete constant — it is cached on the engine
    and reused across traces)."""
    codebook = np.asarray(codebook)
    S, C, d = codebook.shape
    out = np.zeros((S, C, S * d), np.float32)
    for k in range(S):
        out[k, :, k * d:(k + 1) * d] = codebook[k]
    return jnp.asarray(out, dtype)


def decode_pq_matmul(codes: jnp.ndarray, decode_tensor: jnp.ndarray) -> jnp.ndarray:
    """MXU decode: one-hot(codes) contracted with the block-diagonal
    codebook tensor. Output [..., S*d] lands directly in a lane-aligned
    96-wide layout; the one-hot matmul trades 256x redundant FLOPs for
    avoiding TPU gathers — a large net win on the MXU."""
    S = codes.shape[-1]
    oh = jax.nn.one_hot(codes.astype(jnp.int32), decode_tensor.shape[1],
                        dtype=decode_tensor.dtype)
    prec = (jax.lax.Precision.HIGHEST if decode_tensor.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jnp.einsum("...kc,kcD->...D", oh, decode_tensor,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(decode_tensor.dtype)


def texture_similarity(lat_des: jnp.ndarray, lat_sqnorm: jnp.ndarray,
                       lat_valid: jnp.ndarray,
                       rol_decoded_t: jnp.ndarray, rol_sqnorm: jnp.ndarray,
                       rol_valid: jnp.ndarray,
                       dot_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """simi[..., Lt, Rt] = 2 X.decoded^T + (6 - |x|^2 - |c|^2).

    ``rol_decoded_t`` is TRANSPOSED [..., D, Rt] (minutiae axis last for
    lane-aligned TPU layout). When both descriptor operands are int8 the
    dot runs on the int8 MXU path (2x bf16 throughput, half the HBM) and
    ``dot_scale`` de-scales the int32 accumulator; the squared-norm
    corrections stay exact f32 either way. Invalid rolled columns -> -inf
    (excluded from the row argmax); invalid latent rows -> -inf (excluded
    from the top-K).
    """
    if rol_decoded_t.dtype == jnp.int8:
        dots = jnp.einsum("ld,...dr->...lr", lat_des, rol_decoded_t,
                          preferred_element_type=jnp.int32)
        dots = dots.astype(jnp.float32) * dot_scale
    else:
        prec = (jax.lax.Precision.HIGHEST if lat_des.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dots = jnp.einsum("ld,...dr->...lr", lat_des, rol_decoded_t,
                          preferred_element_type=jnp.float32, precision=prec)
    simi = 2.0 * dots + (6.0 - lat_sqnorm[:, None] - rol_sqnorm[..., None, :])
    pair_valid = lat_valid[:, None] & rol_valid[..., None, :]
    return jnp.where(pair_valid, simi, -jnp.inf)


def texture_correspondences(simi: jnp.ndarray, top_n: int = MC.TOPN_TEX_CORR):
    """Per-latent-minutia row argmax, then keep the top-N rows
    (matcher.cpp:723-749). Operates on one [Lt, Rt] matrix."""
    Lt = simi.shape[0]
    best_j = jnp.argmax(simi, axis=1)
    best_v = jnp.max(simi, axis=1)
    k = min(top_n, Lt)
    topv, li = jax.lax.top_k(best_v, k)
    ri = best_j[li]
    valid = topv > -jnp.inf
    val = jnp.where(valid, topv, 0.0)
    return val, li, ri, valid


def texture_match_from_simi(simi, lat_xy, lat_ori, rol_xy, rol_ori) -> jnp.ndarray:
    """Graph-filtered texture score from a precomputed similarity matrix.

    Coordinates are the quantized (x-24)/16 values stored in final
    templates; the distance stage uses the lookup-table semantics with 3
    power iterations (matcher.cpp:759).
    """
    val, li, ri, valid = texture_correspondences(simi)
    return filter_correspondences(
        val, li, ri,
        lat_xy[li], lat_ori[li], rol_xy[ri], rol_ori[ri],
        valid, lookup=True, dist_iters=3)
