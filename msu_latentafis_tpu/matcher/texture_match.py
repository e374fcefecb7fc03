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

import jax
import jax.numpy as jnp

from ..templates.data_model import MatcherConstants as MC
from .graph_filter import filter_correspondences


def decode_pq(codes: jnp.ndarray, codebook_flat: jnp.ndarray,
              n_clusters: int, dtype=jnp.float32) -> jnp.ndarray:
    """Decode uint8 PQ codes [..., S] -> descriptors [..., S*sub_dim].

    ``codebook_flat`` is [S * n_clusters, sub_dim] (row-major over subs).
    """
    S = codes.shape[-1]
    sub_dim = codebook_flat.shape[-1]
    idx = codes.astype(jnp.int32) + jnp.arange(S, dtype=jnp.int32) * n_clusters
    dec = jnp.take(codebook_flat.astype(dtype), idx, axis=0)
    return dec.reshape(codes.shape[:-1] + (S * sub_dim,))


def texture_similarity(lat_des: jnp.ndarray, lat_sqnorm: jnp.ndarray,
                       lat_valid: jnp.ndarray,
                       rol_decoded: jnp.ndarray, rol_sqnorm: jnp.ndarray,
                       rol_valid: jnp.ndarray) -> jnp.ndarray:
    """simi[..., Lt, Rt] = 2 X.decoded^T + (6 - |x|^2 - |c|^2).

    Invalid rolled columns -> -inf (excluded from the row argmax);
    invalid latent rows -> -inf (excluded from the top-K).
    """
    prec = (jax.lax.Precision.HIGHEST if lat_des.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dots = jnp.einsum("ld,...rd->...lr", lat_des, rol_decoded,
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
