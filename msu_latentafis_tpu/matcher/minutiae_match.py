"""Minutiae-template matching (uncompressed descriptors), batched for TPU.

Reference semantics: /root/reference/matching/matcher.cpp:420-516 —
descriptor cosine-similarity GEMM, clamp at zero, mutual normalization
s / (rowsum + colsum - s), top-120 candidate correspondences by normalized
similarity (carrying the raw similarity as the correspondence weight), then
two-stage graph-consistency filtering.

The TPU formulation: the Eigen GEMM becomes an MXU einsum over the whole
gallery block, the sort becomes ``lax.top_k`` over the flattened padded
similarity matrix with -inf masking, and the rest is `graph_filter`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..templates.data_model import MatcherConstants as MC
from .graph_filter import filter_correspondences


def minutiae_similarity(lat_des: jnp.ndarray, lat_valid: jnp.ndarray,
                        rol_des_t: jnp.ndarray, rol_valid: jnp.ndarray) -> jnp.ndarray:
    """Clamped descriptor similarity [.., Lm, Rm]; invalid pairs -> 0.

    ``rol_des_t`` is TRANSPOSED [.., D, Rm]: the gallery keeps descriptors
    with the minutiae axis last so the TPU lane dimension is the large one
    (a trailing D=96 would be lane-padded to 128, inflating HBM by 4/3).
    """
    # HIGHEST precision for f32 inputs: on TPU the MXU would otherwise
    # downcast to bf16, perturbing the top-120 correspondence selection vs
    # the spec. bfloat16 inputs (the throughput mode) keep the fast path.
    prec = (jax.lax.Precision.HIGHEST if lat_des.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    simi = jnp.einsum("...ld,...dr->...lr", lat_des, rol_des_t,
                      preferred_element_type=jnp.float32, precision=prec)
    simi = jnp.maximum(simi, 0.0)
    pair_valid = lat_valid[..., :, None] & rol_valid[..., None, :]
    return jnp.where(pair_valid, simi, 0.0)


def minutiae_correspondences(simi: jnp.ndarray, lat_valid: jnp.ndarray,
                             rol_valid: jnp.ndarray,
                             top_n: int = MC.TOPN_MINU_CORR,
                             approx: bool = False):
    """Top-N correspondences by mutually-normalized similarity.

    Returns (val, li, ri, valid): raw similarities at the selected pairs and
    their latent/rolled minutiae indices. Operates on one [Lm, Rm] matrix
    (vmap over batch axes). ``approx=True`` uses the TPU-optimized
    approx_max_k (recall ~0.99) instead of the full sort — the tail of the
    120 candidates has near-zero filtered-score impact.
    """
    Lm, Rm = simi.shape
    row = jnp.sum(simi, axis=1)
    col = jnp.sum(simi, axis=0)
    norm = simi / (row[:, None] + col[None, :] - simi + 1e-6)
    pair_valid = lat_valid[:, None] & rol_valid[None, :]
    norm = jnp.where(pair_valid, norm, -jnp.inf)

    k = min(top_n, Lm * Rm)
    if approx:
        topv, topi = jax.lax.approx_max_k(norm.reshape(-1), k,
                                          recall_target=0.95)
    else:
        topv, topi = jax.lax.top_k(norm.reshape(-1), k)
    li = topi // Rm
    ri = topi % Rm
    valid = topv > -jnp.inf
    val = simi.reshape(-1)[topi]
    return val, li, ri, valid


def minutiae_correspondence_indices(simi: jnp.ndarray, lat_valid: jnp.ndarray,
                                    rol_valid: jnp.ndarray,
                                    top_n: int = MC.TOPN_MINU_CORR,
                                    approx: bool = True):
    """Batched top-N correspondence INDICES (no value gather).

    Like minutiae_correspondences but operating on the full batched
    similarity tensor simi [NT, B, Lm, Rm] (lat_valid [NT, Lm],
    rol_valid [B, Rm]) and returning only (li, ri, valid) [NT, B, N] — the
    correspondence weights are recovered in-VMEM by the fused filter kernel
    (pallas_kernels.fused_graph_filter_infuse), which is far cheaper than an
    XLA value gather on TPU.
    """
    NT, B, Lm, Rm = simi.shape
    row = jnp.sum(simi, axis=-1)
    col = jnp.sum(simi, axis=-2)
    norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
    pair_valid = lat_valid[:, None, :, None] & rol_valid[None, :, None, :]
    norm = jnp.where(pair_valid, norm, -jnp.inf)

    k = min(top_n, Lm * Rm)
    flat = norm.reshape(NT, B, Lm * Rm)
    if approx:
        topv, topi = jax.lax.approx_max_k(flat, k, recall_target=0.95)
    else:
        topv, topi = jax.lax.top_k(flat, k)
    li = topi // Rm
    ri = topi % Rm
    valid = topv > -jnp.inf
    return li, ri, valid


def minutiae_match_single(lat_des, lat_xy, lat_ori, lat_valid,
                          rol_des_t, rol_xy, rol_ori, rol_valid) -> jnp.ndarray:
    """Score one latent minutiae template against one rolled template.
    ``rol_des_t`` is the transposed [D, Rm] descriptor matrix."""
    simi = minutiae_similarity(lat_des, lat_valid, rol_des_t, rol_valid)
    val, li, ri, valid = minutiae_correspondences(simi, lat_valid, rol_valid)
    return filter_correspondences(
        val, li, ri,
        lat_xy[li], lat_ori[li], rol_xy[ri], rol_ori[ri],
        valid, lookup=False, dist_iters=5)
