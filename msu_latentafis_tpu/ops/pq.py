"""Product quantization: encoding, decoding, and codebook training.

Reference semantics (/root/reference/extraction/descriptor_PQ.py):
- encoder: per-6-d-subspace nearest-centroid assignment (scipy vq) -> uint8
  codes (:19-27);
- training: per-subspace k-means, Ks=256, 20 iterations, initialized from
  data points (:41-77).

TPU formulation: assignment is an argmin over a [N, 256] distance matrix per
subspace computed with one batched matmul (||x||^2 - 2 x.c + ||c||^2);
training is jitted Lloyd iterations with segment-sum updates.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Nearest centroid per row: x [N, d], centroids [K, d] -> [N] int32."""
    d2 = (jnp.sum(x * x, axis=1, keepdims=True)
          - 2.0 * x @ centroids.T
          + jnp.sum(centroids * centroids, axis=1)[None, :])
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def pq_encode(des: np.ndarray, codebook: np.ndarray,
              pad_to: int = 1024) -> np.ndarray:
    """Encode [N, M*Ds] descriptors -> uint8 codes [N, M].

    Rows are padded to a multiple of ``pad_to`` so the jitted assignment
    compiles for a handful of bucket shapes instead of once per template's
    minutiae count.
    """
    n_subs, n_clusters, sub_dim = codebook.shape
    des = np.asarray(des, np.float32)
    N, D = des.shape
    assert D == n_subs * sub_dim, f"{D} != {n_subs}*{sub_dim}"
    Np = ((N + pad_to - 1) // pad_to) * pad_to
    if Np != N:
        des = np.concatenate([des, np.zeros((Np - N, D), np.float32)])
    codes = np.empty((Np, n_subs), np.uint8)
    for m in range(n_subs):
        sub = jnp.asarray(des[:, m * sub_dim:(m + 1) * sub_dim])
        codes[:, m] = np.asarray(_assign(sub, jnp.asarray(codebook[m])))
    return codes[:N]


def pq_decode(codes: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """Decode uint8 codes [N, M] -> [N, M*Ds] reconstructions."""
    n_subs, n_clusters, sub_dim = codebook.shape
    parts = [codebook[m][codes[:, m].astype(int)] for m in range(n_subs)]
    return np.concatenate(parts, axis=1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _lloyd_step(x: jnp.ndarray, centroids: jnp.ndarray, k: int):
    assign = _assign(x, centroids)
    one = jnp.ones((x.shape[0],), jnp.float32)
    counts = jax.ops.segment_sum(one, assign, num_segments=k)
    sums = jax.ops.segment_sum(x, assign, num_segments=k)
    new = sums / jnp.maximum(counts[:, None], 1.0)
    # empty clusters keep their previous centroid (scipy kmeans2 'points'
    # init rarely produces them; this matches the stable behavior)
    return jnp.where(counts[:, None] > 0, new, centroids)


def train_codebook(des: np.ndarray, n_subs: int = 16, n_clusters: int = 256,
                   iters: int = 20, seed: int = 0) -> np.ndarray:
    """Per-subspace k-means codebook [n_subs, n_clusters, sub_dim]
    (descriptor_PQ.py:41-77: Ks=256, 20 iterations, point init)."""
    des = np.asarray(des, np.float32)
    N, D = des.shape
    assert D % n_subs == 0
    sub_dim = D // n_subs
    assert N > n_clusters, "need more training vectors than clusters"
    rng = np.random.default_rng(seed)
    out = np.zeros((n_subs, n_clusters, sub_dim), np.float32)
    for m in range(n_subs):
        sub = des[:, m * sub_dim:(m + 1) * sub_dim]
        init_idx = rng.choice(N, size=n_clusters, replace=False)
        c = jnp.asarray(sub[init_idx])
        xs = jnp.asarray(sub)
        for _ in range(iters):
            c = _lloyd_step(xs, c, n_clusters)
        out[m] = np.asarray(c)
    return out
