"""Training losses.

Capability parity with the reference's loss zoo:
- L2 reconstruction (tf.nn.l2_loss semantics: 0.5 * sum of squares) used by
  both AEC trainers (/root/reference/extraction/minutiae_AEC.py:267,
  enhancement_AEC.py:305);
- batch-hard and batch-all triplet losses
  (/root/reference/extraction/losses/triplet*.py);
- angular (sphereface-style) margin softmax
  (/root/reference/extraction/losses/angleloss.py);
- plain classification / regression heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def l2_reconstruction(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum((pred - target)^2) — tf.nn.l2_loss semantics."""
    d = pred - target
    return 0.5 * jnp.sum(d * d)


def _pairwise_sq_dists(emb: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(emb * emb, axis=1)
    d2 = sq[:, None] - 2.0 * emb @ emb.T + sq[None, :]
    return jnp.maximum(d2, 0.0)


def batch_hard_triplet(emb: jnp.ndarray, labels: jnp.ndarray,
                       margin: float = 0.3) -> jnp.ndarray:
    """Hardest-positive / hardest-negative triplet loss over a batch."""
    d = jnp.sqrt(_pairwise_sq_dists(emb) + 1e-12)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(len(labels), dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    hardest_pos = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    valid = jnp.isfinite(hardest_pos) & jnp.isfinite(hardest_neg)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    return jnp.sum(jnp.where(valid, loss, 0.0)) / (jnp.sum(valid) + 1e-6)


def batch_all_triplet(emb: jnp.ndarray, labels: jnp.ndarray,
                      margin: float = 0.3) -> jnp.ndarray:
    """Mean over all valid (anchor, pos, neg) triplets with positive loss."""
    d = jnp.sqrt(_pairwise_sq_dists(emb) + 1e-12)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(len(labels), dtype=bool)
    pos = same & ~eye
    tri = d[:, :, None] - d[:, None, :] + margin      # [a, p, n]
    valid = pos[:, :, None] & (~same)[:, None, :]
    loss = jnp.where(valid, jnp.maximum(tri, 0.0), 0.0)
    n_pos = jnp.sum((loss > 1e-16) & valid)
    return jnp.sum(loss) / (n_pos + 1e-6)


def angular_margin_softmax(emb: jnp.ndarray, weights: jnp.ndarray,
                           labels: jnp.ndarray, m: int = 4) -> jnp.ndarray:
    """SphereFace-style A-Softmax: cos(m*theta) margin on the target logit
    via the Chebyshev expansion, annealing omitted (inference-equivalent
    capability of losses/angleloss.py)."""
    w = weights / (jnp.linalg.norm(weights, axis=0, keepdims=True) + 1e-8)
    x_norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
    cos = (emb @ w) / (x_norm + 1e-8)
    cos = jnp.clip(cos, -1.0, 1.0)
    theta = jnp.arccos(cos)
    k = jnp.floor(theta * m / jnp.pi)
    cos_m = jnp.cos(m * theta) * (-1.0) ** k - 2.0 * k
    logits = cos * x_norm
    target_logits = cos_m * x_norm
    onehot = jax.nn.one_hot(labels, weights.shape[1])
    final = logits * (1 - onehot) + target_logits * onehot
    return optax.softmax_cross_entropy_with_integer_labels(final, labels).mean()


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def regression_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE regression head (losses/regression.py)."""
    return jnp.mean((pred - target) ** 2)


def l2norm_pair_loss(x1: jnp.ndarray, x2: jnp.ndarray, y1: jnp.ndarray,
                     y2: jnp.ndarray) -> jnp.ndarray:
    """Distance-preservation loss for descriptor compression: the norm of
    the per-pair gap between input-space and output-space L2 distances,
    / batch (losses/l2norm.py L2NormLoss — the DR/CompNet training
    criterion pairing 192-d inputs with 96-d outputs)."""
    dist_in = jnp.linalg.norm(x1 - x2, axis=1)
    dist_out = jnp.linalg.norm(y1 - y2, axis=1)
    return jnp.linalg.norm(dist_in - dist_out) / x1.shape[0]


def batch_hard_pair_l2norm(x1: jnp.ndarray, x2: jnp.ndarray,
                           y1: jnp.ndarray, y2: jnp.ndarray,
                           metric: str = "cosine",
                           threshold: float = 0.0) -> jnp.ndarray:
    """Hard-pair variant (losses/l2norm.py BatchHardPairL2NormLoss): only
    pairs whose |in-distance - out-distance| exceeds ``threshold`` count.
    The reference's boolean indexing becomes static-shape masking."""
    if metric == "cosine":
        def cos(a, b):
            na = jnp.linalg.norm(a, axis=1) + 1e-8
            nb = jnp.linalg.norm(b, axis=1) + 1e-8
            return jnp.sum(a * b, axis=1) / (na * nb)
        dist_in, dist_out = cos(x1, x2), cos(y1, y2)
    elif metric == "euclidean":
        dist_in = jnp.linalg.norm(x1 - x2, axis=1)
        dist_out = jnp.linalg.norm(y1 - y2, axis=1)
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    diff = dist_in - dist_out
    hard = (jnp.abs(diff) - threshold) > 0.0
    n = jnp.sum(hard)
    norm = jnp.sqrt(jnp.sum(jnp.where(hard, diff, 0.0) ** 2))
    return jnp.where(n > 0, norm / jnp.maximum(n, 1), 0.0)


def uncertainty_loss(mu: jnp.ndarray, log_var: jnp.ndarray,
                     target: jnp.ndarray, wsigma: float = 0.0) -> jnp.ndarray:
    """Heteroscedastic regression (losses/uncertainty.py): squared error
    scaled by exp(-log sigma^2) + log sigma^2 penalty + wsigma * ||sigma^2||
    regularizer on the predicted covariance."""
    sq = (target - mu) ** 2
    loss = jnp.mean(sq * jnp.exp(-log_var)) + jnp.mean(log_var)
    return loss + wsigma * jnp.linalg.norm(jnp.exp(log_var))
