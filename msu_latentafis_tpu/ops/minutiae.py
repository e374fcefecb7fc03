"""Minutiae decoding and refinement.

Reference semantics:
- cylinder -> points: per-pixel channel argmax + spatial NMS + quadratic
  sub-bin orientation interpolation
  (/root/reference/extraction/prepare_data.py:244-350);
- pairwise refinement (drop near-duplicates / similar-orientation neighbors,
  prepare_data.py:446-472);
- crowding filter via mean distance of 3/5 nearest neighbors
  (minutiae_AEC.py:90-118);
- mask-border spurious removal (extraction_latent.py:259-278);
- cross-set consensus voting (extraction_latent.py:219-257).

Decoding is a jitted dense op returning fixed-size top-N candidates + a
valid count (TPU-friendly); the order-dependent pairwise refinements operate
on the small decoded list on the host, exactly mirroring the reference's
sequential semantics.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.distance import cdist


@functools.partial(jax.jit, static_argnames=("max_minutiae",))
def decode_cylinder(cylinder: jnp.ndarray, thr: float,
                    max_minutiae: int = 1000):
    """12-channel minutiae cylinder [H, W, C] -> candidate minutiae.

    Implements get_minutiae_from_cylinder2 (prepare_data.py:302-350): strict
    8-neighbor spatial NMS on the channel-max map, threshold, quadratic
    orientation interpolation ``pred = 0.5 (y3 - 4 y2) / (y3 - 2 y2)`` around
    the argmax channel, confidence refinement. Returns
    (minutiae [N, 4] = (x, y, ori, conf) sorted by conf desc, count).
    """
    h, w, c = cylinder.shape
    max_val = jnp.max(cylinder, axis=2)
    max_arg = jnp.argmax(cylinder, axis=2)

    # strict local maximum over the 8-neighborhood
    p = jnp.pad(max_val, 1, constant_values=jnp.inf)
    neigh = jnp.stack([p[dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)
                       if not (dy == 1 and dx == 1)])
    is_peak = jnp.all(max_val[None] > neigh, axis=0)

    r2 = 7  # r=15, r2=r//2 border exclusion (prepare_data.py:318-321)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= r2) & (yy <= h - r2 - 1) & (xx >= r2) & (xx <= w - r2 - 1)
    cand = is_peak & (max_val > thr) & interior

    ind = max_arg
    ind1 = (ind - 1) % c
    ind2 = (ind + 1) % c
    gather = lambda i: jnp.take_along_axis(cylinder, i[..., None], axis=2)[..., 0]
    y1 = gather(ind1)
    y2 = gather(ind) - y1
    y3 = gather(ind2) - y1
    denom = y3 - 2 * y2
    pred = 0.5 * (y3 - 4 * y2) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    conf = -(2 * y2 - 0.5 * y3) ** 2 / jnp.where(jnp.abs(2 * denom) > 1e-12,
                                                 2 * denom, 1e-12) + max_val
    ori = (ind1 + pred) / c * 2 * jnp.pi

    score = jnp.where(cand, conf, -jnp.inf).reshape(-1)
    k = min(max_minutiae, h * w)
    topv, topi = jax.lax.top_k(score, k)
    py = topi // w
    px = topi % w
    n = jnp.sum(topv > -jnp.inf)
    minutiae = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32),
                          ori.reshape(-1)[topi].astype(jnp.float32),
                          conf.reshape(-1)[topi].astype(jnp.float32)], axis=1)
    return minutiae, n


def refine_minutiae(minutiae: np.ndarray, dist_thr: float = 10,
                    ori_dist: float = np.pi / 4) -> np.ndarray:
    """Pairwise suppression (prepare_data.py:446-472): for i < j, drop j if
    closer than dist_thr, or within 20 px with similar orientation.

    The reference's loop never checks flag[i] — an already-dropped minutia
    still suppresses later ones — so the result is order-independent given
    the (confidence-sorted) input order and vectorizes exactly: j survives
    iff no earlier i triggers either condition. The O(n^2) Python loop was
    a measurable per-set cost in the extraction profile."""
    n = len(minutiae)
    if n == 0:
        return minutiae
    d = cdist(minutiae[:, :2], minutiae[:, :2])
    od = np.abs(minutiae[:, 2][None, :] - minutiae[:, 2][:, None])
    od = np.minimum(od, 2 * np.pi - od)
    sup = (d < dist_thr) | ((d < 20) & (od < ori_dist))
    sup = np.triu(sup, 1)                  # only i < j suppresses j
    return minutiae[~sup.any(axis=0)]


def remove_crowded_minutiae(minutiae: np.ndarray) -> np.ndarray:
    """Crowding filter (minutiae_AEC.py:90-118): drop points whose 3 nearest
    neighbors average < 12 px away or 5 nearest < 25 px; mutual removal of
    pairs closer than 5 px."""
    if minutiae is None or len(minutiae) == 0:
        return np.zeros((0, 4))
    minutiae = np.asarray(minutiae)
    n = len(minutiae)
    if n < 3:
        return minutiae
    d = cdist(minutiae[:, :2], minutiae[:, :2])
    # vectorized row-wise form of the reference loop: each row's verdict
    # depends only on its own sorted neighbor distances, except the <5 px
    # pair case which also drops the nearest neighbor (symmetric marking)
    ds = np.sort(d, axis=1)                       # ds[:, 0] == 0 (self)
    nn = np.argsort(d, axis=1)[:, 1]
    flag = np.ones(n, bool)
    pair = ds[:, 1] < 5
    flag[pair] = False
    flag[nn[pair]] = False
    # the reference `continue`s after the pair case, but those i are
    # already dropped, so applying the mean checks unconditionally to
    # non-pair rows gives the identical surviving set
    mean3 = ds[:, 1:4].mean(axis=1)
    flag &= ~(~pair & (mean3 < 12))
    if n > 5:
        mean5 = ds[:, 1:6].mean(axis=1)
        flag &= ~(~pair & (mean5 < 25))
    return minutiae[flag]


def remove_spurious_minutiae(minutiae: np.ndarray, mask: np.ndarray,
                             r: int = 10) -> np.ndarray:
    """Mask-border filter (extraction_latent.py:259-278, rolled uses r=5):
    drop minutiae whose r-offset corners leave the mask."""
    n = len(minutiae)
    if n == 0:
        return minutiae
    h, w = mask.shape[:2]
    x = minutiae[:, 0].astype(int)
    y = minutiae[:, 1].astype(int)
    inside = (x >= r) & (y >= r) & (x <= w - r - 1) & (y <= h - r - 1)
    keep = inside.copy()
    idx = np.nonzero(inside)[0]
    for i in idx:
        if (mask[y[i] - r, x[i] - r] == 0 or mask[y[i] - r, x[i] + r] == 0
                or mask[y[i] + r, x[i] - r] == 0 or mask[y[i] + r, x[i] + r] == 0):
            keep[i] = False
    return minutiae[keep]


def get_common_minutiae(minutiae_sets, thr: int = 3, init_ind: int = 3) -> np.ndarray:
    """Cross-set consensus voting (extraction_latent.py:219-257): seed from
    set ``init_ind``, match by dist <= 10 and ori-diff < pi/6 (mod pi), keep
    points seen in >= thr sets."""
    if len(minutiae_sets[init_ind]) == 0:
        return np.zeros((0, 4))
    seed = np.asarray(minutiae_sets[init_ind], np.float64)[:, :4]
    mnt = np.empty((len(seed), 4), np.float64)   # grown geometrically below
    mnt[:] = seed
    count = [1.0] * len(mnt)
    n = len(mnt)
    for i, mset in enumerate(minutiae_sets):
        if i == init_ind:
            continue
        for m in np.asarray(mset):
            x2, y2, ori2 = m[0], m[1], m[2]
            # first-match-wins over the current list (the reference's inner
            # Python scan, extraction_latent.py:236-246), vectorized
            dx = mnt[:n, 0] - x2
            dy = mnt[:n, 1] - y2
            od = np.abs(mnt[:n, 2] - ori2)
            od = np.where(od > math.pi / 2, math.pi - od, od)
            hit = (dx * dx + dy * dy <= 100.0) & (od < math.pi / 6)
            k = int(np.argmax(hit)) if hit.any() else -1
            if k >= 0:
                count[k] += 1
            else:
                if n == len(mnt):
                    mnt = np.concatenate([mnt, np.empty_like(mnt)])
                mnt[n] = (x2, y2, ori2, 1)
                count.append(1)
                n += 1
    count = np.asarray(count)
    keep = mnt[:n][count >= thr]
    if len(keep):
        keep[:, 3] = 1
    return keep


def decode_minutiae_batch(cylinders, thrs, refine: bool = True,
                          crowd_filter: bool = True,
                          refine_dist_thr: float = 20.0):
    """Batched decode of same-shape cylinders [N, H, W, C] with per-image
    thresholds: one vmapped device decode, host refine per image. Used to
    fuse the latent pipeline's paired same-model detections into one
    dispatch."""
    ms, ns = jax.vmap(lambda c, t: decode_cylinder(c, t))(
        jnp.asarray(cylinders, jnp.float32),
        jnp.asarray(thrs, jnp.float32))
    ms = np.asarray(ms)
    ns = np.asarray(ns)
    out = []
    for i in range(len(thrs)):
        m = ms[i][:int(ns[i])]
        if refine and len(m):
            m = refine_minutiae(m, dist_thr=refine_dist_thr,
                                ori_dist=np.pi / 4)
        if crowd_filter and len(m):
            m = remove_crowded_minutiae(m)
        out.append(np.asarray(m))
    return out


def decode_minutiae(cylinder, thr: float = 0.2, max_minutiae: int = 1000,
                    refine: bool = True, crowd_filter: bool = True,
                    refine_dist_thr: float = 20.0) -> np.ndarray:
    """Full whole-image decode pipeline used after minutiae-net inference
    (minutiae_AEC.py:76-88): decode -> refine(dist 20; the 64-patch rolled
    variant passes 10, minutiae_AEC_modified.py:89) -> crowding filter."""
    m, n = decode_cylinder(jnp.asarray(cylinder, jnp.float32), thr,
                           max_minutiae=max_minutiae)
    m = np.asarray(m)[:int(n)]
    if refine and len(m):
        m = refine_minutiae(m, dist_thr=refine_dist_thr, ori_dist=np.pi / 4)
    if crowd_filter and len(m):
        m = remove_crowded_minutiae(m)
    return np.asarray(m)
