"""Second-order graph-consistency filtering, batched for TPU.

Reimplements the reference's LSS_R_Fast2* family
(/root/reference/matching/matcher.cpp:1099-1647) as padded, vmappable JAX:

- compatibility matrices are built with vectorized pairwise ops over a fixed
  K correspondence slots (invalid slots carry zero rows/columns);
- the spectral support is S <- H S / (sum S + eps) power iterations
  (``lax.fori_loop``);
- the sequential greedy one-to-one selection is reformulated as iterative
  peeling: repeatedly select the highest-support *eligible* candidate. This
  is exactly equivalent to the reference's single pass in decreasing-support
  order because eligibility (not blocked by a selected minutia on either
  side, compatible with every selected correspondence) only shrinks
  monotonically as selections accumulate — an entry that was ineligible when
  passed can never become eligible again. Peeling needs only
  (#selections + 1) sequential steps instead of K, which matters when the
  loop is vmapped over a 100K gallery axis.

All functions operate on one correspondence set and are designed to be
``jax.vmap``-ed over gallery/template axes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..templates.data_model import MatcherConstants as MC

_EPS_COMPAT = 1e-5   # H >= eps counts as compatible (matcher.cpp:1205/1329/1450)
_THR_DIST = 1e-4     # greedy stop threshold, distance stages (matcher.cpp:1187)
_THR_ANGLE = 1e-3    # greedy stop threshold, angle stage (matcher.cpp:1599)
_COS_PI_4 = float(np.cos(np.pi / 4))
_COS_PI_6 = float(np.cos(np.pi / 6))


def build_dist_H(lxy: jnp.ndarray, rxy: jnp.ndarray, valid: jnp.ndarray,
                 lookup: bool, d_thr: float = MC.DIST_THRESHOLD) -> jnp.ndarray:
    """Distance-consistency matrix H[K, K].

    ``lookup=True`` uses the quantized-coordinate semantics of
    LSS_R_Fast2_Dist_lookup (integer |dx|,|dy| gated at 50, distances
    16*hypot(dx, dy)); ``lookup=False`` the float semantics of
    LSS_R_Fast2_Dist_eigen. Invalid slots produce zero rows/columns.
    """
    if lookup:
        q = jnp.asarray(lxy, jnp.float32)
        dxl = jnp.abs(q[:, None, 0] - q[None, :, 0])
        dyl = jnp.abs(q[:, None, 1] - q[None, :, 1])
        r = jnp.asarray(rxy, jnp.float32)
        dxr = jnp.abs(r[:, None, 0] - r[None, :, 0])
        dyr = jnp.abs(r[:, None, 1] - r[None, :, 1])
        in_range = (dxl < MC.DIST_LUT_N) & (dyl < MC.DIST_LUT_N) \
            & (dxr < MC.DIST_LUT_N) & (dyr < MC.DIST_LUT_N)
        d1 = 16.0 * jnp.sqrt(dxl * dxl + dyl * dyl)
        d2 = 16.0 * jnp.sqrt(dxr * dxr + dyr * dyr)
    else:
        dl = lxy[:, None, :] - lxy[None, :, :]
        dr = rxy[:, None, :] - rxy[None, :, :]
        d1 = jnp.sqrt(jnp.sum(dl * dl, axis=-1))
        d2 = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
        in_range = jnp.ones(d1.shape, bool)

    dist = jnp.abs(d1 - d2)
    H = jnp.clip((30.0 - dist) / 25.0, 0.0, 1.0)
    gate = in_range & (dist <= d_thr)
    mask = valid[:, None] & valid[None, :]
    K = H.shape[0]
    off_diag = ~jnp.eye(K, dtype=bool)
    return jnp.where(gate & mask & off_diag, H, 0.0).astype(jnp.float32)


def _wrap_pi(a: jnp.ndarray) -> jnp.ndarray:
    """adjust_angle (matcher.cpp:1638-1647): fold into (-pi, pi]."""
    a = jnp.where(a > jnp.pi, a - 2 * jnp.pi, a)
    return jnp.where(a < -jnp.pi, a + 2 * jnp.pi, a)


def _ang_diff(a1: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(a1 - a2)
    return jnp.where(d > jnp.pi, 2 * jnp.pi - d, d)


def build_angle_H(lxy, lori, rxy, rori, valid) -> jnp.ndarray:
    """Boolean angle-consistency matrix (LSS_R_Fast2 three angle tests).

    Trig-free formulation: every test ``|wrap(a - b)| <= t`` is equivalent to
    ``cos(a - b) >= cos(t)`` (cos is monotone on [0, pi] and the wrap only
    folds into that range), and each cos-of-difference expands into dot /
    cross products of unit vectors: the minutia direction vectors
    (cos ori, sin ori) and the normalized connecting-line vectors
    (dx, -dy)/r (the reference's line angle is -atan2(dy, dx)). This removes
    the per-pair arctan2/cos calls that dominate the VPU cost of the
    original formulation while making identical decisions.
    """
    cl, sl = jnp.cos(lori), jnp.sin(lori)          # [K] each — only O(K) trig
    cr, sr = jnp.cos(rori), jnp.sin(rori)

    # test 1: relative minutia orientation difference <= pi/4
    # cos((lori_i - lori_j) - (rori_i - rori_j))
    cos_rel_l = cl[:, None] * cl[None, :] + sl[:, None] * sl[None, :]
    sin_rel_l = sl[:, None] * cl[None, :] - cl[:, None] * sl[None, :]
    cos_rel_r = cr[:, None] * cr[None, :] + sr[:, None] * sr[None, :]
    sin_rel_r = sr[:, None] * cr[None, :] - cr[:, None] * sr[None, :]
    t1 = (cos_rel_l * cos_rel_r + sin_rel_l * sin_rel_r) >= _COS_PI_4

    # line angle L = -atan2(dy, dx): cos L = dx/r, sin L = -dy/r.
    # Coincident points (two correspondences sharing a minutia) must follow
    # atan2(0, 0) = 0, i.e. the unit vector (1, 0).
    def line_vec(xy):
        dx = xy[:, None, 0] - xy[None, :, 0]
        dy = xy[:, None, 1] - xy[None, :, 1]
        r2 = dx * dx + dy * dy
        zero = r2 == 0.0
        inv = jax.lax.rsqrt(jnp.where(zero, 1.0, r2))
        return (jnp.where(zero, 1.0, dx * inv),
                jnp.where(zero, 0.0, -dy * inv))

    cLl, sLl = line_vec(lxy)
    cLr, sLr = line_vec(rxy)

    def cos_diff_of_diffs(c_a, s_a, c_b, s_b, c_c, s_c, c_d, s_d):
        # cos((A - B) - (C - D)) given unit vectors of A, B, C, D
        cab = c_a * c_b + s_a * s_b
        sab = s_a * c_b - c_a * s_b
        ccd = c_c * c_d + s_c * s_d
        scd = s_c * c_d - c_c * s_d
        return cab * ccd + sab * scd

    # test 2: (lori_i - line_l) vs (rori_i - line_r) <= pi/6
    t2 = cos_diff_of_diffs(cl[:, None], sl[:, None], cLl, sLl,
                           cr[:, None], sr[:, None], cLr, sLr) >= _COS_PI_6
    # test 3: (lori_j - line_l) vs (rori_j - line_r) <= pi/6
    t3 = cos_diff_of_diffs(cl[None, :], sl[None, :], cLl, sLl,
                           cr[None, :], sr[None, :], cLr, sLr) >= _COS_PI_6

    K = t1.shape[0]
    mask = valid[:, None] & valid[None, :] & ~jnp.eye(K, dtype=bool)
    return t1 & t2 & t3 & mask


def power_iteration(H: jnp.ndarray, b0: jnp.ndarray, iters: int,
                    eps: float = 1e-5) -> jnp.ndarray:
    """S <- H S / (sum(H S) + eps), repeated ``iters`` times."""
    def body(_, b):
        c = jnp.dot(H, b, precision=jax.lax.Precision.HIGHEST)
        return c / (jnp.sum(c) + eps)
    return jax.lax.fori_loop(0, iters, body, b0)


def lex_outranks(S: jnp.ndarray, tie_keys: Tuple[jnp.ndarray, ...] = ()
                 ) -> jnp.ndarray:
    """outranks[i, j] = True where j precedes i in the spec's greedy order.

    The reference's greedy pass walks candidates by support descending with
    ties broken by *position in the candidate list* (stable argsort,
    matcher.cpp:1184-1220). When the engine's slot order differs from the
    spec's list order, the list position is reconstructed lexicographically:
    ``tie_keys`` are compared in order (larger wins), with ascending slot
    index as the final fallback. Stage-2 ties additionally chain the
    stage-1 ordering (the corr2 list is ordered by stage-1 selection rank),
    which callers express by prepending S1 and stage-1 keys to tie_keys.
    """
    K = S.shape[0]
    idx = jnp.arange(K)
    gt = S[None, :] > S[:, None]
    eq = S[None, :] == S[:, None]
    for k in tie_keys:
        gt = gt | (eq & (k[None, :] > k[:, None]))
        eq = eq & (k[None, :] == k[:, None])
    return gt | (eq & (idx[None, :] < idx[:, None]))


def greedy_one_to_one(S: jnp.ndarray, compat: jnp.ndarray, li: jnp.ndarray,
                      ri: jnp.ndarray, valid: jnp.ndarray, thr: float,
                      tie_keys: Tuple[jnp.ndarray, ...] = ()) -> jnp.ndarray:
    """Greedy mutual-compatibility selection; returns a selected mask [K].

    ``compat`` is boolean pairwise compatibility; a candidate is selected
    only if compatible with *all* previously selected correspondences and
    neither of its minutiae is already used.

    Formulated as parallel greedy-by-priority (Luby-style): candidate j
    *blocks* i when j outranks i and selecting j would exclude i (shared
    minutia or incompatible). The sequential scan's outcome satisfies
    ``selected(i) <=> no blocker of i is selected``, the unique fixpoint of
    the priority DAG, computed here in rounds — each round decides every
    candidate whose blockers are all decided (two batched mask-matvecs per
    round, ~log K rounds) instead of one selection per step. Exactly
    equivalent to the reference's sorted single pass
    (matcher.cpp:1184-1220), including tie order (see lex_outranks).
    """
    K = S.shape[0]
    conflict = (li[:, None] == li[None, :]) | (ri[:, None] == ri[None, :])
    eligible = valid & (S >= thr)
    bad = (conflict | ~compat) & ~jnp.eye(K, dtype=bool)
    outranks = lex_outranks(S, tie_keys)
    blockers = (bad & outranks & eligible[None, :]
                & eligible[:, None]).astype(jnp.float32)      # [i, j]

    def cond(state):
        sel, rej = state
        return jnp.any(eligible & ~sel & ~rej)

    def body(state):
        sel, rej = state
        undecided = eligible & ~sel & ~rej
        blocked_by_sel = blockers @ sel.astype(jnp.float32) > 0.5
        any_live_blocker = blockers @ (1.0 - rej.astype(jnp.float32)) > 0.5
        sel = sel | (undecided & ~any_live_blocker)
        rej = rej | (undecided & blocked_by_sel)
        return sel, rej

    sel0 = jnp.logical_and(valid, False)
    sel, _ = jax.lax.while_loop(cond, body, (sel0, sel0))
    return sel


def filter_correspondences(val: jnp.ndarray, li: jnp.ndarray, ri: jnp.ndarray,
                           lxy: jnp.ndarray, lori: jnp.ndarray,
                           rxy: jnp.ndarray, rori: jnp.ndarray,
                           valid: jnp.ndarray, lookup: bool,
                           dist_iters: int,
                           tie_keys: Tuple[jnp.ndarray, ...] = ()
                           ) -> jnp.ndarray:
    """Full two-stage filtering of one correspondence set.

    Inputs are per-slot gathered arrays: ``val`` raw similarities, ``li/ri``
    latent/rolled minutiae indices, ``lxy/lori`` and ``rxy/rori`` gathered
    coordinates and orientations. ``tie_keys`` reconstructs the spec's
    candidate-list order when the caller's slot order differs from it (see
    lex_outranks); stage 2 automatically chains (S1,) + tie_keys because
    the reference's corr2 list is ordered by stage-1 selection rank.
    Returns the filtered match score (sum of surviving similarities).
    """
    # Stage 1: distance consistency, support seeded with raw similarities.
    H1 = build_dist_H(lxy, rxy, valid, lookup=lookup)
    b0 = jnp.where(valid, val, 0.0).astype(jnp.float32)
    S1 = power_iteration(H1, b0, dist_iters, eps=1e-5)
    sel1 = greedy_one_to_one(S1, H1 >= _EPS_COMPAT, li, ri, valid, _THR_DIST,
                             tie_keys=tie_keys)

    # Stage 2: angle consistency over stage-1 survivors, uniform seed.
    H2 = build_angle_H(lxy, lori, rxy, rori, sel1)
    n2 = jnp.sum(sel1.astype(jnp.float32))
    b2 = jnp.where(sel1, 1.0 / jnp.maximum(n2, 1.0), 0.0)
    S2 = power_iteration(H2.astype(jnp.float32), b2, 5, eps=1e-5)
    sel2 = greedy_one_to_one(S2, H2, li, ri, sel1, _THR_ANGLE,
                             tie_keys=(S1,) + tuple(tie_keys))

    return jnp.sum(jnp.where(sel2, val, 0.0))
