"""Ridge orientation / frequency / quality map estimation.

Reference semantics (/root/reference/extraction/get_maps.py):
- ``construct_dictionary`` (:255-346) — synthetic ridge-wave 32x32 atoms over
  spacing x valley-split x orientation x phase;
- ``get_quality_map_dict`` (:456-515) — per-16x16-block best-matching atom by
  |patch . dict| (one big MXU matmul), quality/ori/freq from the winner,
  Gaussian + circular smoothing;
- ``get_maps_STFT`` (:587-643) — block FFT directional-energy histogram with
  smoothed peak picking (used for rolled prints);
- ``SSIM`` block mask (:406-453) and the intensity-based rolled segmentation
  mask (:349-366);
- ``smooth_dir_map`` (:237-252) — circular smoothing in the doubled-angle
  domain.

The dictionary GEMM is the designed-for-TPU part: all blocks of the image
score against all atoms in a single [n_blocks, 1024] x [1024, n_atoms]
matmul.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fft import extract_blocks
from .gaussian import gaussian_blur_cv2, gaussian_blur_reflect

BLOCK = 16
DICT_PATCH = 32


# ---------------------------------------------------------------------------
# Ridge dictionary
# ---------------------------------------------------------------------------

def construct_dictionary(ori_num: int = 30, rolled: bool = False):
    """Synthetic ridge dictionary.

    Returns (dict_all [1024, n_atoms], ori_all [n_atoms],
    spacing_all [n_atoms] (reciprocal spacing)). ``rolled=True`` uses the
    narrower spacing range of construct_dictionary_rolled (:302-346).
    """
    p2 = DICT_PATCH // 2
    Y, X = np.meshgrid(np.arange(-p2, p2), np.arange(-p2, p2))
    atoms, oris, spacings = [], [], []
    spacing_range = range(6, 13) if rolled else range(4, 13)
    for spacing in spacing_range:
        if rolled:
            valley_range = range(3, spacing // 2)
        else:
            valley_range = range(max(2, spacing // 2 - 2), spacing // 2)
        for valley_spacing in valley_range:
            ridge_spacing = spacing - valley_spacing
            for k in range(ori_num):
                theta = np.pi / 2 - k * np.pi / ori_num
                X_r = X * np.cos(theta) - Y * np.sin(theta)
                for offset in range(0, spacing - 1, 2):
                    X_off = np.remainder(X_r + offset + ridge_spacing / 2.0, spacing)
                    Y1 = np.where(X_off <= ridge_spacing, X_off, 0.0)
                    Y2 = np.where(X_off > ridge_spacing, X_off - ridge_spacing, 0.0)
                    el = (-np.sin(2 * np.pi * (Y1 / ridge_spacing / 2))
                          + np.sin(2 * np.pi * (Y2 / valley_spacing / 2)))
                    el = el.reshape(-1)
                    el = el - el.mean()
                    el = el / np.linalg.norm(el)
                    atoms.append(el)
                    oris.append(theta)
                    spacings.append(1.0 / spacing)
    dict_all = np.asarray(atoms, np.float32).T
    return dict_all, np.asarray(oris, np.float32), np.asarray(spacings, np.float32)


def smooth_dir_map(dir_map: jnp.ndarray, sigma: float = 2.0,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Circular smoothing in the doubled-angle domain (get_maps.py:237-252)."""
    c = jnp.cos(dir_map * 2)
    s = jnp.sin(dir_map * 2)
    if mask is not None:
        c = jnp.where(mask == 0, 0.0, c)
        s = jnp.where(mask == 0, 0.0, s)
    c = gaussian_blur_reflect(c, sigma)
    s = gaussian_blur_reflect(s, sigma)
    return jnp.arctan2(s, c) * 0.5


@functools.partial(jax.jit, static_argnames=("replicate_border_bug",))
def _quality_map_core(img, dict_all, ori_all, spacing_all,
                      replicate_border_bug: bool = True):
    h, w = img.shape
    blkH, blkW = h // BLOCK, w // BLOCK
    pad = (DICT_PATCH - BLOCK) // 2
    padded = jnp.pad(img, ((pad, pad), (pad, pad)), mode="symmetric")

    r = 1
    patches, bh, bw = extract_blocks(padded, patch=DICT_PATCH, stride=BLOCK)
    patches = patches.reshape(bh, bw, -1)[r:blkH - r, r:blkW - r]
    flat = patches.reshape(-1, DICT_PATCH * DICT_PATCH)
    flat = flat - jnp.mean(flat, axis=1, keepdims=True)
    flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 500.0)
    # extreme values are ZEROED (not clamped) — get_maps.py:486-487
    t = 0.05
    flat = jnp.where(flat > t, 0.0, flat)
    flat = jnp.where(flat < -t, -0.0, flat)

    simi = jnp.abs(flat @ dict_all)                # [(blkH-2)(blkW-2), n_atoms]
    best = jnp.argmax(simi, axis=1)
    qual = jnp.max(simi, axis=1)

    inner_shape = (blkH - 2 * r, blkW - 2 * r)
    quality = jnp.zeros((blkH, blkW)).at[r:blkH - r, r:blkW - r].set(
        qual.reshape(inner_shape))
    dirm = jnp.zeros((blkH, blkW)).at[r:blkH - r, r:blkW - r].set(
        ori_all[best].reshape(inner_shape))
    frem = jnp.zeros((blkH, blkW)).at[r:blkH - r, r:blkW - r].set(
        spacing_all[best].reshape(inner_shape))

    # border replication — faithfully reproducing that the reference copies
    # the *frequency* row/col into the direction map at the bottom/right
    # borders (get_maps.py:503-510)
    frem = frem.at[0].set(frem[r]).at[-1].set(frem[-r - 1])
    dirm = dirm.at[0].set(dirm[r])
    dirm = dirm.at[-1].set(frem[-r - 1] if replicate_border_bug else dirm[-r - 1])
    frem = frem.at[:, 0].set(frem[:, r]).at[:, -1].set(frem[:, -r - 1])
    dirm = dirm.at[:, 0].set(dirm[:, r])
    dirm = dirm.at[:, -1].set(frem[:, -r - 1] if replicate_border_bug else dirm[:, -r - 1])

    quality = gaussian_blur_cv2(quality, ksize=5, sigma=0.0)
    dirm = smooth_dir_map(dirm, sigma=1.5)
    frem = gaussian_blur_cv2(frem, ksize=3, sigma=1.0)
    return quality, dirm, frem


def get_quality_map_dict(img, dict_all, ori_all, spacing_all,
                         replicate_border_bug: bool = True):
    """Quality / direction / frequency maps from the ridge dictionary
    (get_maps.py:456-515). Accepts numpy or jax arrays."""
    return _quality_map_core(jnp.asarray(img, jnp.float32),
                             jnp.asarray(dict_all), jnp.asarray(ori_all),
                             jnp.asarray(spacing_all),
                             replicate_border_bug=replicate_border_bug)


# ---------------------------------------------------------------------------
# STFT directional analysis (rolled orientation maps)
# ---------------------------------------------------------------------------

def _stft_direction_tables(patch_size: int, nrof_dirs: int = 16):
    half = patch_size // 2
    x, y = np.meshgrid(np.arange(-half, half), np.arange(-half, half))
    # f64 tables: direction binning at exact pi/nd boundaries must not
    # depend on f32 arctan2 rounding
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    r = np.sqrt(x * x + y * y) + 1e-4
    f_low = patch_size / 18.0
    f_high = patch_size / 3.0
    band = (1.0 / (1 + (r / f_high) ** 4)) * (1.0 / (1 + (f_low / r) ** 4))
    d = np.arctan2(y, x)
    d[d < 0] += np.pi
    dir_ind = np.floor(d / (np.pi / nrof_dirs)).astype(int)
    dir_ind[dir_ind == nrof_dirs] = 0
    onehot = np.stack([(dir_ind == i).astype(np.float32)
                       for i in range(nrof_dirs)])      # [nd, P, P]
    sigma = patch_size / 3.0
    weight = np.exp(-(x * x + y * y) / (sigma * sigma)).astype(np.float32)
    return band.astype(np.float32), onehot, weight, r.astype(np.float32)


def _stft_histograms(img, patch_size: int, nrof_dirs: int):
    """Directional-energy analysis shared by the ridge-flow variants.

    Returns (sm, is_peak, fre_by_dir, bh, bw): the smoothed/normalized
    histogram [n, nd], its circular peak mask, and the per-direction ridge
    frequency — all with the reference's exact arithmetic
    (get_maps.py:33-99), including two quirks of ``local_STFT.analysis``:
    the [1,4,1]/6 smoothing is IN-PLACE (``smoothed_dir_norm = dir_norm``
    aliases, so each step reads the already-smoothed left neighbor — a
    recursive filter, not a convolution), and the frequency normalizer
    ``dir_norm[i]`` is the same aliased array, i.e. the smoothed+normalized
    value, not the raw bin energy.
    """
    band, onehot, weight, r = _stft_direction_tables(patch_size, nrof_dirs)
    band, onehot, weight, r = map(jnp.asarray, (band, onehot, weight, r))

    patches, bh, bw = extract_blocks(img, patch=patch_size, stride=BLOCK)
    n = patches.shape[0]
    p = patches * weight[None]
    p = p - jnp.mean(p, axis=(1, 2), keepdims=True)
    p = p / (jnp.linalg.norm(p.reshape(n, -1), axis=1)[:, None, None] + 1e-6)
    f = jnp.fft.fftshift(jnp.fft.fft2(p), axes=(1, 2)) * band[None]

    energy = jnp.abs(f)
    energy = energy / (jnp.sum(energy, axis=(1, 2), keepdims=True) + 1e-5)
    # directional energy histogram: [n, nd]
    dir_norm = jnp.einsum("npq,dpq->nd", energy, onehot)

    # sequential in-place circular smoothing (get_maps.py:52-58): carry the
    # smoothed left neighbor; the right neighbor is always the raw value
    d_next = jnp.roll(dir_norm, -1, axis=1)                  # raw right
    prev0 = dir_norm[:, nrof_dirs - 1]                       # raw wrap pad

    def smooth_step(prev, di_dn):
        di, dn = di_dn
        s = (prev + 4.0 * di + dn) / 6.0
        return s, s

    _, sm_t = jax.lax.scan(smooth_step, prev0,
                           (dir_norm.T, d_next.T))           # [nd, n]
    sm = sm_t.T
    sm = sm / (jnp.sum(sm, axis=1, keepdims=True) + 1e-5)

    sml = jnp.roll(sm, 1, axis=1)
    smr = jnp.roll(sm, -1, axis=1)
    is_peak = (sm > sml) & (sm > smr)

    wenergy = jnp.einsum("npq,dpq->nd", energy * r[None], onehot)
    # aliased normalizer: the reference divides by smoothed_dir_norm
    fre_by_dir = 1.0 / (wenergy / (sm + 1e-12) + 1e-5)
    return sm, is_peak, fre_by_dir, bh, bw


@functools.partial(jax.jit, static_argnames=("patch_size", "nrof_dirs"))
def _stft_maps_core(img, patch_size: int = 64, nrof_dirs: int = 16):
    sm, is_peak, fre_by_dir, bh, bw = _stft_histograms(img, patch_size,
                                                       nrof_dirs)
    n = sm.shape[0]
    conf = jnp.where(is_peak, sm, -jnp.inf)
    best = jnp.argmax(conf, axis=1)

    ori_interval = math.pi / nrof_dirs
    ori = best * ori_interval + ori_interval / 2 + math.pi / 2
    fre = fre_by_dir[jnp.arange(n), best]
    has_peak = jnp.any(is_peak, axis=1)
    ori = jnp.where(has_peak, ori, -10.0)
    fre = jnp.where(has_peak, fre, -10.0)
    return ori.reshape(bh, bw), fre.reshape(bh, bw)


@functools.partial(jax.jit, static_argnames=("patch_size", "nrof_dirs"))
def _stft_top2_core(img, patch_size: int = 64, nrof_dirs: int = 16):
    """Top-2 candidate orientations per block with the reference's
    candidate-pruning rule (get_maps.py:77-99): all histogram peaks sorted
    by confidence; if the strongest beats the runner-up by more than 2x
    only it survives, otherwise the top N=2 are kept."""
    sm, is_peak, _, bh, bw = _stft_histograms(img, patch_size, nrof_dirs)
    conf = jnp.where(is_peak, sm, -jnp.inf)
    i1 = jnp.argmax(conf, axis=1)
    c1 = jnp.max(conf, axis=1)
    conf2 = conf.at[jnp.arange(conf.shape[0]), i1].set(-jnp.inf)
    i2 = jnp.argmax(conf2, axis=1)
    c2 = jnp.max(conf2, axis=1)

    valid1 = jnp.any(is_peak, axis=1)
    valid2 = valid1 & jnp.isfinite(c2) & ~(c1 / jnp.maximum(c2, 1e-30) > 2.0)

    ori_interval = math.pi / nrof_dirs
    ori1 = i1 * ori_interval + ori_interval / 2 + math.pi / 2
    ori2 = i2 * ori_interval + ori_interval / 2 + math.pi / 2
    stackb = lambda a: a.reshape(bh, bw)
    return (stackb(ori1), stackb(ori2), stackb(valid1), stackb(valid2))


@functools.partial(jax.jit, static_argnames=("patch_size", "nrof_dirs"))
def _ridge_flow_optimal_core(img, patch_size: int = 64, nrof_dirs: int = 16):
    ori1, ori2, valid1, valid2 = _stft_top2_core(img, patch_size, nrof_dirs)
    bh, bw = ori1.shape
    cand_ori = jnp.stack([ori1, ori2], axis=-1)              # [bh, bw, 2]
    cand_valid = jnp.stack([valid1, valid2], axis=-1)
    c2t = jnp.where(cand_valid, jnp.cos(2 * cand_ori), 0.0)
    s2t = jnp.where(cand_valid, jnp.sin(2 * cand_ori), 0.0)

    pad = 2
    reliability = jnp.zeros((bh, bw, 2))
    for di in range(-pad, pad + 1):
        for dj in range(-pad, pad + 1):
            if di == 0 and dj == 0:
                continue
            nb_c = jnp.roll(c2t, (-di, -dj), axis=(0, 1))
            nb_s = jnp.roll(s2t, (-di, -dj), axis=(0, 1))
            nb_v = jnp.roll(cand_valid, (-di, -dj), axis=(0, 1))
            # simi = (cos(2(ori_k - ori_nb)) + 1) / 2, max over the
            # neighbor's valid candidates; neighbors with none contribute 0
            simi = (c2t[..., :, None] * nb_c[..., None, :]
                    + s2t[..., :, None] * nb_s[..., None, :] + 1.0) / 2.0
            simi = jnp.where(nb_v[..., None, :], simi, -jnp.inf)
            best = jnp.max(simi, axis=-1)                    # [bh, bw, 2]
            reliability = reliability + jnp.where(
                jnp.any(nb_v, axis=-1)[..., None], best, 0.0)

    reliability = jnp.where(cand_valid, reliability, -jnp.inf)
    k = jnp.argmax(reliability, axis=-1)
    sel_ori = jnp.take_along_axis(cand_ori, k[..., None], axis=-1)[..., 0]
    dir_map = sel_ori + math.pi * 0.5

    ii = jnp.arange(bh)[:, None]
    jj = jnp.arange(bw)[None, :]
    interior = ((ii >= pad) & (ii < bh - pad)
                & (jj >= pad) & (jj < bw - pad))
    return jnp.where(interior & valid1, dir_map, -10.0)


def get_maps_stft(img, patch_size: int = 64, block_size: int = BLOCK):
    """Direction + frequency maps via block STFT (get_maps.py:587-643):
    top-confidence smoothed peak per block, then circular smoothing."""
    img = jnp.asarray(img, jnp.float32)
    ovp = (patch_size - block_size) // 2
    padded = jnp.pad(img, ((ovp, ovp), (ovp, ovp)), mode="symmetric")
    dir_map, fre_map = _stft_maps_core(padded, patch_size=patch_size)
    dir_map = smooth_dir_map(dir_map, sigma=2.0)
    return dir_map, fre_map


def get_ridge_flow_optimal_n(img, patch_size: int = 64,
                             block_size: int = BLOCK):
    """Neighborhood-consistent orientation map (get_maps.py:200-234).

    Instead of taking each block's single strongest directional peak
    (``get_ridge_flow_top``, what get_maps_stft uses), every block keeps up
    to two candidate orientations and the one most consistent with the 5x5
    block neighborhood wins: reliability(k) = sum over the 24 neighbors of
    max_m (cos(2(ori_k - ori_nb_m)) + 1)/2. Border blocks (within 2) and
    blocks without any histogram peak return -10. The selected orientation
    carries the reference's extra +pi/2 offset on top of the +pi/2 already
    applied by the histogram analysis."""
    img = jnp.asarray(img, jnp.float32)
    ovp = (patch_size - block_size) // 2
    padded = jnp.pad(img, ((ovp, ovp), (ovp, ovp)), mode="symmetric")
    return _ridge_flow_optimal_core(padded, patch_size=patch_size)


@functools.partial(jax.jit, static_argnames=())
def _quality_map_coarse_core(img, dict_all, t):
    h, w = img.shape
    blkH, blkW = h // BLOCK, w // BLOCK
    pad = (DICT_PATCH - BLOCK) // 2
    padded = jnp.pad(img, ((pad, pad), (pad, pad)), mode="symmetric")

    p2 = DICT_PATCH // 2
    x, y = np.meshgrid(np.arange(-p2, p2), np.arange(-p2, p2))
    window = jnp.asarray(
        np.exp(-(x * x + y * y) / (DICT_PATCH * DICT_PATCH / 3.0)),
        jnp.float32).reshape(-1)

    r = 1
    patches, bh, bw = extract_blocks(padded, patch=DICT_PATCH, stride=BLOCK)
    patches = patches.reshape(bh, bw, -1)[r:blkH - r, r:blkW - r]
    flat = patches.reshape(-1, DICT_PATCH * DICT_PATCH)
    flat = flat - jnp.median(flat, axis=1, keepdims=True)
    flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 500.0)
    flat = jnp.where(jnp.abs(flat) > t, 0.0, flat)
    flat = flat * window[None, :]

    simi = jnp.abs(flat @ dict_all)
    best = jnp.argmax(simi, axis=1)
    qual = jnp.max(simi, axis=1)
    return best, qual, blkH, blkW


def get_quality_map_dict_coarse(img, dict_all, ori, spacing, t: float = 0.5,
                                replicate_border_bug: bool = True):
    """Coarse dictionary quality/ori/freq maps (get_maps.py:518-584).

    Differs from get_quality_map_dict: median (not mean) subtraction,
    extreme values zeroed at |v| > t = 0.5, a Gaussian window applied after
    normalization, and sigma-2 quality smoothing. The reference reads the
    winning atom's orientation from per-pixel doubled-angle component rows
    of 2-D ``ori``/``spacing`` arrays (rows 32 and 96 = pixels (1,0)/(3,0)
    of the flattened 32x32 atom) — a dictionary layout no constructor in
    its repo produces, so the function is unreachable there as shipped.
    Faithful indexing is used when 2-D arrays are passed; the per-atom 1-D
    form of construct_dictionary is accepted as the usable form.
    """
    img = jnp.asarray(img, jnp.float32)
    dict_all = jnp.asarray(dict_all)
    best, qual, blkH, blkW = _quality_map_coarse_core(img, dict_all, t)
    best_np = np.asarray(best)

    ori = np.asarray(ori)
    spacing = np.asarray(spacing)
    if ori.ndim == 2:
        dir_flat = -np.arctan2(ori[DICT_PATCH + 2 * DICT_PATCH,
                                   best_np],
                               ori[DICT_PATCH, best_np]) / 2.0
    else:
        dir_flat = ori[best_np]
    fre_flat = spacing[DICT_PATCH, best_np] if spacing.ndim == 2 \
        else spacing[best_np]

    r = 1
    inner = (blkH - 2 * r, blkW - 2 * r)
    quality = jnp.zeros((blkH, blkW)).at[r:-r, r:-r].set(
        jnp.asarray(qual).reshape(inner))
    dirm = jnp.zeros((blkH, blkW)).at[r:-r, r:-r].set(
        jnp.asarray(dir_flat, jnp.float32).reshape(inner))
    frem = jnp.zeros((blkH, blkW)).at[r:-r, r:-r].set(
        jnp.asarray(fre_flat, jnp.float32).reshape(inner))

    # same border replication (and same freq-into-direction copy at the
    # bottom/right borders) as the fine variant — get_maps.py:569-577
    frem = frem.at[0].set(frem[r]).at[-1].set(frem[-r - 1])
    dirm = dirm.at[0].set(dirm[r])
    dirm = dirm.at[-1].set(frem[-r - 1] if replicate_border_bug
                           else dirm[-r - 1])
    frem = frem.at[:, 0].set(frem[:, r]).at[:, -1].set(frem[:, -r - 1])
    dirm = dirm.at[:, 0].set(dirm[:, r])
    dirm = dirm.at[:, -1].set(frem[:, -r - 1] if replicate_border_bug
                              else dirm[:, -r - 1])

    quality = gaussian_blur_cv2(quality, ksize=5, sigma=2.0)
    dirm = smooth_dir_map(dirm, sigma=1.5)
    frem = gaussian_blur_cv2(frem, ksize=3, sigma=1.0)
    return quality, dirm, frem


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------

@jax.jit
def ssim_mask_quality(img: jnp.ndarray, temp_img: jnp.ndarray) -> jnp.ndarray:
    """Blockwise windowed correlation between two images (get_maps.py:406-447)
    before thresholding/morphology. Returns the [blkH, blkW] quality map."""
    h, w = img.shape
    blkH, blkW = h // BLOCK, w // BLOCK
    patch_size = 64
    bip = patch_size // BLOCK      # blocks per patch (4)
    R = 500.0

    def get_weight(n, sigma):
        yy, xx = np.mgrid[0:n, 0:n]
        c = n // 2
        return np.exp(-((xx - c) ** 2 + (yy - c) ** 2) / sigma)

    w_blk = jnp.asarray(get_weight(bip, (bip / 2.0) ** 2), jnp.float32)
    w_pix = jnp.asarray(get_weight(patch_size, (patch_size / 2.0) ** 2), jnp.float32)

    def prep(x):
        patches, bh, bw = extract_blocks(x, patch=patch_size, stride=BLOCK)
        # stride over blocks: take every block position (stride 16 = 1 block)
        n = patches.shape[0]
        med = jnp.median(patches.reshape(n, -1), axis=1)
        p = patches - med[:, None, None]
        p = p / (jnp.linalg.norm(p.reshape(n, -1), axis=1)[:, None, None] + R)
        return (p * w_pix[None]).reshape(n, -1), bh, bw

    pa, bh, bw = prep(img)
    pb, _, _ = prep(temp_img)
    simi = jnp.sum(pa * pb, axis=1).reshape(bh, bw)

    quality = jnp.zeros((blkH, blkW))
    # scatter the patch similarity onto its bip x bip block footprint
    for di in range(bip):
        for dj in range(bip):
            quality = quality.at[di:di + bh, dj:dj + bw].add(
                simi * w_blk[di, dj])
    return quality


def ssim_mask(img, temp_img, thr: float = 0.65) -> np.ndarray:
    """Full SSIM block mask with cv2-Gaussian + binary closing/opening."""
    q = ssim_mask_quality(jnp.asarray(img, jnp.float32),
                          jnp.asarray(temp_img, jnp.float32))
    q = gaussian_blur_cv2(q, ksize=5, sigma=0.0)
    return _ssim_mask_host(np.asarray(q), thr)


def _ssim_mask_host(q: np.ndarray, thr: float) -> np.ndarray:
    """Host tail of ssim_mask (threshold + tiny-block morphology)."""
    from . import morphology
    blk = q > thr
    blk = morphology.binary_closing(blk, np.ones((3, 3), bool))
    blk = morphology.binary_opening(blk, np.ones((3, 3), bool))
    return blk.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("replicate_border_bug",))
def quality_ssim_fused(aec_img, stft_texture, dict_all, ori_all,
                       spacing_all, replicate_border_bug: bool = True):
    """One dispatch for the latent mask stage's device work: dictionary
    quality/ori/freq maps of the AEC image + blurred SSIM block quality
    between the STFT-texture and AEC images (extraction_latent.py:106-115)
    — the two separate dispatches plus their round-trips cost ~0.2 s of
    the maps_mask stage through the tunnel. Returns
    (quality, dir, fre, ssim_quality[blurred])."""
    q, d, f = _quality_map_core(jnp.asarray(aec_img, jnp.float32),
                                dict_all, ori_all, spacing_all,
                                replicate_border_bug)
    sq = ssim_mask_quality(jnp.asarray(stft_texture, jnp.float32),
                           jnp.asarray(aec_img, jnp.float32))
    sq = gaussian_blur_cv2(sq, ksize=5, sigma=0.0)
    return q, d, f, sq


@jax.jit
def _intensity_mask_core(dimg):
    """Device half of get_quality_map_intensity: contrast-normalize ->
    gradient magnitude -> Gaussian blur -> x8 downsample, fused so the
    image crosses the 22 MB/s tunnel once and only the [h/8, w/8] map
    returns (the r4 implementation round-tripped the full-res magnitude
    through the host, costing ~0.4 s of the rolled 'cropping' stage)."""
    from .contrast import local_contrast_enhancement
    nimg = local_contrast_enhancement(dimg)
    gy, gx = jnp.gradient(nimg)
    mag = jnp.abs(gx) + jnp.abs(gy)
    mag = gaussian_blur_cv2(mag, ksize=21, sigma=7.0)
    return mag[::8, ::8]


def get_quality_map_intensity(img) -> np.ndarray:
    """Rolled segmentation mask from contrast-normalized gradient magnitude
    (get_maps.py:349-366). Accepts a host or device-resident image."""
    from . import morphology
    mag = np.asarray(_intensity_mask_core(jnp.asarray(img, jnp.float32)))
    mask = (mag > 0.3 * 127.5).astype(np.uint8)
    mask = morphology.binary_opening(mask.astype(bool), np.ones((5, 5), bool))
    mask = np.kron(mask.astype(np.uint8), np.ones((8, 8), np.uint8))
    h, w = img.shape[:2]
    return mask[:h, :w]
