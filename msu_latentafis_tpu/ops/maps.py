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
    x = x.astype(np.float32)
    y = y.astype(np.float32)
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


@functools.partial(jax.jit, static_argnames=("patch_size", "nrof_dirs"))
def _stft_maps_core(img, patch_size: int = 64, nrof_dirs: int = 16):
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
    # circular [1,4,1]/6 smoothing
    left = jnp.roll(dir_norm, 1, axis=1)
    right = jnp.roll(dir_norm, -1, axis=1)
    sm = (left + 4.0 * dir_norm + right) / 6.0
    sm = sm / (jnp.sum(sm, axis=1, keepdims=True) + 1e-5)

    sml = jnp.roll(sm, 1, axis=1)
    smr = jnp.roll(sm, -1, axis=1)
    is_peak = (sm > sml) & (sm > smr)
    conf = jnp.where(is_peak, sm, -jnp.inf)
    best = jnp.argmax(conf, axis=1)

    ori_interval = math.pi / nrof_dirs
    ori = best * ori_interval + ori_interval / 2 + math.pi / 2

    wenergy = jnp.einsum("npq,dpq->nd", energy * r[None], onehot)
    fre_raw = wenergy[jnp.arange(n), best] / (dir_norm[jnp.arange(n), best] + 1e-9)
    fre = 1.0 / (fre_raw + 1e-5)
    has_peak = jnp.any(is_peak, axis=1)
    ori = jnp.where(has_peak, ori, -10.0)
    fre = jnp.where(has_peak, fre, -10.0)
    return ori.reshape(bh, bw), fre.reshape(bh, bw)


def get_maps_stft(img, patch_size: int = 64, block_size: int = BLOCK):
    """Direction + frequency maps via block STFT (get_maps.py:587-643):
    top-confidence smoothed peak per block, then circular smoothing."""
    img = jnp.asarray(img, jnp.float32)
    ovp = (patch_size - block_size) // 2
    padded = jnp.pad(img, ((ovp, ovp), (ovp, ovp)), mode="symmetric")
    dir_map, fre_map = _stft_maps_core(padded, patch_size=patch_size)
    dir_map = smooth_dir_map(dir_map, sigma=2.0)
    return dir_map, fre_map


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
    from . import morphology
    q = ssim_mask_quality(jnp.asarray(img, jnp.float32),
                          jnp.asarray(temp_img, jnp.float32))
    q = gaussian_blur_cv2(q, ksize=5, sigma=0.0)
    blk = np.asarray(q) > thr
    blk = morphology.binary_closing(blk, np.ones((3, 3), bool))
    blk = morphology.binary_opening(blk, np.ones((3, 3), bool))
    return blk.astype(np.int32)


def get_quality_map_intensity(img) -> np.ndarray:
    """Rolled segmentation mask from contrast-normalized gradient magnitude
    (get_maps.py:349-366)."""
    from . import morphology
    from .contrast import local_contrast_enhancement
    nimg = np.asarray(local_contrast_enhancement(jnp.asarray(img, jnp.float32)))
    gy, gx = np.gradient(nimg)
    mag = np.abs(gx) + np.abs(gy)
    mag = np.asarray(gaussian_blur_cv2(jnp.asarray(mag, jnp.float32),
                                       ksize=21, sigma=7.0))
    mag = mag[::8, ::8]
    mask = (mag > 0.3 * 127.5).astype(np.uint8)
    mask = morphology.binary_opening(mask.astype(bool), np.ones((5, 5), bool))
    mask = np.kron(mask.astype(np.uint8), np.ones((8, 8), np.uint8))
    h, w = img.shape[:2]
    return mask[:h, :w]
