"""Pixelwise Gabor enhancement.

The reference's hottest CPU loop: for every foreground pixel, select a Gabor
kernel by the local (orientation, frequency) bucket and convolve at that
pixel (/root/reference/extraction/filtering.py:136-216 — a per-pixel Python
loop fanned out over multiprocessing with thread_num=1).

TPU formulation: all kernels live in a dense bank [n_ori * n_freq, 361]
(variable-size kernels zero-embedded into the 19x19 max footprint — the
sums are unchanged). The per-pixel kernel choice becomes an MXU matmul:
a bf16 one-hot of the per-pixel bucket index, [H*W, 1800], times the bank
gathers each pixel's 361 taps, which are then fused multiply-reduced in
f32 against im2col patches (conv_general_dilated_patches), [H*W, 361]:

    enh[p] = sum_t onehot(bucket[p]) @ bank[:, t] * patches[p, t]

Peak HBM transient: the one-hot is H*W x 1800 bf16 (~2.2 GB at 768x800)
plus H*W x 361 f32 patches (~0.9 GB) — this, not FLOPs, bounds the usable
image area on the 15.75 GB chip; `max_size` in the callers keeps images
within it.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

KMAX = 19          # max gabor kernel footprint at sigma=3, n_stds=3
KHALF = KMAX // 2


def _gabor_kernel_real(frequency: float, theta: float, sigma: float = 3.0,
                       n_stds: float = 3.0) -> np.ndarray:
    """Real part of the skimage-style complex Gabor kernel at its natural
    (theta-dependent) size."""
    x0 = int(np.ceil(max(abs(n_stds * sigma * np.cos(theta)),
                         abs(n_stds * sigma * np.sin(theta)), 1)))
    y0 = int(np.ceil(max(abs(n_stds * sigma * np.sin(theta)),
                         abs(n_stds * sigma * np.cos(theta)), 1)))
    y, x = np.mgrid[-y0:y0 + 1, -x0:x0 + 1]
    rotx = x * np.cos(theta) + y * np.sin(theta)
    roty = -x * np.sin(theta) + y * np.cos(theta)
    g = np.exp(-0.5 * (rotx ** 2 / sigma ** 2 + roty ** 2 / sigma ** 2))
    g /= 2 * np.pi * sigma * sigma
    return g * np.cos(2 * np.pi * frequency * rotx)


@functools.lru_cache(maxsize=4)
def get_gabor_filters(angle_inc: int = 3, fre_num: int = 30) -> np.ndarray:
    """Normalized int16-quantized kernel bank [n_ori, fre_num, 19, 19]
    (filtering.py:61-81), zero-embedded to the max footprint."""
    n_ori = 180 // angle_inc
    bank = np.zeros((n_ori, fre_num, KMAX, KMAX), np.float32)
    for i in range(n_ori):
        ori = i * angle_inc / 180.0 * math.pi
        for j in range(fre_num):
            if j < 5:
                continue
            k = _gabor_kernel_real(j * 0.01, theta=ori)
            k = k - k.mean()
            k = k / (np.linalg.norm(k) + 1e-5)
            k = np.asarray(k * 255, np.int16).astype(np.float32)
            kh, kw = k.shape
            oy, ox = (KMAX - kh) // 2, (KMAX - kw) // 2
            bank[i, j, oy:oy + kh, ox:ox + kw] = k
    return bank


def _upsample_maps(dir_map, fre_map, block_size: int, out_hw: Tuple[int, int]):
    """Block maps -> pixel maps via cubic zoom of cos/sin(2 theta) and the
    frequency (filtering.py:143-148). Uses scipy spline zoom on the host for
    faithful semantics (tiny arrays)."""
    from scipy.ndimage import zoom
    c = zoom(np.cos(np.asarray(dir_map) * 2), block_size)
    s = zoom(np.sin(np.asarray(dir_map) * 2), block_size)
    f = zoom(np.asarray(fre_map), block_size)
    angle = np.arctan2(s, c) * 0.5
    h, w = out_hw
    return angle[:h, :w], f[:h, :w]


@functools.lru_cache(maxsize=8)
def _zoom_mat(n: int, factor: int) -> np.ndarray:
    """Cubic spline zoom along one axis as an exact [n*factor, n] matrix:
    scipy.ndimage.zoom is linear in its input (spline prefilter + spline
    evaluation are both linear maps), so the matrix is just the zoom of an
    identity — verified equal to direct zoom to ~6e-15."""
    from scipy.ndimage import zoom
    return zoom(np.eye(n), (factor, 1), order=3).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("block_size", "angle_inc",
                                             "fre_num", "h", "w"))
def _gabor_plan_device(dir_map, fre_map, My, Mx, border_mask,
                       block_size: int, angle_inc: int, fre_num: int,
                       h: int, w: int):
    hi = jax.lax.Precision.HIGHEST
    up = lambda a: jnp.matmul(jnp.matmul(My, a.astype(jnp.float32),
                                         precision=hi), Mx.T,
                              precision=hi)[:h, :w]
    c = up(jnp.cos(dir_map * 2))
    s = up(jnp.sin(dir_map * 2))
    f = up(fre_map)
    angle = jnp.arctan2(s, c) * 0.5
    deg = (angle / math.pi * 180).astype(jnp.int32)   # trunc toward 0
    deg = jnp.where(deg < 0, deg + 180, deg)
    deg = jnp.where(deg == 180, 0, deg)
    a_ind = deg // angle_inc
    f_ind = jnp.round(f * 100).astype(jnp.int32)
    in_range = (f_ind >= 5) & (f_ind < fre_num)
    active = in_range & border_mask
    bucket = a_ind * fre_num + jnp.clip(f_ind, 0, fre_num - 1)
    return bucket.astype(jnp.int16), active


@functools.partial(jax.jit, static_argnames=("fre_num",))
def _gabor_apply(img: jnp.ndarray, bucket: jnp.ndarray, active: jnp.ndarray,
                 bank_flat: jnp.ndarray, fre_num: int = 30) -> jnp.ndarray:
    """enh[i,j] = sum over taps of img[i+dy-9, j+dx-9] * bank[bucket, dy, dx].

    The per-pixel kernel selection K[p, t] = bank_flat[bucket[p], t] is an
    EXACT one-hot matmul on the MXU: the bank is int16-quantized (integer
    values, |v| <= 255, exactly representable in bf16) and each output
    element is one selected entry accumulated in f32. A gather formulation
    runs at TPU's ~90M gathered elements/s (213M elements here = seconds
    per call, measured as the extraction pipeline's top hotspot in r3);
    this is ~800 GFLOP of bf16 matmul = milliseconds. The tap reduction is
    an im2col (conv_general_dilated_patches) fused multiply-reduce in f32.
    """
    h, w = img.shape
    nb, nt = bank_flat.shape                       # [1800, 361]
    oh = jax.nn.one_hot(bucket.reshape(-1), nb, dtype=jnp.bfloat16)
    K = jax.lax.dot_general(
        oh, bank_flat.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [P, nt] exact
    # patches[i, j, t] = img[i + dy - 9, j + dx - 9], t = dy*19 + dx
    # (row-major spatial order matches bank_flat's tap order)
    patches = jax.lax.conv_general_dilated_patches(
        img[None, :, :, None], (KMAX, KMAX), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]  # [H, W, nt]
    enh = jnp.sum(patches.reshape(-1, nt) * K, axis=1).reshape(h, w)
    enh = jnp.where(active, enh, 0.0)
    # min-max scale to [0, 255] (filtering.py:214-216) on device
    lo, hi = jnp.min(enh), jnp.max(enh)
    return (enh - lo + 1e-4) / (hi - lo + 1e-4) * 255.0


def gabor_plan(dir_map, fre_map, shape: Tuple[int, int], mask=None,
               block_size: int = 16, angle_inc: int = 3):
    """Per-pixel (bucket, active) selection maps for :func:`_gabor_apply`.

    Separated from the apply so callers enhancing several images with the
    SAME orientation/frequency maps (the latent pipeline Gabor-enhances
    both the contrast and texture images) pay the cubic-spline upsampling
    (~0.16 s host) once."""
    h, w = shape
    fre_num = 30
    if block_size > 1:
        # whole plan on device: the cubic zoom is two exact matmuls
        # (_zoom_mat), the bucket math is elementwise int — only the tiny
        # block maps cross the tunnel (the host zoom alone cost ~0.3 s of
        # the gabor stage on the 2-core host)
        border = np.ones((h, w), bool)
        border[:15, :] = False
        border[:, :15] = False
        border[h - 15:, :] = False
        border[:, w - 15:] = False
        if mask is not None:
            border &= np.asarray(mask)[:h, :w] > 0
        dm = np.asarray(dir_map, np.float32)
        My = jnp.asarray(_zoom_mat(dm.shape[0], block_size))
        Mx = jnp.asarray(_zoom_mat(dm.shape[1], block_size))
        bucket, active = _gabor_plan_device(
            jnp.asarray(dm), jnp.asarray(fre_map, jnp.float32), My, Mx,
            jnp.asarray(border), block_size=block_size,
            angle_inc=angle_inc, fre_num=fre_num, h=h, w=w)
        return bucket, active, angle_inc, fre_num

    mask = (np.ones((h, w), np.uint8) if mask is None
            else np.asarray(mask).copy())
    mask[:15, :] = 0
    mask[:, :15] = 0
    mask[h - 15:, :] = 0
    mask[:, w - 15:] = 0
    angle, frequency = np.asarray(dir_map), np.asarray(fre_map)
    deg = (angle / math.pi * 180).astype(int)
    deg[deg < 0] += 180
    deg[deg == 180] = 0
    a_ind = deg // angle_inc
    f_ind = np.around(frequency * 100).astype(int)
    in_range = (f_ind >= 5) & (f_ind < fre_num)
    active = in_range & (mask > 0)
    f_safe = np.clip(f_ind, 0, fre_num - 1)
    bucket = a_ind * fre_num + f_safe
    # bucket uploads as int16 (max 1799) to halve tunnel bytes
    return (jnp.asarray(bucket, jnp.int16), jnp.asarray(active),
            angle_inc, fre_num)


def gabor_apply_planned(img, plan) -> jnp.ndarray:
    bucket, active, angle_inc, fre_num = plan
    bank = get_gabor_filters(angle_inc, fre_num)
    bank_flat = bank.reshape(-1, KMAX * KMAX)
    return _gabor_apply(jnp.asarray(img, jnp.float32), bucket, active,
                        jnp.asarray(bank_flat))


def gabor_apply_planned_multi(imgs, plan):
    """Gabor-enhance several same-shape images under ONE plan in one
    dispatch: the per-pixel kernel table K (the 800-GFLOP one-hot matmul +
    ~900 MB materialization) is computed once and shared — the latent
    pipeline enhances both the contrast and texture images with the same
    orientation/frequency plan (extraction_latent.py:135-148)."""
    bucket, active, angle_inc, fre_num = plan
    bank = get_gabor_filters(angle_inc, fre_num)
    bank_flat = bank.reshape(-1, KMAX * KMAX)
    out = _gabor_apply_multi(jnp.stack([jnp.asarray(im, jnp.float32)
                                        for im in imgs]), bucket, active,
                             jnp.asarray(bank_flat))
    return [out[i] for i in range(len(imgs))]


@functools.partial(jax.jit, static_argnames=("fre_num",))
def _gabor_apply_multi(imgs: jnp.ndarray, bucket: jnp.ndarray,
                       active: jnp.ndarray, bank_flat: jnp.ndarray,
                       fre_num: int = 30) -> jnp.ndarray:
    n, h, w = imgs.shape
    nb, nt = bank_flat.shape
    oh = jax.nn.one_hot(bucket.reshape(-1), nb, dtype=jnp.bfloat16)
    K = jax.lax.dot_general(
        oh, bank_flat.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [P, nt] exact, shared
    outs = []
    for i in range(n):
        patches = jax.lax.conv_general_dilated_patches(
            imgs[i][None, :, :, None], (KMAX, KMAX), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        enh = jnp.sum(patches.reshape(-1, nt) * K, axis=1).reshape(h, w)
        enh = jnp.where(active, enh, 0.0)
        lo, hi = jnp.min(enh), jnp.max(enh)
        outs.append((enh - lo + 1e-4) / (hi - lo + 1e-4) * 255.0)
    return jnp.stack(outs)


def gabor_plan_host(angle: np.ndarray, frequency: np.ndarray,
                    shape: Tuple[int, int], mask=None, angle_inc: int = 3,
                    fre_num: int = 30):
    """NumPy twin of :func:`gabor_plan` at block_size=1 (full-resolution
    angle/frequency maps) for host-side training-data generation — the
    descriptor stand-ins must train on the SAME Gabor-enhanced domain the
    latent pipeline produces at match time (latent descriptor images 3/4
    and the selected minutiae templates {26, 2, 11} are all Gabor-enhanced;
    matcher.cpp:380, extraction_latent.py:135-148)."""
    h, w = shape
    if mask is None:
        mask = np.ones((h, w), np.uint8)
    mask = np.asarray(mask).copy()
    mask[:15, :] = 0
    mask[:, :15] = 0
    mask[h - 15:, :] = 0
    mask[:, w - 15:] = 0
    angle = np.broadcast_to(np.asarray(angle), (h, w))
    frequency = np.broadcast_to(np.asarray(frequency), (h, w))
    deg = (angle / math.pi * 180).astype(int)
    deg = np.where(deg < 0, deg + 180, deg)
    deg = np.where(deg == 180, 0, deg)
    a_ind = deg // angle_inc
    f_ind = np.around(frequency * 100).astype(int)
    in_range = (f_ind >= 5) & (f_ind < fre_num)
    active = in_range & (mask > 0)
    bucket = a_ind * fre_num + np.clip(f_ind, 0, fre_num - 1)
    return bucket.astype(np.int32), active


def gabor_apply_host(img: np.ndarray, bucket: np.ndarray,
                     active: np.ndarray, angle_inc: int = 3,
                     fre_num: int = 30) -> np.ndarray:
    """NumPy twin of :func:`_gabor_apply` (same bank, same zero-padded
    correlation, same min-max normalization) built for FEW distinct
    buckets: one FFT correlation per bucket present, then per-pixel select.
    Synthetic training imagery has one ridge spacing and <= 60 orientations
    per image, so this runs in ~0.1 s/image on a host core where the
    one-hot-matmul device path would burn the 2-core data-generation budget
    (it exists for the TPU, not the host). Tested equal to the device path
    in tests/test_ops.py."""
    from scipy.signal import fftconvolve
    bank = get_gabor_filters(angle_inc, fre_num)
    bank2d = bank.reshape(-1, KMAX, KMAX)
    img = np.asarray(img, np.float64)
    enh = np.zeros_like(img)
    for b in np.unique(bucket[active]):
        sel = (bucket == b) & active
        kern = bank2d[int(b)][::-1, ::-1]  # correlate == flipped convolve
        conv = fftconvolve(img, kern, mode="same")
        enh[sel] = conv[sel]
    lo, hi = enh.min(), enh.max()
    return ((enh - lo + 1e-4) / (hi - lo + 1e-4) * 255.0).astype(np.float32)


def gabor_filtering_pixel2(img, dir_map, fre_map, mask=None,
                           block_size: int = 16, angle_inc: int = 3) -> jnp.ndarray:
    """Pixelwise Gabor enhancement (filtering.py:136-216).

    ``dir_map``/``fre_map`` are block-resolution; the 15-px image border is
    masked off and the result is min-max scaled to [0, 255]."""
    plan = gabor_plan(dir_map, fre_map, img.shape, mask=mask,
                      block_size=block_size, angle_inc=angle_inc)
    return gabor_apply_planned(img, plan)
