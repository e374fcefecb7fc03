"""Separable Gaussian blurs matching cv2 / scipy.ndimage semantics.

The reference mixes cv2.GaussianBlur (reflect-101 borders, kernel size given)
and skimage/scipy gaussian filtering (edge-replicating reflect borders,
radius = int(truncate * sigma + 0.5)); both appear in map smoothing, so both
variants are provided as jitted JAX.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cv2_kernel(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _ndimage_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _sep_blur(img: jnp.ndarray, k: jnp.ndarray, pad_mode: str) -> jnp.ndarray:
    pad = (len(k) - 1) // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode=pad_mode)
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1,
                 out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur_cv2(img: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """cv2.GaussianBlur(img, (ksize, ksize), sigma) — reflect-101 borders."""
    k = jnp.asarray(_cv2_kernel(ksize, sigma))
    return _sep_blur(img.astype(jnp.float32), k, "reflect")


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur_reflect(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """scipy.ndimage.gaussian_filter(img, sigma, mode='reflect') — the
    skimage ``gaussian(..., mode='reflect')`` used by smooth_dir_map."""
    k = jnp.asarray(_ndimage_kernel(sigma))
    return _sep_blur(img.astype(jnp.float32), k, "symmetric")
