"""Local contrast normalization (preprocessing.py:31-59) in JAX.

Box (15x15) and Gaussian variants of mean/absolute-deviation normalization
mapped to [0, 255]. Convolutions are separable depthwise convs — trivially
XLA-fusable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _sep_filter2d(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D filter with reflect-101 edge handling (cv2 default)."""
    pad = (len(k) - 1) // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1,
                 out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def _box_kernel(n: int) -> jnp.ndarray:
    return jnp.full((n,), 1.0 / n, jnp.float32)


def _gauss_kernel(ksize: int) -> jnp.ndarray:
    """cv2.getGaussianKernel semantics: sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return jnp.asarray(k / k.sum(), jnp.float32)


@functools.partial(jax.jit, static_argnames=("ksize",))
def local_contrast_enhancement(img: jnp.ndarray, ksize: int = 15) -> jnp.ndarray:
    """Box mean/abs-dev normalization (preprocessing.py:31-44)."""
    img = img.astype(jnp.float32)
    k = _box_kernel(ksize)
    mean = _sep_filter2d(img, k)
    centered = img - mean
    dev = _sep_filter2d(jnp.abs(centered), k)
    out = jnp.clip(centered / (dev + 10.0) * 0.75, -1.0, 1.0)
    return (out + 1.0) * 127.5


@functools.partial(jax.jit, static_argnames=("ksize",))
def local_contrast_enhancement_gaussian(img: jnp.ndarray, ksize: int = 15) -> jnp.ndarray:
    """Gaussian-window variant (preprocessing.py:47-59); the reference passes
    sigma=15 as the cv2 *kernel size* with auto sigma."""
    img = img.astype(jnp.float32)
    k = _gauss_kernel(ksize)
    mean = _sep_filter2d(img, k)
    centered = img - mean
    dev = _sep_filter2d(jnp.abs(centered), k)
    out = jnp.clip(centered / (dev + 10.0) * 0.75, -1.0, 1.0)
    return (out + 1.0) * 127.5
