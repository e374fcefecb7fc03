"""Training-time degradation augmentations (jitted, batched).

Capability parity with the reference's dataflow augments
(/root/reference/extraction/enhancement_AEC.py:154-180 and
minutiae_AEC.py:186-211): random crop, random brightness (+/-25), random
contrast (x0.5..1.5), Gaussian blur with random odd kernel 1..7 — applied to
the [-1, 1]-normalized input while the target stays clean.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def random_crop(key, img: jnp.ndarray, target: jnp.ndarray, size: int):
    """Aligned random crop of [H, W, Ci] input + [H, W, Ct] target."""
    h, w = img.shape[:2]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - size + 1)
    x0 = jax.random.randint(kx, (), 0, w - size + 1)
    ci = jax.lax.dynamic_slice(img, (y0, x0, 0), (size, size, img.shape[2]))
    ct = jax.lax.dynamic_slice(target, (y0, x0, 0), (size, size, target.shape[2]))
    return ci, ct


def _gauss_kernel(sigma_px: int, max_k: int = 7) -> jnp.ndarray:
    """Bank of cv2-style kernels for odd sizes 1..max_k, zero-padded."""
    ks = []
    for size in range(1, max_k + 1, 2):
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
        x = np.arange(size) - (size - 1) / 2.0
        k = np.exp(-(x * x) / (2 * sigma * sigma))
        k = k / k.sum()
        pad = (max_k - size) // 2
        ks.append(np.pad(k, (pad, pad)))
    return jnp.asarray(np.stack(ks), jnp.float32)   # [max_k//2+1, max_k]


_KERNELS = None


def degrade(key, img: jnp.ndarray) -> jnp.ndarray:
    """Random brightness/contrast/blur on a [H, W, 1] image in raw
    (0..255-ish) units; returns the degraded image still in raw units."""
    global _KERNELS
    if _KERNELS is None:
        _KERNELS = _gauss_kernel(0)
    kb, kc, ks = jax.random.split(key, 3)
    img = img + (jax.random.uniform(kb, ()) - 0.5) * 50.0
    img = img * (jax.random.uniform(kc, ()) + 0.5)

    sel = jax.random.randint(ks, (), 0, _KERNELS.shape[0])
    k = _KERNELS[sel]
    pad = (_KERNELS.shape[1] - 1) // 2
    x = img[:, :, 0]
    x = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    x = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"), in_axes=1,
                 out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(x)
    return x[:, :, None]


@functools.partial(jax.jit, static_argnames=("crop",))
def make_training_pair(key, img: jnp.ndarray, target: jnp.ndarray, crop: int = 128):
    """Full augment: aligned crop + degrade input, normalize to [-1, 1]."""
    k1, k2 = jax.random.split(key)
    ci, ct = random_crop(k1, img, target, crop)
    ci = degrade(k2, ci)
    return ci / 128.0 - 1.0, ct
