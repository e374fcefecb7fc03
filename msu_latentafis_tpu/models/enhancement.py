"""Enhancement autoencoder (Flax).

Capability parity with the reference's tensorpack ``reconstruction2``
(/root/reference/extraction/enhancement_AEC.py:198-223): a conv encoder
(nf=16, 4x4 stride-2 x5 + 1x1 bottleneck, tanh feature) and deconv decoder
(x5 + 3x3 conv, tanh output). Input is a [-1, 1]-normalized grayscale image;
output is the enhanced image in [-1, 1].

TPU-first details: NHWC layout, bfloat16-friendly compute with float32
batch-norm statistics, fully convolutional — whole-image inference runs on
any H, W that are multiples of 32 (pad + crop helpers below).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 4
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


class DeconvBNRelu(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


class EnhancementAEC(nn.Module):
    """Conv-deconv enhancement autoencoder; 1-channel in/out."""

    nf: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        for i, mult in enumerate([1, 2, 4, 8, 8]):
            x = ConvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        x = nn.Conv(nf, (1, 1), dtype=self.dtype)(x)
        x = jnp.tanh(x)  # bottleneck 'feature'
        for mult in [8, 4, 2, 1, 1]:
            x = DeconvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        x = nn.Conv(1, (3, 3), dtype=self.dtype)(x)
        return jnp.tanh(x)


def pad_to_multiple(img: jnp.ndarray, multiple: int = 32) -> Tuple[jnp.ndarray, int, int]:
    h, w = img.shape[-3:-1] if img.ndim >= 3 else img.shape
    H = ((h + multiple - 1) // multiple) * multiple
    W = ((w + multiple - 1) // multiple) * multiple
    pad = [(0, 0)] * (img.ndim - 3) + [(0, H - h), (0, W - w), (0, 0)]
    if img.ndim == 2:
        pad = [(0, H - h), (0, W - w)]
    return jnp.pad(img, pad), h, w


def gaussian_blend_weights(h: int, w: int, sigma=None) -> np.ndarray:
    """Center-weighted blending window (enhancement_AEC.get_weights,
    :405-413: sigma defaults to (max(h,w)/3)^2)."""
    Y, X = np.mgrid[0:h, 0:w]
    x0, y0 = w // 2, h // 2
    if sigma is None:
        sigma = (max(h, w) / 3.0) ** 2
    return np.exp(-((X - x0) ** 2 + (Y - y0) ** 2) / sigma)


def enhance_tiled(apply_fn, variables, img: np.ndarray,
                  patch: int = 128) -> np.ndarray:
    """Tiled inference with Gaussian-window overlap-add blending
    (ImportGraph.run, enhancement_AEC.py:39-66): 128x128 patches at stride
    64, batched through the net in one call, min-max rescaled to [0, 255]."""
    img = np.asarray(img, np.float32)
    h, w = img.shape
    stride = patch // 2
    ys = list(range(0, max(h - patch, 0) + 1, stride))
    xs = list(range(0, max(w - patch, 0) + 1, stride))
    tiles = np.stack([img[y:y + patch, x:x + patch]
                      for y in ys for x in xs])[..., None]
    out = np.asarray(apply_fn(variables, jnp.asarray(tiles)))[..., 0]
    weight = gaussian_blend_weights(patch, patch)
    canvas = np.zeros((h, w), np.float64)
    i = 0
    for y in ys:
        for x in xs:
            canvas[y:y + patch, x:x + patch] += out[i] * weight
            i += 1
    lo, hi = canvas.min(), canvas.max()
    return (canvas - lo) / (hi - lo + 1e-9) * 255.0


def enhance_whole_image(apply_fn, variables, img) -> jnp.ndarray:
    """Whole-image inference matching ImportGraph.run_whole_image
    (enhancement_AEC.py:89-104): x/128 - 1 in, min-max rescale to [0, 255]
    out. ``apply_fn`` is a jitted model.apply closed over variables.
    Returns a DEVICE array — downstream consumers (quality maps, SSIM,
    minutiae net) all run on device, so the enhanced image never needs to
    cross the host boundary."""
    x = jnp.asarray(img, jnp.float32) / 128.0 - 1.0
    x = x[None, :, :, None]
    x, h, w = pad_to_multiple(x, 32)
    out = apply_fn(variables, x)[0, :h, :w, 0]
    lo, hi = jnp.min(out), jnp.max(out)
    return (out - lo) / (hi - lo + 1e-9) * 255.0
