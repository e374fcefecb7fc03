"""Minutiae detection networks (Flax).

Capability parity with the reference's tensorpack models
(/root/reference/extraction/minutiae_AEC.py):
- ``MinutiaeAEC`` — the AEC_Model conv-deconv topology (:228-256): nf=64
  4x4 stride-2 encoder x6 with tanh bottleneck, deconv decoder x6 to a
  12-channel orientation-cylinder heatmap with ReLU output;
- ``MinutiaeUNet`` — the UNet variant (:367-422) with skip connections.

Both are fully convolutional: whole-image inference on any size that is a
multiple of the downsampling factor (64), matching the reference's
``run_whole_image`` path (minutiae_AEC.py:76-88). The helper below wraps
inference + cylinder decoding into minutiae points.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .enhancement import ConvBNRelu, DeconvBNRelu, pad_to_multiple


class MinutiaeAEC(nn.Module):
    """Conv-deconv 12-channel minutiae-cylinder regressor."""

    nf: int = 64
    num_ori: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        skips = []
        for mult in [1, 2, 4, 8, 8, 8]:
            x = ConvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        x = jnp.tanh(x)  # bottleneck 'feature'
        for mult in [8, 8, 4, 2, 1]:
            x = DeconvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        x = nn.ConvTranspose(self.num_ori, (4, 4), strides=(2, 2),
                             dtype=self.dtype)(x)
        return nn.relu(x)


class MinutiaeAEC64(nn.Module):
    """The 64x64-patch variant used by the ROLLED extraction path.

    The reference's extraction_rolled.py:15 imports
    ``minutiae_AEC_modified``, whose model is a shallower conv-deconv
    (minutiae_AEC_modified.py:234-249): four 4x4 stride-2 encoder convs
    (nf, 2nf, 4nf, 8nf) with a tanh bottleneck, then deconvs (4nf, 2nf, nf)
    and a final identity deconv to 12 channels — note NO output ReLU,
    unlike the 128 variant. Fully convolutional with downsample factor 16.
    """

    nf: int = 64
    num_ori: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        for mult in [1, 2, 4, 8]:
            x = ConvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        x = jnp.tanh(x)  # bottleneck 'feature'
        for mult in [4, 2, 1]:
            x = DeconvBNRelu(nf * mult, dtype=self.dtype)(x, train)
        return nn.ConvTranspose(self.num_ori, (4, 4), strides=(2, 2),
                                dtype=self.dtype)(x)


class MinutiaeUNet(nn.Module):
    """U-Net variant with encoder-decoder skip connections."""

    nf: int = 64
    num_ori: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        enc = []
        for mult in [1, 2, 4, 8, 8, 8]:
            x = ConvBNRelu(nf * mult, dtype=self.dtype)(x, train)
            enc.append(x)
        for i, mult in enumerate([8, 8, 4, 2, 1]):
            x = DeconvBNRelu(nf * mult, dtype=self.dtype)(x, train)
            skip = enc[len(enc) - 2 - i]
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.ConvTranspose(self.num_ori, (4, 4), strides=(2, 2),
                             dtype=self.dtype)(x)
        return nn.relu(x)


def detect_minutiae_tiled(apply_fn, variables, img: np.ndarray,
                          minu_thr: float = 0.2, patch: int = 128) -> np.ndarray:
    """Tiled minutiae inference with Gaussian blending and 10-px tile-border
    zeroing (ImportGraph.run, minutiae_AEC.py:42-74), then the v1 decoder."""
    from ..ops.minutiae import (refine_minutiae, remove_crowded_minutiae)
    from ..ops.minutiae import decode_minutiae
    from .enhancement import gaussian_blend_weights
    img = np.asarray(img, np.float32)
    h, w = img.shape
    stride = patch // 2
    ys = list(range(0, max(h - patch, 0) + 1, stride))
    xs = list(range(0, max(w - patch, 0) + 1, stride))
    tiles = np.stack([img[y:y + patch, x:x + patch]
                      for y in ys for x in xs])[..., None] / 128.0 - 1.0
    out = np.array(apply_fn(variables, jnp.asarray(tiles)))     # [N,P,P,12]
    out[:, :10, :, :] = 0
    out[:, -10:, :, :] = 0
    out[:, :, :10, :] = 0
    out[:, :, -10:, :] = 0
    weight = gaussian_blend_weights(patch, patch)[:, :, None]
    canvas = np.zeros((h, w, out.shape[-1]), np.float64)
    i = 0
    for y in ys:
        for x in xs:
            canvas[y:y + patch, x:x + patch] += out[i] * weight
            i += 1
    return decode_minutiae(canvas, thr=minu_thr)


def detect_minutiae_whole_image_batch(apply_fn, variables, imgs,
                                      thrs, multiple: int = 64,
                                      refine_dist_thr: float = 20.0):
    """Batched whole-image detection through ONE model: stacks same-shape
    images into a single FCN forward + one vmapped decode dispatch (the
    latent pipeline detects on image pairs per model —
    extraction_latent.py:119-125, :128-148)."""
    from ..ops.minutiae import decode_minutiae_batch
    x = jnp.stack([jnp.asarray(im, jnp.float32) for im in imgs])
    x = x[:, :, :, None] / 128.0 - 1.0
    x, h, w = pad_to_multiple(x, multiple)
    cyl = apply_fn(variables, x)
    return decode_minutiae_batch(cyl[:, :h, :w, :], thrs,
                                 refine_dist_thr=refine_dist_thr)


def detect_minutiae_whole_image(apply_fn, variables, img: np.ndarray,
                                minu_thr: float = 0.2, multiple: int = 64,
                                refine_dist_thr: float = 20.0) -> np.ndarray:
    """Whole-image minutiae detection: x/128-1 normalize, FCN forward, crop,
    decode + refine + crowding filter (minutiae_AEC.py:76-88). The 64-patch
    rolled variant refines at dist 10 instead of 20
    (minutiae_AEC_modified.py:89) and downsamples by 16, not 64."""
    from ..ops.minutiae import decode_minutiae
    x = jnp.asarray(img, jnp.float32) / 128.0 - 1.0
    x = x[None, :, :, None]
    x, h, w = pad_to_multiple(x, multiple)
    cyl = apply_fn(variables, x)
    # stay on device: decode_cylinder consumes the [H, W, 12] heatmap there
    # and only the decoded [<=1000, 4] candidate list crosses to host
    return decode_minutiae(cyl[0, :h, :w, :], thr=minu_thr,
                           refine_dist_thr=refine_dist_thr)
