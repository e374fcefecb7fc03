"""Minutiae-cylinder ground-truth generation (training targets).

Reference semantics (/root/reference/extraction/prepare_data.py:91-241):
every minutia splats a spatial Gaussian (sigma^2 = 25) into 12 orientation
channels with angular falloff exp(-6 * dtheta / pi); channels are laid out
at 2*pi*j/12.

TPU formulation: one vectorized broadcast over [num_minu, H, W, num_ori]
collapsed with a sum — jit-compiled, used inside the training data pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("h", "w", "num_ori"))
def minutiae_cylinder(minutiae: jnp.ndarray, valid: jnp.ndarray, h: int,
                      w: int, num_ori: int = 12) -> jnp.ndarray:
    """[N, 3+] minutiae (+valid mask) -> [h, w, num_ori] target cylinder."""
    sigma2 = 25.0
    xs = minutiae[:, 0]
    ys = minutiae[:, 1]
    ori = minutiae[:, 2]
    ori = jnp.where(ori < 0, ori + 2 * jnp.pi, ori)
    ori = jnp.where(ori > 2 * jnp.pi, ori - 2 * jnp.pi, ori)

    Y, X = jnp.mgrid[0:h, 0:w]
    d2 = ((X[None] - xs[:, None, None]) ** 2
          + (Y[None] - ys[:, None, None]) ** 2)
    spatial = jnp.exp(-d2 / sigma2)                    # [N, h, w]
    in_img = valid & (xs >= 0) & (ys >= 0)
    spatial = jnp.where(in_img[:, None, None], spatial, 0.0)

    ch = jnp.arange(num_ori) * 2 * jnp.pi / num_ori    # [C]
    od = jnp.abs(ori[:, None] - ch[None, :])
    od = jnp.where(od > 2 * jnp.pi, od - 2 * jnp.pi, od)
    od = jnp.minimum(od, 2 * jnp.pi - od)
    ang = jnp.exp(-od / jnp.pi * 6.0)                  # [N, C]

    return jnp.einsum("nhw,nc->hwc", spatial, ang)


def make_cylinder_target(minutiae: np.ndarray, h: int, w: int,
                         num_ori: int = 12, max_minutiae: int = 256) -> np.ndarray:
    """NumPy wrapper with padding to a static minutiae count."""
    m = np.zeros((max_minutiae, 3), np.float32)
    n = min(len(minutiae), max_minutiae)
    if n:
        m[:n] = np.asarray(minutiae)[:n, :3]
    valid = np.arange(max_minutiae) < n
    return np.asarray(minutiae_cylinder(jnp.asarray(m), jnp.asarray(valid), h, w,
                                        num_ori=num_ori))
