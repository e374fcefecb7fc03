"""Binary morphology + Euclidean distance transform (host-side NumPy).

Masks are tiny (block-resolution, <= ~64x64) and computed once per image, so
these stay on the host; semantics follow skimage.binary_opening/closing and
scipy.ndimage.distance_transform_edt as used by the reference
(extraction_latent.py:108-115, :193, get_maps.py:448-453).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def binary_dilation(mask: np.ndarray, selem: np.ndarray) -> np.ndarray:
    return ndimage.binary_dilation(mask, structure=selem)


def binary_erosion(mask: np.ndarray, selem: np.ndarray) -> np.ndarray:
    return ndimage.binary_erosion(mask, structure=selem)


def binary_opening(mask: np.ndarray, selem: np.ndarray) -> np.ndarray:
    return ndimage.binary_opening(mask, structure=selem)


def binary_closing(mask: np.ndarray, selem: np.ndarray) -> np.ndarray:
    # skimage pads with the edge value before closing; scipy's
    # border_value=0 matches the reference's usage on block masks.
    return ndimage.binary_closing(mask, structure=selem)


def distance_transform_edt(mask: np.ndarray) -> np.ndarray:
    return ndimage.distance_transform_edt(mask)
