"""Minutiae patch descriptor network (Flax).

The reference uses per-patch-type TF1 embedding models (inputs 96x96,
``embedding:0`` of size 64, L2-normalized downstream —
/root/reference/extraction/descriptor.py:11-34, with an
inception-resnet-v1-style backbone in extraction/models/). The TPU rebuild
uses a compact pre-activation ResNet producing the same 64-d embedding —
same contract (three patch types x 64-d, concatenated to 192-d, then DR to
96-d), architecture chosen for MXU-friendly channel sizes.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        y = nn.relu(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype)(y)
        return y + residual


class DescriptorNet(nn.Module):
    """96x96 patch -> 64-d embedding."""

    embedding_size: int = 64
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.widths[0], (3, 3), dtype=self.dtype)(x)
        for w in self.widths:
            x = ResBlock(w, stride=2, dtype=self.dtype)(x, train)
            x = ResBlock(w, dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        x = nn.Dense(self.embedding_size, dtype=self.dtype)(x)
        return x
