"""Descriptor dimensionality-reduction MLP (192 -> 96).

Capability parity with the reference's PyTorch CompNet
(/root/reference/extraction/models/net_compress.py:7-54): Linear+BN+
LeakyReLU input layer, one residual BasicBlock, Linear+BN output. The DR
stage re-normalizes each output row to ||.|| = 1.73
(descriptor_DR.py:150-153) — handled by ``compress_descriptors`` below.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DES_NORM = 1.73


class BasicBlock(nn.Module):
    dims: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Dense(self.dims, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Dense(self.dims, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        return nn.leaky_relu(y + x, 0.2)


class CompNet(nn.Module):
    in_dims: int = 192
    out_dims: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_dims, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, 0.2)
        x = BasicBlock(self.out_dims, dtype=self.dtype)(x, train)
        x = nn.Dense(self.out_dims, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return x


def compress_descriptors(apply_fn, variables, des: np.ndarray,
                         batch_size: int = 128) -> np.ndarray:
    """DR a [N, 192] descriptor matrix -> [N, 96], renormalized to 1.73
    (descriptor_DR.extract_features + the renorm at :150-153)."""
    n = len(des)
    if n == 0:
        return np.zeros((0, 96), np.float32)
    pad = (-n) % batch_size
    x = np.concatenate([des, np.zeros((pad, des.shape[1]), des.dtype)]) if pad else des
    outs = []
    for i in range(0, len(x), batch_size):
        outs.append(np.asarray(apply_fn(variables, jnp.asarray(x[i:i + batch_size]))))
    out = np.concatenate(outs)[:n]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / norms * DES_NORM).astype(np.float32)
