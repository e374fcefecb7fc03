"""Training model zoo (Flax).

Capability parity with the reference's PyTorch model zoo used by the
descriptor / DR training harness (/root/reference/extraction/models/):
resnet.py, preactresnet.py, sphereface.py, inception_resnet_v1.py,
hourglass.py, bcnn.py, dropout.py. These are TPU-first reimplementations
(NHWC, bf16-friendly, BN in f32), not ports — same families and roles:
embedding backbones for the patch descriptor nets and heatmap regressors.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# ResNet / PreActResNet
# ---------------------------------------------------------------------------

class ResNetBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Classic post-activation ResNet (models/resnet.py equivalent)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    num_outputs: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                stride = 2 if j == 0 and i > 0 else 1
                x = ResNetBlock(self.width * 2 ** i, stride,
                                dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_outputs, dtype=self.dtype)(x)


class PreActBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        y = nn.relu(y)
        residual = x
        if x.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        return y + residual


class PreActResNet(nn.Module):
    """Pre-activation ResNet (models/preactresnet.py equivalent)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    num_outputs: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (3, 3), use_bias=False, dtype=self.dtype)(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                stride = 2 if j == 0 and i > 0 else 1
                x = PreActBlock(self.width * 2 ** i, stride,
                                dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_outputs, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# SphereFace-style embedding net
# ---------------------------------------------------------------------------

class SphereFaceNet(nn.Module):
    """Conv feature extractor with PReLU-style activations and an embedding
    head, paired with the angular-margin softmax in training.losses
    (models/sphereface.py equivalent)."""

    widths: Sequence[int] = (64, 128, 256, 512)
    embedding_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for w in self.widths:
            x = nn.Conv(w, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.25)
            x = nn.Conv(w, (3, 3), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.25)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.embedding_size, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Inception-ResNet v1 (facenet backbone of the descriptor models)
# ---------------------------------------------------------------------------

class ConvBlock(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


class Block35(nn.Module):
    scale: float = 0.17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBlock(32, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(32, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(32, (3, 3), dtype=self.dtype)(b1, train)
        b2 = ConvBlock(32, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBlock(32, (3, 3), dtype=self.dtype)(b2, train)
        b2 = ConvBlock(32, (3, 3), dtype=self.dtype)(b2, train)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(mixed)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    scale: float = 0.10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBlock(128, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(128, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(128, (1, 7), dtype=self.dtype)(b1, train)
        b1 = ConvBlock(128, (7, 1), dtype=self.dtype)(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(mixed)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    scale: float = 0.20
    activate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBlock(192, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(192, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBlock(192, (1, 3), dtype=self.dtype)(b1, train)
        b1 = ConvBlock(192, (3, 1), dtype=self.dtype)(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(mixed)
        out = x + self.scale * up
        return nn.relu(out) if self.activate else out


class InceptionResnetV1(nn.Module):
    """Facenet-style backbone (models/inception_resnet_v1.py equivalent):
    stem -> 5x Block35 -> reduction-A -> 10x Block17 -> reduction-B ->
    5x Block8 -> pooled embedding."""

    embedding_size: int = 128
    n35: int = 5
    n17: int = 10
    n8: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = ConvBlock(32, (3, 3), 2, dt)(x, train)
        x = ConvBlock(32, (3, 3), 1, dt)(x, train)
        x = ConvBlock(64, (3, 3), 1, dt)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBlock(80, (1, 1), 1, dt)(x, train)
        x = ConvBlock(192, (3, 3), 1, dt)(x, train)
        x = ConvBlock(256, (3, 3), 2, dt)(x, train)
        for _ in range(self.n35):
            x = Block35(dtype=dt)(x, train)
        # reduction A
        r0 = ConvBlock(384, (3, 3), 2, dt)(x, train)
        r1 = ConvBlock(192, (1, 1), 1, dt)(x, train)
        r1 = ConvBlock(192, (3, 3), 1, dt)(r1, train)
        r1 = ConvBlock(256, (3, 3), 2, dt)(r1, train)
        r2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([r0, r1, r2], axis=-1)
        for _ in range(self.n17):
            x = Block17(dtype=dt)(x, train)
        # reduction B
        r0 = ConvBlock(256, (1, 1), 1, dt)(x, train)
        r0 = ConvBlock(384, (3, 3), 2, dt)(r0, train)
        r1 = ConvBlock(256, (1, 1), 1, dt)(x, train)
        r1 = ConvBlock(256, (3, 3), 2, dt)(r1, train)
        r2 = ConvBlock(256, (1, 1), 1, dt)(x, train)
        r2 = ConvBlock(256, (3, 3), 1, dt)(r2, train)
        r2 = ConvBlock(256, (3, 3), 2, dt)(r2, train)
        r3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([r0, r1, r2, r3], axis=-1)
        for _ in range(self.n8):
            x = Block8(dtype=dt)(x, train)
        x = Block8(activate=False, dtype=dt)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(self.embedding_size, use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return x


# ---------------------------------------------------------------------------
# Stacked hourglass (heatmap regressor)
# ---------------------------------------------------------------------------

class Hourglass(nn.Module):
    """One recursive hourglass module (models/hourglass.py equivalent)."""

    depth: int = 3
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def hg(x, depth):
            up = ResNetBlock(self.features, dtype=self.dtype)(x, train)
            low = nn.max_pool(x, (2, 2), strides=(2, 2))
            low = ResNetBlock(self.features, dtype=self.dtype)(low, train)
            if depth > 1:
                low = hg(low, depth - 1)
            low = ResNetBlock(self.features, dtype=self.dtype)(low, train)
            low = jax.image.resize(low, up.shape, method="nearest")
            return up + low
        return hg(x, self.depth)


class StackedHourglass(nn.Module):
    n_stacks: int = 2
    features: int = 64
    num_outputs: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features, (7, 7), 1, self.dtype)(x, train)
        outs = []
        for _ in range(self.n_stacks):
            y = Hourglass(features=self.features, dtype=self.dtype)(x, train)
            y = ConvBlock(self.features, (1, 1), 1, self.dtype)(y, train)
            out = nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype)(y)
            outs.append(out)
            x = x + ConvBlock(self.features, (1, 1), 1, self.dtype)(y, train)
        return outs[-1] if len(outs) == 1 else jnp.stack(outs)


# ---------------------------------------------------------------------------
# Bilinear CNN + dropout MLP head
# ---------------------------------------------------------------------------

class BCNN(nn.Module):
    """Bilinear pooling head over conv features (models/bcnn.py
    equivalent): outer-product pooling + signed-sqrt + L2 normalize."""

    widths: Sequence[int] = (32, 64, 128)
    num_outputs: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for w in self.widths:
            x = ConvBlock(w, (3, 3), 2, self.dtype)(x, train)
        b, h, w_, c = x.shape
        flat = x.reshape(b, h * w_, c)
        bil = jnp.einsum("bpc,bpd->bcd", flat, flat) / (h * w_)
        bil = bil.reshape(b, c * c)
        bil = jnp.sign(bil) * jnp.sqrt(jnp.abs(bil) + 1e-10)
        bil = bil / (jnp.linalg.norm(bil, axis=1, keepdims=True) + 1e-10)
        return nn.Dense(self.num_outputs, dtype=self.dtype)(bil)


class DropoutMLP(nn.Module):
    """Small fully-connected head with dropout (models/dropout.py
    equivalent)."""

    hidden: Sequence[int] = (512, 256)
    num_outputs: int = 128
    rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.rate, deterministic=not train)(x)
        return nn.Dense(self.num_outputs, dtype=self.dtype)(x)


class PlainNet(nn.Module):
    """LeNet-style baseline classifier (models/net.py equivalent):
    conv5x5(6) -> pool -> conv5x5(16) -> pool -> fc 120/84/num_classes."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(6, (5, 5), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(16, (5, 5), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(120, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(84, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
