"""FFT-domain preprocessing: cartoon-texture decomposition and STFT
block enhancement, as jitted JAX.

Reference semantics:
- ``FastCartoonTexture`` — Butterworth low-pass in radius^4, gradient-norm
  weighting, texture residual clipped to [0,255] around +/-20
  (/root/reference/extraction/preprocessing.py:129-172);
- ``STFT`` enhancement — 64x64 patches, stride 16, median subtraction, ring
  band-pass for ridge spacing 3..18 px, energy normalization,
  Gaussian-window overlap-add, output renormalized ~N(127,14)
  (preprocessing.py:175-226).

TPU formulation: the per-patch Python loop becomes one batched ``fft2`` over
all patches, and overlap-add becomes a scatter-add — every op static-shape
so XLA compiles once per image geometry.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 16
PATCH = 64


def _nextpow2(x: int) -> int:
    return int(math.ceil(math.log2(x)))


def lowpass_filter(img: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad to L's shape, filter in the (fftshifted) frequency domain
    (preprocessing.py:62-76). The 2-D DFT runs as HIGHEST-precision MXU
    matmuls (XLA's TPU FFT emulation is ~10x slower at these sizes; the
    filter is real and applied unshifted, matching fftshift semantics)."""
    h, w = img.shape
    h2, w2 = L.shape
    padded = jnp.pad(img, ((0, h2 - h), (0, w2 - w)))
    Lu = jnp.fft.ifftshift(L)
    Ch, Sh = _dft_mats(h2)
    Cw, Sw = _dft_mats(w2)
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    # Y = F_h X F_w (X real, F = C - iS symmetric)
    CX = mm(Ch, padded)
    SX = mm(Sh, padded)
    Yr = mm(CX, Cw) - mm(SX, Sw)
    Yi = -(mm(CX, Sw) + mm(SX, Cw))
    Yr = Lu * Yr
    Yi = Lu * Yi
    # rec = (1/(h2 w2)) Re[conj(F_h) Y conj(F_w)]
    A = mm(Ch, Yr) - mm(Sh, Yi)
    B = mm(Ch, Yi) + mm(Sh, Yr)
    rec = (mm(A, Cw) - mm(B, Sw)) / (h2 * w2)
    return rec[:h, :w]


def gradient_norm(img: jnp.ndarray) -> jnp.ndarray:
    gy, gx = jnp.gradient(img)
    return jnp.sqrt(gx * gx + gy * gy) + 1e-6


@functools.partial(jax.jit, static_argnames=("sigma",))
def fast_cartoon_texture(img: jnp.ndarray, sigma: float = 2.5) -> jnp.ndarray:
    """Texture component of the cartoon+texture decomposition."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    n = max(2 ** _nextpow2(h), 2 ** _nextpow2(w))
    half = n // 2
    x, y = np.meshgrid(np.arange(-half, half), np.arange(-half, half))
    r = (np.sqrt(x * x + y * y) + 1e-4) / n
    L = jnp.asarray(1.0 / (1.0 + (2 * np.pi * r * sigma) ** 4), jnp.float32)

    img_low = lowpass_filter(img, L)
    g1 = lowpass_filter(gradient_norm(img), L)
    g2 = lowpass_filter(gradient_norm(img_low), L)

    diff = g1 - g2
    ar1 = jnp.abs(g1)
    diff = jnp.where(ar1 > 1, diff / jnp.where(ar1 > 1, ar1, 1.0), 0.0)

    cmin, cmax = 0.3, 0.7
    weight = (diff - cmin) / (cmax - cmin)
    weight = jnp.where(diff < cmin, 0.0, weight)
    weight = jnp.where(diff > cmax, 1.0, weight)

    u = weight * img_low + (1.0 - weight) * img
    temp = img - u
    lim = 20.0
    return jnp.clip((temp + lim) * 255.0 / (2 * lim), 0.0, 255.0)


def extract_blocks(img: jnp.ndarray, patch: int = PATCH, stride: int = BLOCK,
                   inclusive: bool = True):
    """[H, W] -> patches [bh*bw, patch, patch] at the given stride.

    ``inclusive=False`` reproduces preprocessing.STFT's block count
    (h - patch) // stride, which drops the last fitting block;
    ``inclusive=True`` the (h - patch) // stride + 1 of get_maps."""
    h, w = img.shape
    bh = (h - patch) // stride + (1 if inclusive else 0)
    bw = (w - patch) // stride + (1 if inclusive else 0)
    if patch % stride == 0 and h % stride == 0 and w % stride == 0:
        # gather-free form: each patch is a (k x k) grid of stride-sized
        # tiles; tile (a, b) of patch (i, j) is image tile (i+a, j+b), so
        # the whole extraction is k^2 static slices of the tile grid
        # (TPU gathers measured ~50x slower than these slice/reshapes)
        k = patch // stride
        s = stride
        tiles = jnp.asarray(img).reshape(h // s, s, w // s, s) \
            .transpose(0, 2, 1, 3)                   # [Hb, Wb, s, s]
        rows = [jnp.stack([tiles[a:a + bh, b:b + bw] for b in range(k)],
                          axis=2)                    # [bh, bw, k, s, s]
                for a in range(k)]
        patches = jnp.stack(rows, axis=2)            # [bh, bw, k, k, s, s]
        patches = patches.transpose(0, 1, 2, 4, 3, 5) \
            .reshape(bh * bw, patch, patch)
        return patches, bh, bw
    i0 = (np.arange(bh) * stride)[:, None, None, None]
    j0 = (np.arange(bw) * stride)[None, :, None, None]
    di = np.arange(patch)[None, None, :, None]
    dj = np.arange(patch)[None, None, None, :]
    patches = img[i0 + di, j0 + dj]
    return patches.reshape(bh * bw, patch, patch), bh, bw


def overlap_add(patches: jnp.ndarray, h: int, w: int, bh: int, bw: int,
                stride: int = BLOCK) -> jnp.ndarray:
    """Overlap-add [bh*bw, P, P] patches back onto an [h, w] canvas.

    When P is a multiple of the stride (the 64/16 STFT geometry), the
    scatter is reformulated as (P/stride)^2 STATIC shifted adds: each patch
    is split into stride-sized sub-tiles; sub-tile (a, b) of every patch
    lands on a regular non-overlapping grid offset by (a, b) strides, which
    is a reshape + one static-slice add. TPU scatter-adds measured 0.21 s
    for this shape; the shift-add form is pure VPU adds."""
    p = patches.shape[-1]
    if p % stride == 0:
        k = p // stride
        s = stride
        x = patches.reshape(bh, bw, k, s, k, s)
        canvas = jnp.zeros((h, w), patches.dtype)
        for a in range(k):
            for b in range(k):
                tile = x[:, :, a, :, b, :].transpose(0, 2, 1, 3) \
                    .reshape(bh * s, bw * s)
                canvas = canvas.at[a * s:a * s + bh * s,
                                   b * s:b * s + bw * s].add(tile)
        return canvas
    i0 = (np.arange(bh) * stride)[:, None, None, None]
    j0 = (np.arange(bw) * stride)[None, :, None, None]
    di = np.arange(p)[None, None, :, None]
    dj = np.arange(p)[None, None, None, :]
    yy = jnp.asarray((i0 + di) * w + (j0 + dj)).reshape(bh * bw, p, p)
    canvas = jnp.zeros((h * w,), patches.dtype)
    canvas = canvas.at[yy.reshape(-1)].add(patches.reshape(-1))
    return canvas.reshape(h, w)


def _bandpass(patch_size: int) -> np.ndarray:
    half = patch_size // 2
    x, y = np.meshgrid(np.arange(-half, half), np.arange(-half, half))
    r = np.sqrt(x * x + y * y) + 1e-4
    f_low = patch_size / 18.0   # RMAX
    f_high = patch_size / 3.0   # RMIN
    return (1.0 / (1 + (r / f_high) ** 4)) * (1.0 / (1 + (f_low / r) ** 4))


@functools.lru_cache(maxsize=2)
def _dft_mats(n: int):
    """Real/imag parts of the n-point DFT matrix (f32)."""
    k = np.arange(n)
    ang = 2 * np.pi * np.outer(k, k) / n
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


@functools.partial(jax.jit, static_argnames=())
def _stft_core(img: jnp.ndarray, band: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Batched 64x64 block STFT filtering, with the 2-D DFT expressed as
    f32 MATMULS (F X F^T with F = C - iS) instead of jnp.fft: XLA's TPU
    FFT emulation ran ~0.3 s per whole-image call; 14 [N,64,64]@[64,64]
    HIGHEST-precision matmuls are MXU work measured ~10x faster. The band
    mask is applied unshifted (band is fftshifted by the caller, so it is
    un-shifted here once) — numerics match jnp.fft to ~1e-4."""
    h, w = img.shape
    patches, bh, bw = extract_blocks(img, inclusive=False)
    med = jnp.median(patches.reshape(bh * bw, -1), axis=1)
    patches = patches - med[:, None, None]

    n = patches.shape[-1]
    C, S = _dft_mats(n)
    band_u = jnp.fft.ifftshift(band)               # static shift of a const
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    # forward: Y = F X F with symmetric F = C - iS (X real):
    # Yr = CXC - SXS, Yi = -(CXS + SXC)
    CX = mm(C, patches)
    SX = mm(S, patches)
    Yr = mm(CX, C) - mm(SX, S)
    Yi = -(mm(CX, S) + mm(SX, C))
    # band + energy normalization (band is real, applied elementwise)
    Yr = band_u[None] * Yr
    Yi = band_u[None] * Yi
    norm = jnp.sqrt(jnp.sum(Yr * Yr + Yi * Yi, axis=(1, 2)))
    scale = 1.0 / (norm[:, None, None] + 1e-4)
    Yr = Yr * scale
    Yi = Yi * scale
    # inverse, real part: (1/n^2) Re[conj(F) Y conj(F)], conj(F) = C + iS
    A = mm(C, Yr) - mm(S, Yi)                      # Re[conj(F) Y]
    B = mm(C, Yi) + mm(S, Yr)                      # Im[conj(F) Y]
    rec = (mm(A, C) - mm(B, S)) / (n * n)
    return overlap_add(rec * weight[None], h, w, bh, bw)


@jax.jit
def stft_enhance_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    """STFT block enhancement of a batch [N, H, W]: the latent pipeline
    needs three STFT variants of the same-shaped image (extraction_latent
    :101-102); one vmapped dispatch replaces three (each ~0.2 s of mostly
    dispatch/FFT-launch overhead through the remote-TPU tunnel)."""
    return jax.vmap(stft_enhance)(imgs)


def stft_enhance(img: jnp.ndarray) -> jnp.ndarray:
    """STFT block enhancement of a [H, W] image (H, W multiples of 16)."""
    img = jnp.asarray(img, jnp.float32)
    h0, w0 = img.shape
    ovp = (PATCH - BLOCK) // 2
    padded = jnp.pad(img, ((ovp, ovp), (ovp, ovp)))

    half = PATCH // 2
    x, y = np.meshgrid(np.arange(-half, half), np.arange(-half, half))
    sigma = PATCH / 3.0
    weight = jnp.asarray(np.exp(-(x * x + y * y) / (sigma * sigma)), jnp.float32)
    band = jnp.asarray(_bandpass(PATCH), jnp.float32)

    rec = _stft_core(padded, band, weight)
    rec = rec[ovp:ovp + h0, ovp:ovp + w0]
    out = (rec - jnp.median(rec)) / (jnp.std(rec) + 1e-6) * 14.0 + 127.0
    return jnp.clip(out, 0.0, 255.0)
