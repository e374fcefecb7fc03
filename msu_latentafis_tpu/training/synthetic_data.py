"""Synthetic fingerprint generation for stand-in model training.

The reference's pretrained weights are external downloads that do not ship
with the repo, so the rebuild trains stand-in models on synthetic ridge
imagery: smooth random orientation fields rendered through the ridge-wave
dictionary prior (the same generator used for quality maps —
/root/reference/extraction/get_maps.py:255-299 doubles as a fingerprint
prior), with synthetic minutiae inserted as local ridge terminations and
their ground-truth 12-channel cylinders from ops.cylinder.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops.cylinder import make_cylinder_target


def random_orientation_field(rng: np.random.Generator, blkH: int, blkW: int,
                             smooth: int = 5) -> np.ndarray:
    """Smooth random orientation field in radians via doubled-angle
    Gaussian-smoothed noise."""
    c = rng.standard_normal((blkH, blkW))
    s = rng.standard_normal((blkH, blkW))
    from scipy.ndimage import gaussian_filter
    c = gaussian_filter(c, smooth)
    s = gaussian_filter(s, smooth)
    return np.arctan2(s, c) * 0.5


def render_ridge_image(rng: np.random.Generator, h: int = 512, w: int = 512,
                       spacing: float = 9.0, block: int = 16,
                       noise_sigma: float = 12.0) -> Tuple[np.ndarray, np.ndarray]:
    """Render a ridge-wave image from a random orientation field.

    Returns (image [h, w] float in [0, 255], ori_field [h//block, w//block]).
    ``noise_sigma=0`` renders the noise-free waveform — required for
    enhancement-AEC TARGETS: a noisy target teaches the AEC to reproduce
    noise, which directly caps the dictionary-quality of its outputs (the
    block mask thresholds quality at 0.45, extraction_latent.py:108).
    """
    blkH, blkW = -(-h // block), -(-w // block)   # ceil: cover any h, w
    from scipy.ndimage import gaussian_filter, zoom

    # COHERENT phase field: least-squares-integrate grad(phi) ~ (2pi/sp) *
    # n with an FFT Poisson solve. The previous projection approximation
    # (remainder of x*cos+y*sin with spatially-varying theta) phase-tears
    # wherever theta drifts, which decoheres every 32x32 dictionary patch:
    # rendered images scored quality ~0.38 vs the ~0.73 a
    # constant-orientation wave achieves, starving the 0.45 block mask.
    # The normal field n must be a smooth VECTOR field (a doubled-angle
    # orientation has mod-pi branch cuts whose sign flips cancel the
    # Poisson divergence and collapse the ridge frequency); its isolated
    # zeros act like natural cores/deltas. The waveform is the
    # ridge/valley asymmetric wave the quality dictionary is built from
    # (get_maps.py:271-283) — a pure cosine only correlates ~0.5 with
    # those atoms.
    smooth = 5
    vx = gaussian_filter(rng.standard_normal((blkH, blkW)), smooth)
    vy = gaussian_filter(rng.standard_normal((blkH, blkW)), smooth)
    vx = zoom(vx, block, order=1)[:h, :w]
    vy = zoom(vy, block, order=1)[:h, :w]
    vn = np.sqrt(vx * vx + vy * vy) + 1e-9
    vx, vy = vx / vn, vy / vn
    theta = np.arctan2(vy, vx) - np.pi / 2       # ridge direction (normal
    # is the vector direction)
    sp = float(np.round(spacing))
    gx = (2 * np.pi / sp) * vx
    gy = (2 * np.pi / sp) * vy
    # split off the mean gradient: the periodic FFT solve zeroes the k=0
    # mode, so a (near-)uniform field would otherwise render NO ridges —
    # phi = fft_solve(g - mean(g)) + mean(g) . (x, y)
    gx0, gy0 = float(gx.mean()), float(gy.mean())
    ky = np.fft.fftfreq(h)[:, None] * 2 * np.pi
    kx = np.fft.fftfreq(w)[None, :] * 2 * np.pi
    k2 = kx * kx + ky * ky
    k2[0, 0] = 1.0
    div_hat = (1j * kx * np.fft.fft2(gx - gx0)
               + 1j * ky * np.fft.fft2(gy - gy0))
    phi = np.real(np.fft.ifft2(-div_hat / k2))
    yy0, xx0 = np.mgrid[0:h, 0:w].astype(np.float64)
    phi = phi + gx0 * xx0 + gy0 * yy0
    dist = phi * sp / (2 * np.pi)

    valley = max(2.0, np.floor(sp / 2) - 1)
    ridge = sp - valley
    x_off = np.remainder(dist, sp)
    y1 = np.where(x_off <= ridge, x_off, 0.0)
    y2 = np.where(x_off > ridge, x_off - ridge, 0.0)
    img = -np.sin(2 * np.pi * (y1 / ridge / 2.0)) \
        + np.sin(2 * np.pi * (y2 / valley / 2.0))
    img = (img * 0.5 + 0.5) * 255.0
    if noise_sigma > 0:
        img = img + rng.standard_normal((h, w)) * noise_sigma
    return np.clip(img, 0, 255), theta


def cylinder_target_np(minutiae: np.ndarray, h: int, w: int,
                       num_ori: int = 12) -> np.ndarray:
    """Pure-NumPy minutiae-cylinder target (same math as ops.cylinder, which
    is the jitted in-pipeline version) — used by host-side data generation
    so training data never bounces off the accelerator."""
    sigma2 = 25.0
    out = np.zeros((h, w, num_ori), np.float32)
    if len(minutiae) == 0:
        return out
    Y, X = np.mgrid[0:h, 0:w].astype(np.float32)
    ch = np.arange(num_ori) * 2 * np.pi / num_ori
    for x, y, ori in np.asarray(minutiae)[:, :3]:
        if x < 0 or y < 0:
            continue
        ori = ori % (2 * np.pi)
        spatial = np.exp(-((X - x) ** 2 + (Y - y) ** 2) / sigma2)
        od = np.abs(ori - ch)
        od = np.minimum(od, 2 * np.pi - od)
        out += spatial[:, :, None] * np.exp(-od / np.pi * 6.0)[None, None, :]
    return out


def synthetic_minutiae_sample(rng: np.random.Generator, size: int = 128,
                              n_minutiae: int = 8, num_ori: int = 12,
                              preprocess: str = "none"):
    """(image [size,size,1] raw units, cylinder target [size,size,12]).

    ``preprocess`` applies the same normalization the inference pipeline
    feeds the detector ('stft' for the latent STFT path, 'cartoon' for the
    rolled texture path) so the stand-in trains in its deployment domain.
    """
    img, theta = render_ridge_image(rng, size, size,
                                    spacing=float(rng.uniform(8, 10.5)))
    clutter = rng.random() < 0.5
    minutiae = np.zeros((n_minutiae, 4), np.float64)
    minutiae[:, 0] = rng.uniform(12, size - 12, n_minutiae)
    minutiae[:, 1] = rng.uniform(12, size - 12, n_minutiae)
    # orientation from the local ridge flow (+pi flip at random)
    for i in range(n_minutiae):
        t = theta[int(minutiae[i, 1]), int(minutiae[i, 0])]
        minutiae[i, 2] = (-t + (np.pi if rng.random() < 0.5 else 0.0)) % (2 * np.pi)
    # carve ridge endings: damp the ridge wave locally past each minutia
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    for x, y, o, _ in minutiae:
        d2 = (xx - x) ** 2 + (yy - y) ** 2
        along = (xx - x) * np.cos(-o) + (yy - y) * np.sin(-o)
        wedge = (along > 0) & (d2 < 15 ** 2)
        img[wedge] = 0.5 * img[wedge] + 0.5 * 200.0
    if clutter:
        # half the pool carries latent-lift interference so detection at
        # deployment (STFT of a cluttered latent) is in-distribution
        img = add_latent_clutter(rng, img,
                                 strength=float(rng.uniform(0.3, 0.9)))
    if preprocess == "stft":
        from ..ops.fft import stft_enhance
        img = np.asarray(stft_enhance(img), np.float64)
    elif preprocess == "cartoon":
        from ..ops.fft import fast_cartoon_texture
        img = np.asarray(fast_cartoon_texture(img), np.float64)
    cyl = cylinder_target_np(minutiae, size, size, num_ori=num_ori)
    return img[:, :, None].astype(np.float32), cyl, minutiae


def add_latent_clutter(rng: np.random.Generator, img: np.ndarray,
                       strength: float = 1.0) -> np.ndarray:
    """Overlay latent-lift clutter on a clean ridge image: low-frequency
    background shading, smooth contrast falloff, dark/bright strokes
    (ruler/text/furrow artifacts), blobs, and sensor noise — the structured
    interference real SD27-style latents carry. The enhancement AEC and the
    descriptor/minutiae nets train against this domain so the deployment
    inputs (stft/cartoon of real latents) are in-distribution."""
    from scipy.ndimage import gaussian_filter
    h, w = img.shape
    out = img.astype(np.float64).copy()
    bg = gaussian_filter(rng.standard_normal((h, w)), max(h, w) / 8.0)
    bg /= np.abs(bg).max() + 1e-9
    out += bg * rng.uniform(20, 80) * strength
    amp = gaussian_filter(rng.random((h, w)), max(h, w) / 6.0)
    amp = (amp - amp.min()) / (amp.max() - amp.min() + 1e-9)
    lo = rng.uniform(0.25, 0.6)
    out = 128.0 + (out - 128.0) * (lo + (1.0 - lo) * amp)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    for _ in range(int(rng.integers(0, 6))):
        theta = rng.uniform(0, np.pi)
        c, s = np.cos(theta), np.sin(theta)
        offset = rng.uniform(-0.5, 0.5) * (h + w)
        d = np.abs((xx - w / 2) * c + (yy - h / 2) * s - offset)
        mask = d < rng.uniform(1.0, 4.0)
        shade = rng.uniform(0, 255)
        alpha = rng.uniform(0.4, 0.9) * strength
        out[mask] = (1 - alpha) * out[mask] + alpha * shade
    for _ in range(int(rng.integers(0, 4))):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r2 = rng.uniform(5.0, h / 3.0) ** 2
        m = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / r2) \
            * 0.6 * strength
        out = out * (1 - m) + rng.uniform(0, 255) * m
    out += rng.standard_normal((h, w)) * rng.uniform(3, 15)
    return np.clip(out, 0, 255)


def synthetic_latent_sample(rng: np.random.Generator, size: int = 128):
    """(cluttered latent-style raw image [size, size], clean ridge target
    [size, size, 1] in [-1, 1]) — the enhancement AEC's training pair
    source; the caller applies the pipeline's actual preprocessing
    (cartoon + STFT) to the cluttered side. The target is the NOISE-FREE
    waveform (the clutter/noise all lives on the input side)."""
    seed = rng.integers(0, 2**31)
    clean_img, _ = render_ridge_image(np.random.default_rng(seed), size,
                                      size,
                                      spacing=float(rng.uniform(8, 10.5)),
                                      noise_sigma=0.0)
    clean = (clean_img / 128.0 - 1.0)[:, :, None].astype(np.float32)
    noisy = np.clip(clean_img
                    + rng.standard_normal((size, size)) * 12.0, 0, 255)
    dirty = add_latent_clutter(rng, noisy)
    return dirty, clean


def synthetic_enhancement_sample(rng: np.random.Generator, size: int = 128):
    """(noisy ridge image [size,size,1] raw, noise-free target in [-1,1])
    — the degradation augment further corrupts the input side at train
    time; the target stays the pure waveform."""
    img, _ = render_ridge_image(rng, size, size,
                                spacing=float(rng.uniform(8, 10.5)),
                                noise_sigma=0.0)
    noisy = np.clip(img + rng.standard_normal(img.shape) * 12.0, 0, 255)
    x = noisy[:, :, None].astype(np.float32)
    return x, (img[:, :, None].astype(np.float32) / 128.0 - 1.0)


def synthetic_descriptor_batch(rng: np.random.Generator, n_ids: int = 16,
                               samples_per_id: int = 4, size: int = 96):
    """Labeled patch batch for triplet training.

    Each identity is a ridge patch; same-id samples differ by the nuisances
    the matcher must survive: small translations (alignment error of the
    detected minutia), small rotations (orientation estimate error — patches
    are rotation-normalized by minutia ori before the net), brightness /
    contrast / noise jitter, AND the enhancement domain: at match time the
    latent's descriptors come from STFT/Gabor-enhanced images while the
    rolled gallery's come from the raw print
    (extraction_latent.py:175-181 vs extraction_rolled.py:95), so the
    embedding must be stable across those domains for a mated pair to
    produce high-similarity correspondences.
    """
    from ..ops.contrast import local_contrast_enhancement_gaussian
    from ..ops.fft import fast_cartoon_texture, stft_enhance
    from ..ops.gabor import gabor_apply_host, gabor_plan_host
    from scipy.ndimage import rotate

    # Identities are LOCATIONS ON A SHARED FINGER, not independent ridge
    # fields: nearby patches share the orientation field, so the only
    # separating signal is fine local ridge geometry — the invariance the
    # real matcher needs. (Independent-patch identities separate on gross
    # orientation/frequency alone; the triplet loss saturated at ~0.001
    # while real cross-domain mate pairs stayed at impostor similarity.)
    #
    # Renditions mirror the deployment pairings EXACTLY (v8; the r4 pool
    # had no Gabor-enhanced domain at all, yet the matcher's three
    # selected latent minutiae templates {26, 2, 11} all describe
    # Gabor-enhanced images — matcher.cpp:380 maps to descriptor images
    # enh_texture/enh_contrast in extraction_latent.py:175-181 — and the
    # latent texture descriptors come from enh_contrast too; that unseen
    # domain is the diagnosed cause of the recorded 0.0 mate
    # minutiae-template scores, results/sd27/diagnostics.json r4):
    #   rolled side: raw print (minutiae des), contrast img (virtual des)
    #   latent side: stft(lift), cartoon(lift), gabor(contrast(lift)),
    #                gabor(cartoon(lift))
    # The Gabor plan uses the renderer's ground-truth orientation +pi/2
    # (dir_map ~ theta measured on the dictionary estimator) and the true
    # ridge frequency, matching pipeline/latent.py:124. Each id's first
    # two samples are forced to a (rolled-domain, gabor-latent-domain)
    # pair so every identity carries the hard cross-domain positive.
    n_fingers = max(1, n_ids // 4)
    ids_per_finger = -(-n_ids // n_fingers)
    big = 256
    xs, ys = [], []
    label = 0
    for _ in range(n_fingers):
        sp = float(np.round(rng.uniform(8, 10.5)))
        base, theta = render_ridge_image(rng, big, big, spacing=sp,
                                         noise_sigma=0.0)
        # domain renditions of the whole finger (patch-level enhancement
        # would see different boundary windows than deployment)
        noisy = np.clip(base + rng.standard_normal(base.shape) * 10, 0, 255)
        lifted = add_latent_clutter(rng, noisy,
                                    strength=float(rng.uniform(0.4, 1.0)))
        cartoon_l = np.asarray(fast_cartoon_texture(lifted), np.float64)
        contrast_l = np.asarray(local_contrast_enhancement_gaussian(lifted),
                                np.float64)
        bucket, active = gabor_plan_host(theta + np.pi / 2,
                                         np.full((big, big), 1.0 / sp),
                                         (big, big))
        rolled_renditions = [
            noisy,                                             # raw print
            np.asarray(local_contrast_enhancement_gaussian(noisy),
                       np.float64),                            # virtual des
        ]
        latent_renditions = [
            np.asarray(stft_enhance(lifted), np.float64),      # stft_img
            cartoon_l,                                         # texture_img
            gabor_apply_host(contrast_l, bucket, active).astype(np.float64),
            gabor_apply_host(cartoon_l, bucket, active).astype(np.float64),
        ]
        renditions = rolled_renditions + latent_renditions
        centers = rng.uniform(size // 2 + 8, big - size // 2 - 8,
                              (ids_per_finger, 2))
        for cy, cx in centers:
            if label >= n_ids:
                break
            for k in range(samples_per_id):
                if k == 0:
                    j = rolled_renditions[int(rng.integers(0, 2))]
                elif k == 1:
                    j = latent_renditions[int(rng.integers(2, 4))]
                else:
                    j = renditions[int(rng.integers(0, len(renditions)))]
                ang = float(rng.uniform(-10, 10))
                dy = int(cy - size // 2 + rng.integers(-6, 7))
                dx = int(cx - size // 2 + rng.integers(-6, 7))
                patch = j[dy:dy + size, dx:dx + size].copy()
                if abs(ang) > 0.5:
                    patch = rotate(patch, ang, reshape=False,
                                   mode="nearest", order=1)
                patch = patch * float(rng.uniform(0.7, 1.3)) \
                    + float(rng.uniform(-20, 20))
                patch = patch + rng.standard_normal(patch.shape) \
                    * float(rng.uniform(2, 12))
                xs.append(np.clip(patch, 0, 255)[:, :, None])
                ys.append(label)
            label += 1
    x = np.stack(xs).astype(np.float32) / 128.0 - 1.0
    return x, np.asarray(ys, np.int32)
