"""Classical-ops parity: JAX ops vs direct NumPy implementations of the
reference formulas (preprocessing.py / get_maps.py / prepare_data.py /
descriptor_PQ.py semantics)."""
import math

import numpy as np
import pytest
from scipy import ndimage


# ---------------------------------------------------------------------------
# NumPy spec helpers (straightforward transcriptions of the published math)
# ---------------------------------------------------------------------------

def np_lowpass(img, L):
    h, w = img.shape
    h2, w2 = L.shape
    p = np.zeros((h2, w2))
    p[:h, :w] = img
    f = np.fft.fftshift(np.fft.fft2(p))
    return np.real(np.fft.ifft2(np.fft.fftshift(f * L)))[:h, :w]


def np_cartoon_texture(img, sigma=2.5):
    img = img.astype(np.float64)
    h, w = img.shape
    n = max(2 ** math.ceil(math.log2(h)), 2 ** math.ceil(math.log2(w)))
    half = n // 2
    x, y = np.meshgrid(range(-half, half), range(-half, half))
    r = (np.sqrt(x * x + y * y) + 1e-4) / n
    L = 1.0 / (1 + (2 * np.pi * r * sigma) ** 4)

    def gnorm(a):
        gy, gx = np.gradient(a)
        return np.sqrt(gx * gx + gy * gy) + 1e-6

    img_low = np_lowpass(img, L)
    g1 = np_lowpass(gnorm(img), L)
    g2 = np_lowpass(gnorm(img_low), L)
    diff = g1 - g2
    ar1 = np.abs(g1)
    out = np.where(ar1 > 1, diff / np.where(ar1 > 1, ar1, 1), 0.0)
    w_ = np.clip((out - 0.3) / 0.4, 0, 1)
    w_[out < 0.3] = 0
    w_[out > 0.7] = 1
    u = w_ * img_low + (1 - w_) * img
    v = (img - u + 20) * 255 / 40
    return np.clip(v, 0, 255)


def np_stft_enhance(img):
    patch, block = 64, 16
    ovp = (patch - block) // 2
    h0, w0 = img.shape
    img = np.pad(img.astype(np.float64), ovp)
    h, w = img.shape
    bh, bw = (h - patch) // block, (w - patch) // block
    half = patch // 2
    x, y = np.meshgrid(range(-half, half), range(-half, half))
    r = np.sqrt(x * x + y * y) + 1e-4
    lo = 1 / (1 + (r / (patch / 3.0)) ** 4)
    hi = 1 / (1 + ((patch / 18.0) / r) ** 4)
    band = lo * hi
    weight = np.exp(-(x * x + y * y) / ((patch / 3) ** 2))
    rec = np.zeros((h, w))
    for i in range(bh):
        for j in range(bw):
            p = img[i * block:i * block + patch, j * block:j * block + patch].copy()
            p -= np.median(p)
            f = np.fft.fftshift(np.fft.fft2(p))
            f = band * f
            f /= np.linalg.norm(f) + 1e-4
            rp = np.real(np.fft.ifft2(np.fft.ifftshift(f)))
            rec[i * block:i * block + patch, j * block:j * block + patch] += rp * weight
    rec = rec[ovp:ovp + h0, ovp:ovp + w0]
    out = (rec - np.median(rec)) / (np.std(rec) + 1e-6) * 14 + 127
    return np.clip(out, 0, 255)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ridge_img():
    from msu_latentafis_tpu.training.synthetic_data import render_ridge_image
    rng = np.random.default_rng(3)
    img, _ = render_ridge_image(rng, 160, 192)
    return img


def test_cartoon_texture_matches_spec(ridge_img):
    from msu_latentafis_tpu.ops.fft import fast_cartoon_texture
    got = np.asarray(fast_cartoon_texture(ridge_img))
    want = np_cartoon_texture(ridge_img)
    # interior parity (np.gradient edge rows match too, but allow fp slack)
    np.testing.assert_allclose(got, want, atol=0.15)


def test_stft_enhance_matches_spec(ridge_img):
    from msu_latentafis_tpu.ops.fft import stft_enhance
    got = np.asarray(stft_enhance(ridge_img))
    want = np_stft_enhance(ridge_img)
    assert np.mean(np.abs(got - want)) < 0.2
    np.testing.assert_allclose(got, want, atol=2.0)


def test_local_contrast_matches_cv2(ridge_img):
    import cv2
    from msu_latentafis_tpu.ops.contrast import local_contrast_enhancement
    img = ridge_img.astype(np.float32)
    mean = cv2.blur(img, (15, 15))
    centered = img - mean
    dev = cv2.blur(np.abs(centered), (15, 15))
    want = (np.clip(centered / (dev + 10) * 0.75, -1, 1) + 1) * 127.5
    got = np.asarray(local_contrast_enhancement(img))
    # borders differ (cv2.blur reflect101 vs our reflect pad); check interior
    np.testing.assert_allclose(got[8:-8, 8:-8], want[8:-8, 8:-8], atol=0.5)


def test_gaussian_blur_matches_scipy(ridge_img):
    from msu_latentafis_tpu.ops.gaussian import gaussian_blur_reflect
    want = ndimage.gaussian_filter(ridge_img.astype(np.float32), 2.0,
                                   mode="reflect")
    got = np.asarray(gaussian_blur_reflect(ridge_img.astype(np.float32), 2.0))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_pq_encode_matches_scipy_vq(rng):
    from scipy.cluster.vq import vq
    from msu_latentafis_tpu.ops.pq import pq_encode, pq_decode
    from msu_latentafis_tpu.utils.synthetic import random_codebook, random_descriptors
    cb = random_codebook(rng)
    des = random_descriptors(rng, 200)
    codes = pq_encode(des, cb)
    for m in range(16):
        want, _ = vq(des[:, m * 6:(m + 1) * 6], cb[m])
        np.testing.assert_array_equal(codes[:, m], want.astype(np.uint8))
    dec = pq_decode(codes, cb)
    assert dec.shape == (200, 96)


def test_train_codebook_reduces_distortion(rng):
    from msu_latentafis_tpu.ops.pq import train_codebook, pq_encode, pq_decode
    from msu_latentafis_tpu.utils.synthetic import random_descriptors
    des = random_descriptors(rng, 2000)
    cb = train_codebook(des, iters=5)
    dec = pq_decode(pq_encode(des, cb), cb)
    mse_trained = np.mean((des - dec) ** 2)
    from msu_latentafis_tpu.utils.synthetic import random_codebook
    cb0 = random_codebook(rng)
    dec0 = pq_decode(pq_encode(des, cb0), cb0)
    assert mse_trained < np.mean((des - dec0) ** 2)


def test_decode_cylinder_finds_planted_minutiae():
    from msu_latentafis_tpu.ops.cylinder import make_cylinder_target
    from msu_latentafis_tpu.ops.minutiae import decode_minutiae
    minutiae = np.array([[40.0, 50.0, 1.0, 1.0],
                         [100.0, 30.0, 4.0, 1.0],
                         [70.0, 100.0, 2.5, 1.0]])
    cyl = make_cylinder_target(minutiae, 128, 128)
    found = decode_minutiae(cyl, thr=0.3)
    assert len(found) == 3
    # match each planted point
    for x, y, ori, _ in minutiae:
        d = np.hypot(found[:, 0] - x, found[:, 1] - y)
        i = np.argmin(d)
        assert d[i] < 2.0
        od = abs(found[i, 2] - ori) % (2 * np.pi)
        od = min(od, 2 * np.pi - od)
        assert od < 0.2


def test_consensus_voting():
    from msu_latentafis_tpu.ops.minutiae import get_common_minutiae
    base = np.array([[50.0, 50.0, 1.0, 1.0], [100.0, 100.0, 2.0, 1.0]])
    shifted = base.copy()
    shifted[:, :2] += 3
    other = np.array([[200.0, 200.0, 0.5, 1.0]])
    sets = [base, shifted, other, base.copy(), np.zeros((0, 4))]
    # init_ind=3 seeds from sets[3] == base
    common = get_common_minutiae(sets, thr=3, init_ind=3)
    assert len(common) == 2           # both base points seen 3x; 'other' only once


def test_gabor_kernel_bank_shape():
    from msu_latentafis_tpu.ops.gabor import get_gabor_filters
    bank = get_gabor_filters()
    assert bank.shape == (60, 30, 19, 19)
    assert np.all(bank[:, :5] == 0)        # frequencies < 5 unused
    # int16-quantized, roughly zero-mean kernels
    assert abs(bank[10, 10].mean()) < 3.0


def test_evaluate_metrics(rng):
    from msu_latentafis_tpu.evaluate import (verification_metrics,
                                             rank_k_accuracy,
                                             mean_average_precision)
    genuine = rng.normal(2.0, 0.5, 500)
    impostor = rng.normal(0.0, 0.5, 5000)
    scores = np.concatenate([genuine, impostor])
    labels = np.concatenate([np.ones(500), np.zeros(5000)])
    m = verification_metrics(scores, labels)
    assert m["tar@far=0.01"] > 0.5 and m["eer"] < 0.2

    sm = rng.normal(0, 1, (20, 50))
    mates = rng.integers(0, 50, 20)
    sm[np.arange(20), mates] += 10
    assert rank_k_accuracy(sm, mates, 1) == 1.0
    rel = np.zeros((20, 50), bool)
    rel[np.arange(20), mates] = True
    assert mean_average_precision(sm, rel) == 1.0
