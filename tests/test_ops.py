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


def test_refine_minutiae_matches_reference_loop(rng):
    """Vectorized suppression == the reference's sequential double loop
    (prepare_data.py:446-472, which never reads flag[i])."""
    from scipy.spatial.distance import cdist
    from msu_latentafis_tpu.ops.minutiae import refine_minutiae
    for _ in range(10):
        n = int(rng.integers(2, 120))
        m = np.column_stack([rng.uniform(0, 120, (n, 2)),
                             rng.uniform(0, 2 * np.pi, n),
                             rng.random(n)])
        flag = np.ones(n, bool)
        d = cdist(m[:, :2], m[:, :2])
        for i in range(n):
            for j in range(i + 1, n):
                if d[i, j] < 10:
                    flag[j] = False
                    continue
                od = abs(m[j, 2] - m[i, 2])
                od = min(od, 2 * np.pi - od)
                if d[i, j] < 20 and od < np.pi / 4:
                    flag[j] = False
        want = m[flag]
        got = refine_minutiae(m.copy())
        assert np.array_equal(got, want)


def test_remove_crowded_matches_reference_loop(rng):
    """Vectorized crowding filter == the reference loop
    (minutiae_AEC.py:90-118 semantics)."""
    from scipy.spatial.distance import cdist
    from msu_latentafis_tpu.ops.minutiae import remove_crowded_minutiae
    for _ in range(10):
        n = int(rng.integers(3, 150))
        m = np.column_stack([rng.uniform(0, 80, (n, 2)),
                             rng.uniform(0, 2 * np.pi, n),
                             rng.random(n)])
        d = cdist(m[:, :2], m[:, :2])
        flag = np.ones(n, bool)
        for i in range(n):
            order = np.argsort(d[i])
            if d[i, order[1]] < 5:
                flag[i] = False
                flag[order[1]] = False
                continue
            if np.mean(d[i, order[1:4]]) < 12:
                flag[i] = False
            if n > 5 and np.mean(d[i, order[1:6]]) < 25:
                flag[i] = False
        want = m[flag]
        got = remove_crowded_minutiae(m.copy())
        assert np.array_equal(got, want)


def test_gabor_kernel_bank_shape():
    from msu_latentafis_tpu.ops.gabor import get_gabor_filters
    bank = get_gabor_filters()
    assert bank.shape == (60, 30, 19, 19)
    assert np.all(bank[:, :5] == 0)        # frequencies < 5 unused
    # int16-quantized, roughly zero-mean kernels
    assert abs(bank[10, 10].mean()) < 3.0


def test_gabor_apply_matches_per_pixel_gather(rng):
    """The one-hot-matmul + im2col formulation must equal the direct
    per-pixel kernel-selection sum (filtering.py:176-187 semantics)."""
    import jax.numpy as jnp
    from msu_latentafis_tpu.ops.gabor import (KHALF, KMAX, _gabor_apply,
                                              get_gabor_filters)
    h, w = 40, 48
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    bank = get_gabor_filters()
    nb = bank.shape[0] * bank.shape[1]
    bucket = rng.integers(0, nb, (h, w)).astype(np.int32)
    active = rng.random((h, w)) > 0.3
    bank_flat = bank.reshape(nb, KMAX * KMAX)

    padded = np.pad(img, KHALF)
    want = np.zeros((h, w), np.float64)
    for i in range(h):
        for j in range(w):
            if not active[i, j]:
                continue
            patch = padded[i:i + KMAX, j:j + KMAX].reshape(-1)
            want[i, j] = np.dot(patch.astype(np.float64),
                                bank_flat[bucket[i, j]].astype(np.float64))
    lo, hi = want.min(), want.max()
    want = (want - lo + 1e-4) / (hi - lo + 1e-4) * 255.0
    got = np.asarray(_gabor_apply(jnp.asarray(img), jnp.asarray(bucket),
                                  jnp.asarray(active), jnp.asarray(bank_flat)))
    assert np.allclose(got, want, rtol=1e-4, atol=2e-2)


def test_gabor_host_matches_device(rng):
    """The host FFT-correlation path (training-data generation) must equal
    the device one-hot-matmul path for few-bucket selection maps — the
    descriptor stand-ins train on gabor_apply_host output and deploy
    against _gabor_apply output."""
    import jax.numpy as jnp
    from msu_latentafis_tpu.ops.gabor import (KMAX, _gabor_apply,
                                              gabor_apply_host,
                                              gabor_plan_host,
                                              get_gabor_filters)
    h, w = 48, 56
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    angle = rng.uniform(-np.pi / 2, np.pi / 2, (h, w))
    freq = np.full((h, w), 1.0 / 9.0)
    bucket, active = gabor_plan_host(angle, freq, (h, w))
    bank = get_gabor_filters()
    bank_flat = bank.reshape(-1, KMAX * KMAX)
    got_dev = np.asarray(_gabor_apply(jnp.asarray(img),
                                      jnp.asarray(bucket, jnp.int32),
                                      jnp.asarray(active),
                                      jnp.asarray(bank_flat)))
    got_host = gabor_apply_host(img, bucket, active)
    assert np.allclose(got_host, got_dev, rtol=1e-3, atol=0.25), \
        np.abs(got_host - got_dev).max()


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


# ---------------------------------------------------------------------------
# STFT ridge-flow maps (get_maps.py:13-234, :587-643)
# ---------------------------------------------------------------------------

def np_stft_analysis(img, patch_size=64, block_size=16, nrof_dirs=16):
    """NumPy transcription of local_STFT.analysis over every block
    (get_maps.py:33-99 + the get_maps_STFT driver), returning per-block
    candidate (ori, fre, confidence) lists."""
    ovp = (patch_size - block_size) // 2
    img = np.pad(img.astype(np.float64), ovp, mode="symmetric")
    h, w = img.shape
    blkH = (h - patch_size) // block_size + 1
    blkW = (w - patch_size) // block_size + 1

    half = patch_size // 2
    x, y = np.meshgrid(np.arange(-half, half), np.arange(-half, half))
    r = np.sqrt(x * x + y * y) + 1e-4
    flow, fhigh = patch_size / 18.0, patch_size / 3.0
    band = (1.0 / (1 + (r / fhigh) ** 4)) * (1.0 / (1 + (flow / r) ** 4))
    d = np.arctan2(y, x)
    d[d < 0] += math.pi
    dir_ind = np.floor(d / (math.pi / nrof_dirs)).astype(int)
    dir_ind[dir_ind == nrof_dirs] = 0
    sigma = patch_size / 3.0
    weight = np.exp(-(x * x + y * y) / (sigma * sigma))

    out = {}
    for bi in range(blkH):
        for bj in range(blkW):
            patch = img[bi * block_size:bi * block_size + patch_size,
                        bj * block_size:bj * block_size + patch_size].copy()
            p = patch * weight
            p = p - p.mean()
            p = p / (np.linalg.norm(p) + 1e-6)
            f = np.fft.fftshift(np.fft.fft2(p)) * band
            energy = np.abs(f)
            energy = energy / (np.sum(energy) + 1e-5)

            dir_norm = np.zeros(nrof_dirs + 2)
            for i in range(nrof_dirs):
                dir_norm[i + 1] = energy[dir_ind == i].sum()
            dir_norm[0] = dir_norm[nrof_dirs]
            dir_norm[nrof_dirs + 1] = dir_norm[1]
            sm = dir_norm                  # ALIAS — in-place recursion
            for i in range(1, nrof_dirs + 1):
                sm[i] = (dir_norm[i - 1] + dir_norm[i] * 4 + dir_norm[i + 1]) / 6
            sm[0] = sm[nrof_dirs]
            sm[nrof_dirs + 1] = sm[1]
            sm = sm / (np.sum(sm[1:nrof_dirs + 1]) + 1e-5)

            ori_interval = math.pi / nrof_dirs
            wenergy = energy * r
            cands = []
            for i in range(1, nrof_dirs + 1):
                if sm[i] > sm[i - 1] and sm[i] > sm[i + 1]:
                    ori = (i - 1) * ori_interval + ori_interval / 2 + math.pi / 2
                    fre = 1.0 / (wenergy[dir_ind == i - 1].sum() / sm[i] + 1e-5)
                    cands.append((sm[i], ori, fre))
            cands.sort(key=lambda t: -t[0])
            if len(cands) >= 2 and cands[0][0] / cands[1][0] > 2.0:
                cands = cands[:1]
            else:
                cands = cands[:2]
            out[(bi, bj)] = cands
    return out, blkH, blkW


def test_stft_maps_matches_spec(ridge_img):
    from msu_latentafis_tpu.ops.maps import _stft_maps_core
    import jax.numpy as jnp
    cands, blkH, blkW = np_stft_analysis(ridge_img)
    ovp = (64 - 16) // 2
    padded = jnp.pad(jnp.asarray(ridge_img, jnp.float32),
                     ((ovp, ovp), (ovp, ovp)), mode="symmetric")
    ori, fre = map(np.asarray, _stft_maps_core(padded))
    assert ori.shape == (blkH, blkW)
    agree = 0
    checked = 0
    for (bi, bj), c in cands.items():
        if not c:
            assert ori[bi, bj] == -10.0
            continue
        checked += 1
        # ties between nearly-equal f32/f64 histogram peaks may pick a
        # different direction bin; require near-universal agreement
        if abs(ori[bi, bj] - c[0][1]) < 1e-4:
            agree += 1
            np.testing.assert_allclose(fre[bi, bj], c[0][2], rtol=1e-2)
    assert checked > 20 and agree / checked > 0.9


def test_ridge_flow_optimal_matches_spec(ridge_img):
    from msu_latentafis_tpu.ops.maps import get_ridge_flow_optimal_n
    cands, blkH, blkW = np_stft_analysis(ridge_img)

    # NumPy mirror of get_ridge_flow_optimal_N (get_maps.py:200-234)
    want = np.zeros((blkH, blkW)) - 10
    pad = 2
    for bi in range(pad, blkH - pad):
        for bj in range(pad, blkW - pad):
            c = cands[(bi, bj)]
            if not c:
                continue
            rel = np.zeros(len(c))
            for k, (_, ori_k, _) in enumerate(c):
                for di in range(-pad, pad + 1):
                    for dj in range(-pad, pad + 1):
                        if di == 0 and dj == 0:
                            continue
                        nb = cands[(bi + di, bj + dj)]
                        if not nb:
                            continue
                        simi = [(math.cos((ori_k - o) * 2) + 1) / 2
                                for (_, o, _) in nb]
                        rel[k] += max(simi)
            want[bi, bj] = c[int(np.argmax(rel))][1] + math.pi * 0.5

    got = np.asarray(get_ridge_flow_optimal_n(ridge_img))
    assert got.shape == want.shape
    mism = np.sum(np.abs(got - want) > 1e-3)
    # fp tie fuzz in peak picking may flip a couple of blocks
    assert mism <= 0.1 * want.size


def test_quality_map_dict_coarse(ridge_img):
    from msu_latentafis_tpu.ops.maps import (construct_dictionary,
                                             get_quality_map_dict_coarse)
    dict_all, ori_all, spacing_all = construct_dictionary(ori_num=24)
    q, d, f = map(np.asarray, get_quality_map_dict_coarse(
        ridge_img, dict_all, ori_all, spacing_all))
    blkH, blkW = ridge_img.shape[0] // 16, ridge_img.shape[1] // 16
    assert q.shape == d.shape == f.shape == (blkH, blkW)
    assert np.all(np.isfinite(q)) and q.max() > 0
    # direction is an angle, frequency a reciprocal spacing
    assert np.all(np.abs(d) <= math.pi)
    inner = f[1:-1, 1:-1]
    assert inner.min() >= 0 and inner.max() <= 1.0

    # 2-D ori/spacing arrays exercise the reference's faithful row indexing
    n_atoms = dict_all.shape[1]
    ori2 = np.zeros((1024, n_atoms), np.float32)
    ori2[32] = np.cos(2 * ori_all)
    ori2[96] = -np.sin(2 * ori_all)
    sp2 = np.tile(spacing_all, (1024, 1))
    _, d2, f2 = map(np.asarray, get_quality_map_dict_coarse(
        ridge_img, dict_all, ori2, sp2))
    assert d2.shape == (blkH, blkW)
    np.testing.assert_allclose(f2, f, atol=1e-6)
