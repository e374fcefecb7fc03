"""Device-side descriptor path == host oracle.

The device path gathers aligned patches on-device (ops/patches.py
gather_patches_device) and fuses patch-gather + 3 descriptor nets +
normalization into one dispatch; it must reproduce the host
extract_patches + per-batch forward path exactly (same integer grids, same
clamping, same normalization)."""
import numpy as np


def test_describe_stack_matches_host(rng):
    from msu_latentafis_tpu.pipeline.models_bundle import ModelBundle

    bundle = ModelBundle.initialize()
    h, w = 160, 192
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img2 = rng.uniform(0, 255, (h, w)).astype(np.float32)
    n = 6
    minutiae = np.column_stack([
        rng.uniform(20, w - 20, n), rng.uniform(20, h - 20, n),
        rng.uniform(0, 2 * np.pi, n), rng.random(n)])

    want1 = bundle.describe_host(img, minutiae, batch_size=8)
    want2 = bundle.describe_host(img2, minutiae, batch_size=8)
    stack = bundle.prepare_image_stack([img, img2])
    got = bundle.describe_stack(stack, minutiae, batch_size=8)

    assert len(got) == 2 and len(got[0]) == len(bundle.patch_types)
    for k in range(len(bundle.patch_types)):
        np.testing.assert_allclose(got[0][k], want1[k], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got[1][k], want2[k], rtol=2e-5, atol=2e-6)
    # the one-image convenience wrapper routes through the same path
    one = bundle.describe(img, minutiae, batch_size=8)
    for k in range(len(bundle.patch_types)):
        np.testing.assert_allclose(one[k], want1[k], rtol=2e-5, atol=2e-6)


def test_describe_empty_contract():
    from msu_latentafis_tpu.pipeline.models_bundle import ModelBundle
    bundle = ModelBundle.initialize()
    img = np.zeros((96, 96), np.float32)
    assert bundle.describe(img, np.zeros((0, 4))) == []
