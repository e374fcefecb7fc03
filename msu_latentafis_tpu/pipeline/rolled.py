"""Rolled (gallery) feature-extraction orchestrator.

Reproduces FeatureExtraction_Rolled.feature_extraction_single_rolled
(/root/reference/extraction/extraction_rolled.py:70-144): intensity-based
segmentation mask, contrast + cartoon-texture preprocessing, one minutiae
set from the texture image (thr 0.15), descriptors from the raw image,
STFT orientation map, one minutiae template + one texture template with
<= 1000 single-direction virtual minutiae (>= 24 px inside the mask)
described from the contrast image.
"""
from __future__ import annotations

import math
import time
from typing import Optional

import numpy as np

from ..ops import contrast as C
from ..ops import fft as F
from ..ops import maps, minutiae as M, morphology
from ..templates.data_model import MinuTemplate, Template, TextureTemplate
from .latent import adjust_image_size
from .models_bundle import ModelBundle

BLOCK = 16


class RolledFeatureExtractor:
    def __init__(self, models: Optional[ModelBundle] = None, config=None):
        self.models = models or ModelBundle.initialize(config)
        self.timings = {}

    def extract(self, img: np.ndarray, ppi: int = 500) -> Optional[Template]:
        img = np.asarray(img, np.float32)
        if ppi != 500:
            import cv2
            img = cv2.resize(img, (0, 0), fx=500.0 / ppi, fy=500.0 / ppi)
        img = adjust_image_size(img)
        h, w = img.shape

        import jax.numpy as jnp
        dimg = jnp.asarray(img, jnp.float32)        # THE one 22 MB/s upload
        t0 = time.perf_counter()
        mask = maps.get_quality_map_intensity(dimg)
        self.timings["cropping"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        contrast_img = C.local_contrast_enhancement(dimg)
        texture_img = F.fast_cartoon_texture(dimg)
        # the rolled path runs the 64-patch modified variant (bundle slot 2;
        # extraction_rolled.py:15 imports minutiae_AEC_modified), thr 0.15
        mnt = self.models.detect_minutiae(2, texture_img, 0.15)
        mnt = M.remove_spurious_minutiae(mnt, mask, r=5)
        self.timings["minutiae"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        des = self.models.describe(dimg, mnt, batch_size=256)
        self.timings["descriptors"] = time.perf_counter() - t0

        dir_map, _ = maps.get_maps_stft(texture_img)
        dir_map = np.asarray(dir_map)

        blkH, blkW = h // BLOCK, w // BLOCK
        template = Template()
        template.add_minu_template(MinuTemplate(
            h=h, w=w, blkH=blkH, blkW=blkW,
            minutiae=np.asarray(mnt).reshape(-1, 4) if len(mnt) else np.zeros((0, 4)),
            des=des, oimg=dir_map[:blkH, :blkW].copy(), mask=mask))

        t0 = time.perf_counter()
        virtual = self._virtual_minutiae(mask, dir_map, h, w)
        if len(virtual) > 3:
            # batch 256 shares the compiled (I=1, B=256) describe shape with
            # the real-minutiae call above
            vdes = self.models.describe(contrast_img, virtual, batch_size=256)
            template.add_texture_template(TextureTemplate(
                h=h, w=w, minutiae=virtual, des=vdes, mask=mask))
        self.timings["texture"] = time.perf_counter() - t0
        return template

    @staticmethod
    def _virtual_minutiae(mask, dir_map, h, w, stride: int = 16,
                          min_dist: float = 24.0, cap: int = 1000) -> np.ndarray:
        dist = morphology.distance_transform_edt(mask)
        out = []
        for y in range(24, h - 24, stride):
            for x in range(24, w - 24, stride):
                if dist[y][x] <= min_dist:
                    continue
                out.append([x, y, -dir_map[y // 16][x // 16]])
        out = np.asarray(out, np.float64)
        return out[:cap]

    def extract_file(self, img_file: str, ppi: int = 500) -> Optional[Template]:
        import imageio.v2 as imageio
        img = np.asarray(imageio.imread(img_file))
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114])
        return self.extract(img, ppi=ppi)


# ---------------------------------------------------------------------------
# Dataset layout enumerators (the reference's batch modes)
# ---------------------------------------------------------------------------

def enumerate_rolled_dataset(image_dir: str, layout: str = "flat",
                             img_type: str = "bmp", N1: int = 0,
                             N2: int = 10 ** 9):
    """Yield ``(img_file, template_stem, ppi)`` for each image to enroll.

    Layouts mirror the reference's batch modes
    (/root/reference/extraction/extraction_rolled.py):

    - ``flat``: sorted ``*.<img_type>`` in one directory, sliced [N1:N2]
      (feature_extraction, :146-174);
    - ``longitudinal``: per-subject directories, fingers 0-9, first five
      impressions of each finger, template stem ``<subject>_<image>``
      (feature_extraction_Longitudinal, :176-213);
    - ``msp``: numbered ``<i>.bmp`` files for i in [N1, N2]
      (feature_extraction_MSP, :215-234);
    - ``n2n``: per-subject directories of ``*.png`` scanned at 1200 ppi
      (feature_extraction_N2N, :236-262).
    """
    import glob as _glob
    import os as _os

    if layout == "flat":
        files = sorted(_glob.glob(_os.path.join(image_dir, "*." + img_type)))
        if img_type == "bmp":  # the CLI historically accepts png alongside
            files = sorted(set(files) |
                           set(_glob.glob(_os.path.join(image_dir, "*.png"))))
        for f in files[N1:N2]:
            yield f, _os.path.splitext(_os.path.basename(f))[0], 500
    elif layout == "longitudinal":
        subjects = sorted(_os.listdir(image_dir))[N1:N2]
        for subject in subjects:
            for finger_id in range(10):
                imgs = sorted(_glob.glob(_os.path.join(
                    image_dir, subject, f"*{finger_id}.bmp")))
                if len(imgs) < 5:
                    continue
                for f in imgs[:5]:
                    stem = subject + "_" + _os.path.splitext(_os.path.basename(f))[0]
                    yield f, stem, 500
    elif layout == "msp":
        for i in range(N1, N2 + 1):
            f = _os.path.join(image_dir, f"{i}.bmp")
            if _os.path.exists(f):
                yield f, str(i), 500
    elif layout == "n2n":
        subject_paths = sorted(_glob.glob(_os.path.join(image_dir, "*")))[N1:N2]
        for sp in subject_paths:
            for f in sorted(_glob.glob(_os.path.join(sp, "*.png"))):
                yield f, _os.path.splitext(_os.path.basename(f))[0], 1200
    else:
        raise ValueError(f"unknown dataset layout: {layout!r}")
