"""Latent feature-extraction orchestrator.

Reproduces FeatureExtraction_Latent.feature_extraction_single_latent
(/root/reference/extraction/extraction_latent.py:69-217):

1. preprocess: cartoon-texture, STFT enhancement, Gaussian contrast
   normalization -> three STFT variants;
2. autoencoder enhancement of the STFT texture image; dictionary-based
   quality/orientation/frequency maps; AEC-quality x SSIM block mask;
3. five minutiae sets (STFT, contrast-STFT, AEC, Gabor-enhanced contrast,
   Gabor-enhanced texture) + two consensus sets (votes >= 2, >= 3)
   -> 7 sets x 4 descriptor images = 28 minutiae templates;
4. virtual minutiae on a stride-16 grid >= 16 px inside the mask (both ridge
   directions) -> 1 texture template from the enhanced contrast image.

The stage structure and constants match the reference; the compute runs
through the JAX ops/models of this package. Timing per stage is recorded in
``self.timings`` (the reference prints the same three buckets).
"""
from __future__ import annotations

import math
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from ..ops import contrast as C
from ..ops import fft as F
from ..ops import gabor, maps, minutiae as M, morphology
from ..templates.data_model import MinuTemplate, Template, TextureTemplate
from .models_bundle import ModelBundle

BLOCK = 16


def adjust_image_size(img: np.ndarray, block_size: int = BLOCK) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: (h // block_size) * block_size, : (w // block_size) * block_size]


class LatentFeatureExtractor:
    def __init__(self, models: Optional[ModelBundle] = None, config=None):
        import jax.numpy as jnp
        self.models = models or ModelBundle.initialize(config)
        d_all, d_ori, d_spc = maps.construct_dictionary(ori_num=60)
        # device-resident once: passing host arrays into the jitted maps
        # core re-uploads the ~MB dictionary every call (22 MB/s tunnel)
        self.dict_all = jnp.asarray(d_all)
        self.dict_ori = jnp.asarray(d_ori)
        self.dict_spacing = jnp.asarray(d_spc)
        self.timings = {}
        # per-stage diagnostics of the LAST extract() call: quality-failure
        # attribution (a 0.0 mate score usually means an empty minutiae set
        # or a collapsed mask — this shows which stage lost the signal)
        self.diag = {}

    # ------------------------------------------------------------------
    def extract(self, img: np.ndarray, ppi: int = 500,
                max_size: int = 1000) -> Optional[Template]:
        import jax.numpy as jnp
        t_start = time.perf_counter()
        img = np.asarray(img, np.float32)
        if ppi != 500:
            import cv2
            img = cv2.resize(img, (0, 0), fx=500.0 / ppi, fy=500.0 / ppi)
        img = adjust_image_size(img)
        h, w = img.shape
        if h > max_size and w > max_size:
            return None

        # --- preprocessing variants — all DEVICE-resident: through the
        # remote-TPU tunnel, host->device uploads run at ~22 MB/s
        # (MICROBENCH_TUNNEL.json), so every np.asarray boundary that
        # re-uploads an intermediate image costs ~0.1 s. The image crosses
        # once; per-stage sync (for honest stage timing) only under
        # EXTRACT_SYNC_TIMINGS=1.
        tick = time.perf_counter()
        sync = os.environ.get("EXTRACT_SYNC_TIMINGS") == "1"

        def _lap(key, *sync_arrs):
            nonlocal tick
            if sync:
                for a in sync_arrs:
                    np.asarray(a)
            now = time.perf_counter()
            self.timings[key] = now - tick
            tick = now

        dimg = jnp.asarray(img)
        texture_img = F.fast_cartoon_texture(dimg)
        _lap("cartoon", texture_img)
        contrast_img = C.local_contrast_enhancement_gaussian(dimg)
        stft3 = F.stft_enhance_batch(jnp.stack([texture_img, dimg,
                                                contrast_img]))
        stft_texture, stft_img, contrast_stft = stft3[0], stft3[1], stft3[2]
        _lap("stft_x3", stft_texture, stft_img, contrast_stft)

        # --- AEC enhancement + maps + mask
        aec_img = self.models.enhance(stft_texture)
        _lap("aec", aec_img)
        quality, dir_map, fre_map, ssim_q = maps.quality_ssim_fused(
            aec_img, stft_texture, self.dict_all, self.dict_ori,
            self.dict_spacing)
        quality = np.asarray(quality)
        dir_map = np.asarray(dir_map)
        fre_map = np.asarray(fre_map)
        blk_aec = (quality > 0.45)
        blk_aec = morphology.binary_closing(blk_aec, np.ones((3, 3), bool))
        blk_aec = morphology.binary_opening(blk_aec, np.ones((3, 3), bool))
        blk_ssim = maps._ssim_mask_host(np.asarray(ssim_q), thr=0.2)
        blkmask = blk_ssim * blk_aec.astype(np.int32)
        blkH, blkW = blkmask.shape
        import cv2
        mask = cv2.resize(blkmask.astype(float), (BLOCK * blkW, BLOCK * blkH),
                          interpolation=cv2.INTER_LINEAR)
        mask = (mask > 0).astype(np.float64)
        _lap("maps_mask")

        # --- minutiae sets (same-model pairs batched into one dispatch)
        minutiae_sets: List[np.ndarray] = []
        minutiae_sets.extend(self.models.detect_minutiae_batch(
            0, [stft_img, contrast_stft], [0.05, 0.10]))
        mnt_aec = self.models.detect_minutiae(1, aec_img, 0.25)
        mnt_aec = M.remove_spurious_minutiae(mnt_aec, mask)
        minutiae_sets.append(mnt_aec)
        _lap("detect_3")

        plan = gabor.gabor_plan(dir_map + math.pi / 2, fre_map, (h, w),
                                mask=np.ones((h, w), np.uint8))
        enh_contrast, enh_texture = gabor.gabor_apply_planned_multi(
            [contrast_img, texture_img], plan)
        _lap("gabor_x2", enh_contrast, enh_texture)

        mnt_contrast, mnt_texture = self.models.detect_minutiae_batch(
            1, [enh_contrast, enh_texture], [0.25, 0.25])
        mnt_contrast = M.remove_spurious_minutiae(mnt_contrast, mask)
        minutiae_sets.append(mnt_contrast)
        mnt_texture = M.remove_spurious_minutiae(mnt_texture, mask)
        minutiae_sets.append(mnt_texture)
        _lap("detect_2")

        mnt2 = M.get_common_minutiae(minutiae_sets, thr=2)
        mnt3 = M.get_common_minutiae(minutiae_sets, thr=3)
        minutiae_sets.append(mnt3)
        minutiae_sets.append(mnt2)
        _lap("consensus")
        self.timings["minutiae"] = time.perf_counter() - t_start
        self.diag = {
            "quality_mean": float(quality.mean()),
            "quality_p90": float(np.quantile(quality, 0.9)),
            "blk_aec_frac": float(blk_aec.mean()),
            "blk_ssim_frac": float(np.asarray(blk_ssim).mean()),
            "mask_frac": float(mask.mean()),
            "minutiae_per_set": [int(len(m)) for m in minutiae_sets],
        }

        # --- 7 sets x 4 descriptor images = 28 minutiae templates, via ONE
        # fused (gather + nets) dispatch over the UNION of unique minutiae
        # across all sets (consensus sets are exact copies of source-set
        # rows, so the union is ~60% the size of the concatenation; the
        # gather runs at ~300M elements/s and dominates this stage). Order
        # matches extraction_latent.py:175-181.
        t0 = time.perf_counter()
        stack = self.models.prepare_image_stack(
            [stft_img, texture_img, enh_texture, enh_contrast])
        template = Template()
        set_arrays = [np.asarray(mnt).reshape(-1, 4) if len(mnt)
                      else np.zeros((0, 4)) for mnt in minutiae_sets]
        cat = np.concatenate(set_arrays, axis=0)
        if len(cat):
            # descriptors depend on (x, y, ori) only; round for float-safe
            # exact dedupe of consensus copies
            union, inverse = np.unique(cat[:, :3].round(6), axis=0,
                                       return_inverse=True)
            per_img_union = self.models.describe_stack(stack, union)
        sizes = np.cumsum([0] + [len(a) for a in set_arrays])
        for si, mnt in enumerate(set_arrays):
            idx = inverse[sizes[si]:sizes[si + 1]] if len(mnt) else None
            for i in range(stack.n_images):
                des = ([arr[idx] for arr in per_img_union[i]]
                       if len(mnt) else [])
                template.add_minu_template(MinuTemplate(
                    h=h, w=w, blkH=blkH, blkW=blkW, minutiae=mnt,
                    des=des, oimg=dir_map.copy(), mask=mask))
        self.timings["descriptors"] = time.perf_counter() - t0

        # --- texture template from virtual minutiae
        t0 = time.perf_counter()
        virtual = self._virtual_minutiae(mask, dir_map, h, w)
        self.diag["virtual_minutiae"] = int(len(virtual))
        if len(virtual) > 3:
            vdes = self.models.describe(enh_contrast, virtual)
            template.add_texture_template(TextureTemplate(
                h=h, w=w, minutiae=virtual, des=vdes))
        self.timings["texture"] = time.perf_counter() - t0
        return template

    @staticmethod
    def _virtual_minutiae(mask: np.ndarray, dir_map: np.ndarray, h: int,
                          w: int, stride: int = 16, min_dist: float = 16.0,
                          both_directions: bool = True) -> np.ndarray:
        """Grid virtual minutiae >= min_dist inside the mask, oriented by
        -dir_map, one per ridge direction (extraction_latent.py:186-203)."""
        dist = morphology.distance_transform_edt(mask)
        out = []
        for y in range(24, h - 24, stride):
            for x in range(24, w - 24, stride):
                if dist[y][x] <= min_dist:
                    continue
                ori = -dir_map[y // 16][x // 16]
                out.append([x, y, ori])
                if both_directions:
                    out.append([x, y, math.pi + ori])
        return np.asarray(out, np.float64)

    # ------------------------------------------------------------------
    def extract_file(self, img_file: str, ppi: int = 500) -> Optional[Template]:
        import imageio.v2 as imageio
        img = np.asarray(imageio.imread(img_file))
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114])
        return self.extract(img, ppi=ppi)
