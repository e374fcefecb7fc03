"""Model bundle: loads / initializes all networks the pipelines need.

Mirrors the model set the reference loads at startup
(/root/reference/extraction/extraction_latent.py:34-67): two minutiae
models, three patch-type descriptor models, one enhancement model, plus the
DR CompNet. Checkpoints are Orbax directories; absent checkpoints fall back
to randomly-initialized stand-ins (the reference's pretrained weights are
external downloads that do not ship with the repo).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (CompNet, DescriptorNet, EnhancementAEC, MinutiaeAEC)
from ..models.minutiae_net import MinutiaeAEC64


def _try_restore(path: Optional[str], target):
    if not path or not os.path.isdir(path):
        return target
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target)
    except Exception:
        return target


def save_checkpoint(path: str, variables) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


@dataclasses.dataclass
class ImageStack:
    """Device-resident descriptor-source images, edge-padded by ``pad`` px
    and transposed to [hp * wp, I] so each patch-gather row is one
    contiguous [I] slice (edge padding reproduces the host path's
    coordinate clamping exactly — ops.patches.device_patch_index_table)."""

    h: int
    w: int
    n_images: int
    pad: int
    hp: int
    wp: int
    flat: Any          # [hp * wp, I]


@dataclasses.dataclass
class ModelBundle:
    """All inference models + jitted apply fns."""

    enhancement: Any
    enhancement_vars: Any
    minutiae: List[Any]            # [latent-STFT 128, latent-AEC 128,
    #                                 rolled 64-variant] — the reference
    #                                 loads minutiae_AEC.ImportGraph twice
    #                                 for latents (extraction_latent.py:50)
    #                                 and minutiae_AEC_modified for rolled
    #                                 (extraction_rolled.py:15)
    minutiae_vars: List[Any]
    descriptors: List[Any]         # one per patch type
    descriptor_vars: List[Any]
    patch_types: Sequence[int]
    compnet: Any
    compnet_vars: Any

    @classmethod
    def initialize(cls, config=None, patch_types: Sequence[int] = (2, 8, 11),
                   seed: int = 0) -> "ModelBundle":
        rng = jax.random.PRNGKey(seed)
        img = jnp.zeros((1, 128, 128, 1), jnp.float32)
        patch = jnp.zeros((1, 96, 96, 1), jnp.float32)
        feat = jnp.zeros((1, 192), jnp.float32)

        enh = EnhancementAEC()
        enh_vars = enh.init(rng, img, train=False)
        img64 = jnp.zeros((1, 64, 64, 1), jnp.float32)
        minu = [MinutiaeAEC(), MinutiaeAEC(), MinutiaeAEC64()]
        minu_vars = [m.init(rng, img64 if isinstance(m, MinutiaeAEC64)
                            else img, train=False) for m in minu]
        des = [DescriptorNet() for _ in patch_types]
        des_vars = [m.init(rng, patch, train=False) for m in des]
        comp = CompNet()
        comp_vars = comp.init(rng, feat, train=False)

        if config is not None:
            enh_vars = _try_restore(config.EnhancementModel, enh_vars)
            minu_vars[0] = _try_restore(config.MinutiaeExtractionModelLatentSTFT,
                                        minu_vars[0])
            minu_vars[1] = _try_restore(config.MinutiaeExtractionModel,
                                        minu_vars[1])
            minu_vars[2] = _try_restore(
                getattr(config, "MinutiaeExtractionModelRolled", None),
                minu_vars[2])
            for i, pt in enumerate(patch_types):
                key = f"DescriptorModelPatch{pt}"
                des_vars[i] = _try_restore(getattr(config, key, None), des_vars[i])
            comp_vars = _try_restore(config.DimensionalityReductionModel, comp_vars)

        return cls(enhancement=enh, enhancement_vars=enh_vars,
                   minutiae=minu, minutiae_vars=minu_vars,
                   descriptors=des, descriptor_vars=des_vars,
                   patch_types=tuple(patch_types),
                   compnet=comp, compnet_vars=comp_vars)

    # jitted apply closures (cached per bundle)
    def __post_init__(self):
        self._enh_apply = jax.jit(
            lambda v, x: self.enhancement.apply(v, x, train=False))
        self._minu_apply = [
            jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))
            for m in self.minutiae]
        self._des_apply = [
            jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))
            for m in self.descriptors]
        self._comp_apply = jax.jit(
            lambda v, x: self.compnet.apply(v, x, train=False))

        descriptors = self.descriptors

        def _describe_all(des_vars, flat, xb, yb, ori_ind, table, wp, pad):
            """One fused device pass: packed-table patch gather for every
            patch type + all descriptor nets + L2 norm -> [T, I, B, 64]."""
            from ..ops.patches import gather_patches_device_packed
            patches = gather_patches_device_packed(
                flat, wp, pad, xb, yb, ori_ind, table)     # [T, B, 96, 96, I]
            outs = []
            for k, net in enumerate(descriptors):
                x = jnp.moveaxis(patches[k], -1, 0)        # [I, B, 96, 96]
                ib = x.shape[0] * x.shape[1]
                x = x.reshape(ib, x.shape[2], x.shape[3], 1) / 128.0 - 1.0
                emb = net.apply(des_vars[k], x, train=False)
                emb = emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-7)
                outs.append(emb.reshape(patches.shape[-1], patches.shape[1], -1))
            return jnp.stack(outs)                          # [T, I, B, 64]

        self._describe_all = jax.jit(_describe_all,
                                     static_argnames=("wp", "pad"))

    # ------------------------------------------------------------------
    def enhance(self, img: np.ndarray) -> np.ndarray:
        from ..models.enhancement import enhance_whole_image
        return enhance_whole_image(self._enh_apply, self.enhancement_vars, img)

    def detect_minutiae(self, model_idx: int, img: np.ndarray,
                        minu_thr: float = 0.2) -> np.ndarray:
        from ..models.minutiae_net import detect_minutiae_whole_image
        modified = isinstance(self.minutiae[model_idx], MinutiaeAEC64)
        return detect_minutiae_whole_image(
            self._minu_apply[model_idx], self.minutiae_vars[model_idx], img,
            minu_thr=minu_thr, multiple=16 if modified else 64,
            refine_dist_thr=10.0 if modified else 20.0)

    def detect_minutiae_batch(self, model_idx: int, imgs, thrs):
        """Paired same-model detection in one forward + one decode dispatch
        (same semantics as per-image detect_minutiae)."""
        from ..models.minutiae_net import detect_minutiae_whole_image_batch
        modified = isinstance(self.minutiae[model_idx], MinutiaeAEC64)
        return detect_minutiae_whole_image_batch(
            self._minu_apply[model_idx], self.minutiae_vars[model_idx],
            imgs, thrs, multiple=16 if modified else 64,
            refine_dist_thr=10.0 if modified else 20.0)

    def prepare_image_stack(self, imgs: Sequence) -> "ImageStack":
        """Device-resident edge-padded [hp*wp, I] transposed image stack
        for describe_stack: each patch-gather row is a contiguous [I]
        slice, so one gather serves every descriptor source image at
        once."""
        from ..ops.patches import PATCH_PAD
        arrs = [jnp.asarray(im, jnp.float32) for im in imgs]
        h, w = arrs[0].shape
        pad = PATCH_PAD
        hp, wp = h + 2 * pad, w + 2 * pad
        flat = self._stack_pad(tuple(arrs), pad)
        return ImageStack(h=h, w=w, n_images=len(arrs), pad=pad, hp=hp,
                          wp=wp, flat=flat)

    @staticmethod
    @functools.partial(jax.jit, static_argnums=(1,))
    def _stack_pad(arrs, pad: int):
        padded = [jnp.pad(a, pad, mode="edge") for a in arrs]
        hp, wp = padded[0].shape
        return jnp.stack(padded, axis=-1).reshape(hp * wp, len(arrs))

    def describe_stack(self, stack: "ImageStack", minutiae: np.ndarray,
                       batch_size: int = 256) -> List[List[np.ndarray]]:
        """L2-normalized embeddings for every (image, patch type) pair:
        ``out[i][k]`` is [n_minutiae, 64] for source image i, patch type k.

        The descriptor stage's cost through the remote-TPU tunnel is
        dominated by host->device patch uploads (22 MB/s measured; a
        900-minutia template is ~100 MB of f32 patches). Here only the
        [B]-sized minutiae cross; patches are gathered on device from the
        already-resident images. Gathers run at ~300M elements/s on the
        chip, so the batch is padded to a power-of-two bucket and the full
        (packed-table gather + 3 nets + normalize) pass is ONE dispatch
        (chunked only above ``max_bucket``) instead of fixed 256-chunks.
        """
        import math as _math
        from ..ops.patches import (ORI_NUM, _PATCH_LOCATIONS,
                                   device_patch_index_table)
        n = len(minutiae)
        if n == 0:
            return [[] for _ in range(stack.n_images)]
        # the packed table only supports patch types whose crop window is
        # already 96x96 (no resize). Fall back to the host oracle path for
        # bundles configured with resize-needing types (ADVICE r4).
        if any(_PATCH_LOCATIONS[pt][0][1] - _PATCH_LOCATIONS[pt][0][0] != 96
               or _PATCH_LOCATIONS[pt][1][1] - _PATCH_LOCATIONS[pt][1][0] != 96
               for pt in self.patch_types):
            imgs = np.asarray(stack.flat).reshape(
                stack.hp, stack.wp, stack.n_images)[
                stack.pad:stack.pad + stack.h,
                stack.pad:stack.pad + stack.w]
            return [self.describe_host(imgs[..., i], minutiae)
                    for i in range(stack.n_images)]
        m = np.asarray(minutiae)
        ori = (-m[:, 2]) % (2 * _math.pi)
        ori_ind = np.round(ori / (2 * _math.pi) * ORI_NUM).astype(np.int32) % ORI_NUM
        xs = np.clip(m[:, 0].astype(np.int32), 0, stack.w - 1)
        ys = np.clip(m[:, 1].astype(np.int32), 0, stack.h - 1)
        table = device_patch_index_table(tuple(self.patch_types), stack.wp)
        des_vars = tuple(self.descriptor_vars)

        max_bucket = 2048
        chunks = []
        for i0 in range(0, n, max_bucket):
            b = np.arange(i0, min(i0 + max_bucket, n))
            bucket = max(batch_size, 1 << (len(b) - 1).bit_length())
            pad = bucket - len(b)
            bi = np.concatenate([b, np.zeros(pad, int)]) if pad else b
            out = self._describe_all(
                des_vars, stack.flat, jnp.asarray(xs[bi]), jnp.asarray(ys[bi]),
                jnp.asarray(ori_ind[bi]), table, wp=stack.wp, pad=stack.pad)
            chunks.append(np.asarray(out))               # [T, I, B, 64]
        full = np.concatenate(chunks, axis=2)[:, :, :n]  # [T, I, n, 64]
        return [[full[k, i].astype(np.float32)
                 for k in range(len(self.patch_types))]
                for i in range(stack.n_images)]

    def describe(self, img, minutiae: np.ndarray,
                 batch_size: int = 256, patch_size: int = 96) -> List[np.ndarray]:
        """Per-patch-type L2-normalized embeddings
        (descriptor.minutiae_descriptor_extraction semantics)."""
        if len(minutiae) == 0:
            return []
        return self.describe_stack(self.prepare_image_stack([img]), minutiae,
                                   batch_size=batch_size)[0]

    def describe_host(self, img: np.ndarray, minutiae: np.ndarray,
                      batch_size: int = 128, patch_size: int = 96) -> List[np.ndarray]:
        """Host-side patch-extraction reference path (kept as the oracle for
        the device gather and for patch types whose window is not 96x96)."""
        from ..ops.patches import extract_patches
        out = []
        if len(minutiae) == 0:
            return out
        for k, pt in enumerate(self.patch_types):
            patches = np.asarray(extract_patches(minutiae, img, patch_type=pt,
                                                 patch_size=patch_size))
            # x/128-1: the nets train in this domain (training.pretrain /
            # training.synthetic_data feed normalized patches)
            x = patches[:, :, :, None].astype(np.float32) / 128.0 - 1.0
            n = len(x)
            pad = (-n) % batch_size
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            embs = []
            for i in range(0, len(x), batch_size):
                embs.append(np.asarray(self._des_apply[k](
                    self.descriptor_vars[k], jnp.asarray(x[i:i + batch_size]))))
            emb = np.concatenate(embs)[:n]
            emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-7)
            out.append(emb.astype(np.float32))
        return out

    def compress(self, des: np.ndarray) -> np.ndarray:
        from ..models.compnet import compress_descriptors
        return compress_descriptors(self._comp_apply, self.compnet_vars, des)
