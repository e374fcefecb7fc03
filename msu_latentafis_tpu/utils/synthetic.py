"""Synthetic template / gallery generation.

Used by tests and benchmarks to produce structurally-realistic templates
(final ``.dat`` semantics: texture coordinates already quantized, descriptors
L2-normalized to 1.73 as after dimensionality reduction —
/root/reference/extraction/descriptor_DR.py:150-153) without trained models
or forensic data.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..templates.data_model import MinuTemplate, TextureTemplate, Template

DES_NORM = 1.73  # post-DR descriptor norm (descriptor_DR.py:152)


def random_descriptors(rng: np.random.Generator, n: int, dim: int = 96,
                       norm: float = DES_NORM) -> np.ndarray:
    d = rng.standard_normal((n, dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-7
    return (d * norm).astype(np.float32)


def random_codebook(rng: np.random.Generator, n_subs: int = 16,
                    n_clusters: int = 256, sub_dim: int = 6) -> np.ndarray:
    cb = rng.standard_normal((n_subs, n_clusters, sub_dim)).astype(np.float32)
    return cb * (DES_NORM / np.sqrt(n_subs * sub_dim))


def random_minutiae(rng: np.random.Generator, n: int, h: int = 512,
                    w: int = 512, margin: int = 24,
                    with_reliability: bool = True) -> np.ndarray:
    cols = 4 if with_reliability else 3
    m = np.zeros((n, cols), np.float64)
    m[:, 0] = rng.integers(margin, w - margin, n)
    m[:, 1] = rng.integers(margin, h - margin, n)
    m[:, 2] = rng.uniform(-np.pi, np.pi, n)
    if with_reliability:
        m[:, 3] = 1.0
    return m


def random_quantized_minutiae(rng: np.random.Generator, n: int,
                              blk: int = 30) -> np.ndarray:
    """Texture minutiae with on-disk quantized (x-24)/16 coordinates."""
    m = np.zeros((n, 4), np.float64)
    m[:, 0] = rng.integers(0, blk, n)
    m[:, 1] = rng.integers(0, blk, n)
    m[:, 2] = rng.uniform(-np.pi, np.pi, n)
    return m


def make_rolled_template(rng: np.random.Generator, n_minu: int = 60,
                         n_tex: int = 300, des_dim: int = 96,
                         n_subs: int = 16, h: int = 512, w: int = 512,
                         mated_latent: Optional[Template] = None,
                         codebook: Optional[np.ndarray] = None,
                         noise: float = 0.25,
                         mate_template_idx: int = 26) -> Template:
    """Rolled template in final-PQ form (uint8 texture codes).

    When ``mated_latent`` is given, descriptors/coords are noisy copies of
    the latent's *selected* minutiae template (default index 26, the first
    template the fused score uses — matcher.cpp:380), and the texture codes
    PQ-encode the latent's texture descriptors (requires ``codebook``) so
    the genuine pair scores far above random impostors.
    """
    t = Template()
    minu = random_minutiae(rng, n_minu, h, w, with_reliability=False)
    des = random_descriptors(rng, n_minu, des_dim)
    if mated_latent is not None and mated_latent.minu_template:
        idx = min(mate_template_idx, len(mated_latent.minu_template) - 1)
        src = mated_latent.minu_template[idx]
        k = min(n_minu, src.n_minutiae)
        minu[:k, :3] = np.asarray(src.minutiae)[:k, :3]
        minu[:k, :2] += rng.normal(0, 2.0, (k, 2))
        d = src.des[:k] + noise * rng.standard_normal((k, des_dim)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-7
        des[:k] = d * DES_NORM
    t.add_minu_template(MinuTemplate(h=h, w=w, blkH=h // 16, blkW=w // 16,
                                     minutiae=minu, des=des,
                                     oimg=np.zeros((h // 16, w // 16), np.float32)))
    tex = random_quantized_minutiae(rng, n_tex)
    codes = rng.integers(0, 256, (n_tex, n_subs)).astype(np.uint8)
    if mated_latent is not None and mated_latent.texture_template:
        src = mated_latent.texture_template[0]
        k = min(n_tex, src.n_minutiae)
        tex[:k] = np.asarray(src.minutiae)[:k, :4]
        if codebook is not None and k:
            from ..ops.pq import pq_encode
            codes[:k] = pq_encode(np.asarray(src.des)[:k], codebook)
    t.add_texture_template(TextureTemplate(h=h, w=w, minutiae=tex, des=codes))
    return t


def synthetic_packed_gallery(rng: np.random.Generator, codebook: np.ndarray,
                             G: int, n_minu: int = 96, n_tex: int = 448,
                             des_dim: int = 96):
    """Directly build a PackedGallery of G synthetic rolled templates with
    vectorized NumPy (no per-template Python objects) — used for large-scale
    benchmarking. Counts are jittered +/-25% per entry."""
    from ..templates.packing import PackedGallery
    n_subs, n_clusters, sub_dim = codebook.shape
    Rm = n_minu
    Rt = n_tex

    minu_des = rng.standard_normal((G, Rm, des_dim), dtype=np.float32)
    minu_des /= np.linalg.norm(minu_des, axis=2, keepdims=True) + 1e-7
    minu_des *= DES_NORM
    minu_n = rng.integers(int(0.75 * Rm), Rm + 1, G).astype(np.int32)
    row = np.arange(Rm)[None, :]
    mmask = row < minu_n[:, None]
    minu_des *= mmask[:, :, None]
    minu_xy = rng.integers(24, 488, (G, Rm, 2)).astype(np.float32) * mmask[:, :, None]
    minu_ori = rng.uniform(-np.pi, np.pi, (G, Rm)).astype(np.float32) * mmask

    tex_codes = rng.integers(0, n_clusters, (G, Rt, n_subs)).astype(np.uint8)
    tex_n = rng.integers(int(0.75 * Rt), Rt + 1, G).astype(np.int32)
    trow = np.arange(Rt)[None, :]
    tmask = trow < tex_n[:, None]
    tex_codes *= tmask[:, :, None]
    cw_sqnorm = np.sum(codebook.astype(np.float64) ** 2, axis=2).astype(np.float32)
    sub_ids = np.arange(n_subs)
    tex_sqnorm = cw_sqnorm[sub_ids[None, None, :],
                           tex_codes.astype(np.int64)].sum(axis=2) * tmask
    tex_xy = rng.integers(0, 30, (G, Rt, 2)).astype(np.float32) * tmask[:, :, None]
    tex_ori = rng.uniform(-np.pi, np.pi, (G, Rt)).astype(np.float32) * tmask

    return PackedGallery(minu_des=minu_des, minu_xy=minu_xy, minu_ori=minu_ori,
                         minu_n=minu_n, tex_codes=tex_codes,
                         tex_sqnorm=tex_sqnorm.astype(np.float32),
                         tex_xy=tex_xy, tex_ori=tex_ori, tex_n=tex_n,
                         names=[str(i) for i in range(G)])


def make_latent_template(rng: np.random.Generator, n_minu: int = 30,
                         n_tex: int = 200, des_dim: int = 96,
                         n_minu_templates: int = 28, h: int = 512,
                         w: int = 512) -> Template:
    """Latent template in final form: 28 minutiae templates + 1 float
    texture template with quantized coordinates."""
    t = Template()
    for _ in range(n_minu_templates):
        minu = random_minutiae(rng, n_minu, h, w)
        des = random_descriptors(rng, n_minu, des_dim)
        t.add_minu_template(MinuTemplate(h=h, w=w, blkH=h // 16, blkW=w // 16,
                                         minutiae=minu, des=des,
                                         oimg=np.zeros((h // 16, w // 16), np.float32)))
    tex = random_quantized_minutiae(rng, n_tex)
    des = random_descriptors(rng, n_tex, des_dim)
    t.add_texture_template(TextureTemplate(h=h, w=w, minutiae=tex, des=des))
    return t
