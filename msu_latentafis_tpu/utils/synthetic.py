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
                         tex_noise: float = 0.0,
                         mate_template_idx: int = 26) -> Template:
    """Rolled template in final-PQ form (uint8 texture codes).

    When ``mated_latent`` is given, descriptors/coords are noisy copies of
    the latent's *selected* minutiae template (default index 26, the first
    template the fused score uses — matcher.cpp:380), and the texture codes
    PQ-encode the latent's texture descriptors (requires ``codebook``) so
    the genuine pair scores far above random impostors. ``noise`` grades
    the minutiae-descriptor corruption and ``tex_noise`` the texture-
    descriptor corruption before PQ encoding — together they produce
    NEAR-MATES at controlled strengths (the structured-impostor rank-list
    protocol plants a graded ladder of these so the dense top-24 is
    meaningful, not iid noise).
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
            d = np.asarray(src.des)[:k].astype(np.float32)
            if tex_noise > 0:
                d = d + tex_noise * rng.standard_normal(d.shape) \
                    .astype(np.float32)
                d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-7
                d *= DES_NORM
            codes[:k] = pq_encode(d, codebook)
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


def device_synthetic_gallery(engine, G: int, n_minu: int = 96,
                             n_tex: int = 448, des_dim: int = 96,
                             codes_resident: bool = False, seed: int = 0,
                             chunk: int = 4096):
    """Generate a DeviceGallery of G synthetic rolled templates DIRECTLY on
    device in the engine's layout (transposed descriptors, split x/y
    planes, codes-resident or pre-decoded int8 textures). Host-side
    generation + upload of a 100K-1M gallery would take minutes through the
    22 MB/s tunnel; this builds it with on-device RNG in seconds.
    Used by bench.py-style scale benchmarks and the rank-parity script."""
    import jax
    import jax.numpy as jnp
    from ..matcher.engine import DeviceGallery

    RM, RT, D = n_minu, n_tex, des_dim
    block = engine.block_size
    Gpad = ((G + block - 1) // block) * block
    nchunks = (Gpad + chunk - 1) // chunk
    Gpad = nchunks * chunk
    MSCALE = DES_NORM / 127.0 + 1e-12

    def gen_chunk(key):
        ks = jax.random.split(key, 8)
        minu_des = jax.random.normal(ks[0], (chunk, D, RM), jnp.bfloat16)
        norm = jnp.sqrt(jnp.sum(minu_des.astype(jnp.float32) ** 2, 1,
                                keepdims=True)) + 1e-6
        minu_des = (minu_des / norm * DES_NORM).astype(jnp.bfloat16)
        if getattr(engine, "minu_int8", False):
            minu_des = jnp.clip(jnp.round(
                minu_des.astype(jnp.float32) / MSCALE), -127, 127) \
                .astype(jnp.int8)
        codes = jax.random.randint(ks[1], (chunk, RT, 16), 0, 256,
                                   jnp.int32).astype(jnp.uint8)
        dec = engine._decode(codes)                       # [chunk, RT, D]
        tex_sqnorm = jnp.sum(dec.astype(jnp.float32) ** 2, axis=-1)
        if codes_resident:
            tex_field = dict(tex_codes_t=jnp.swapaxes(codes, 1, 2))
        else:
            if engine.tex_int8:
                dec = jnp.clip(jnp.round(dec.astype(jnp.float32)
                                         / engine._tex_scale_g),
                               -127, 127).astype(jnp.int8)
            tex_field = dict(tex_dec=jnp.swapaxes(dec, 1, 2))
        return dict(
            **tex_field,
            minu_des=minu_des,
            minu_x=jax.random.uniform(ks[2], (chunk, RM), jnp.float32, 24, 488),
            minu_y=jax.random.uniform(ks[3], (chunk, RM), jnp.float32, 24, 488),
            minu_ori=jax.random.uniform(ks[4], (chunk, RM), jnp.float32,
                                        -np.pi, np.pi),
            minu_n=jnp.full((chunk,), RM, jnp.int32),
            tex_sqnorm=tex_sqnorm,
            tex_x=jnp.floor(jax.random.uniform(ks[5], (chunk, RT),
                                               jnp.float32, 0, 30)),
            tex_y=jnp.floor(jax.random.uniform(ks[6], (chunk, RT),
                                               jnp.float32, 0, 30)),
            tex_ori=jax.random.uniform(ks[7], (chunk, RT), jnp.float32,
                                       -np.pi, np.pi),
            tex_n=jnp.full((chunk,), RT, jnp.int32),
        )

    keys = jax.random.split(jax.random.PRNGKey(seed), nchunks)

    # ONE FIELD PER PROGRAM, biggest first: the AOT compiler charges a
    # generation program ~2x its outputs (scan accumulation + result;
    # measured 21.3 GB for an 11.25 GB gallery, and buffer donation is NOT
    # honored through the remote-compile path), so emitting all fields
    # from one program caps single-chip galleries at ~200K. Per-field
    # programs bound the peak at (already-generated fields) + 2x(current
    # field); XLA dead-code-eliminates the untouched outputs of gen_chunk
    # in each specialization.
    import functools as _ft

    shapes = jax.eval_shape(gen_chunk, keys[0])
    order = sorted(shapes, key=lambda k: -(
        np.prod(shapes[k].shape) * shapes[k].dtype.itemsize))

    @_ft.partial(jax.jit, static_argnames=("field",))
    def gen_field(keys, field):
        return jax.lax.map(
            lambda k: gen_chunk(k)[field], keys).reshape(
                (Gpad,) + shapes[field].shape[1:])

    g = {}
    for k in order:
        g[k] = gen_field(keys, field=k)
        jax.block_until_ready(g[k])
    minu_scale = (jnp.full((1,), MSCALE, jnp.float32)
                  if getattr(engine, "minu_int8", False) else None)
    return DeviceGallery(names=[str(i) for i in range(G)], n_real=G,
                         tex_codes=None, minu_scale=minu_scale, **g)


def plant_gallery_entries(gallery, engine, packed_mates, positions):
    """Overwrite gallery rows at ``positions`` with real packed templates
    (e.g. planted mates for rank-parity experiments). ``packed_mates`` is a
    PackedGallery of len(positions) entries; conversion to the engine's
    device layout reuses engine.load_gallery."""
    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp

    # donated scatter: .at[].set() in eager mode copies the (multi-GB)
    # gallery array — donation lets XLA update the buffer in place
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _scatter(big, sm, pos):
        return big.at[pos].set(sm)

    small = engine.load_gallery(packed_mates)
    n = len(positions)
    pos = jnp.asarray(np.asarray(positions, np.int32))
    updates = {}
    for f in dataclasses.fields(gallery):
        name = f.name
        big = getattr(gallery, name)
        sm = getattr(small, name, None)
        if name in ("names", "n_real", "minu_scale") or big is None:
            continue
        if name == "tex_codes_t" and sm is None and small.tex_codes is not None:
            S = big.shape[1]
            sm = jnp.swapaxes(small.tex_codes.reshape(
                small.tex_codes.shape[0], -1, S), 1, 2)
        if sm is None:
            continue
        sm = sm[:n]
        if name == "minu_des" and gallery.minu_scale is not None:
            # requantize the mates into the BIG gallery's int8 scale (the
            # engine applies one global minu_scale at screen/match time)
            sm = jnp.clip(jnp.round(
                sm.astype(jnp.float32) * small.minu_scale[0]
                / gallery.minu_scale[0]), -127, 127)
        sm = sm.astype(big.dtype)
        # pad the per-entry axes up to the big gallery's R capacity
        pads = [(0, 0)] + [(0, b - s) for b, s in zip(big.shape[1:],
                                                      sm.shape[1:])]
        sm = jnp.pad(sm, pads)
        updates[name] = _scatter(big, sm, pos)
    return dataclasses.replace(gallery, **updates)


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
