#!/usr/bin/env python
"""~60 s TPU smoke: run the matcher's Pallas kernels at BENCH SHAPES
(B=128, Lm=64, Lt=Rt=448, NL=8) against a tiny gallery on the real chip.

This is the pre-commit ritual for any `matcher/pallas_kernels.py` change:
interpret-mode tests skip Mosaic lowering AND the chip's physical VMEM
bound, so only an on-hardware run proves the production path still exists
(the round-2 regression shipped green on CPU and crashed bench.py).

Exit 0 = kernels compiled, ran, and produced finite scores.
Usage: python scripts/tpu_smoke.py  [SMOKE_GALLERY=512]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from msu_latentafis_tpu.matcher.engine import DeviceGallery, MatchEngine
    from msu_latentafis_tpu.templates import read_codebook
    from msu_latentafis_tpu.templates.packing import pack_latent
    from msu_latentafis_tpu.utils.synthetic import make_latent_template

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)
    if backend == "cpu":
        print("WARNING: running on CPU — this does NOT validate the chip")

    G = int(os.environ.get("SMOKE_GALLERY", "512"))
    NL, BLOCK = 8, 128
    RM, RT, LM, LT, D = 96, 448, 64, 448, 96
    CODEBOOK = ("/root/reference/matching/"
                "codebook_EmbeddingSize_96_stride_16_subdim_6.dat")

    cb = read_codebook(CODEBOOK)
    engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16,
                         tex_int8=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    minu_des = jax.random.normal(ks[0], (G, D, RM), jnp.bfloat16)
    norm = jnp.sqrt(jnp.sum(minu_des.astype(jnp.float32) ** 2, 1,
                            keepdims=True)) + 1e-6
    minu_des = (minu_des / norm * 1.73).astype(jnp.bfloat16)
    codes = jax.random.randint(ks[1], (G, RT, 16), 0, 256,
                               jnp.int32).astype(jnp.uint8)
    dec = engine._decode(codes)
    tex_sqnorm = jnp.sum(dec.astype(jnp.float32) ** 2, axis=-1)
    dec = jnp.clip(jnp.round(dec.astype(jnp.float32) / engine._tex_scale_g),
                   -127, 127).astype(jnp.int8)
    g = dict(
        minu_des=minu_des,
        minu_x=jax.random.uniform(ks[2], (G, RM), jnp.float32, 24, 488),
        minu_y=jax.random.uniform(ks[3], (G, RM), jnp.float32, 24, 488),
        minu_ori=jax.random.uniform(ks[4], (G, RM), jnp.float32,
                                    -np.pi, np.pi),
        minu_n=jnp.full((G,), RM, jnp.int32),
        tex_dec=jnp.swapaxes(dec, 1, 2), tex_sqnorm=tex_sqnorm,
        tex_x=jnp.floor(jax.random.uniform(ks[5], (G, RT), jnp.float32, 0, 30)),
        tex_y=jnp.floor(jax.random.uniform(ks[6], (G, RT), jnp.float32, 0, 30)),
        tex_ori=jax.random.uniform(ks[7], (G, RT), jnp.float32, -np.pi, np.pi),
        tex_n=jnp.full((G,), RT, jnp.int32),
    )
    gallery = DeviceGallery(names=[str(i) for i in range(G)], n_real=G,
                            tex_codes=None, **g)

    rng = np.random.default_rng(7)
    lats = [pack_latent(make_latent_template(rng, n_minu=LM, n_tex=LT),
                        quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
            for _ in range(NL)]

    t0 = time.time()
    r = engine.match_scores_batch(lats, gallery)
    # CLAUDE.md: block_until_ready is unreliable through the tunnel — force
    # a value readback
    s = float(np.asarray(r[0, :4]).sum())
    t_first = time.time() - t0
    t0 = time.time()
    r = engine.match_scores_batch(lats, gallery)
    s2 = float(np.asarray(r[:, :4]).sum())
    t_steady = time.time() - t0

    arr = np.asarray(r)
    assert np.isfinite(arr).all(), "non-finite scores"
    assert (arr > 0).any(), "all-zero scores"
    pairs_per_s = NL * G / t_steady
    print(f"SMOKE OK  first={t_first:.1f}s (compile) steady={t_steady:.3f}s "
          f"({pairs_per_s:,.0f} pairs/s)  score_sample={s:.3f}/{s2:.3f}",
          flush=True)

    # serving path: screen + rerank kernels on the chip
    t0 = time.time()
    idx, exact, margin, thr = engine.match_scores_batch_reranked(
        lats, gallery, m=256)
    t_first = time.time() - t0
    t0 = time.time()
    idx, exact, margin, thr = engine.match_scores_batch_reranked(
        lats, gallery, m=256)
    t_steady = time.time() - t0
    assert np.isfinite(exact).all()
    print(f"SMOKE RERANK OK  first={t_first:.1f}s steady={t_steady:.3f}s  "
          f"thr={np.round(thr, 2).tolist()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
