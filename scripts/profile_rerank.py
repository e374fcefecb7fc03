#!/usr/bin/env python
"""Phase profile of the screen+rerank serving path on the real chip.

Phases measured at bench config (default G=100K, NL=8, BLOCK=512 —
the bench.py headline block, VERDICT r3 #5):
  screen     - engine.screen_scores_batch (minu screen + ADC screen scan)
  full       - engine.match_scores_batch_reranked (screen + top-k + rerank)
  topk+rerank = full - screen
Plus standalone per-block kernel rates for the two screening kernels.

Writes PROFILE_r05.json at the repo root.
Run alone - never concurrently with another TPU process.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = int(os.environ.get("PROF_GALLERY", "100000"))
NL = int(os.environ.get("PROF_LATENTS", "8"))
BLOCK = int(os.environ.get("PROF_BLOCK", "512"))  # bench.py headline block
M = int(os.environ.get("PROF_RERANK", "512"))
RM, RT, LM, LT, D = 96, 448, 64, 448, 96
CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher import pallas_kernels as pk
    from msu_latentafis_tpu.matcher.engine import DeviceGallery, MatchEngine
    from msu_latentafis_tpu.templates import read_codebook
    from msu_latentafis_tpu.templates.packing import pack_latent
    from msu_latentafis_tpu.utils.synthetic import make_latent_template

    cb = read_codebook(CODEBOOK)
    engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16,
                         tex_int8=True)

    # device-side synthetic gallery (bench.py's generator)
    Gpad = ((G + BLOCK - 1) // BLOCK) * BLOCK
    chunk = 4096
    nchunks = (Gpad + chunk - 1) // chunk
    Gpad = nchunks * chunk

    def gen_chunk(key):
        ks = jax.random.split(key, 8)
        minu_des = jax.random.normal(ks[0], (chunk, D, RM), jnp.bfloat16)
        norm = jnp.sqrt(jnp.sum(minu_des.astype(jnp.float32) ** 2, 1,
                                keepdims=True)) + 1e-6
        minu_des = (minu_des / norm * 1.73).astype(jnp.bfloat16)
        codes = jax.random.randint(ks[1], (chunk, RT, 16), 0, 256,
                                   jnp.int32).astype(jnp.uint8)
        dec = engine._decode(codes)
        tex_sqnorm = jnp.sum(dec.astype(jnp.float32) ** 2, axis=-1)
        dec = jnp.clip(jnp.round(dec.astype(jnp.float32)
                                 / engine._tex_scale_g),
                       -127, 127).astype(jnp.int8)
        return dict(
            minu_des=minu_des,
            minu_x=jax.random.uniform(ks[2], (chunk, RM), jnp.float32, 24, 488),
            minu_y=jax.random.uniform(ks[3], (chunk, RM), jnp.float32, 24, 488),
            minu_ori=jax.random.uniform(ks[4], (chunk, RM), jnp.float32,
                                        -np.pi, np.pi),
            minu_n=jnp.full((chunk,), RM, jnp.int32),
            tex_dec=jnp.swapaxes(dec, 1, 2), tex_sqnorm=tex_sqnorm,
            tex_x=jnp.floor(jax.random.uniform(ks[5], (chunk, RT),
                                               jnp.float32, 0, 30)),
            tex_y=jnp.floor(jax.random.uniform(ks[6], (chunk, RT),
                                               jnp.float32, 0, 30)),
            tex_ori=jax.random.uniform(ks[7], (chunk, RT), jnp.float32,
                                       -np.pi, np.pi),
            tex_n=jnp.full((chunk,), RT, jnp.int32),
        )

    keys = jax.random.split(jax.random.PRNGKey(0), nchunks)

    @jax.jit
    def gen_all(keys):
        out = jax.lax.map(gen_chunk, keys)
        return {k: v.reshape((Gpad,) + v.shape[2:]) for k, v in out.items()}

    g = gen_all(keys)
    jax.block_until_ready(g["minu_des"])
    gallery = DeviceGallery(names=[str(i) for i in range(G)], n_real=G,
                            tex_codes=None, **g)

    rng = np.random.default_rng(7)
    lats = [pack_latent(make_latent_template(rng, n_minu=LM, n_tex=LT),
                        quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
            for _ in range(NL)]

    def timed(fn, reps=3):
        fn()                                   # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    t_full = timed(lambda: engine.match_scores_batch_reranked(
        lats, gallery, m=M))
    t_screen = timed(lambda: float(np.asarray(
        engine.screen_scores_batch(lats, gallery)[:, :8]).sum()))

    # standalone kernel rates at one block
    blk = {k: v[:512] for k, v in engine._gallery_dict(gallery).items()}
    lat_d = engine._latent_dict(lats)
    x_eff = (jnp.asarray(lat_d["tex_des"], jnp.float32)
             * engine._tex_scale_g).astype(jnp.bfloat16)
    xsq = jnp.sum(jnp.asarray(lat_d["tex_des"], jnp.float32) ** 2, -1)
    lval = (np.arange(LT)[None, :]
            < np.asarray(lat_d["tex_n"])[:, None]).astype(np.float32)
    rtval = jnp.ones((512, RT), jnp.float32)
    mval = np.ones((NL * 3, LM), np.float32)

    @jax.jit
    def adc_many(x, sq, lv, dect, rsq, rv):
        def step(c, _):
            s = pk.fused_adc_screen(x, sq, lv, dect, rsq, rv)
            return c + jnp.sum(s), None
        s, _ = jax.lax.scan(step, 0.0, None, length=8)
        return s

    @jax.jit
    def minu_many(ld, lv, rd, rv):
        def step(c, _):
            s = pk.fused_minu_screen(ld, lv, rd, rv)
            return c + jnp.sum(s), None
        s, _ = jax.lax.scan(step, 0.0, None, length=8)
        return s

    t_adc = timed(lambda: float(np.asarray(adc_many(
        x_eff, xsq, jnp.asarray(lval), blk["tex_dec"], blk["tex_sqnorm"],
        rtval))))
    # block sweep for the ADC rate (VERDICT r4 weak #6: CLAUDE.md's
    # "46-60 TFLOP/s at block >= 512" vs PROFILE_r04's 32.58 at 512 —
    # re-measured here amortized, several block sizes, min-of-3)
    adc_by_block = {}
    gd_full = engine._gallery_dict(gallery)
    for BB in (512, 1024, 2048):
        blkB = {k: v[:BB] for k, v in gd_full.items()}
        rtvalB = jnp.ones((BB, RT), jnp.float32)
        tB = timed(lambda: float(np.asarray(adc_many(
            x_eff, xsq, jnp.asarray(lval), blkB["tex_dec"],
            blkB["tex_sqnorm"], rtvalB))))
        adc_by_block[str(BB)] = round(
            NL * BB * 8 * 2 * LT * D * RT / tB / 1e12, 2)
    t_minu = timed(lambda: float(np.asarray(minu_many(
        jnp.asarray(lat_d["minu_des"], jnp.bfloat16).reshape(NL * 3, LM, D),
        jnp.asarray(mval), blk["minu_des"],
        jnp.ones((512, RM), jnp.float32)))))

    adc_pairs = NL * 512 * 8
    minu_pairs = NL * 3 * 512 * 8
    out = {
        "config": {"gallery": G, "latents": NL, "block": BLOCK, "m": M,
                   "shapes": {"Rm": RM, "Rt": RT, "Lm": LM, "Lt": LT, "D": D},
                   "source": "scripts/profile_rerank.py, v5e 1 chip, "
                             "bf16+int8 tex, serving path"},
        "full_s": round(t_full, 4),
        "latents_per_s": round(NL / t_full, 3),
        "breakdown_s": {
            "screen_scan": round(t_screen, 4),
            "topk_gather_rerank": round(t_full - t_screen, 4),
        },
        "kernel_rates": {
            "adc_screen_pairs_per_s": round(adc_pairs / t_adc),
            "adc_screen_tflops": round(adc_pairs * 2 * LT * D * RT
                                       / t_adc / 1e12, 2),
            "adc_screen_tflops_by_block": adc_by_block,
            "minu_screen_pairs_per_s": round(minu_pairs / t_minu),
            "minu_screen_tflops": round(minu_pairs * 2 * LM * D * RM
                                        / t_minu / 1e12, 2),
        },
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "PROFILE_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
