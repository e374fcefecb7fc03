#!/usr/bin/env python
"""Ablation profile of the match step on the real chip.

Times the full engine step and variants with stages stubbed out (the stubs
keep upstream operands alive where noted, so XLA cannot dead-code the stage
being measured). Subtraction gives a per-stage cost breakdown:

  full      - everything
  nominu    - fused_minutiae_match stubbed by a cheap reduce that still
              consumes the descriptor tiles (isolates the whole minutiae
              kernel: similarity + selection + filter)
  notex     - fused_texture_match stubbed (isolates texture selection +
              filter; the ADC row-max kernel stays)
  core      - both stubbed: ADC kernel + block slicing + scan machinery
  noadc     - all three stubbed: block slicing + scan machinery only
              (core - noadc isolates the ADC row-max kernel)

Env: PROF_GALLERY (default 16384), PROF_LATENTS (8), PROF_BLOCK (512).
Run alone — never concurrently with another TPU process.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = int(os.environ.get("PROF_GALLERY", "16384"))
NL = int(os.environ.get("PROF_LATENTS", "8"))
BLOCK = int(os.environ.get("PROF_BLOCK", "512"))
RM, RT, LM, LT, D = 96, 448, 64, 448, 96
CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"


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

    real_minu = pk.fused_minutiae_match
    real_tex = pk.fused_texture_match

    def fake_minu(lat_des, lvalid, rol_des_t, rvalid, lpackT, rpackT, **kw):
        a = jnp.sum(lat_des.astype(jnp.float32), axis=(1, 2))
        b = jnp.sum(rol_des_t.astype(jnp.float32), axis=(1, 2))
        return (a[:, None] + b[None, :]) * 1e-30

    def fake_tex(best, bestj, lvalidf, lpackT, rpackT, **kw):
        return jnp.sum(best, axis=2) * 1e-30

    real_adc = pk.fused_adc_rowmax

    def fake_adc(x, lsq, dect, rsq, rva, **kw):
        NL, Lt, D = x.shape
        B = dect.shape[0]
        xs = jnp.sum(x.astype(jnp.float32), 2)             # [NL, Lt]
        ds = jnp.sum(dect.astype(jnp.float32), (1, 2))     # [B]
        best = xs[:, None, :] * 1e-30 + ds[None, :, None] * 1e-30
        return best, jnp.zeros(best.shape, jnp.int32)

    def make_gallery(engine):
        chunk = 4096
        nchunks = (max(G, chunk) + chunk - 1) // chunk
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
            if engine.tex_int8:
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
                tex_x=jnp.floor(jax.random.uniform(ks[5], (chunk, RT), jnp.float32, 0, 30)),
                tex_y=jnp.floor(jax.random.uniform(ks[6], (chunk, RT), jnp.float32, 0, 30)),
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
        return DeviceGallery(names=[str(i) for i in range(G)], n_real=G,
                             tex_codes=None, **g)

    rng = np.random.default_rng(7)

    def run(tag):
        engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16,
                             tex_int8=True)
        gallery = make_gallery(engine)
        warm = [pack_latent(make_latent_template(rng, n_minu=LM, n_tex=LT),
                            quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
                for _ in range(NL)]
        batch = [pack_latent(make_latent_template(rng, n_minu=LM, n_tex=LT),
                             quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
                 for _ in range(NL)]
        r = engine.match_scores_batch(warm, gallery)
        float(np.asarray(r[0, 0]))
        t0 = time.time()
        r = engine.match_scores_batch(batch, gallery)
        float(np.asarray(r[0, :4]).sum())
        dt = time.time() - t0
        print(json.dumps({"variant": tag, "s": round(dt, 4),
                          "latents_per_s": round(NL / dt, 3)}), flush=True)
        del engine, gallery
        return dt

    results = {}
    results["full"] = run("full")
    pk.fused_minutiae_match = fake_minu
    results["nominu"] = run("nominu")
    pk.fused_texture_match = fake_tex
    results["core"] = run("core")
    pk.fused_adc_rowmax = fake_adc
    results["noadc"] = run("noadc")
    pk.fused_adc_rowmax = real_adc
    pk.fused_minutiae_match = real_minu
    results["notex"] = run("notex")
    pk.fused_texture_match = real_tex

    print(json.dumps({
        "minu_kernel_s": round(results["full"] - results["nominu"], 4),
        "tex_kernel_s": round(results["full"] - results["notex"], 4),
        "core_s": round(results["core"], 4),
        "adc_s": round(results["core"] - results["noadc"], 4),
        "scan_s": round(results["noadc"], 4),
    }))


if __name__ == "__main__":
    main()
