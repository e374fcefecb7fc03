#!/usr/bin/env python
"""Experiment: screening-score design for screen-then-rerank.

The dense matcher runs the VPU-bound graph filters for every (latent,
gallery) pair; serving only needs exact scores where they matter (the
top-24 rank list, matcher.cpp:305-330). This experiment evaluates cheap
MXU-only screening scores against the exact fused score on a synthetic
gallery with planted mates, measuring for each variant:

  worst_rank(M): the deepest screen-rank of any exact-top-24 entry —
  containment of exact top-24 in screen top-M needs M >= worst_rank.

Variants (per latent, per gallery entry):
  minu  = sum over 3 templates of min(sum_i rowmax+, sum_j colmax+) of the
          mutual-normalized minutiae similarity  (upper bound on s0+s1+s2)
  texS  = sum_i max(bestrow_i, 0)               (upper bound on s_tex)
  texT(tau) = sum_i max(bestrow_i - tau, 0)     (soft-threshold variant)
Combined screens: minu + 0.3 * texX.

Env: EXP_GALLERY (16384), EXP_LATENTS (8), EXP_BLOCK (128).
Run alone - never concurrently with another TPU process.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = int(os.environ.get("EXP_GALLERY", "16384"))
NL = int(os.environ.get("EXP_LATENTS", "8"))
BLOCK = int(os.environ.get("EXP_BLOCK", "128"))
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
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template)

    cb = read_codebook(CODEBOOK)
    rng = np.random.default_rng(11)

    lats_t = [make_latent_template(rng, n_minu=LM, n_tex=LT)
              for _ in range(NL)]
    lats = [pack_latent(t, quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
            for t in lats_t]

    # gallery: random impostors + one mate per latent at spread positions
    print("building gallery...", flush=True)
    mate_pos = [(i * G) // NL + (i * 977) % (G // NL) for i in range(NL)]
    rolled = []
    t0 = time.time()
    for g in range(G):
        if g in mate_pos:
            li = mate_pos.index(g)
            rolled.append(make_rolled_template(
                rng, n_minu=RM, n_tex=RT, mated_latent=lats_t[li],
                codebook=cb))
        else:
            rolled.append(make_rolled_template(rng, n_minu=RM, n_tex=RT))
    print(f"gallery built in {time.time()-t0:.0f}s", flush=True)

    engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16,
                         tex_int8=True)
    packed = pack_gallery(rolled, cb, names=[str(i) for i in range(G)],
                          minu_cap=RM, tex_cap=RT)
    gal = engine.load_gallery(packed)

    # ---- exact dense scores
    t0 = time.time()
    exact = engine.match_scores_batch(lats, gal)
    exact = np.asarray(exact)[:, :G]
    t_exact = time.time() - t0
    print(f"exact dense: {t_exact:.2f}s ({NL/t_exact:.2f} latents/s)",
          flush=True)

    # ---- screening ingredients
    lat_d = engine._latent_dict(lats)
    gal_d = engine._gallery_dict(gal)
    dtype = engine.compute_dtype

    NLl, T, Lm, Dd = lat_d["minu_des"].shape
    lat_minu_valid = (np.arange(Lm)[None, None, :]
                      < np.asarray(lat_d["minu_n"])[:, :, None])
    Lt = lat_d["tex_des"].shape[1]

    @jax.jit
    def screen_blocks(lat, gal):
        B = BLOCK
        Gp = gal["minu_des"].shape[0]
        nb = Gp // B
        x = lat["tex_des"].astype(dtype)
        xsq = jnp.sum(lat["tex_des"].astype(jnp.float32) ** 2, -1)
        mdes = lat["minu_des"].astype(jnp.float32)
        if "minu_scale" in gal:
            mdes = mdes * gal["minu_scale"][0]
        mdes = mdes.astype(dtype)
        mvalid = (jnp.arange(Lm)[None, None, :]
                  < lat["minu_n"][:, :, None]).astype(jnp.float32)
        tvalid = (jnp.arange(Lt)[None, :]
                  < lat["tex_n"][:, None]).astype(jnp.float32)
        x_eff = (lat["tex_des"].astype(jnp.float32)
                 * engine._tex_scale_g).astype(dtype)

        def step(carry, i):
            blk = {k: jax.lax.dynamic_slice_in_dim(v, i * B, B, 0)
                   for k, v in gal.items() if k != "minu_scale"}
            rvalid = (jnp.arange(RM)[None, :]
                      < blk["minu_n"][:, None]).astype(jnp.float32)
            rtval = (jnp.arange(RT)[None, :]
                     < blk["tex_n"][:, None]).astype(jnp.float32)
            # minutiae: [NLl, T, Lm, D] x [B, D, RM] -> [NLl, T, B, Lm, RM]
            sims = jnp.einsum("ntld,bdr->ntblr", mdes, blk["minu_des"],
                              preferred_element_type=jnp.float32)
            sims = jnp.maximum(sims, 0.0)
            sims = sims * mvalid[:, :, None, :, None] \
                * rvalid[None, None, :, None, :]
            # RAW-similarity bound: the exact score sums raw sims of a
            # one-to-one survivor set (weights are raw, matcher.cpp:482),
            # so min(sum row maxima, sum col maxima) is a strict upper bound
            rb_raw = jnp.sum(jnp.max(sims, axis=4), axis=3)
            cb_raw = jnp.sum(jnp.max(sims, axis=3), axis=3)
            minu_bound = jnp.sum(jnp.minimum(rb_raw, cb_raw), axis=1)
            # normalized-rowmax heuristic: selection runs on the mutual-
            # normalized matrix, so this may correlate better (NOT a bound)
            rowsum = jnp.sum(sims, axis=4, keepdims=True)
            colsum = jnp.sum(sims, axis=3, keepdims=True)
            norm = sims / (rowsum + colsum - sims + 1e-9)
            rb = jnp.sum(jnp.max(norm, axis=4), axis=3)     # [NLl, T, B]
            cbnd = jnp.sum(jnp.max(norm, axis=3), axis=3)
            minu_norm = jnp.sum(jnp.minimum(rb, cbnd), axis=1)  # [NLl, B]

            best, _ = pk.fused_adc_rowmax(
                x_eff, xsq, blk["tex_dec"], blk["tex_sqnorm"], rtval)
            best = jnp.where(tvalid[:, None, :] > 0, best, pk.NEG_BIG)
            texS = jnp.sum(jnp.maximum(best, 0.0), axis=2)
            texT = [jnp.sum(jnp.maximum(best - tau, 0.0), axis=2)
                    for tau in (1.0, 2.0, 3.0, 4.0)]
            return carry, (minu_bound, minu_norm, texS, *texT)

        _, outs = jax.lax.scan(step, 0.0, jnp.arange(nb))
        # [nb, NLl, B] -> [NLl, G]
        return [jnp.swapaxes(o, 0, 1).reshape(NLl, nb * B) for o in outs]

    t0 = time.time()
    outs = screen_blocks(lat_d, gal_d)
    outs = [np.asarray(o)[:, :G] for o in outs]
    t_screen = time.time() - t0
    print(f"screen ingredients: {t_screen:.2f}s", flush=True)
    minu_b, minu_n, texS, tT1, tT2, tT3, tT4 = outs

    variants = {
        "minu_bound": minu_b,
        "minu_norm": minu_n,
        "tex_only_S": texS,
        "bound_S": minu_b + 0.3 * texS,       # strict upper bound on exact
        "bound_T1": minu_b + 0.3 * tT1,
        "bound_T2": minu_b + 0.3 * tT2,
        "bound_T3": minu_b + 0.3 * tT3,
        "norm_T2": minu_n + 0.3 * tT2,
        "norm_T3": minu_n + 0.3 * tT3,
        "norm_T4": minu_n + 0.3 * tT4,
        "T3_only": tT3,
    }

    report = {"config": {"G": G, "NL": NL, "t_exact_s": round(t_exact, 3)},
              "variants": {}}
    for name, s in variants.items():
        worst24 = []
        mate_rank = []
        margin24 = []
        for li in range(NL):
            ex_order = np.argsort(-exact[li], kind="stable")
            top24 = ex_order[:24]
            sc_rank = np.empty(G, np.int64)
            sc_rank[np.argsort(-s[li], kind="stable")] = np.arange(G)
            worst24.append(int(sc_rank[top24].max()) + 1)
            mate_rank.append(int(sc_rank[mate_pos[li]]) + 1)
            # upper-bound check: screen >= exact (only meaningful for S)
            margin24.append(float((s[li] - exact[li]).min()))
        report["variants"][name] = {
            "worst_screen_rank_of_top24": worst24,
            "mate_screen_rank": mate_rank,
            "min_screen_minus_exact": round(min(margin24), 3),
        }
        print(f"{name:14s} worst24={worst24} mate={mate_rank}", flush=True)

    with open("/tmp/exp_screen.json", "w") as f:
        json.dump(report, f, indent=1)
    np.savez("/tmp/exp_screen_raw.npz", exact=exact,
             mate_pos=np.array(mate_pos),
             **{k: v for k, v in variants.items()})
    print("wrote /tmp/exp_screen.json + raw npz")


if __name__ == "__main__":
    sys.exit(main())
# (analysis rerun appends raw arrays for threshold-certification stats)
