#!/usr/bin/env python
"""Serving-vs-dense rank parity at 100K (VERDICT r3 #3).

Matches N latents against a 100K synthetic gallery with planted mates in
BOTH modes on identical data:
  - dense exact (match_scores_batch: full VPU graph-filter path), and
  - serving (match_scores_batch_reranked, m=512: MXU screen + exact rerank
    of the survivors) — the same mode as bench.py's headline,

and reports, per latent: the mate's rank in each mode, top-24 SET overlap,
top-24 ORDER agreement, and the serving margin diagnostics. This is the
empirical certification of the serving mode: the reference's output IS the
top-24 rank list (matcher.cpp:305-330), so "serving == dense on the
top-24" is exactly the property that matters.

--record writes results/rank_parity_100k.json (the committed artifact).
Run alone (single TPU tunnel). ~2 min of chip time after compiles.

Env: PARITY_GALLERY (100000), PARITY_LATENTS (8), PARITY_BLOCK (512),
PARITY_RERANK (512), PARITY_SHAPES=448|cap (default 448).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODEBOOK = ("/root/reference/matching/"
            "codebook_EmbeddingSize_96_stride_16_subdim_6.dat")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--record", action="store_true")
    args = p.parse_args()

    G = int(os.environ.get("PARITY_GALLERY", "100000"))
    NL = int(os.environ.get("PARITY_LATENTS", "8"))
    BLOCK = int(os.environ.get("PARITY_BLOCK", "512"))
    M = int(os.environ.get("PARITY_RERANK", "256"))
    cap = os.environ.get("PARITY_SHAPES", "448") == "cap"
    RM, RT, LM, LT = (128, 1000, 128, 1000) if cap else (96, 448, 64, 448)

    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates import read_codebook
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import (
        device_synthetic_gallery, make_latent_template, make_rolled_template,
        plant_gallery_entries)

    cb = read_codebook(CODEBOOK)
    rng = np.random.default_rng(23)

    # bench.py headline config: bf16 compute; cap shapes use codes-resident
    # int8-minutiae (HBM), 448 uses pre-decoded int8 textures
    engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16,
                         tex_int8=not cap, minu_int8=cap,
                         codes_resident=cap)

    lats_t = [make_latent_template(rng, n_minu=LM, n_tex=LT)
              for _ in range(NL)]
    lats = [pack_latent(t, quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
            for t in lats_t]

    print(f"gallery G={G} shapes Rm={RM},Rt={RT}...", flush=True)
    gal = device_synthetic_gallery(engine, G, n_minu=RM, n_tex=RT,
                                   codes_resident=cap, seed=3)
    mate_pos = [(i * G) // NL + (i * 977) % (G // NL) for i in range(NL)]
    mates = [make_rolled_template(rng, n_minu=RM, n_tex=RT,
                                  mated_latent=lats_t[i], codebook=cb)
             for i in range(NL)]
    packed_mates = pack_gallery(mates, cb, names=[f"mate{i}" for i in
                                                  range(NL)],
                                minu_cap=RM, tex_cap=RT)
    gal = plant_gallery_entries(gal, engine, packed_mates, mate_pos)

    print("dense exact pass...", flush=True)
    t0 = time.time()
    dense = np.asarray(engine.match_scores_batch(lats, gal))[:, :G]
    float(dense[0, :4].sum())
    dense_s = time.time() - t0
    print(f"dense: {dense_s:.1f}s", flush=True)

    PK = int(os.environ.get("PARITY_PRESCREEN", "256"))
    PLT = int(os.environ.get("PARITY_PRESCREEN_LT", "64"))
    PT = int(os.environ.get("PARITY_PRESCREEN_T", "1"))
    # warm-up (compile) pass so serving_seconds is steady-state, not
    # first-call compile (VERDICT r4 weak #2)
    engine.match_scores_batch_reranked(
        lats, gal, m=M, prescreen_k=PK, prescreen_lt=PLT, prescreen_t=PT)
    t0 = time.time()
    idx, exact, margin, thr = engine.match_scores_batch_reranked(
        lats, gal, m=M, prescreen_k=PK, prescreen_lt=PLT, prescreen_t=PT)
    float(np.asarray(exact)[0, :4].sum())
    serve_s = time.time() - t0
    print(f"serving (steady-state): {serve_s:.1f}s", flush=True)

    results = {"config": {
        "G": G, "latents": NL, "block": BLOCK, "rerank_m": M,
        "prescreen": {"k": PK, "lt": PLT, "t": PT},
        "shapes": {"Rm": RM, "Rt": RT, "Lm": LM, "Lt": LT},
        "engine": ("bf16 + codes-resident + int8 minu" if cap
                   else "bf16 + int8 predecoded tex"),
        "dense_seconds": round(dense_s, 2),
        "serving_seconds": round(serve_s, 2)},
        "latents": []}
    all_set24 = all_order24 = all_mate = True
    for i in range(NL):
        d_order = np.argsort(-dense[i], kind="stable")
        d_top24 = d_order[:24]
        # serving rank list: exact scores of the top-m screened candidates
        srt = np.argsort(-np.asarray(exact[i]), kind="stable")
        s_top24_idx = np.asarray(idx[i])[srt[:24]]
        mate_rank_dense = int(np.where(d_order == mate_pos[i])[0][0]) + 1
        in_serve = np.where(np.asarray(idx[i])[srt] == mate_pos[i])[0]
        mate_rank_serve = int(in_serve[0]) + 1 if len(in_serve) else -1
        set_agree = len(set(d_top24) & set(s_top24_idx))
        order_agree = int(np.sum(d_top24 == s_top24_idx))
        all_set24 &= set_agree == 24
        all_order24 &= order_agree == 24
        all_mate &= mate_rank_dense == 1 and mate_rank_serve == 1
        # score-level parity: the dense top-24 beyond the mate are
        # iid-noise impostors (the engine docstring's "ranks 2-24" point),
        # so SET equality is not achievable by any sub-exact screen; what
        # matters is that serving's candidate list is as strong as
        # dense's. Compare the sorted exact-score vectors of both top-24s.
        d_scores24 = np.sort(dense[i][d_top24])[::-1]
        s_scores24 = np.sort(np.asarray(exact[i])[srt[:24]])[::-1]
        results["latents"].append({
            "mate_rank_dense": mate_rank_dense,
            "mate_rank_serving": mate_rank_serve,
            "top24_set_overlap": set_agree,
            "top24_order_agreement": order_agree,
            "top24_score_gap_max": round(float(
                np.max(np.abs(d_scores24 - s_scores24))), 3),
            "dense_24th_score": round(float(d_scores24[-1]), 3),
            "serving_24th_score": round(float(s_scores24[-1]), 3),
            "mate_score": round(float(dense[i, mate_pos[i]]), 3),
            "best_impostor": round(float(np.max(
                np.delete(dense[i], mate_pos[i]))), 3),
            "containment_margin": round(float(margin[i]), 3)})
        print(json.dumps(results["latents"][-1]), flush=True)
    gaps = [r["top24_score_gap_max"] for r in results["latents"]]
    results["summary"] = {
        "all_top24_sets_equal": bool(all_set24),
        "all_top24_orders_equal": bool(all_order24),
        "all_mates_rank1_both_modes": bool(all_mate),
        "max_top24_score_gap": max(gaps) if gaps else None,
        "note": ("dense ranks 2-24 are iid-noise impostors on this "
                 "synthetic gallery; serving is equivalent when the "
                 "mate parity holds and the sorted top-24 exact-score "
                 "vectors match to noise level")}
    print(json.dumps(results["summary"]))

    out = os.path.join(REPO, "results",
                       "rank_parity_100k_cap.json" if cap
                       else "rank_parity_100k.json")
    if args.record:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
