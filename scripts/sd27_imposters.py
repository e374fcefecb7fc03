#!/usr/bin/env python
"""SD27 acceptance at gallery scale: mates + N synthetic imposters.

A 3-entry gallery makes rank-1 nearly meaningless (VERDICT r2); the
reference's published context is a 100K-gallery search. This script takes
the templates produced by scripts/run_sd27.py (--out dir) and matches each
latent against the 3 real mates PLUS ``--imposters`` synthetic rolled
templates, reporting the mate's rank in that gallery.

Usage: python scripts/sd27_imposters.py --templates /tmp/sd27 [--cpu]
       [--imposters 500] [--record]
--record writes results/sd27/imposter_ranks.txt (the committed artifact).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLES = ["good", "bad", "ugly"]
CODEBOOK = ("/root/reference/matching/"
            "codebook_EmbeddingSize_96_stride_16_subdim_6.dat")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--templates", default="/tmp/sd27",
                   help="run_sd27.py --out dir holding the 6 .dat files")
    p.add_argument("--imposters", type=int, default=500)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--record", action="store_true")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.templates import read_codebook, read_final_template
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent
    from msu_latentafis_tpu.utils.synthetic import make_rolled_template

    codebook = read_codebook(CODEBOOK)
    rng = np.random.default_rng(1234)

    gallery, names = [], []
    for name in SAMPLES:
        t = read_final_template(
            os.path.join(args.templates, f"{name}_rolled.dat"), kind="rolled")
        gallery.append(t)
        names.append(f"{name}_rolled")
    # imposters shaped like real enrollments (~150 minutiae, ~900 virtual)
    for i in range(args.imposters):
        gallery.append(make_rolled_template(rng, n_minu=150, n_tex=900))
        names.append(f"imposter_{i:04d}")

    engine = MatchEngine(codebook, block_size=64)
    packed = pack_gallery(gallery, codebook, names=names)
    dev_gal = engine.load_gallery(packed)

    lines = []
    for name in SAMPLES:
        t = read_final_template(
            os.path.join(args.templates, f"{name}_latent.dat"), kind="latent")
        if not t.minu_template and not t.texture_template:
            lines.append(f"{name}_latent  EMPTY template")
            continue
        lat = pack_latent(t, quantize_tex_xy=False)
        res = engine.one_to_list(lat, dev_gal)
        order = [n for n, _ in res.ranked()]
        mate_rank = order.index(f"{name}_rolled") + 1
        top1 = res.ranked(1)[0]
        mate_score = float(res.scores[names.index(f"{name}_rolled")])
        imp_scores = res.scores[3:]
        line = (f"{name}_latent  mate_rank={mate_rank}/{len(names)}  "
                f"mate_score={mate_score:.3f}  "
                f"rank1={top1[0]}({top1[1]:.3f})  "
                f"imposter_max={imp_scores.max():.3f} "
                f"imposter_mean={imp_scores.mean():.3f}")
        print(line, flush=True)
        lines.append(line)

    out = os.path.join(args.templates, "imposter_ranks.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    if args.record:
        repo_res = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "sd27")
        os.makedirs(repo_res, exist_ok=True)
        with open(os.path.join(repo_res, "imposter_ranks.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    sys.exit(main())
