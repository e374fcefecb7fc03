#!/usr/bin/env python
"""End-to-end SD27 sample run (BASELINE config 1 skeleton).

Extracts the three sample latents and their rolled mates from the reference
repo's sample_data with trained stand-in models, writes final ``.dat``
templates, matches each latent against the 3-mate gallery, and reports the
rank table next to the reference's published ranks
(/root/reference/sample_data/sample_scores.txt).

The reference's pretrained weights are external downloads that don't ship
with its repo, so absolute score parity is not reproducible by anyone from
the repos alone; this run demonstrates the full pipeline wiring with
synthetic-data stand-ins. Usage:

    python scripts/run_sd27.py [--ckpt checkpoints/standin] [--out /tmp/sd27]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLES = ["good", "bad", "ugly"]
SAMPLE_DIR = "/root/reference/sample_data"
CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"


def load_bundle(ckpt_root):
    import jax
    from msu_latentafis_tpu.pipeline.models_bundle import ModelBundle, _try_restore
    bundle = ModelBundle.initialize()
    if ckpt_root and os.path.isdir(ckpt_root):
        bundle.enhancement_vars = _try_restore(
            os.path.join(ckpt_root, "enhancement"), bundle.enhancement_vars)
        bundle.minutiae_vars[0] = _try_restore(
            os.path.join(ckpt_root, "minutiae_stft"), bundle.minutiae_vars[0])
        bundle.minutiae_vars[1] = _try_restore(
            os.path.join(ckpt_root, "minutiae"), bundle.minutiae_vars[1])
        bundle.minutiae_vars[2] = _try_restore(
            os.path.join(ckpt_root, "minutiae64"), bundle.minutiae_vars[2])
        for i, pt in enumerate(bundle.patch_types):
            bundle.descriptor_vars[i] = _try_restore(
                os.path.join(ckpt_root, f"descriptor_patch{pt}"),
                bundle.descriptor_vars[i])
        bundle.compnet_vars = _try_restore(
            os.path.join(ckpt_root, "compnet"), bundle.compnet_vars)
    return bundle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/standin")
    p.add_argument("--out", default="/tmp/sd27")
    p.add_argument("--record", action="store_true",
                   help="overwrite the committed results/sd27/results.txt "
                        "acceptance artifact with this run's outcome")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leaves the TPU tunnel free; "
                        "the 6-image run is host-feasible)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import imageio.v2 as imageio
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.engine import MatchEngine
    from msu_latentafis_tpu.ops.pq import pq_encode
    from msu_latentafis_tpu.pipeline import (LatentFeatureExtractor,
                                             RolledFeatureExtractor)
    from msu_latentafis_tpu.pipeline.postprocess import compress_template
    from msu_latentafis_tpu.templates import (read_codebook,
                                              read_final_template,
                                              write_final_latent_template,
                                              write_final_rolled_pq_template)
    from msu_latentafis_tpu.templates.packing import pack_gallery, pack_latent

    os.makedirs(args.out, exist_ok=True)
    bundle = load_bundle(args.ckpt)
    codebook = read_codebook(CODEBOOK)

    rolled_x = RolledFeatureExtractor(models=bundle)
    latent_x = LatentFeatureExtractor(models=bundle)

    # --- enroll rolled mates
    for name in SAMPLES:
        out = os.path.join(args.out, f"{name}_rolled.dat")
        if os.path.exists(out):
            continue
        t0 = time.time()
        img = np.asarray(imageio.imread(
            os.path.join(SAMPLE_DIR, f"{name}_rolled.bmp")), np.float64)
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114])
        t = rolled_x.extract(img)
        compress_template(bundle, t)
        if t.texture_template and t.texture_template[0].des is not None \
                and len(t.texture_template[0].des):
            t.texture_template[0].des = pq_encode(
                np.asarray(t.texture_template[0].des, np.float32), codebook)
        write_final_rolled_pq_template(out, t)
        print(f"enrolled {name}_rolled in {time.time()-t0:.1f}s "
              f"(minutiae: {t.minu_template[0].n_minutiae if t.minu_template else 0}, "
              f"virtual: {t.texture_template[0].n_minutiae if t.texture_template else 0})")

    # --- extract latents
    diags = {}
    for name in SAMPLES:
        out = os.path.join(args.out, f"{name}_latent.dat")
        if os.path.exists(out):
            continue
        t0 = time.time()
        img = np.asarray(imageio.imread(
            os.path.join(SAMPLE_DIR, f"{name}_latent.bmp")), np.float64)
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114])
        t = latent_x.extract(img)
        compress_template(bundle, t)
        write_final_latent_template(out, t)
        n_t = len(t.minu_template) if t else 0
        print(f"extracted {name}_latent in {time.time()-t0:.1f}s "
              f"({n_t} minutiae templates) timings={latent_x.timings}")
        diags[f"{name}_latent"] = dict(latent_x.diag)

    # --- match each latent vs the 3-rolled gallery
    gallery_names = [f"{n}_rolled" for n in SAMPLES]
    gallery = [read_final_template(os.path.join(args.out, g + ".dat"),
                                   kind="rolled") for g in gallery_names]
    packed_gal = pack_gallery(gallery, codebook, names=gallery_names)
    engine = MatchEngine(codebook, block_size=2)
    dev_gal = engine.load_gallery(packed_gal)

    print("\nLatent    Rank-1 candidate   Scores (vs good/bad/ugly rolled)")
    lines = []
    for name in SAMPLES:
        t = read_final_template(os.path.join(args.out, f"{name}_latent.dat"),
                                kind="latent")
        if not t.minu_template and not t.texture_template:
            print(f"{name}_latent: EMPTY template")
            continue
        lat = pack_latent(t, quantize_tex_xy=False)
        res = engine.one_to_list(lat, dev_gal)
        rank1 = res.ranked(1)[0]
        mate_rank = [n for n, _ in res.ranked()].index(f"{name}_rolled") + 1
        line = (f"{name}_latent  rank1={rank1[0]}({rank1[1]:.3f})  "
                f"mate_rank={mate_rank}  scores={np.round(res.scores, 3).tolist()}")
        print(line)
        lines.append(line)
        # per-stage attribution: unfused component scores vs the mate plus
        # template-shape facts (a 0.0 mate score -> which stage was empty)
        mate_t = gallery[gallery_names.index(f"{name}_rolled")]
        comp = engine.one_to_one_all_templates(t, mate_t)
        n_m = len(t.minu_template)
        d = diags.setdefault(f"{name}_latent", {})
        d["mate_minu_template_scores_selected"] = \
            [round(float(comp[i]), 3) for i in (26, 2, 11) if i < n_m]
        d["mate_texture_score"] = (round(float(comp[n_m]), 3)
                                   if len(comp) > n_m else None)
        d["minu_per_template"] = [mt.n_minutiae for mt in t.minu_template]
        d["tex_minutiae"] = (t.texture_template[0].n_minutiae
                             if t.texture_template else 0)
        d["mate_rolled_minutiae"] = (mate_t.minu_template[0].n_minutiae
                                     if mate_t.minu_template else 0)
        d["mate_rolled_virtual"] = (mate_t.texture_template[0].n_minutiae
                                    if mate_t.texture_template else 0)

    import json
    with open(os.path.join(args.out, "results.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(args.out, "diagnostics.json"), "w") as f:
        json.dump(diags, f, indent=1)
    print("diagnostics:", json.dumps(diags, indent=1))
    if args.record:
        # record the committed acceptance artifact (tests/test_sd27.py pins
        # it) — only on explicit request, so experimental/--cpu/broken-
        # checkpoint runs cannot silently clobber the pinned results
        repo_res = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "sd27")
        os.makedirs(repo_res, exist_ok=True)
        with open(os.path.join(repo_res, "results.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(os.path.join(repo_res, "diagnostics.json"), "w") as f:
            json.dump(diags, f, indent=1)


if __name__ == "__main__":
    main()
