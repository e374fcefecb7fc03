#!/usr/bin/env python
"""Extraction throughput on the real chip: seconds/image for the full
latent and rolled pipelines (SD27-shaped 768x800 inputs).

Two measurement modes per pipeline:
  - async (default): steady-state seconds/image with the pipeline's
    natural overlap (the headline number);
  - sync (EXTRACT_SYNC_TIMINGS=1 re-run): per-stage wall attribution with
    a forced device sync at each stage boundary (slightly slower overall;
    the per-stage split is only honest in this mode).

The first pass per pipeline pays per-shape compiles. Writes
BENCH_EXTRACT_r05.json. Run alone (single TPU tunnel).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_EXTRACT_r05.json")


def main():
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.pipeline import (LatentFeatureExtractor,
                                             RolledFeatureExtractor)
    from msu_latentafis_tpu.pipeline.models_bundle import ModelBundle
    from msu_latentafis_tpu.training.synthetic_data import render_ridge_image

    rng = np.random.default_rng(0)
    # trained stand-ins (when committed): populated minutiae sets make the
    # descriptor stage carry its real workload; a random-init bundle
    # detects nothing and understates that stage
    bundle = ModelBundle.initialize()
    ckpt = os.path.join(REPO, "checkpoints", "standin")
    if os.path.isdir(ckpt):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from run_sd27 import load_bundle
        bundle = load_bundle(ckpt)
    results = {}

    imgs = [render_ridge_image(rng, 768, 800)[0] for _ in range(3)]

    def run_one(extractor, name):
        # remote-tunnel dispatch latency fluctuates ~2x run to run; report
        # the MIN over several steady passes (the reproducible number) and
        # keep the per-stage split from the fastest synced pass
        t0 = time.time()
        extractor.extract(imgs[0])
        compile_s = time.time() - t0
        steady = []
        for _ in range(3):
            t0 = time.time()
            extractor.extract(imgs[1])
            steady.append(time.time() - t0)
        os.environ["EXTRACT_SYNC_TIMINGS"] = "1"
        sync_s, stages = [], None
        for _ in range(3):
            t0 = time.time()
            extractor.extract(imgs[2])
            sync_s.append(time.time() - t0)
            if sync_s[-1] == min(sync_s):
                stages = dict(extractor.timings)
        os.environ.pop("EXTRACT_SYNC_TIMINGS", None)
        results[name] = {
            "seconds_per_image": round(min(steady), 3),
            "seconds_per_image_mean": round(sum(steady) / len(steady), 3),
            "seconds_per_image_synced": round(min(sync_s), 3),
            "first_call_s": round(compile_s, 1),
            "stages_synced": {k: round(v, 3) for k, v in stages.items()}}
        print(json.dumps({name: results[name]}), flush=True)

    run_one(RolledFeatureExtractor(models=bundle), "rolled")
    run_one(LatentFeatureExtractor(models=bundle), "latent")

    # REAL workload: the three SD27 sample latents (the synthetic bench
    # image has a full-coverage mask whose ~4200 virtual minutiae make the
    # texture stage a worst case; real latents carry ~600-900)
    sd = "/root/reference/sample_data"
    if os.path.isdir(sd):
        import imageio.v2 as imageio
        from msu_latentafis_tpu.pipeline.latent import adjust_image_size
        ex = LatentFeatureExtractor(models=bundle)
        sd_imgs = []
        for n in ("good", "bad", "ugly"):
            im = np.asarray(imageio.imread(
                os.path.join(sd, f"{n}_latent.bmp")), np.float32)
            if im.ndim == 3:
                im = im.mean(axis=2)
            sd_imgs.append(adjust_image_size(im))
        ex.extract(sd_imgs[0])                      # warm per-shape
        per = {}
        for n, im in zip(("good", "bad", "ugly"), sd_imgs):
            ts = []
            for _ in range(2):
                t0 = time.time()
                ex.extract(im)
                ts.append(time.time() - t0)
            per[n] = round(min(ts), 3)
        results["latent_sd27"] = {
            "metric": "seconds/latent on the 3 REAL SD27 sample latents "
                      "(min-of-2 steady state, trained stand-ins)",
            "per_image": per,
            "seconds_per_image_mean": round(sum(per.values()) / 3, 3)}
        print(json.dumps({"latent_sd27": results["latent_sd27"]}),
              flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
