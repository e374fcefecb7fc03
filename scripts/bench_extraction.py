#!/usr/bin/env python
"""Extraction throughput on the real chip: seconds/image for the full
latent and rolled pipelines (SD27-shaped 768x800 inputs), with the
pipeline's per-stage phase timings.

Two passes per pipeline: the first pays per-shape compiles, the second is
the steady-state number. Writes BENCH_EXTRACT_r03.json. Run alone
(single TPU tunnel).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_EXTRACT_r03.json")


def main():
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.pipeline import (LatentFeatureExtractor,
                                             RolledFeatureExtractor)
    from msu_latentafis_tpu.pipeline.models_bundle import ModelBundle
    from msu_latentafis_tpu.training.synthetic_data import render_ridge_image

    rng = np.random.default_rng(0)
    bundle = ModelBundle.initialize()
    results = {}

    imgs = [render_ridge_image(rng, 768, 800)[0] for _ in range(2)]

    rolled_x = RolledFeatureExtractor(models=bundle)
    t0 = time.time()
    rolled_x.extract(imgs[0])
    compile_s = time.time() - t0
    t0 = time.time()
    rolled_x.extract(imgs[1])
    results["rolled"] = {"seconds_per_image": round(time.time() - t0, 3),
                         "first_call_s": round(compile_s, 1),
                         "stages": {k: round(v, 3)
                                    for k, v in rolled_x.timings.items()}}
    print(json.dumps({"rolled": results["rolled"]}), flush=True)

    latent_x = LatentFeatureExtractor(models=bundle)
    t0 = time.time()
    latent_x.extract(imgs[0])
    compile_s = time.time() - t0
    t0 = time.time()
    latent_x.extract(imgs[1])
    results["latent"] = {"seconds_per_image": round(time.time() - t0, 3),
                         "first_call_s": round(compile_s, 1),
                         "stages": {k: round(v, 3)
                                    for k, v in latent_x.timings.items()}}
    print(json.dumps({"latent": results["latent"]}), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
