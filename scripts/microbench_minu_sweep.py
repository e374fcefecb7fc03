#!/usr/bin/env python
"""Sweep the fused minutiae-match kernel's static knobs on the real chip.

The kernel is 53% of the match step (PROFILE_r02.json); this sweep measures
tile_b (grid tile), row_cap (selection extraction passes), and block size
against the 16K-gallery profile shape to pick defaults. Run alone (single
TPU tunnel).
"""
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, P, R, D = 24, 64, 96, 96
B = int(os.environ.get("SWEEP_B", "4096"))
REPS = int(os.environ.get("SWEEP_REPS", "3"))


def sync(r):
    float(np.asarray(r).reshape(-1)[:4].astype(np.float64).sum())


def main():
    import jax.numpy as jnp
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.matcher import pallas_kernels as pk

    rng = np.random.default_rng(0)
    lat_des = jnp.asarray(rng.standard_normal((NT, P, D)) * 0.18, jnp.bfloat16)
    lat_validf = jnp.asarray(rng.random((NT, P)) < 0.9, jnp.float32)
    rol_des = jnp.asarray(rng.standard_normal((B, D, R)) * 0.18, jnp.bfloat16)
    rol_validf = jnp.asarray(rng.random((B, R)) < 0.95, jnp.float32)
    lpackT = jnp.asarray(
        np.stack([rng.uniform(0, 480, (NT, P)), rng.uniform(0, 480, (NT, P)),
                  np.cos(rng.uniform(-3, 3, (NT, P))),
                  np.sin(rng.uniform(-3, 3, (NT, P)))], axis=1), jnp.float32)
    rpackT = jnp.asarray(
        np.stack([rng.uniform(0, 480, (B, R)), rng.uniform(0, 480, (B, R)),
                  np.cos(rng.uniform(-3, 3, (B, R))),
                  np.sin(rng.uniform(-3, 3, (B, R)))], axis=1), jnp.float32)

    ref = None
    for tile_b, row_cap in itertools.product((8, 16, 32), (8, 4)):
        if B % tile_b:
            continue
        try:
            fn = lambda: pk.fused_minutiae_match(
                lat_des, lat_validf, rol_des, rol_validf, lpackT, rpackT,
                top_n=120, row_cap=row_cap, lookup=False, dist_iters=5,
                tile_b=tile_b)
            r = fn()
            sync(r)
            t0 = time.time()
            for _ in range(REPS):
                r = fn()
            sync(r)
            dt = (time.time() - t0) / REPS
            s = np.asarray(r)
            if ref is None:
                ref = s
            dev = float(np.abs(s - ref).max())
            print(json.dumps({
                "tile_b": tile_b, "row_cap": row_cap,
                "ms": round(dt * 1e3, 2),
                "us_per_pair": round(dt / (NT * B) * 1e6, 3),
                "max_dev_vs_first": dev}), flush=True)
        except Exception as e:  # VMEM OOM etc — record and continue
            print(json.dumps({"tile_b": tile_b, "row_cap": row_cap,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
