#!/usr/bin/env python
"""Ablate the graph-filter body by stage to locate its cost on TPU.

stages: 1=H1 build, 2=+power(dist), 3=+greedy1, 4=+angle-H build,
5=+power(5), 6=full. Run alone (single TPU tunnel).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4


def sync(r):
    float(np.asarray(r).reshape(-1)[:4].astype(np.float64).sum())


def main():
    import jax.numpy as jnp
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.matcher import pallas_kernels as pk

    rng = np.random.default_rng(0)
    for name, NP, K, lookup, dist_iters, lo, hi in (
            ("minu", 24 * 512, 120, False, 5, 0, 480),
            ("tex", 8 * 512, 200, True, 3, 0, 30)):
        val = jnp.asarray(rng.uniform(0.5, 3.0, (NP, K)), jnp.float32)
        gl = jnp.asarray(rng.uniform(lo, hi, (NP, K, 4)), jnp.float32)
        gr = jnp.asarray(rng.uniform(lo, hi, (NP, K, 4)), jnp.float32)
        li = jnp.asarray(rng.integers(0, 64, (NP, K)), jnp.int32)
        ri = jnp.asarray(rng.integers(0, 448, (NP, K)), jnp.int32)
        valid = jnp.asarray(rng.random((NP, K)) > 0.15)
        prev = 0.0
        for st in range(1, 7):
            r = pk.fused_graph_filter_packed(val, gl, gr, li, ri, valid,
                                             lookup=lookup,
                                             dist_iters=dist_iters,
                                             tile=8, stages=st)
            sync(r)
            t0 = time.time()
            for _ in range(REPS):
                r = pk.fused_graph_filter_packed(val, gl, gr, li, ri, valid,
                                                 lookup=lookup,
                                                 dist_iters=dist_iters,
                                                 tile=8, stages=st)
            sync(r)
            dt = (time.time() - t0) / REPS * 1e3
            print(json.dumps({"variant": f"{name}/st{st}",
                              "ms": round(dt, 2),
                              "delta_ms": round(dt - prev, 2)}), flush=True)
            prev = dt


if __name__ == "__main__":
    main()
