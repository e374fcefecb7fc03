#!/usr/bin/env python
"""Isolate the graph-filter body cost vs the selection preamble on TPU.

fused_graph_filter_packed is the body-only kernel (operands pre-gathered):
timing it at match-step rates gives the floor the fused match kernels can
reach; the delta to fused_minutiae_match / fused_texture_match is the
in-kernel similarity+selection preamble. Run alone.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, B, P, R, D = 24, 512, 64, 96, 96
K = 120
NL, Lt, Rt, KT = 8, 448, 448, 200
REPS = 4


def sync(r):
    leaves = r if isinstance(r, tuple) else (r,)
    float(np.asarray(leaves[0]).reshape(-1)[:4].astype(np.float64).sum())


def timed(name, fn, *args):
    r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(REPS):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / REPS
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from msu_latentafis_tpu.matcher import pallas_kernels as pk

    rng = np.random.default_rng(0)

    # ---- body-only floor, minutiae shape: NT*B sets of K=120
    NP = NT * B
    val = jnp.asarray(rng.uniform(0.5, 3.0, (NP, K)), jnp.float32)
    gl = jnp.asarray(rng.uniform(0, 480, (NP, K, 4)), jnp.float32)
    gr = jnp.asarray(rng.uniform(0, 480, (NP, K, 4)), jnp.float32)
    li = jnp.asarray(rng.integers(0, P, (NP, K)), jnp.int32)
    ri = jnp.asarray(rng.integers(0, R, (NP, K)), jnp.int32)
    valid = jnp.asarray(rng.random((NP, K)) > 0.15)
    timed("body/minu[NP=12288,K=120]",
          lambda *a: pk.fused_graph_filter_packed(
              *a, lookup=False, dist_iters=5, tile=8),
          val, gl, gr, li, ri, valid)

    # ---- body-only floor, texture shape: NL*B sets of K=200
    NP2 = NL * B
    val2 = jnp.asarray(rng.uniform(0.5, 3.0, (NP2, KT)), jnp.float32)
    gl2 = jnp.asarray(rng.integers(0, 30, (NP2, KT, 4)).astype(np.float32))
    gr2 = jnp.asarray(rng.integers(0, 30, (NP2, KT, 4)).astype(np.float32))
    li2 = jnp.asarray(rng.integers(0, Lt, (NP2, KT)), jnp.int32)
    ri2 = jnp.asarray(rng.integers(0, Rt, (NP2, KT)), jnp.int32)
    valid2 = jnp.asarray(rng.random((NP2, KT)) > 0.15)
    timed("body/tex[NP=4096,K=200]",
          lambda *a: pk.fused_graph_filter_packed(
              *a, lookup=True, dist_iters=3, tile=8),
          val2, gl2, gr2, li2, ri2, valid2)

    # ---- full fused kernels at the same rates
    lat_des = rng.standard_normal((NT, P, D)).astype(np.float32)
    lat_des /= np.linalg.norm(lat_des, axis=-1, keepdims=True)
    rol = rng.standard_normal((B, R, D)).astype(np.float32)
    rol /= np.linalg.norm(rol, axis=-1, keepdims=True)
    rol_t = jnp.asarray(np.swapaxes(rol, 1, 2), jnp.bfloat16)
    lat_desj = jnp.asarray(lat_des, jnp.bfloat16)
    onesl = jnp.ones((NT, P), jnp.float32)
    onesr = jnp.ones((B, R), jnp.float32)
    lpackT = jnp.asarray(rng.uniform(0, 480, (NT, 4, P)), jnp.float32)
    rpackT = jnp.asarray(rng.uniform(0, 480, (B, 4, R)), jnp.float32)
    timed("fused_minutiae_match", lambda *a: pk.fused_minutiae_match(
        *a, top_n=K, row_cap=8, dist_iters=5),
        lat_desj, onesl, rol_t, onesr, lpackT, rpackT)

    best = jnp.asarray(rng.uniform(-3, 6, (NL, B, Lt)), jnp.float32)
    bestj = jnp.asarray(rng.integers(0, Rt, (NL, B, Lt)), jnp.int32)
    lval = jnp.ones((NL, Lt), jnp.float32)
    lpackT2 = jnp.asarray(rng.uniform(0, 30, (NL, 4, Lt)), jnp.float32)
    rpackT2 = jnp.asarray(rng.uniform(0, 30, (B, 4, Rt)), jnp.float32)
    timed("fused_texture_match", lambda *a: pk.fused_texture_match(
        *a, top_n=KT, lookup=True, dist_iters=3),
        best, bestj, lval, lpackT2, rpackT2)


if __name__ == "__main__":
    main()
