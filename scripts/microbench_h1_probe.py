#!/usr/bin/env python
"""Probe: is the H1-build slow because of lane-broadcast pairwise tensors?

Compares three Pallas formulations of the stage-1 distance-H build at the
texture shape (T=8 sets, K=200), same grid rate as the real kernel:
  bcast   — current form (lx[:, :, None] - lx[:, None, :])
  matmul  — deltas via [K, 2] @ [2, K] MXU outer-form (exact)
  gram    — d^2 via [K, 4] @ [4, K] (inexact; lower bound)
Run alone (single TPU tunnel).
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, K = 8, 200
NP = 4096
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    def tail(d1, d2, vf):
        dist = jnp.abs(d1 - d2)
        H1 = jnp.clip((30.0 - dist) / 25.0, 0.0, 1.0)
        pairf = vf[:, None, :] * vf[:, :, None]
        gatef = (dist <= 30.0).astype(jnp.float32) * pairf
        return jnp.sum(jnp.sum(H1 * gatef, axis=2), axis=1)

    def k_bcast(lx_ref, ly_ref, rx_ref, ry_ref, vf_ref, o_ref):
        lx, ly, rx, ry = lx_ref[...], ly_ref[...], rx_ref[...], ry_ref[...]
        dxl = lx[:, :, None] - lx[:, None, :]
        dyl = ly[:, :, None] - ly[:, None, :]
        dxr = rx[:, :, None] - rx[:, None, :]
        dyr = ry[:, :, None] - ry[:, None, :]
        d1 = jnp.sqrt(dxl * dxl + dyl * dyl)
        d2 = jnp.sqrt(dxr * dxr + dyr * dyr)
        o_ref[...] = tail(d1, d2, vf_ref[...])[:, None]

    def k_matmul(lx_ref, ly_ref, rx_ref, ry_ref, vf_ref, o_ref):
        ones = jnp.ones((K, 1), jnp.float32)

        def deltas(x):                                   # [T, K] -> [T, K, K]
            outs = []
            for t in range(T):
                a = jnp.concatenate([x[t][:, None], -ones], axis=1)  # [K, 2]
                b = jnp.concatenate([ones.T, x[t][None, :]], axis=0)
                outs.append(jnp.dot(a, b, preferred_element_type=jnp.float32))
            return jnp.stack(outs)

        dxl = deltas(lx_ref[...])
        dyl = deltas(ly_ref[...])
        dxr = deltas(rx_ref[...])
        dyr = deltas(ry_ref[...])
        d1 = jnp.sqrt(dxl * dxl + dyl * dyl)
        d2 = jnp.sqrt(dxr * dxr + dyr * dyr)
        o_ref[...] = tail(d1, d2, vf_ref[...])[:, None]

    def k_gram(lx_ref, ly_ref, rx_ref, ry_ref, vf_ref, o_ref):
        ones = jnp.ones((K, 1), jnp.float32)

        def dsq(x, y):                                   # [T,K]x2 -> [T,K,K]
            outs = []
            for t in range(T):
                s = (x[t] * x[t] + y[t] * y[t])[:, None]           # [K, 1]
                a = jnp.concatenate([s, ones, -2.0 * x[t][:, None],
                                     -2.0 * y[t][:, None]], axis=1)
                b = jnp.concatenate([ones.T, s.T, x[t][None, :],
                                     y[t][None, :]], axis=0)
                outs.append(jnp.maximum(
                    jnp.dot(a, b, preferred_element_type=jnp.float32), 0.0))
            return jnp.stack(outs)

        d1 = jnp.sqrt(dsq(lx_ref[...], ly_ref[...]))
        d2 = jnp.sqrt(dsq(rx_ref[...], ry_ref[...]))
        o_ref[...] = tail(d1, d2, vf_ref[...])[:, None]

    rng = np.random.default_rng(0)
    lx, ly, rx, ry = (jnp.asarray(rng.uniform(0, 30, (NP, K)), jnp.float32)
                      for _ in range(4))
    vf = jnp.asarray((rng.random((NP, K)) > 0.15).astype(np.float32))
    spec = pl.BlockSpec((T, K), lambda t: (t, 0))

    results = {}
    for name, kern in (("bcast", k_bcast), ("matmul", k_matmul),
                       ("gram", k_gram)):
        fn = jax.jit(functools.partial(
            pl.pallas_call, kern, grid=(NP // T,),
            in_specs=[spec] * 5,
            out_specs=pl.BlockSpec((T, 1), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((NP, 1), jnp.float32))())
        r = fn(lx, ly, rx, ry, vf)
        results[name] = np.asarray(r)
        float(results[name][:4].sum())
        t0 = time.time()
        for _ in range(REPS):
            r = fn(lx, ly, rx, ry, vf)
        float(np.asarray(r)[:4].astype(np.float64).sum())
        dt = (time.time() - t0) / REPS * 1e3
        print(json.dumps({"variant": name, "ms": round(dt, 2)}), flush=True)

    print("matmul exact:",
          bool(np.array_equal(results["bcast"], results["matmul"])))
    print("gram maxdiff:",
          float(np.abs(results["bcast"] - results["gram"]).max()))


if __name__ == "__main__":
    main()
