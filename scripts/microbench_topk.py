#!/usr/bin/env python
"""Microbenchmark of the correspondence top-k stage variants on the real TPU.

The match-step profile (scripts/profile_match.py) attributes ~26% of the
step to minutiae_correspondence_indices and ~10% to the texture top-k.
This isolates the candidate formulations at one gallery block's shapes:

  mcorr/current      norm -> reshape[Lm*Rm] -> approx_max_k     (relayout?)
  mcorr/pad128       norm -> pad Rm to 128 (-inf) -> reshape (layout-free)
                     -> approx_max_k
  mcorr/pad128_exact same but lax.top_k
  mcorr/norm_only    just the mutual normalization (floor cost)
  mcorr/row2         per-row top-2 -> [Lm*2] -> top_k(120) (approximate)
  tex/current        top_k(448, 200) + take_along_axis
  tex/approx         approx_max_k(448, 200) + take_along_axis

Run alone — never concurrently with another TPU process.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, B, Lm, Rm = 24, 512, 64, 96
K = 120
NL, Lt = 8, 448
KT = 200
REPS = 8


def timed(name, fn, *args):
    r = fn(*args)
    jax_sync(r)
    t0 = time.time()
    for _ in range(REPS):
        r = fn(*args)
    jax_sync(r)
    dt = (time.time() - t0) / REPS
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def jax_sync(r):
    # readback forces real completion through the tunnel
    import numpy as np
    leaves = [x for x in (r if isinstance(r, tuple) else (r,))]
    float(np.asarray(leaves[0]).reshape(-1)[:4].astype(np.float64).sum())


def main():
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    simi = jnp.asarray(rng.uniform(0, 2, (NT, B, Lm, Rm)), jnp.float32)
    lat_valid = jnp.asarray(rng.random((NT, Lm)) > 0.1)
    rol_valid = jnp.asarray(rng.random((B, Rm)) > 0.1)

    def norm_of(simi):
        row = jnp.sum(simi, axis=-1)
        col = jnp.sum(simi, axis=-2)
        norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
        pv = lat_valid[:, None, :, None] & rol_valid[None, :, None, :]
        return jnp.where(pv, norm, -jnp.inf)

    @jax.jit
    def current(simi):
        norm = norm_of(simi)
        topv, topi = jax.lax.approx_max_k(norm.reshape(NT, B, Lm * Rm), K,
                                          recall_target=0.95)
        return topv.sum(), (topi // Rm).sum()

    @jax.jit
    def pad128(simi):
        norm = norm_of(simi)
        normp = jnp.pad(norm, ((0, 0),) * 3 + ((0, 128 - Rm),),
                        constant_values=-jnp.inf)
        topv, topi = jax.lax.approx_max_k(normp.reshape(NT, B, Lm * 128), K,
                                          recall_target=0.95)
        return topv.sum(), (topi >> 7).sum()

    @jax.jit
    def pad128_exact(simi):
        norm = norm_of(simi)
        normp = jnp.pad(norm, ((0, 0),) * 3 + ((0, 128 - Rm),),
                        constant_values=-jnp.inf)
        topv, topi = jax.lax.top_k(normp.reshape(NT, B, Lm * 128), K)
        return topv.sum(), (topi >> 7).sum()

    @jax.jit
    def norm_only(simi):
        return norm_of(simi).sum(), simi.sum()

    @jax.jit
    def row2(simi):
        norm = norm_of(simi)
        v2, i2 = jax.lax.top_k(norm, 2)                  # [NT, B, Lm, 2]
        flat = v2.reshape(NT, B, Lm * 2)
        topv, topi = jax.lax.top_k(flat, K)
        return topv.sum(), topi.sum()

    for name, fn in [("mcorr/current", current), ("mcorr/pad128", pad128),
                     ("mcorr/pad128_exact", pad128_exact),
                     ("mcorr/norm_only", norm_only), ("mcorr/row2", row2)]:
        timed(name, fn, simi)

    best = jnp.asarray(rng.uniform(-3, 6, (NL, B, Lt)), jnp.float32)
    bestj = jnp.asarray(rng.integers(0, 448, (NL, B, Lt)), jnp.int32)

    @jax.jit
    def tex_current(best, bestj):
        topv, li = jax.lax.top_k(best, KT)
        ri = jnp.take_along_axis(bestj, li, axis=2)
        return topv.sum(), ri.sum()

    @jax.jit
    def tex_approx(best, bestj):
        topv, li = jax.lax.approx_max_k(best, KT, recall_target=0.95)
        ri = jnp.take_along_axis(bestj, li, axis=2)
        return topv.sum(), ri.sum()

    timed("tex/current", tex_current, best, bestj)
    timed("tex/approx", tex_approx, best, bestj)


if __name__ == "__main__":
    main()
