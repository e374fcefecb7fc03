#!/usr/bin/env python
"""Microbench: where does the minutiae-correspondence stage spend time?

Times, per 512-entry gallery block shape (NT=24 latent templates):
  norm      - mutual normalization only
  approx    - + approx_max_k(120)
  gather    - + val gather at the top indices
  topk      - exact lax.top_k variant
Run alone on the chip.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    NT, B, Lm, Rm, K = 24, 512, 64, 96, 120
    key = jax.random.PRNGKey(0)
    simi = jax.random.uniform(key, (NT, B, Lm, Rm), jnp.float32)

    def norm_only(simi):
        row = jnp.sum(simi, axis=-1)
        col = jnp.sum(simi, axis=-2)
        norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
        return jnp.sum(norm, axis=(-1, -2))

    def with_approx(simi):
        row = jnp.sum(simi, axis=-1)
        col = jnp.sum(simi, axis=-2)
        norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
        topv, topi = jax.lax.approx_max_k(norm.reshape(NT, B, -1), K,
                                          recall_target=0.95)
        return jnp.sum(topv, -1) + jnp.sum(topi, -1).astype(jnp.float32)

    def with_gather(simi):
        row = jnp.sum(simi, axis=-1)
        col = jnp.sum(simi, axis=-2)
        norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
        topv, topi = jax.lax.approx_max_k(norm.reshape(NT, B, -1), K,
                                          recall_target=0.95)
        val = jnp.take_along_axis(simi.reshape(NT, B, -1), topi, axis=-1)
        return jnp.sum(topv, -1) + jnp.sum(val, -1)

    def with_topk(simi):
        row = jnp.sum(simi, axis=-1)
        col = jnp.sum(simi, axis=-2)
        norm = simi / (row[..., :, None] + col[..., None, :] - simi + 1e-6)
        topv, topi = jax.lax.top_k(norm.reshape(NT, B, -1), K)
        return jnp.sum(topv, -1) + jnp.sum(topi, -1).astype(jnp.float32)

    for name, fn in [("norm", norm_only), ("approx", with_approx),
                     ("gather", with_gather), ("topk", with_topk)]:
        f = jax.jit(fn)
        r = f(simi)
        float(np.asarray(r[0, 0]))
        t0 = time.time()
        for _ in range(8):
            r = f(simi)
        float(np.asarray(r[0, :4]).sum())
        dt = (time.time() - t0) / 8
        print(json.dumps({"stage": name, "ms_per_block": round(dt * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
