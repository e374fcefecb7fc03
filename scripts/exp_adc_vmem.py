#!/usr/bin/env python
"""Experiment: fused_adc_rowmax (C, E, vmem_limit) sweep on the real chip.

Measures the standalone ADC kernel at bench shapes to answer:
1. How much VMEM can a kernel actually get (is 16M the physical bound or
   just the default scoped limit)?
2. Which (C, E) is fastest once the limit is raised?

Run alone — never concurrently with another TPU process.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from msu_latentafis_tpu.matcher import pallas_kernels as pk

    NL, B, LT, RT, D = 8, 128, 448, 448, 96
    NBLK = int(os.environ.get("EXP_BLOCKS", "16"))     # gallery blocks timed

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (NL, LT, D), jnp.bfloat16)
    lsq = jnp.sum(x.astype(jnp.float32) ** 2, -1)
    dect = jax.random.randint(ks[1], (B, D, RT), -127, 127,
                              jnp.int32).astype(jnp.int8)
    rsq = jax.random.uniform(ks[2], (B, RT), jnp.float32, 0, 6)
    rva = jnp.ones((B, RT), jnp.float32)

    def run(C, E, vmem_mb, reps=3):
        @jax.jit
        def many(x, lsq, dect, rsq, rva):
            def step(carry, _):
                b, _bj = pk.fused_adc_rowmax(
                    x, lsq, dect, rsq, rva, entries_per_step=E,
                    latent_chunk=C, vmem_limit_mb=vmem_mb)
                return carry + jnp.sum(b[:, :, :8]), None
            s, _ = jax.lax.scan(step, 0.0, None, length=NBLK)
            return s
        try:
            r = many(x, lsq, dect, rsq, rva)
            float(np.asarray(r))                       # force through tunnel
            ts = []
            for _ in range(reps):
                t0 = time.time()
                r = many(x, lsq, dect, rsq, rva)
                float(np.asarray(r))
                ts.append(time.time() - t0)
            dt = min(ts)
            pairs = NL * B * NBLK
            flops = pairs * 2 * LT * D * RT
            print(f"C={C} E={E} vmem={vmem_mb}M: {dt*1e3:8.1f} ms  "
                  f"{pairs/dt:12,.0f} pairs/s  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
            return dt
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"C={C} E={E} vmem={vmem_mb}M: FAIL {msg}", flush=True)
            return None

    for C, E, v in [(1, 8, 0), (2, 8, 64), (4, 8, 64), (8, 8, 110),
                    (4, 16, 110), (8, 16, 0), (2, 16, 64)]:
        run(C, E, v)


if __name__ == "__main__":
    sys.exit(main())
