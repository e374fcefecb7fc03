#!/usr/bin/env python
"""ADC-screen MFU experiments (VERDICT r3 #5: screen scan is 95% of serving
time at ~18% MFU; adc_screen measured 32.4 TFLOP/s vs ~183 bf16 peak).

Hypothesis from the kernel's structure: the per-entry f32 row-max over the
LANE dimension ([C*Lt, Rt] -> [C*Lt]) costs ~2x the GEMM's cycles (lane
reductions shuffle across 128 lanes; 4 lane-tiles of work per row-tile).
Variants measured on the real chip at bench shapes:

  base      : fused_adc_screen as shipped (bf16 x, int8 dect)
  transposed: dots computed as [Rt, C*Lt] (dect pre-transposed), max over
              the SUBLANE dim — elementwise tile maxes instead of lane
              shuffles
  int8      : transposed + x quantized to int8 -> int8 x int8 MXU at 2x
              the bf16 rate, i32 row-max
  e16       : entries_per_step 16 (less per-entry loop overhead)

Writes EXP_SCREEN_MFU.json. Run alone (single TPU tunnel).
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NL, Lt, D, Rt = 8, 448, 96, 448
B = int(os.environ.get("EXP_B", "4096"))        # gallery block


def main():
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from msu_latentafis_tpu.matcher import pallas_kernels as pk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NL, Lt, D)), jnp.bfloat16)
    lat_sq = jnp.asarray(rng.random((NL, Lt)), jnp.float32)
    lat_va = jnp.ones((NL, Lt), jnp.float32)
    dect = jnp.asarray(rng.integers(-127, 127, (B, D, Rt)), jnp.int8)
    rol_sq = jnp.asarray(rng.random((B, Rt)), jnp.float32)
    rol_va = jnp.ones((B, Rt), jnp.float32)

    flops = 2.0 * NL * Lt * (D + 2) * Rt * B
    out = {"shapes": {"NL": NL, "Lt": Lt, "D": D, "Rt": Rt, "B": B}}

    def timeit(name, fn, n=6):
        r = fn()
        s0 = float(np.asarray(r).ravel()[:4].sum())   # sync + sanity
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
            float(np.asarray(r).ravel()[:4].sum())
        dt = (time.perf_counter() - t0) / n
        out[name] = {"seconds": round(dt, 4),
                     "tflops": round(flops / dt / 1e12, 1),
                     "pairs_per_s": round(NL * B / dt, 0)}
        print(name, json.dumps(out[name]), flush=True)
        return r

    # ---- base
    base = timeit("base", lambda: pk.fused_adc_screen(
        x, lat_sq, lat_va, dect, rol_sq, rol_va))
    base_np = np.asarray(base)

    # ---- transposed variants
    def make_t(xdt, E=8, C=0):
        import math
        E_ = pk._adc_entries_per_step(B, E)
        C_ = C or pk._adc_latent_chunk(NL, Lt, Rt, entries=E_)
        # lane dim of the xt block is C*Lt -> must be 128-divisible
        step = 128 // math.gcd(Lt, 128)
        C_ = min(NL, ((C_ + step - 1) // step) * step)
        while NL % C_:
            C_ += step
        assert (C_ * Lt) % 128 == 0 and NL % C_ == 0, (C_, Lt, NL)
        M = NL * Lt
        int8 = xdt == jnp.int8

        def kernel_bf16(xt_ref, dect_ref, best_ref):
            # out is [E, C*Lt] per block — a row write per entry avoids the
            # lane-crossing [1, C*Lt] -> (C, Lt) reshape Mosaic rejects
            xt = xt_ref[...]                       # [D+2, C*Lt]
            for e in range(E_):
                d = dect_ref[e]                    # [Rt, D+2]
                if d.dtype != xt.dtype:
                    d = d.astype(xt.dtype)
                dots = jnp.dot(d, xt,
                               preferred_element_type=jnp.float32)
                best_ref[e:e + 1, :] = jnp.max(dots, axis=0, keepdims=True)

        def kernel_int8(xt_ref, dect_ref, corr_ref, best_ref):
            # dots in i32 (x/sx units); per-row correction (-rsq/2/sx and
            # the invalid sentinel) is ONE broadcast add before the
            # sublane max
            xt = xt_ref[...]
            for e in range(E_):
                dots = jnp.dot(dect_ref[e], xt,
                               preferred_element_type=jnp.int32)
                dots = dots + corr_ref[e]          # [Rt, 1] -> [Rt, M]
                best_ref[e:e + 1, :] = jnp.max(dots, axis=0, keepdims=True)

        @jax.jit
        def run(x_, dect_, rol_sq_, rol_va_, lat_sq_, lat_va_):
            rsqm = rol_sq_ * 0.5
            if int8:
                sx = jnp.max(jnp.abs(x_.astype(jnp.float32))) / 126.0 + 1e-9
                xq = jnp.clip(jnp.round(x_.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                xt = xq.reshape(M, D).T                    # [D, M]
                dect_t = jnp.swapaxes(dect_, 1, 2)         # [B, Rt, D]
                corr = (jnp.round(-rsqm / sx).astype(jnp.int32)
                        + jnp.where(rol_va_ > 0, 0, -(1 << 28))
                        .astype(jnp.int32)).reshape(B, Rt, 1)
                raw = pl.pallas_call(
                    kernel_int8,
                    grid=(B // E_, NL // C_),
                    in_specs=[
                        pl.BlockSpec((D, C_ * Lt), lambda b, c: (0, c)),
                        pl.BlockSpec((E_, Rt, D), lambda b, c: (b, 0, 0)),
                        pl.BlockSpec((E_, Rt, 1), lambda b, c: (b, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((E_, C_ * Lt),
                                           lambda b, c: (b, c)),
                    out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(xt, dect_t, corr)
                raw = jnp.swapaxes(raw.reshape(B, NL, Lt), 0, 1)  # [NL,B,Lt]
                best = 2.0 * raw.astype(jnp.float32) * sx \
                    + (6.0 - lat_sq_)[:, None, :]
            else:
                c1 = jnp.float32(1.0)
                aug1 = (-rsqm).astype(xdt).reshape(B, 1, Rt)
                aug2 = jnp.where(rol_va_ > 0, 0.0, -1e4) \
                    .astype(xdt).reshape(B, 1, Rt)
                dect_aug = jnp.concatenate(
                    [dect_.astype(xdt), aug1, aug2], axis=1)
                dect_t = jnp.swapaxes(dect_aug, 1, 2)      # [B, Rt, D+2]
                cols = jnp.concatenate([
                    jnp.broadcast_to(c1.astype(xdt), (NL, Lt, 1)),
                    jnp.ones((NL, Lt, 1), xdt)], axis=2)
                x_aug = jnp.concatenate([x_.astype(xdt), cols], axis=2)
                xt = x_aug.reshape(M, D + 2).T             # [D+2, M]
                raw = pl.pallas_call(
                    kernel_bf16,
                    grid=(B // E_, NL // C_),
                    in_specs=[
                        pl.BlockSpec((D + 2, C_ * Lt), lambda b, c: (0, c)),
                        pl.BlockSpec((E_, Rt, D + 2), lambda b, c: (b, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((E_, C_ * Lt),
                                           lambda b, c: (b, c)),
                    out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(xt, dect_t)
                raw = jnp.swapaxes(raw.reshape(B, NL, Lt), 0, 1)  # [NL,B,Lt]
                best = 2.0 * raw + (6.0 - lat_sq_)[:, None, :]
            contrib = jnp.maximum(best, 0.0) * lat_va_[:, None, :]
            return jnp.sum(contrib, axis=2)
        return run

    tb = make_t(jnp.bfloat16)
    r = timeit("transposed", lambda: tb(x, dect, rol_sq, rol_va,
                                        lat_sq, lat_va))
    err = float(np.max(np.abs(np.asarray(r) - base_np)))
    out["transposed"]["max_abs_err_vs_base"] = round(err, 3)
    print("transposed err", err, flush=True)

    t16 = make_t(jnp.bfloat16, E=16)
    timeit("transposed_e16", lambda: t16(x, dect, rol_sq, rol_va,
                                         lat_sq, lat_va))

    ti = make_t(jnp.int8)
    r = timeit("transposed_int8", lambda: ti(x, dect, rol_sq, rol_va,
                                             lat_sq, lat_va))
    err = float(np.max(np.abs(np.asarray(r) - base_np)))
    rel = err / max(1.0, float(np.abs(base_np).max()))
    out["transposed_int8"]["max_abs_err_vs_base"] = round(err, 3)
    out["transposed_int8"]["rel_err"] = round(rel, 4)
    print("int8 err", err, "rel", rel, flush=True)

    # base with e16 for fairness
    timeit("base_e16", lambda: pk.fused_adc_screen(
        x, lat_sq, lat_va, dect, rol_sq, rol_va, entries_per_step=16))

    with open(os.path.join(REPO, "EXP_SCREEN_MFU.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
