#!/usr/bin/env python
"""Quantify the TPU tunnel's per-call costs that bound extraction speed:

  a) round-trip latency of a trivial jitted op (dispatch + sync readback)
  b) host->device upload bandwidth (4.7 MB descriptor batch)
  c) device->host download bandwidth (30 MB heatmap)
  d) device gather throughput for the patch-extraction pattern
     ([900, 96, 96] advanced-index gather from a 768x800 image)
  e) one [128, 96, 96, 1] DescriptorNet forward (compute + sync)

The r3 extraction profile lumps these; this separates "tunnel overhead"
from "real compute" so the pipeline refactor attacks the right term.
Run alone (single TPU tunnel).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, n=5):
    fn()                      # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    from msu_latentafis_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    out = {}
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # a) round-trip latency: tiny op, value readback forces the sync
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    out["roundtrip_latency_s"] = round(timed(
        lambda: float(np.asarray(f(tiny))[0]), n=10), 4)
    print("roundtrip:", out["roundtrip_latency_s"], flush=True)

    # b) upload bandwidth: 4.7 MB batch, sync via tiny reduce readback
    batch = np.random.default_rng(0).random((128, 96, 96, 1), np.float32)
    g = jax.jit(lambda x: jnp.sum(x))
    up = timed(lambda: float(np.asarray(g(jnp.asarray(batch)))), n=5)
    out["upload_4p7MB_s"] = round(up, 4)
    out["upload_MBps"] = round(batch.nbytes / 1e6 / max(up, 1e-9), 1)
    print("upload:", out, flush=True)

    # c) download bandwidth: 30 MB on-device tensor pulled to host
    big = jax.device_put(np.zeros((768, 800, 12), np.float32))
    down = timed(lambda: np.asarray(big).ravel()[0], n=5)
    out["download_29p5MB_s"] = round(down, 4)
    out["download_MBps"] = round(big.nbytes / 1e6 / max(down, 1e-9), 1)
    print("download:", out, flush=True)

    # d) patch-pattern gather on device: [900, 96, 96] from [768, 800]
    img = jax.device_put(np.random.default_rng(1).random((768, 800), np.float32))
    rng = np.random.default_rng(2)
    yv = jax.device_put(rng.integers(0, 768, (900, 96, 96)).astype(np.int32))
    xv = jax.device_put(rng.integers(0, 800, (900, 96, 96)).astype(np.int32))
    gat = jax.jit(lambda im, y, x: jnp.sum(im[y, x], axis=(1, 2)))
    dt = timed(lambda: float(np.asarray(gat(img, yv, xv))[0]), n=3)
    out["gather_8p3M_s"] = round(dt, 4)
    out["gather_Melem_per_s"] = round(900 * 96 * 96 / 1e6 / max(dt, 1e-9), 1)
    print("gather:", out, flush=True)

    # d2) same but flat-index one-axis gather (often a different XLA path)
    flat = img.reshape(-1)
    fi = jax.device_put((rng.integers(0, 768, (900, 96, 96)) * 800
                         + rng.integers(0, 800, (900, 96, 96))).astype(np.int32))
    gat2 = jax.jit(lambda im, i: jnp.sum(jnp.take(im, i), axis=(1, 2)))
    dt2 = timed(lambda: float(np.asarray(gat2(flat, fi))[0]), n=3)
    out["gather_flat_Melem_per_s"] = round(900 * 96 * 96 / 1e6 / max(dt2, 1e-9), 1)
    print("gather flat:", out["gather_flat_Melem_per_s"], flush=True)

    # e) DescriptorNet forward at batch 128 (dispatch+compute+sync)
    from msu_latentafis_tpu.models import DescriptorNet
    net = DescriptorNet()
    vars_ = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 1)), train=False)
    apply_ = jax.jit(lambda v, x: net.apply(v, x, train=False))
    xb = jax.device_put(batch)
    dt = timed(lambda: float(np.asarray(apply_(vars_, xb))[0, 0]), n=5)
    out["descriptor_fwd_b128_s"] = round(dt, 4)
    print("descriptor fwd:", out["descriptor_fwd_b128_s"], flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "MICROBENCH_TUNNEL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
