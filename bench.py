#!/usr/bin/env python
"""Benchmark: latents matched per second against a synthetic PQ gallery on
one TPU chip, vs a CPU baseline reproducing the reference matcher's loop
structure (8 OpenMP threads — matching/matcher.cpp:168).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_GALLERY (default 100000), BENCH_LATENTS (default 4),
BENCH_BLOCK (default 512).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

G = int(os.environ.get("BENCH_GALLERY", "100000"))
N_LATENTS = int(os.environ.get("BENCH_LATENTS", "4"))
BLOCK = int(os.environ.get("BENCH_BLOCK", "512"))
RM, RT, LM, LT, D = 96, 448, 64, 448, 96

REPO = os.path.dirname(os.path.abspath(__file__))
CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"


def cpu_baseline_pairs_per_s() -> float:
    """Build/run the C++ replica of the reference's per-pair hot loops."""
    src = os.path.join(REPO, "tools", "cpu_baseline.cpp")
    binary = os.path.join(REPO, "tools", "cpu_baseline")
    if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-fopenmp", "-o",
                        binary, src], check=True)
    out = subprocess.run([binary, "1000", str(LM), str(RM), str(D), str(LT),
                          str(RT)], capture_output=True, text=True, check=True)
    return float(json.loads(out.stdout)["pairs_per_s"])


def main():
    import jax
    import jax.numpy as jnp
    from msu_latentafis_tpu.matcher.engine import DeviceGallery, MatchEngine
    from msu_latentafis_tpu.templates import read_codebook
    from msu_latentafis_tpu.templates.packing import pack_latent
    from msu_latentafis_tpu.utils.synthetic import make_latent_template

    cb = read_codebook(CODEBOOK)
    engine = MatchEngine(cb, block_size=BLOCK, compute_dtype=jnp.bfloat16)

    # device-side synthetic gallery (host gen + transfer would dominate)
    Gpad = ((G + BLOCK - 1) // BLOCK) * BLOCK
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    @jax.jit
    def gen_gallery():
        minu_des = jax.random.normal(ks[0], (Gpad, RM, D), jnp.bfloat16)
        norm = jnp.sqrt(jnp.sum(minu_des.astype(jnp.float32) ** 2, -1,
                                keepdims=True)) + 1e-6
        minu_des = (minu_des / norm * 1.73).astype(jnp.bfloat16)
        minu_n = jax.random.randint(ks[1], (Gpad,), int(0.75 * RM), RM + 1)
        minu_xy = jax.random.uniform(ks[2], (Gpad, RM, 2), jnp.float32, 24, 488)
        minu_ori = jax.random.uniform(ks[3], (Gpad, RM), jnp.float32,
                                      -np.pi, np.pi)
        codes = jax.random.randint(ks[4], (Gpad, RT, 16), 0, 256, jnp.int32)
        cwsq = jnp.sum(jnp.asarray(cb) ** 2, axis=2)          # [16, 256]
        flat = codes + jnp.arange(16) * 256
        tex_sqnorm = jnp.sum(jnp.take(cwsq.reshape(-1), flat), axis=2)
        tex_n = jax.random.randint(ks[5], (Gpad,), int(0.75 * RT), RT + 1)
        tex_xy = jnp.floor(jax.random.uniform(ks[6], (Gpad, RT, 2),
                                              jnp.float32, 0, 30))
        tex_ori = jax.random.uniform(ks[7], (Gpad, RT), jnp.float32,
                                     -np.pi, np.pi)
        return dict(minu_des=minu_des, minu_xy=minu_xy, minu_ori=minu_ori,
                    minu_n=minu_n.astype(jnp.int32),
                    tex_codes=codes.astype(jnp.uint8),
                    tex_sqnorm=tex_sqnorm.astype(jnp.float32),
                    tex_xy=tex_xy, tex_ori=tex_ori,
                    tex_n=tex_n.astype(jnp.int32))

    g = gen_gallery()
    jax.block_until_ready(g["minu_des"])
    gallery = DeviceGallery(names=[str(i) for i in range(G)], n_real=G, **g)

    rng = np.random.default_rng(7)
    latents = [pack_latent(make_latent_template(rng, n_minu=LM, n_tex=LT),
                           quantize_tex_xy=False, minu_cap=LM, tex_cap=LT)
               for _ in range(N_LATENTS)]

    # warmup / compile
    jax.block_until_ready(engine.match_scores(latents[0], gallery))

    t0 = time.time()
    for lat in latents:
        jax.block_until_ready(engine.match_scores(lat, gallery))
    dt = time.time() - t0
    latents_per_s = N_LATENTS / dt

    try:
        cpu_pairs = cpu_baseline_pairs_per_s()
        cpu_latents_per_s = cpu_pairs / G
        vs_baseline = latents_per_s / cpu_latents_per_s
    except Exception:
        vs_baseline = float("nan")

    print(json.dumps({
        "metric": f"latents matched/s vs {G}-template PQ gallery (1 chip)",
        "value": round(latents_per_s, 4),
        "unit": "latents/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
