#!/usr/bin/env python
"""Measure the ACTUAL reference matcher binary as the CPU baseline.

Builds /root/reference/matching (unmodified sources; boost::filesystem
shimmed with std::filesystem, Eigen from the tensorflow wheel's vendored
headers) and times One2List matching of one latent ``.dat`` against a
synthetic rolled gallery written with this package's byte-compatible codec.
Reports pairs/s on THIS host (nproc cores; the reference pins 8 OpenMP
threads — matcher.cpp:168).

Writes REF_BASELINE.json at the repo root. CPU-only: safe to run while the
TPU is busy.
"""
import json
import os
import subprocess
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BUILD = os.path.join(REPO, "tools", "refbuild")
EIGEN = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
SRC = "/root/reference/matching"
CODEBOOK = os.path.join(SRC, "codebook_EmbeddingSize_96_stride_16_subdim_6.dat")


# The reference sources hit undefined behavior that modern GCC turns into
# crashes; these minimal build-time patches (applied to a /tmp copy — the
# repo carries only the replacements) make it run as its authors' toolchain
# happened to:
#  - matcher.cpp:244 `for(int n; ...)` — uninitialized loop variable
#    (out-of-bounds ind[] writes);
#  - One2One_matching_all_templates / _selected_templates are declared int
#    but fall off the end without a return — GCC >= 12 at -O2+ treats the
#    path as unreachable and emits no epilogue.
PATCHES = [
    ("for(int n; n != rolled_template_files.size(); n++){",
     "for(int n=0; n != (int)rolled_template_files.size(); n++){", 1),
    ("        score[i+latent_template.m_nrof_minu_templates] = s;\n    }\n\n}",
     "        score[i+latent_template.m_nrof_minu_templates] = s;\n    }\n\n"
     "    return 0;\n}", 2),
]


def build():
    binary = os.path.join(BUILD, "ref_match")
    if os.path.exists(binary):
        return binary
    os.makedirs(BUILD, exist_ok=True)
    import tempfile
    srcdir = tempfile.mkdtemp(prefix="refsrc_")
    for name in os.listdir(SRC):
        if name.endswith((".cpp", ".h", ".hpp")):
            with open(os.path.join(SRC, name), "rb") as f:
                data = f.read()
            with open(os.path.join(srcdir, name), "wb") as f:
                f.write(data)
    mpath = os.path.join(srcdir, "matcher.cpp")
    src = open(mpath).read()
    for old, new, count in PATCHES:
        found = src.count(old)
        assert found == count, (old[:40], found, count)
        src = src.replace(old, new)
    open(mpath, "w").write(src)
    for unit in ("matcher", "main"):
        subprocess.run(
            ["g++", "-c", "-O3", "-fopenmp", "-std=gnu++17", "-I", BUILD,
             "-I", EIGEN, os.path.join(srcdir, unit + ".cpp"),
             "-o", os.path.join(BUILD, unit + ".o")],
            check=True, capture_output=True)
    subprocess.run(["g++", "-O3", "-fopenmp", os.path.join(BUILD, "main.o"),
                    os.path.join(BUILD, "matcher.o"), "-o", binary],
                   check=True, capture_output=True)
    return binary


def main():
    G = int(os.environ.get("REF_GALLERY", "300"))
    # REF_SHAPES=cap: the reference's own template caps (matcher.h:31-32,
    # Lt=Rt=1000 incl. virtual minutiae) -> REF_BASELINE_CAP.json
    cap = os.environ.get("REF_SHAPES", "") == "cap"
    rm, rt, lm, lt = (128, 1000, 128, 1000) if cap else (96, 448, 64, 448)

    
    from msu_latentafis_tpu.templates import (read_codebook,
                                              write_final_latent_template,
                                              write_final_rolled_pq_template)
    from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                    make_rolled_template)

    binary = build()
    cb = read_codebook(CODEBOOK)

    import tempfile
    root = tempfile.mkdtemp(prefix="refbase_")
    gal_dir = os.path.join(root, "work", "gallery")
    score_dir = os.path.join(root, "work", "scores")
    os.makedirs(gal_dir)
    os.makedirs(score_dir)
    # main.cpp reads ../afis.config relative to its cwd
    with open(os.path.join(root, "afis.config"), "w") as f:
        json.dump({"CodebookPath": CODEBOOK}, f)

    rng = np.random.default_rng(11)
    print(f"writing {G} rolled .dat templates...", flush=True)
    for i in range(G):
        t = make_rolled_template(rng, n_minu=rm, n_tex=rt)
        write_final_rolled_pq_template(
            os.path.join(gal_dir, f"g{i:05d}.dat"), t)

    lat = make_latent_template(rng, n_minu=lm, n_tex=lt)
    lat_file = os.path.join(root, "work", "latent.dat")
    write_final_latent_template(lat_file, lat)

    env = dict(os.environ, OMP_NUM_THREADS=os.environ.get(
        "REF_THREADS", str(os.cpu_count())))
    t0 = time.time()
    p = subprocess.run(
        [binary, "-l", lat_file, "-g", gal_dir, "-s", score_dir,
         "-c", CODEBOOK],
        cwd=os.path.join(root, "work"), env=env,
        capture_output=True, text=True, timeout=36000)
    dt = time.time() - t0
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-2000:])
    # self-reported phase timings (matcher.cpp:331-333) land on stdout
    tail = [l for l in p.stdout.splitlines() if l.strip()][-6:]

    n_latent_templates = len(lat.minu_template)
    out = {
        "binary": "/root/reference/matching sources with 2 minimal UB fixes "
                  "(uninitialized loop var, missing returns — see PATCHES)",
        "host": f"{os.cpu_count()} cores, OMP_NUM_THREADS="
                f"{env['OMP_NUM_THREADS']}",
        "gallery": G, "latent_minu_templates": n_latent_templates,
        "shapes": {"Rm": rm, "Rt": rt, "Lm": lm, "Lt": lt},
        "wall_s": round(dt, 3),
        "pairs_per_s": round(G / dt, 3),
        "stdout_tail": tail,
    }
    name = "REF_BASELINE_CAP.json" if cap else "REF_BASELINE.json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
