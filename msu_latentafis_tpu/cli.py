"""Command-line interface.

Mirrors the reference's three entry points with the same flags:
- ``afis extract-latent --i <img> | --idir <dir> [--tdir <dir>]``
  (extraction_latent.py:321-330 argparse surface);
- ``afis extract-rolled --idir <dir> [--tdir <dir>]``
  (extraction_rolled.py:278-286);
- ``afis match -l <latent.dat> | -ldir <dir> -g <gallery_dir> -s <scores>
  [-c <config>]`` (matching/main.cpp:35-87 / argparser.h).

Run as ``python -m msu_latentafis_tpu.cli <subcommand> ...``.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from typing import List, Optional

import numpy as np

from .config import AfisConfig, find_config


def _load_config(path: Optional[str]) -> AfisConfig:
    cfg_path = path or find_config()
    return AfisConfig.load(cfg_path) if cfg_path else AfisConfig()


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

def cmd_extract_latent(args) -> int:
    from .pipeline import LatentFeatureExtractor, ModelBundle
    from .pipeline.postprocess import compress_template
    from .templates import write_template, read_template, write_final_latent_template

    cfg = _load_config(args.config)
    tdir = args.tdir or cfg.LatentTemplateDirectory
    os.makedirs(tdir, exist_ok=True)
    models = ModelBundle.initialize(cfg)
    extractor = LatentFeatureExtractor(models=models)

    files = [args.i] if args.i else sorted(glob.glob(os.path.join(args.idir, "*.bmp"))
                                           + glob.glob(os.path.join(args.idir, "*.png")))
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(tdir, name + ".dat")
        if not args.i and os.path.exists(out):   # resume-by-skip
            continue
        t0 = time.perf_counter()
        try:
            template = extractor.extract_file(f)
        except Exception as e:    # skip-and-continue like the reference
            print(f"{f}: extraction FAILED ({type(e).__name__}: {e}); skipping")
            continue
        print(f"{f}: extracted in {time.perf_counter() - t0:.2f}s "
              f"({extractor.timings})")
        write_template(out, template, is_latent=True)
        # DR + PQ in place (the reference chains the same three stages)
        t = read_template(out, is_latent=True)
        compress_template(models, t)
        write_final_latent_template(out, t)
    return 0


def cmd_extract_rolled(args) -> int:
    from .pipeline import RolledFeatureExtractor, ModelBundle
    from .pipeline.postprocess import compress_template
    from .ops.pq import pq_encode
    from .templates import (read_codebook, write_template, read_template,
                            write_final_rolled_pq_template)

    cfg = _load_config(args.config)
    tdir = args.tdir or cfg.GalleryTemplateDirectory
    os.makedirs(tdir, exist_ok=True)
    models = ModelBundle.initialize(cfg)
    extractor = RolledFeatureExtractor(models=models)
    codebook = read_codebook(cfg.CodebookPath) if cfg.CodebookPath else None

    from .pipeline.rolled import enumerate_rolled_dataset
    for f, name, ppi in enumerate_rolled_dataset(
            args.idir, layout=args.layout, N1=args.N1, N2=args.N2):
        out = os.path.join(tdir, name + ".dat")
        if os.path.exists(out):
            continue
        t0 = time.perf_counter()
        try:
            template = extractor.extract_file(f, ppi=ppi)
        except Exception as e:
            print(f"{f}: extraction FAILED ({type(e).__name__}: {e}); skipping")
            continue
        print(f"{f}: extracted in {time.perf_counter() - t0:.2f}s")
        write_template(out, template, is_latent=False)
        t = read_template(out, is_latent=False)
        compress_template(models, t)
        if codebook is not None and t.texture_template and \
                t.texture_template[0].des is not None:
            t.texture_template[0].des = pq_encode(
                np.asarray(t.texture_template[0].des, np.float32), codebook)
        write_final_rolled_pq_template(out, t)
    return 0


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------

def _load_gallery(engine, gallery_dir: str):
    from .templates.native_io import pack_gallery_native
    files = sorted(glob.glob(os.path.join(gallery_dir, "*.dat")))
    names = [os.path.splitext(os.path.basename(f))[0] for f in files]
    packed = pack_gallery_native(gallery_dir, engine.codebook)
    if packed is None:  # native loader unavailable: pure-Python fallback
        from .templates import read_final_template
        from .templates.packing import pack_gallery
        templates = [read_final_template(f, kind="rolled") for f in files]
        packed = pack_gallery(templates, engine.codebook, names=names)
    return engine.load_gallery(packed), dict(zip(names, files))


def cmd_match(args) -> int:
    import jax.numpy as jnp
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from .matcher.engine import (MatchEngine, write_corr_files,
                                 write_rank_csv, write_score_csv)
    from .templates import read_codebook, read_final_template
    from .templates.packing import pack_latent

    cfg = _load_config(args.config)
    codebook_path = args.codebook or cfg.CodebookPath
    score_dir = args.scores or cfg.ScorePath
    os.makedirs(score_dir, exist_ok=True)

    engine = MatchEngine(read_codebook(codebook_path),
                         block_size=cfg.MatchBlockSize,
                         compute_dtype=jnp.bfloat16
                         if cfg.ComputeDtype == "bfloat16" else jnp.float32)
    t0 = time.perf_counter()
    gallery, gallery_files = _load_gallery(engine, args.gallery)
    print(f"Gallery size: {gallery.n_real} "
          f"(loaded in {time.perf_counter() - t0:.2f}s)")

    latent_files = [args.latent] if args.latent else \
        sorted(glob.glob(os.path.join(args.ldir, "*.dat")))
    todo = []                       # (name, template, packed)
    for lf in latent_files:
        name = os.path.splitext(os.path.basename(lf))[0]
        t = read_final_template(lf, kind="latent")
        if not t.minu_template and not t.texture_template:
            with open(os.path.join(score_dir, name + ".csv"), "w") as f:
                f.write("0\n")
            continue
        todo.append((name, t, pack_latent(t, quantize_tex_xy=False)))

    if args.latent and todo:
        name, t, packed = todo[0]
        t0 = time.perf_counter()
        if args.rerank:
            # serving mode: MXU-only screen over all pairs, exact scores
            # for the top-m; the rank table is identical wherever the
            # certification threshold is cleared (engine docstring)
            result = engine.one_to_list_reranked(
                packed, gallery, m=args.rerank,
                prescreen_k=args.prescreen,
                prescreen_lt=args.prescreen_lt,
                prescreen_t=args.prescreen_t)
        else:
            result = engine.one_to_list(packed, gallery)
        dt = (time.perf_counter() - t0) * 1000
        print(f"{name}: matched {gallery.n_real} in {dt:.1f} ms")
        write_rank_csv(os.path.join(score_dir, name + ".csv"), result)
        print("Rank     Filename      Score")
        for r, (n, s) in enumerate(result.ranked(24), 1):
            print(f"{r:<8} {n:<12} {s:.3f}")
        # correspondence files for the top-24 candidates
        # (matcher.cpp:305-330)
        for n, _ in result.ranked(24):
            rolled = read_final_template(gallery_files[n], kind="rolled")
            write_corr_files(t, rolled, engine.codebook,
                             os.path.join(score_dir, f"corr{name}_{n}"))
    elif todo:
        # -ldir batch mode: heterogeneous latents are padded to shape
        # buckets and matched in batches (O(#buckets) compiles, not
        # O(#latents) — List2List_matching, matcher.cpp:96-214)
        t0 = time.perf_counter()
        results = engine.list_to_list([p for _, _, p in todo], gallery)
        dt = time.perf_counter() - t0
        print(f"Matched {len(todo)} latents x {gallery.n_real} gallery "
              f"in {dt:.2f}s")
        for (name, _, _), result in zip(todo, results):
            write_score_csv(os.path.join(score_dir, name + ".csv"), result)
    return 0


# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="afis",
                                description="TPU-native latent AFIS")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("extract-latent")
    pl.add_argument("--i", help="single input image")
    pl.add_argument("--idir", help="input image directory")
    pl.add_argument("--tdir", help="template output directory")
    pl.add_argument("--config", help="afis.config path")
    pl.set_defaults(fn=cmd_extract_latent)

    pr = sub.add_parser("extract-rolled")
    pr.add_argument("--idir", required=True)
    pr.add_argument("--tdir")
    pr.add_argument("--N1", type=int, default=0)
    pr.add_argument("--N2", type=int, default=10 ** 9)
    pr.add_argument("--layout", default="flat",
                    choices=["flat", "longitudinal", "msp", "n2n"],
                    help="dataset layout (reference batch modes)")
    pr.add_argument("--config")
    pr.set_defaults(fn=cmd_extract_rolled)

    pm = sub.add_parser("match")
    pm.add_argument("-l", "--latent", help="single latent .dat")
    pm.add_argument("-ldir", "--ldir", help="latent .dat directory")
    pm.add_argument("-g", "--gallery", required=True)
    pm.add_argument("-s", "--scores")
    pm.add_argument("-c", "--codebook")
    pm.add_argument("--config")
    pm.add_argument("--rerank", type=int, default=0, metavar="M",
                    help="screen-then-rerank serving mode: exact scores "
                         "for the top-M screened candidates only "
                         "(0 = dense exact, the default)")
    pm.add_argument("--prescreen", type=int, default=0, metavar="K",
                    help="truncated-screen serving (requires --rerank): "
                         "screen with --prescreen-lt texture minutiae / "
                         "--prescreen-t minutiae templates, keep top K "
                         "(<= M reranks them directly). Recorded evidence "
                         "is mate-retrieval (rank-1) agreement with dense "
                         "(results/rank_parity_100k{,_cap}.json); top-24 "
                         "set/order parity does NOT hold under truncation "
                         "— use --rerank without --prescreen (or dense) "
                         "for top-24-fidelity claims")
    pm.add_argument("--prescreen-lt", type=int, default=64,
                    help="latent texture minutiae used by the truncated "
                         "prescreen stage (default 64)")
    pm.add_argument("--prescreen-t", type=int, default=1,
                    help="latent minutiae templates used by the truncated "
                         "prescreen stage (default 1)")
    pm.set_defaults(fn=cmd_match)

    args = p.parse_args(argv)
    if args.cmd == "match" and args.prescreen and not args.rerank:
        p.error("--prescreen requires --rerank > 0 (it is a first stage "
                "of screen-then-rerank serving)")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
