"""End-to-end CLI match command (-l ranked mode and -ldir batch mode)."""
import os

import numpy as np
import pytest

from msu_latentafis_tpu.cli import main
from msu_latentafis_tpu.templates import (write_final_latent_template,
                                          write_final_rolled_pq_template)
from msu_latentafis_tpu.utils.synthetic import (make_latent_template,
                                                make_rolled_template,
                                                random_codebook)

CODEBOOK = "/root/reference/matching/codebook_EmbeddingSize_96_stride_16_subdim_6.dat"


def _dequant(t):
    for tt in t.texture_template:
        if tt.minutiae is not None and len(tt.minutiae):
            m = np.asarray(tt.minutiae, np.float64)
            m[:, :2] = m[:, :2] * 16.0 + 24.0
            tt.minutiae = m
    return t


@pytest.mark.skipif(not os.path.exists(CODEBOOK), reason="codebook absent")
def test_cli_match_ldir_and_ranked(tmp_path):
    from msu_latentafis_tpu.templates import read_codebook
    cb = read_codebook(CODEBOOK)
    rng = np.random.default_rng(4)
    gdir = tmp_path / "gallery"
    ldir = tmp_path / "latents"
    sdir = tmp_path / "scores"
    gdir.mkdir(), ldir.mkdir()

    lat0 = make_latent_template(rng, n_minu=12, n_tex=20)
    lat1 = make_latent_template(rng, n_minu=7, n_tex=33)   # different bucket
    for i in range(4):
        t = make_rolled_template(rng, n_minu=16, n_tex=24,
                                 mated_latent=lat0 if i == 2 else None,
                                 codebook=cb if i == 2 else None)
        write_final_rolled_pq_template(str(gdir / f"g{i}.dat"), _dequant(t))
    write_final_latent_template(str(ldir / "lat0.dat"), _dequant(lat0))
    write_final_latent_template(str(ldir / "lat1.dat"), _dequant(lat1))

    rc = main(["match", "-ldir", str(ldir), "-g", str(gdir),
               "-s", str(sdir), "-c", CODEBOOK])
    assert rc == 0
    lines = open(sdir / "lat0.csv").read().splitlines()
    assert len(lines) == 4 and all("," in l for l in lines)
    scores = {l.split(",")[0]: float(l.split(",")[1]) for l in lines}
    assert max(scores, key=scores.get) == "g2"      # the mate wins
    assert (sdir / "lat1.csv").exists()

    rc = main(["match", "-l", str(ldir / "lat0.dat"), "-g", str(gdir),
               "-s", str(sdir), "-c", CODEBOOK])
    assert rc == 0
    ranked = open(sdir / "lat0.csv").read().splitlines()
    assert ranked[0] == "filename,score"
    assert ranked[1].startswith("1g2,")             # rank-1 = the mate

    # serving mode: --rerank M produces the same rank-1 (mate) via the
    # screen-then-rerank path
    rc = main(["match", "-l", str(ldir / "lat0.dat"), "-g", str(gdir),
               "-s", str(sdir), "-c", CODEBOOK, "--rerank", "4"])
    assert rc == 0
    ranked = open(sdir / "lat0.csv").read().splitlines()
    assert ranked[1].startswith("1g2,")
