"""Native C++ gallery loader vs the pure-Python reader."""
import numpy as np
import pytest

from msu_latentafis_tpu.templates import (read_final_template,
                                          write_final_rolled_pq_template,
                                          pack_gallery)
from msu_latentafis_tpu.templates.native_io import (native_available,
                                                    pack_gallery_native)
from msu_latentafis_tpu.utils.synthetic import (make_rolled_template,
                                                random_codebook)


@pytest.mark.skipif(not native_available(), reason="libtemplate_io not built")
def test_native_loader_matches_python(rng, tmp_path):
    codebook = random_codebook(rng)
    names = []
    for i in range(8):
        t = make_rolled_template(rng, n_minu=20 + i, n_tex=30 + 2 * i)
        t.texture_template[0].minutiae[:, :2] = \
            t.texture_template[0].minutiae[:, :2] * 16 + 24
        write_final_rolled_pq_template(str(tmp_path / f"r{i:03d}.dat"), t)
        names.append(f"r{i:03d}")
    # one empty + one truncated file
    (tmp_path / "r900.dat").write_bytes(b"")
    data = (tmp_path / "r000.dat").read_bytes()
    (tmp_path / "r901.dat").write_bytes(data[:40])

    caps = dict(minu_cap=32, tex_cap=48)
    native = pack_gallery_native(str(tmp_path), codebook, des_dim=96, **caps)

    files = sorted(tmp_path.glob("*.dat"))
    templates = [read_final_template(str(f), kind="rolled") for f in files]
    py = pack_gallery(templates, codebook,
                      names=[f.stem for f in files], des_dim=96, **caps)

    np.testing.assert_array_equal(native.minu_n, py.minu_n)
    np.testing.assert_array_equal(native.tex_n, py.tex_n)
    np.testing.assert_allclose(native.minu_des, py.minu_des, rtol=1e-6)
    np.testing.assert_array_equal(native.tex_codes, py.tex_codes)
    np.testing.assert_allclose(native.tex_sqnorm, py.tex_sqnorm, rtol=1e-5)
    np.testing.assert_allclose(native.minu_xy, py.minu_xy)
    np.testing.assert_allclose(native.tex_xy, py.tex_xy)
    assert native.names == py.names


@pytest.mark.skipif(not native_available(), reason="libtemplate_io not built")
def test_native_loader_autosizes_caps(rng, tmp_path):
    """Without explicit caps the count-scan pass right-sizes the arrays to
    the same shapes as the adaptive Python packer."""
    codebook = random_codebook(rng)
    for i, (nm, nt) in enumerate([(9, 30), (21, 55), (14, 41)]):
        t = make_rolled_template(rng, n_minu=nm, n_tex=nt)
        t.texture_template[0].minutiae[:, :2] = \
            t.texture_template[0].minutiae[:, :2] * 16 + 24
        write_final_rolled_pq_template(str(tmp_path / f"r{i:03d}.dat"), t)

    native = pack_gallery_native(str(tmp_path), codebook)
    files = sorted(tmp_path.glob("*.dat"))
    templates = [read_final_template(str(f), kind="rolled") for f in files]
    py = pack_gallery(templates, codebook, names=[f.stem for f in files])

    assert native.minu_des.shape == py.minu_des.shape == (3, 24, 96)
    assert native.tex_codes.shape == py.tex_codes.shape == (3, 56, 16)
    np.testing.assert_array_equal(native.minu_n, py.minu_n)
    np.testing.assert_array_equal(native.tex_n, py.tex_n)
    np.testing.assert_allclose(native.minu_des, py.minu_des, rtol=1e-6)
    np.testing.assert_array_equal(native.tex_codes, py.tex_codes)
    np.testing.assert_allclose(native.tex_sqnorm, py.tex_sqnorm, rtol=1e-5)
