"""ctypes bindings for the native (C++/OpenMP) template loader.

``tools/libtemplate_io.so`` parses final rolled ``.dat`` files in parallel
and packs them straight into the PackedGallery dense arrays — the host-side
data-loading path for large galleries (the reference's equivalent native
component is the matcher's own reader loop, matcher.cpp:886-983 inside the
OpenMP gallery loop). Falls back transparently to the pure-Python reader
when the library isn't built.
"""
from __future__ import annotations

import ctypes
import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .data_model import MatcherConstants
from .packing import PackedGallery

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tools", "libtemplate_io.so")


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _LIB_PATH.replace("libtemplate_io.so", "template_io.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and \
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    if not os.path.exists(_LIB_PATH) or stale:
        if os.path.exists(src):
            import subprocess
            try:
                subprocess.run(["g++", "-O3", "-march=native", "-fopenmp",
                                "-shared", "-fPIC", "-o", _LIB_PATH, src],
                               check=True, capture_output=True)
            except Exception:
                return None
        else:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pack_gallery_files.restype = ctypes.c_int
    lib.list_dat_files.restype = ctypes.c_int
    lib.scan_gallery_counts.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_gallery_native(gallery_dir: str, codebook: np.ndarray,
                        minu_cap: Optional[int] = None,
                        tex_cap: Optional[int] = None,
                        des_dim: int = 96) -> Optional[PackedGallery]:
    """Parse + pack every rolled ``.dat`` under ``gallery_dir`` with the
    native loader. Returns None when the library is unavailable.

    When caps aren't given, a parallel count-only scan right-sizes them to
    the actual per-gallery maxima (rounded up to the sublane multiple of
    8), matching pack_gallery's adaptive semantics."""
    lib = _load_lib()
    if lib is None:
        return None
    files = sorted(glob.glob(os.path.join(gallery_dir, "*.dat")))
    if not files:
        minu_cap = minu_cap or 8
        tex_cap = tex_cap or 8
        return PackedGallery(
            minu_des=np.zeros((0, minu_cap, des_dim), np.float32),
            minu_xy=np.zeros((0, minu_cap, 2), np.float32),
            minu_ori=np.zeros((0, minu_cap), np.float32),
            minu_n=np.zeros((0,), np.int32),
            tex_codes=np.zeros((0, tex_cap, codebook.shape[0]), np.uint8),
            tex_sqnorm=np.zeros((0, tex_cap), np.float32),
            tex_xy=np.zeros((0, tex_cap, 2), np.float32),
            tex_ori=np.zeros((0, tex_cap), np.float32),
            tex_n=np.zeros((0,), np.int32), names=[])

    n = len(files)
    n_subs = codebook.shape[0]
    joined = ("\n".join(files)).encode()

    if minu_cap is None or tex_cap is None:
        scan_m = np.zeros((n,), np.int32)
        scan_t = np.zeros((n,), np.int32)
        lib.scan_gallery_counts(ctypes.c_char_p(joined), ctypes.c_int(n),
                                _ptr(scan_m, ctypes.c_int32),
                                _ptr(scan_t, ctypes.c_int32))
        rup = lambda v: int(-(-max(int(v), 1) // 8) * 8)
        if minu_cap is None:
            minu_cap = rup(scan_m.max() if n else 1)
        if tex_cap is None:
            tex_cap = rup(scan_t.max() if n else 1)

    minu_des = np.zeros((n, minu_cap, des_dim), np.float32)
    minu_x = np.zeros((n, minu_cap), np.float32)
    minu_y = np.zeros((n, minu_cap), np.float32)
    minu_ori = np.zeros((n, minu_cap), np.float32)
    minu_n = np.zeros((n,), np.int32)
    codes = np.zeros((n, tex_cap, n_subs), np.uint8)
    tex_x = np.zeros((n, tex_cap), np.float32)
    tex_y = np.zeros((n, tex_cap), np.float32)
    tex_ori = np.zeros((n, tex_cap), np.float32)
    tex_n = np.zeros((n,), np.int32)

    lib.pack_gallery_files(
        ctypes.c_char_p(joined), ctypes.c_int(n), ctypes.c_int(minu_cap),
        ctypes.c_int(tex_cap), ctypes.c_int(des_dim), ctypes.c_int(n_subs),
        _ptr(minu_des, ctypes.c_float), _ptr(minu_x, ctypes.c_float),
        _ptr(minu_y, ctypes.c_float), _ptr(minu_ori, ctypes.c_float),
        _ptr(minu_n, ctypes.c_int32), _ptr(codes, ctypes.c_uint8),
        _ptr(tex_x, ctypes.c_float), _ptr(tex_y, ctypes.c_float),
        _ptr(tex_ori, ctypes.c_float), _ptr(tex_n, ctypes.c_int32))

    cw_sqnorm = np.ascontiguousarray(
        np.sum(np.asarray(codebook, np.float64) ** 2, axis=2), dtype=np.float32)
    sqnorms = np.zeros((n * tex_cap,), np.float32)
    lib.pq_sqnorms(_ptr(codes, ctypes.c_uint8),
                   ctypes.c_int64(n * tex_cap), ctypes.c_int(n_subs),
                   _ptr(cw_sqnorm, ctypes.c_float),
                   _ptr(sqnorms, ctypes.c_float))
    tex_sqnorm = sqnorms.reshape(n, tex_cap)
    row = np.arange(tex_cap)[None, :]
    tex_sqnorm *= row < tex_n[:, None]

    names = [os.path.splitext(os.path.basename(f))[0] for f in files]
    minu_xy = np.stack([minu_x, minu_y], axis=-1)
    tex_xy = np.stack([tex_x, tex_y], axis=-1)
    return PackedGallery(minu_des=minu_des, minu_xy=minu_xy,
                         minu_ori=minu_ori, minu_n=minu_n, tex_codes=codes,
                         tex_sqnorm=tex_sqnorm, tex_xy=tex_xy,
                         tex_ori=tex_ori, tex_n=tex_n, names=names)
