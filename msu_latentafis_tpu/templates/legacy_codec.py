"""Legacy template codecs.

Capability parity with the reference's older on-disk formats kept in
/root/reference/extraction/template.py:79-614:

- the "Byte" format (Bin2Template_Byte / _old): per-template sections carry
  a ``des_num`` count of descriptor matrices (one per patch type, read with
  per-row L2 normalization), a u16 texture-template count, and u16-quantized
  texture descriptors;
- run-length mask codec (shared with the current format, in .codec).

These exist so archives produced by older reference deployments remain
readable; new templates always use the TF_C + final PQ formats in .codec.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .codec import _Reader, _Writer, _U8, _U16, _F32
from .data_model import MinuTemplate, Template, TextureTemplate


def read_template_legacy(fname, is_latent: bool = True) -> Optional[Template]:
    """Parse the legacy Byte format (template.py:498-614 semantics)."""
    with open(fname, "rb") as f:
        data = f.read()
    r = _Reader(data)
    template = Template()
    h, w = r.scalar(_U16), r.scalar(_U16)
    if h <= 0 or w <= 0:
        return None
    blkH, blkW = r.scalar(_U16), r.scalar(_U16)
    n_minu_templates = r.scalar(_U8)
    for _ in range(n_minu_templates):
        n = r.scalar(_U16)
        if n <= 0:
            continue
        minu = np.zeros((n, 4), np.float64)
        minu[:, 0] = r.arr(_U16, n)
        minu[:, 1] = r.arr(_U16, n)
        minu[:, 2] = r.arr(_F32, n)
        minu[:, 3] = r.arr(_F32, n)
        des_num = r.scalar(_U16)
        des_len = r.scalar(_U16)
        des = []
        for _ in range(des_num):
            d = r.arr(_F32, des_len * n).reshape(n, des_len).astype(np.float32)
            d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-6)
            des.append(d)
        oimg = r.arr(_F32, blkH * blkW).reshape(blkW, blkH).T.copy()
        template.add_minu_template(MinuTemplate(
            h=h, w=w, blkH=blkH, blkW=blkW, minutiae=minu, des=des,
            oimg=oimg))

    n_tex = r.scalar(_U16)          # legacy: u16 texture count
    if n_tex == 0:
        return template
    n = r.scalar(_U16)
    if n <= 0:
        template.add_texture_template(TextureTemplate(h=h, w=w))
        return template
    ncols = 4 if is_latent else 3
    minu = np.zeros((n, ncols), np.float64)
    minu[:, 0] = r.arr(_U16, n)
    minu[:, 1] = r.arr(_U16, n)
    minu[:, 2] = r.arr(_F32, n)
    if is_latent:
        minu[:, 3] = r.arr(_F32, n)
    des_num = r.scalar(_U16)
    des_len = r.scalar(_U16)
    des = []
    for _ in range(des_num):
        # legacy texture descriptors are u16-quantized raw values
        d = r.arr(_U16, des_len * n).reshape(n, des_len).astype(np.float32)
        des.append(d)
    template.add_texture_template(TextureTemplate(h=h, w=w, minutiae=minu,
                                                  des=des))
    return template


def write_template_legacy(fname, template: Template,
                          is_latent: bool = True) -> None:
    """Serialize in the legacy Byte format (round-trips read_template_legacy)."""
    w = _Writer()
    if template is None or not template.minu_template:
        w.arr(_U16, [0, 0, 0, 0])
        with open(fname, "wb") as f:
            f.write(w.getvalue())
        return
    first = template.minu_template[0]
    w.arr(_U16, [first.h, first.w, first.blkH, first.blkW])
    w.scalar(_U8, len(template.minu_template))
    for mt in template.minu_template:
        minu = np.asarray(mt.minutiae) if mt.minutiae is not None else np.zeros((0, 4))
        n = len(minu)
        w.scalar(_U16, n)
        if n <= 0:
            continue
        w.arr(_U16, minu[:, 0])
        w.arr(_U16, minu[:, 1])
        w.arr(_F32, minu[:, 2])
        w.arr(_F32, minu[:, 3])
        des_list = mt.des if isinstance(mt.des, (list, tuple)) else [mt.des]
        w.scalar(_U16, len(des_list))
        w.scalar(_U16, des_list[0].shape[1])
        for d in des_list:
            w.arr(_F32, np.asarray(d, np.float32).reshape(-1))
        oimg = np.asarray(mt.oimg, np.float32)[:first.blkH, :first.blkW]
        w.arr(_F32, oimg.T.reshape(-1))

    n_tex = len(template.texture_template)
    w.scalar(_U16, n_tex)
    if n_tex:
        tt = template.texture_template[0]
        minu = np.asarray(tt.minutiae) if tt.minutiae is not None else np.zeros((0, 4))
        n = len(minu)
        w.scalar(_U16, n)
        if n > 0:
            w.arr(_U16, minu[:, 0])
            w.arr(_U16, minu[:, 1])
            w.arr(_F32, minu[:, 2])
            if is_latent:
                w.arr(_F32, minu[:, 3] if minu.shape[1] > 3 else np.zeros(n))
            des_list = tt.des if isinstance(tt.des, (list, tuple)) else [tt.des]
            w.scalar(_U16, len(des_list))
            w.scalar(_U16, des_list[0].shape[1])
            for d in des_list:
                w.arr(_U16, np.asarray(d).reshape(-1))
    with open(fname, "wb") as f:
        f.write(w.getvalue())
