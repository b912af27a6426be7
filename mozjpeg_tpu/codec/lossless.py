"""Lossless JPEG (process 14) encode/decode orchestration.

SOF3 frames, predictors 1-7, point transform; RGB images stay RGB (three
1x1-sampled components, /root/reference/jcparam.c jpeg_enable_lossless +
jpeg_default_colorspace lossless branch).
"""
from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from ..entropy import encode as entenc
from ..entropy.huffman import HuffTable, derive_codes, derive_decode_table
from ..native import lib, u8p, u32p, i32p, i64p
from . import marker

lib.mj_lossless_encode.restype = ctypes.c_long
lib.mj_lossless_encode.argtypes = [
    ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, u32p, u8p, u8p, ctypes.c_long, i64p, ctypes.c_int,
    ctypes.c_uint]
lib.mj_lossless_decode.restype = ctypes.c_long
lib.mj_lossless_decode.argtypes = [
    u8p, ctypes.c_long, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, i32p, i64p, i32p, u8p, ctypes.c_uint]


def encode_lossless(image: np.ndarray, predictor: int = 1,
                    point_transform: int = 0, precision: int = 8,
                    restart_interval: int = 0,
                    restart_in_rows: int = 0) -> bytes:
    """Encode (H, W[, 3]) uint8/uint16 losslessly (SOF3 + optimal tables).

    restart_in_rows converts to MCUs via MCUs_per_row = width (lossless
    interleaved MCU = one sample position; jcmaster.c:561,597-600),
    capped at 65535 like the reference."""
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7, got %d"
                         % predictor)
    if not 0 <= point_transform < precision:
        raise ValueError("point transform must be in [0, precision), "
                         "got %d" % point_transform)
    if image.ndim == 2:
        comps = [image]
    else:
        comps = [image[:, :, i] for i in range(image.shape[2])]
    ncomp = len(comps)
    h, w = comps[0].shape
    pt = point_transform
    ri = int(restart_interval)
    if restart_in_rows:
        ri = min(int(restart_in_rows) * w, 65535)
    planes = [np.ascontiguousarray((c.astype(np.uint16) >> pt))
              for c in comps]
    ptrs = (ctypes.c_void_p * ncomp)(
        *[p.ctypes.data for p in planes])
    # all components share DC slot 0 (jpeg_set_colorspace RGB/grayscale
    # assigns table 0 to every component; lossless keeps RGB)
    tbl_idx = np.zeros(ncomp, np.int32)

    # gather stats -> optimal tables
    counts = np.zeros(4 * 257, np.int64)
    lib.mj_lossless_encode(ptrs, ncomp, w, h, predictor, precision, pt,
                           tbl_idx.ctypes.data_as(i32p), None, None, None, 0,
                           counts.ctypes.data_as(i64p), 1, ri)
    tables = {}
    for t in sorted(set(tbl_idx.tolist())):
        tables[t] = entenc.gen_optimal_table(counts[t * 257:(t + 1) * 257])
    co = np.zeros(4 * 256, np.uint32)
    si = np.zeros(4 * 256, np.uint8)
    for t, tbl in tables.items():
        c_, s_ = derive_codes(tbl)
        co[t * 256:(t + 1) * 256] = c_
        si[t * 256:(t + 1) * 256] = s_

    out = np.empty(w * h * ncomp * 4 + (1 << 16), np.uint8)
    n = lib.mj_lossless_encode(ptrs, ncomp, w, h, predictor, precision, pt,
                               tbl_idx.ctypes.data_as(i32p),
                               co.ctypes.data_as(u32p),
                               si.ctypes.data_as(u8p),
                               out.ctypes.data_as(u8p), out.size, None, 0,
                               ri)
    if n < 0:
        raise RuntimeError("lossless encode overflow")

    wtr = marker.MarkerWriter()
    wtr.soi()
    if ncomp == 3:
        # RGB lossless: Adobe APP14 transform=0 flags RGB
        # (jpeg_set_colorspace JCS_RGB -> write_Adobe_marker)
        wtr.adobe_app14(0)
        comp_ids = [0x52, 0x47, 0x42]     # 'R','G','B' (jcparam.c RGB ids)
    else:
        comp_ids = list(range(1, ncomp + 1))
    wtr.sof(marker.SOF3, precision, h, w,
            [(comp_ids[i], 1, 1, 0) for i in range(ncomp)])
    for ci in sorted(set(tbl_idx.tolist())):
        wtr.dht(0, ci, tables[ci])
    if ri:
        wtr.dri(ri)
    wtr.sos([(comp_ids[i], int(tbl_idx[i]), 0) for i in range(ncomp)],
            predictor, 0, 0, pt)
    wtr.raw(bytes(out[:n]))
    wtr.eoi()
    return wtr.bytes()


def decode_lossless(jp: marker.ParsedJpeg, data: bytes) -> np.ndarray:
    """Lossless (SOF3) decode incl. MULTI-SCAN streams: each scan covers
    a disjoint component subset with its own predictor, point transform,
    tables and restart interval (jdlhuff.c per-scan entropy + jdinput.c
    scan sequencing). The reference encoder cannot emit these, but its
    decoder accepts them — golden-tested against djpeg on synthesized
    streams (tests/test_lossless_multiscan.py)."""
    marker.validate_decodable(jp)
    if jp.arithmetic:
        raise ValueError("arithmetic-coded lossless (SOF11) is not "
                         "supported")
    if any(c.h != 1 or c.v != 1 for c in jp.components):
        raise ValueError("subsampled lossless components are not "
                         "supported")
    ncomp = len(jp.components)
    covered = sorted(ci for sc in jp.scans for ci in sc.comp_indices)
    if covered != list(range(ncomp)):
        raise ValueError("lossless scans must cover each component "
                         "exactly once")
    h, w = jp.height, jp.width
    planes = [np.zeros((h, w), np.uint16) for _ in range(ncomp)]
    pts = [0] * ncomp
    buf = np.frombuffer(data, np.uint8)
    for si, scan in enumerate(jp.scans):
        ri = int(jp.scan_restart[si] or 0)
        # the reference decoder requires a whole number of MCU rows per
        # restart interval (jddiffct.c:104-109 JERR_BAD_RESTART); with
        # h=v=1 an MCU is one sample position (all the scan's components
        # together when interleaved), so MCUs per row is w either way
        if ri and ri % w != 0:
            raise ValueError("lossless restart interval must be a "
                             "multiple of the samples per row")
        predictor = scan.Ss
        pt = scan.Al
        nsc = len(scan.comp_indices)
        scomps = list(scan.comp_indices)
        for ci in scomps:
            pts[ci] = pt
        ptrs = (ctypes.c_void_p * nsc)(
            *[planes[ci].ctypes.data for ci in scomps])
        tbl_idx = np.array([scan.dc_tbls[ci] for ci in scomps], np.int32)

        htables = jp.scan_htables[si]
        mincode = np.zeros((4, 17), np.int32)
        maxcode = np.full((4, 18), -1, np.int64)
        valptr = np.zeros((4, 17), np.int32)
        vals = np.zeros((4, 256), np.uint8)
        for (cls, i), t in htables.items():
            if cls != 0:
                continue
            mn, mx, vp, vl = derive_decode_table(t)
            mincode[i] = mn
            maxcode[i] = mx
            valptr[i] = vp
            vals[i, :len(vl)] = vl
        seg = np.ascontiguousarray(buf[scan.data_start:scan.data_end])
        r = lib.mj_lossless_decode(
            seg.ctypes.data_as(u8p), seg.size, ptrs, nsc, w, h,
            predictor, jp.precision, pt, tbl_idx.ctypes.data_as(i32p),
            np.ascontiguousarray(mincode).ctypes.data_as(i32p),
            np.ascontiguousarray(maxcode).ctypes.data_as(i64p),
            np.ascontiguousarray(valptr).ctypes.data_as(i32p),
            np.ascontiguousarray(vals).ctypes.data_as(u8p), ri)
        if r < 0:
            raise ValueError("corrupt lossless scan")
    out = [(p.astype(np.uint32) << pts[ci])
           for ci, p in enumerate(planes)]
    dt = np.uint16 if jp.precision > 8 else np.uint8
    maxv = (1 << jp.precision) - 1
    out = [np.clip(p, 0, maxv).astype(dt) for p in out]
    if ncomp == 1:
        return out[0]
    return np.stack(out, axis=-1)
