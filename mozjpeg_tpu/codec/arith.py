"""Arithmetic-coded scan orchestration (encode + decode).

Python glue over native/arith.cpp. Parity: /root/reference/jcarith.c,
jdarith.c; DAC conditioning defaults L=0, U=1, K=5 (jcparam.c:414-419).
"""
from __future__ import annotations

import ctypes
from typing import Dict, List

import numpy as np

from ..native import lib, u8p

_c = ctypes


class CompPlaneA(_c.Structure):
    _fields_ = [
        ("coef", _c.c_void_p),
        ("bw", _c.c_int32), ("bh", _c.c_int32), ("stride", _c.c_int32),
        ("h", _c.c_int32), ("v", _c.c_int32),
        ("dc_tbl", _c.c_int32), ("ac_tbl", _c.c_int32),
    ]


cpa = _c.POINTER(CompPlaneA)

for name, extra in [
    ("mj_arith_encode_seq", [cpa, _c.c_int, _c.c_int, _c.c_int, _c.c_int,
                             u8p, u8p, u8p, u8p, _c.c_long]),
    ("mj_arith_decode_seq", [u8p, _c.c_long, cpa, _c.c_int, _c.c_int,
                             _c.c_int, _c.c_int, u8p, u8p, u8p]),
    ("mj_arith_encode_dc_first", [cpa, _c.c_int, _c.c_int, _c.c_int,
                                  _c.c_int, _c.c_int, u8p, u8p, u8p,
                                  _c.c_long]),
    ("mj_arith_encode_dc_refine", [cpa, _c.c_int, _c.c_int, _c.c_int,
                                   _c.c_int, _c.c_int, u8p, _c.c_long]),
    ("mj_arith_encode_ac_first", [cpa, _c.c_int, _c.c_int, _c.c_int,
                                  _c.c_int, u8p, u8p, _c.c_long]),
    ("mj_arith_encode_ac_refine", [cpa, _c.c_int, _c.c_int, _c.c_int,
                                   _c.c_int, u8p, _c.c_long]),
    ("mj_arith_decode_dc_first", [u8p, _c.c_long, cpa, _c.c_int, _c.c_int,
                                  _c.c_int, _c.c_int, _c.c_int, u8p, u8p]),
    ("mj_arith_decode_dc_refine", [u8p, _c.c_long, cpa, _c.c_int, _c.c_int,
                                   _c.c_int, _c.c_int, _c.c_int]),
    ("mj_arith_decode_ac_first", [u8p, _c.c_long, cpa, _c.c_int, _c.c_int,
                                  _c.c_int, _c.c_int, u8p]),
    ("mj_arith_decode_ac_refine", [u8p, _c.c_long, cpa, _c.c_int, _c.c_int,
                                   _c.c_int, _c.c_int]),
]:
    fn = getattr(lib, name)
    fn.restype = _c.c_long
    fn.argtypes = extra

DC_L = np.zeros(4, np.uint8)
DC_U = np.ones(4, np.uint8)
AC_K = np.full(4, 5, np.uint8)


def _ptr(a):
    return a.ctypes.data_as(u8p)


def _planes_arr(entries, planes, comps, dc_tbls, ac_tbls, interleaved):
    arr = (CompPlaneA * len(entries))()
    keep = []
    for i, ci in enumerate(entries):
        p = np.ascontiguousarray(planes[ci], dtype=np.int16)
        keep.append(p)
        g = comps[ci]
        arr[i].coef = p.ctypes.data
        if interleaved:
            arr[i].bw, arr[i].bh = p.shape[1], p.shape[0]
            arr[i].h, arr[i].v = g.h, g.v
        else:
            arr[i].bw, arr[i].bh = g.bw, g.bh
            arr[i].h, arr[i].v = 1, 1
        arr[i].stride = p.shape[1]
        arr[i].dc_tbl = dc_tbls.get(ci, 0)
        arr[i].ac_tbl = ac_tbls.get(ci, 0)
    return arr, keep


def encode_scan_arith(scan, geom, planes, dc_tbls, ac_tbls,
                      restart: int) -> bytes:
    mcus_x, mcus_y, comps = geom
    interleaved = len(scan.comps) > 1
    arr, keep = _planes_arr(scan.comps, planes, comps, dc_tbls, ac_tbls,
                            interleaved)
    if interleaved:
        smx, smy = mcus_x, mcus_y
    else:
        g = comps[scan.comps[0]]
        smx, smy = g.bw, g.bh
    nblocks = sum(smx * smy * arr[i].h * arr[i].v
                  for i in range(len(scan.comps)))
    out = np.empty(max(nblocks * 192 + 65536, 1 << 16), np.uint8)

    if scan.Ss == 0 and scan.Se == 63:
        n = lib.mj_arith_encode_seq(arr, len(scan.comps), smx, smy, restart,
                                    _ptr(DC_L), _ptr(DC_U), _ptr(AC_K),
                                    _ptr(out), out.size)
    elif scan.Ss == 0:
        if scan.Ah == 0:
            n = lib.mj_arith_encode_dc_first(
                arr, len(scan.comps), smx, smy, restart, scan.Al,
                _ptr(DC_L), _ptr(DC_U), _ptr(out), out.size)
        else:
            n = lib.mj_arith_encode_dc_refine(
                arr, len(scan.comps), smx, smy, restart, scan.Al,
                _ptr(out), out.size)
    else:
        if scan.Ah == 0:
            n = lib.mj_arith_encode_ac_first(
                arr, scan.Ss, scan.Se, scan.Al, restart, _ptr(AC_K),
                _ptr(out), out.size)
        else:
            n = lib.mj_arith_encode_ac_refine(
                arr, scan.Ss, scan.Se, scan.Al, restart,
                _ptr(out), out.size)
    if n < 0:
        raise RuntimeError("arith encode overflow")
    del keep
    return bytes(out[:n])


def decode_coefficients_arith(jp, data: bytes) -> List[np.ndarray]:
    """Entropy-decode an arithmetic-coded JPEG's scans."""
    from . import marker as _marker
    from .pipeline import CompGeom
    _marker.validate_decodable(jp)

    def scan_cond(si):
        """Per-scan conditioning arrays from the DAC snapshot (defaults
        L=0 U=1 Kx=5 where no DAC value was transmitted, jdarith.c)."""
        dl = DC_L.copy()
        du = DC_U.copy()
        ak = AC_K.copy()
        for (tc, th), v in jp.scan_arith_cond[si].items():
            if tc == 0:
                dl[th] = v & 15
                du[th] = v >> 4
                if du[th] < dl[th] or du[th] > 15:
                    raise ValueError("bogus DAC DC conditioning 0x%02X" % v)
            else:
                ak[th] = v
                if not 1 <= v <= 63:
                    raise ValueError("bogus DAC AC conditioning %d" % v)
        return dl, du, ak
    max_h, max_v = jp.max_h, jp.max_v
    mcus_x = -(-jp.width // (8 * max_h))
    mcus_y = -(-jp.height // (8 * max_v))
    planes = [np.zeros((mcus_y * c.v, mcus_x * c.h, 64), np.int16)
              for c in jp.components]
    comps = []
    for c in jp.components:
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        comps.append(CompGeom(c.h, c.v, cw, ch, -(-cw // 8), -(-ch // 8),
                              mcus_x * c.h, mcus_y * c.v))
    buf = np.frombuffer(data, np.uint8)
    ncomps = len(jp.components)
    cb_cur = np.full((ncomps, 64), -1, dtype=np.int32)
    cb_prev = np.full((ncomps, 64), -1, dtype=np.int32)
    for si, scan in enumerate(jp.scans):
        if jp.progressive:
            # progression status for block smoothing (jdarith.c:663-680,
            # same bookkeeping as jdphuff)
            for ci in scan.comp_indices:
                lo, hi = min(scan.Ss, 1), max(scan.Se, 9)
                cb_prev[ci, lo:hi + 1] = (cb_cur[ci, lo:hi + 1]
                                          if si > 0 else 0)
                cb_cur[ci, scan.Ss:scan.Se + 1] = scan.Al
        seg = np.ascontiguousarray(buf[scan.data_start:scan.data_end])
        restart = jp.scan_restart[si]
        interleaved = len(scan.comp_indices) > 1
        arr = (CompPlaneA * len(scan.comp_indices))()
        for i, ci in enumerate(scan.comp_indices):
            c = jp.components[ci]
            p = planes[ci]
            arr[i].coef = p.ctypes.data
            if interleaved:
                arr[i].bw, arr[i].bh = p.shape[1], p.shape[0]
                arr[i].h, arr[i].v = c.h, c.v
            else:
                arr[i].bw, arr[i].bh = comps[ci].bw, comps[ci].bh
                arr[i].h, arr[i].v = 1, 1
            arr[i].stride = p.shape[1]
            arr[i].dc_tbl = scan.dc_tbls[ci]
            arr[i].ac_tbl = scan.ac_tbls[ci]
        if interleaved:
            smx, smy = mcus_x, mcus_y
        else:
            smx, smy = arr[0].bw, arr[0].bh
        ln = scan.data_end - scan.data_start
        dl, du, ak = scan_cond(si)
        if not jp.progressive:
            r = lib.mj_arith_decode_seq(_ptr(seg), ln, arr,
                                        len(scan.comp_indices), smx, smy,
                                        restart, _ptr(dl), _ptr(du),
                                        _ptr(ak))
        elif scan.Ss == 0:
            if scan.Ah == 0:
                r = lib.mj_arith_decode_dc_first(
                    _ptr(seg), ln, arr, len(scan.comp_indices), smx, smy,
                    restart, scan.Al, _ptr(dl), _ptr(du))
            else:
                r = lib.mj_arith_decode_dc_refine(
                    _ptr(seg), ln, arr, len(scan.comp_indices), smx, smy,
                    restart, scan.Al)
        else:
            if scan.Ah == 0:
                r = lib.mj_arith_decode_ac_first(
                    _ptr(seg), ln, arr, scan.Ss, scan.Se, scan.Al,
                    restart, _ptr(ak))
            else:
                r = lib.mj_arith_decode_ac_refine(
                    _ptr(seg), ln, arr, scan.Ss, scan.Se, scan.Al, restart)
        if r < 0:
            raise ValueError("corrupt arithmetic scan %d" % si)
    # the arith decoder never sets insufficient_data (zero data is legal
    # mid-stream, jdarith.c:136-141), so every started scan completes and
    # last_good_iMCU_row reaches the end of the image
    jp.coef_bits = cb_cur if jp.progressive else None
    jp.coef_bits_prev = cb_prev if jp.progressive else None
    jp.last_good_imcu_row = mcus_y - 1
    return planes
