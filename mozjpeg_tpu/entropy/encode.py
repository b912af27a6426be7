"""Scan-level entropy encoding: Python orchestration over the native engine.

Handles table selection, statistics gathering, optimal table generation, and
scan emission for sequential and progressive scans.
"""
from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..codec.scans import ScanInfo
from ..native import CompPlane, lib, u8p, u32p, i64p, i32p
from .huffman import HuffTable, derive_codes

_c_i64 = ctypes.c_int64
_c_u8 = ctypes.c_uint8
_c_u32 = ctypes.c_uint32


def _np_ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


class ScanGeometry:
    """Geometry for one scan: interleaved (multi-comp) uses MCU-padded dims;
    single-component scans use the component's own block dims."""

    def __init__(self, scan: ScanInfo, geom, planes: List[np.ndarray]):
        mcus_x, mcus_y, comps = geom
        self.scan = scan
        self.planes = planes
        if len(scan.comps) == 1:
            ci = scan.comps[0]
            g = comps[ci]
            self.mcus_x, self.mcus_y = g.bw, g.bh
            self.entries = [(ci, 1, 1)]
        else:
            self.mcus_x, self.mcus_y = mcus_x, mcus_y
            self.entries = [(ci, comps[ci].h, comps[ci].v)
                            for ci in scan.comps]
        self.comps = comps

    def comp_planes(self, dc_tbls: Dict[int, int], ac_tbls: Dict[int, int]):
        arr = (CompPlane * len(self.entries))()
        keepalive = []
        for i, (ci, h, v) in enumerate(self.entries):
            p = np.ascontiguousarray(self.planes[ci], dtype=np.int16)
            keepalive.append(p)
            g = self.comps[ci]
            arr[i].coef = p.ctypes.data
            arr[i].bw = g.bw if len(self.entries) == 1 else g.bw_pad
            arr[i].bh = g.bh if len(self.entries) == 1 else g.bh_pad
            arr[i].stride = p.shape[1]
            arr[i].h = h
            arr[i].v = v
            arr[i].dc_tbl = dc_tbls.get(ci, 0)
            arr[i].ac_tbl = ac_tbls.get(ci, 0)
        return arr, keepalive


def _flatten_tables(tables: Dict[int, HuffTable]):
    """4 tables -> flat ehufco[4*256] u32, ehufsi[4*256] u8."""
    co = np.zeros(4 * 256, dtype=np.uint32)
    si = np.zeros(4 * 256, dtype=np.uint8)
    for idx, tbl in tables.items():
        c, s = derive_codes(tbl)
        co[idx * 256:(idx + 1) * 256] = c
        si[idx * 256:(idx + 1) * 256] = s
    return co, si


def _out_buffer(sg: ScanGeometry) -> np.ndarray:
    # worst case ~ 16 bits/coef * 64 + stuffing; be generous
    nblocks = sum(sg.mcus_x * sg.mcus_y * h * v for _, h, v in sg.entries)
    return np.empty(max(nblocks * 192 + 4096, 1 << 16), dtype=np.uint8)


def encode_scan(sg: ScanGeometry, dc_tbls: Dict[int, int],
                ac_tbls: Dict[int, int],
                dc_tables: Dict[int, HuffTable],
                ac_tables: Dict[int, HuffTable],
                restart_interval: int = 0,
                gather: bool = False
                ) -> Tuple[Optional[bytes], np.ndarray, np.ndarray]:
    """Encode or gather one scan. Returns (data, dc_counts[4,257], ac_counts).

    data is None in gather mode.
    """
    scan = sg.scan
    arr, keep = sg.comp_planes(dc_tbls, ac_tbls)
    dc_co, dc_si = _flatten_tables(dc_tables if not gather else {})
    ac_co, ac_si = _flatten_tables(ac_tables if not gather else {})
    dc_counts = np.zeros((4, 257), dtype=np.int64)
    ac_counts = np.zeros((4, 257), dtype=np.int64)
    out = _out_buffer(sg) if not gather else np.empty(1, dtype=np.uint8)
    g = 1 if gather else 0

    if scan.Ss == 0 and scan.Se == 63:
        n = lib.mj_encode_seq(
            arr, len(sg.entries), sg.mcus_x, sg.mcus_y, restart_interval,
            _np_ptr(dc_co, u32p), _np_ptr(dc_si, u8p),
            _np_ptr(ac_co, u32p), _np_ptr(ac_si, u8p),
            _np_ptr(out, u8p), out.size,
            _np_ptr(dc_counts, i64p), _np_ptr(ac_counts, i64p), g)
    elif scan.Ss == 0:  # DC scan
        if scan.Ah == 0:
            n = lib.mj_encode_dc_first(
                arr, len(sg.entries), sg.mcus_x, sg.mcus_y,
                restart_interval, scan.Al,
                _np_ptr(dc_co, u32p), _np_ptr(dc_si, u8p),
                _np_ptr(out, u8p), out.size, _np_ptr(dc_counts, i64p), g)
        else:
            if gather:
                return None, dc_counts, ac_counts  # no symbols in DC refine
            n = lib.mj_encode_dc_refine(
                arr, len(sg.entries), sg.mcus_x, sg.mcus_y,
                restart_interval, scan.Al, _np_ptr(out, u8p), out.size)
    else:  # AC scan (single component)
        fn = lib.mj_encode_ac_first if scan.Ah == 0 else lib.mj_encode_ac_refine
        n = fn(arr, scan.Ss, scan.Se, scan.Al, restart_interval,
               _np_ptr(ac_co, u32p), _np_ptr(ac_si, u8p),
               _np_ptr(out, u8p), out.size, _np_ptr(ac_counts, i64p), g)
    if n < 0:
        raise RuntimeError("entropy output buffer overflow")
    del keep
    if gather:
        return None, dc_counts, ac_counts
    return bytes(out[:n]), dc_counts, ac_counts


def gen_optimal_table(freq: np.ndarray) -> HuffTable:
    """Native Annex-K.2 optimal table generation (exact libjpeg semantics)."""
    f = np.ascontiguousarray(freq, dtype=np.int64)
    bits = np.zeros(17, dtype=np.uint8)
    vals = np.zeros(256, dtype=np.uint8)
    n = lib.mj_gen_optimal_table(_np_ptr(f, i64p), _np_ptr(bits, u8p),
                                 _np_ptr(vals, u8p))
    if n < 0:
        raise ValueError("Huffman code length overflow")
    return HuffTable(bits, vals[:n])
