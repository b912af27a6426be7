"""ctypes bindings for the native entropy engine (auto-builds on import)."""
from __future__ import annotations

import ctypes
import os

from . import build as _buildmod

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, _buildmod.LIB_NAME)


def _ensure_built():
    srcs = [os.path.join(_DIR, s) for s in _buildmod.SOURCES
            if os.path.exists(os.path.join(_DIR, s))]
    if (not os.path.exists(_LIB)
            or any(os.path.getmtime(_LIB) < os.path.getmtime(s)
                   for s in srcs)):
        _buildmod.build(_DIR, _LIB)


_ensure_built()
lib = ctypes.CDLL(_LIB)


class CompPlane(ctypes.Structure):
    _fields_ = [
        ("coef", ctypes.c_void_p),
        ("bw", ctypes.c_int32), ("bh", ctypes.c_int32),
        ("stride", ctypes.c_int32),
        ("h", ctypes.c_int32), ("v", ctypes.c_int32),
        ("dc_tbl", ctypes.c_int32), ("ac_tbl", ctypes.c_int32),
    ]


_p = ctypes.POINTER
u8p = _p(ctypes.c_uint8)
u32p = _p(ctypes.c_uint32)
i16p = _p(ctypes.c_int16)
i32p = _p(ctypes.c_int32)
i64p = _p(ctypes.c_int64)
cpp = _p(CompPlane)

class SearchComp(ctypes.Structure):
    _fields_ = [
        ("coef", ctypes.c_void_p),
        ("bw", ctypes.c_int32), ("bh", ctypes.c_int32),
        ("bw_pad", ctypes.c_int32), ("bh_pad", ctypes.c_int32),
        ("stride", ctypes.c_int32),
        ("h", ctypes.c_int32), ("v", ctypes.c_int32),
    ]


lib.mj_sparse_expand.restype = ctypes.c_long
lib.mj_sparse_expand.argtypes = [
    u32p, i16p, i32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, i16p]

lib.mj_sparse_expand_flat.restype = ctypes.c_long
lib.mj_sparse_expand_flat.argtypes = [
    u32p, u8p, i16p, ctypes.c_long, ctypes.c_long, ctypes.c_long, i16p]

lib.mj_transport_decode.restype = ctypes.c_long
lib.mj_transport_decode.argtypes = [
    u32p, ctypes.c_long, i32p, ctypes.c_int, ctypes.c_long,
    i32p, i64p, i32p, u8p,
    i32p, i64p, i32p, u8p, i16p]

lib.mj_encode_seq.restype = ctypes.c_long
lib.mj_encode_seq.argtypes = [
    cpp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u32p, u8p, u32p, u8p, u8p, ctypes.c_long, i64p, i64p, ctypes.c_int]

lib.mj_encode_dc_first.restype = ctypes.c_long
lib.mj_encode_dc_first.argtypes = [
    cpp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u32p, u8p, u8p, ctypes.c_long, i64p, ctypes.c_int]

lib.mj_encode_dc_refine.restype = ctypes.c_long
lib.mj_encode_dc_refine.argtypes = [
    cpp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u8p, ctypes.c_long]

lib.mj_encode_ac_first.restype = ctypes.c_long
lib.mj_encode_ac_first.argtypes = [
    cpp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u32p, u8p, u8p, ctypes.c_long, i64p, ctypes.c_int]

lib.mj_encode_ac_refine.restype = ctypes.c_long
lib.mj_encode_ac_refine.argtypes = lib.mj_encode_ac_first.argtypes

lib.mj_gen_optimal_table.restype = ctypes.c_long
lib.mj_gen_optimal_table.argtypes = [i64p, u8p, u8p]

lib.mj_reset_warnings.restype = None
lib.mj_reset_warnings.argtypes = []
lib.mj_get_warnings.restype = ctypes.c_long
lib.mj_get_warnings.argtypes = []

lib.mj_decode_seq.restype = ctypes.c_long
lib.mj_decode_seq.argtypes = [
    u8p, ctypes.c_long, cpp, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, i64p, i32p, u8p, i32p, i64p, i32p, u8p, i32p, i64p]

lib.mj_set_warnings.restype = None
lib.mj_set_warnings.argtypes = [ctypes.c_long]

lib.mj_decode_seq_par.restype = ctypes.c_long
lib.mj_decode_seq_par.argtypes = [
    u8p, ctypes.c_long, cpp, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, i64p, i32p, u8p, i32p, i64p, i32p, u8p, i32p, ctypes.c_int,
    i64p]

lib.mj_ac_refine_schedule.restype = ctypes.c_long
lib.mj_ac_refine_schedule.argtypes = [
    i32p, i32p, i32p, ctypes.c_long, ctypes.c_long,
    i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p]

lib.mj_decode_dc_first.restype = ctypes.c_long
lib.mj_decode_dc_first.argtypes = [
    u8p, ctypes.c_long, cpp, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, i64p, i32p, u8p, i32p, i64p]

lib.mj_decode_dc_refine.restype = ctypes.c_long
lib.mj_decode_dc_refine.argtypes = [
    u8p, ctypes.c_long, cpp, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i64p]

lib.mj_decode_ac_first.restype = ctypes.c_long
lib.mj_decode_ac_first.argtypes = [
    u8p, ctypes.c_long, cpp,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, i64p, i32p, u8p, i32p, i64p]

lib.mj_decode_ac_refine.restype = ctypes.c_long
lib.mj_decode_ac_refine.argtypes = lib.mj_decode_ac_first.argtypes

scp = _p(SearchComp)
lib.mj_scan_search.restype = ctypes.c_long
lib.mj_scan_search.argtypes = [
    scp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, u8p, ctypes.c_long, i32p, ctypes.c_int]

lib.mj_prep_ycc.restype = ctypes.c_long
lib.mj_prep_ycc.argtypes = [
    u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u8p, u8p, u8p, ctypes.c_int]

lib.mj_sparse_count.restype = ctypes.c_long
lib.mj_sparse_count.argtypes = [i16p, ctypes.c_long, ctypes.c_int, i32p]

lib.mj_sparse_pack.restype = ctypes.c_long
lib.mj_sparse_pack.argtypes = [
    i16p, ctypes.c_long, ctypes.c_int, ctypes.c_int, u32p, i16p]

f32p = _p(ctypes.c_float)
lib.mj_host_p1.restype = ctypes.c_long
lib.mj_host_p1.argtypes = [
    u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p,
    ctypes.c_int, ctypes.c_int, i16p, i32p, f32p, ctypes.c_int]

lib.mj_hist_ac_first.restype = ctypes.c_long
lib.mj_hist_ac_first.argtypes = [
    i16p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_long, i32p]

lib.mj_host_trellis_ac.restype = ctypes.c_long
lib.mj_host_trellis_ac.argtypes = [
    i32p, i16p, ctypes.c_long, ctypes.c_int, i32p, f32p, i32p,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_int]

lib.mj_host_trellis_dc.restype = ctypes.c_long
lib.mj_host_trellis_dc.argtypes = [
    i32p, i16p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    i32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int]

lib.mj_plane_pack.restype = ctypes.c_long
lib.mj_plane_pack.argtypes = [u8p, ctypes.c_long, u8p, u32p, ctypes.c_int]

lib.mj_plane_expand.restype = ctypes.c_long
lib.mj_plane_expand.argtypes = [u8p, u32p, ctypes.c_long, ctypes.c_long,
                                u8p]

lib.mj_host_arith_ac_row.restype = ctypes.c_long
lib.mj_host_arith_ac_row.argtypes = [
    i32p, i16p, ctypes.c_long, i32p, f32p, f32p,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]

lib.mj_host_arith_dc_row.restype = ctypes.c_long
lib.mj_host_arith_dc_row.argtypes = [
    i32p, i16p, ctypes.c_long, ctypes.c_int, f32p, ctypes.c_int, f32p,
    ctypes.c_int, i32p]

lib.mj_host_render.restype = ctypes.c_long
lib.mj_host_render.argtypes = [
    i16p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    u8p, ctypes.c_int]

lib.mj_post_ycc.restype = None
lib.mj_post_ycc.argtypes = [
    u8p, ctypes.c_long, ctypes.c_long, u8p, u8p, ctypes.c_long,
    ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_long, ctypes.c_long, u8p]
