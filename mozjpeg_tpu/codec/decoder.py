"""Decoder: marker parse -> native entropy decode -> device IDCT/upsample.

Bit-exact against djpeg's default path (islow IDCT, fancy upsample, YCbCr
-> RGB). Entropy decoding is sequential by nature and runs in C++; the
pixel path (dequant+IDCT, upsample, color) is batched on device.
"""
from __future__ import annotations

import ctypes
import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.huffman import HuffTable, derive_decode_table
from ..native import CompPlane as NativePlane, lib, u8p, i32p, i64p
from ..ops import color, dct, layout, sample
from . import marker


def _np_ptr(a, typ):
    return a.ctypes.data_as(typ)


def _flatten_decode_tables(tables):
    """{idx: HuffTable} -> flat mincode/maxcode/valptr/vals arrays."""
    mincode = np.zeros((4, 17), dtype=np.int32)
    maxcode = np.full((4, 18), -1, dtype=np.int64)
    valptr = np.zeros((4, 17), dtype=np.int32)
    vals = np.zeros((4, 256), dtype=np.uint8)
    for idx, tbl in tables.items():
        mn, mx, vp, vl = derive_decode_table(tbl)
        mincode[idx] = mn
        maxcode[idx] = mx
        valptr[idx] = vp
        vals[idx, :len(vl)] = vl
    return (np.ascontiguousarray(mincode), np.ascontiguousarray(maxcode),
            np.ascontiguousarray(valptr), np.ascontiguousarray(vals))


def _comp_qtable(jp: marker.ParsedJpeg, ci: int):
    """The quant table for component ci as latched at its FIRST scan
    (jdinput.c latch_quant_tables): progressive/multi-scan files may
    redefine a DQT between scans, and each component keeps the table
    current when it was first scanned."""
    c = jp.components[ci]
    for si, scan in enumerate(jp.scans):
        if ci in scan.comp_indices:
            t = jp.scan_qtables[si].get(c.quant_tbl)
            if t is not None:
                return t
            break
    return jp.scan_qtables[0].get(
        c.quant_tbl, jp.qtables.get(c.quant_tbl))


def decode_coefficients(jp: marker.ParsedJpeg, data: bytes, planes=None):
    """Entropy-decode all scans -> list of (bh_pad, bw_pad, 64) int16 zigzag
    planes (MCU-padded dims). planes: continue into existing arrays (the
    buffered-image incremental path) instead of fresh zeros.

    Side effects on jp (consumed by progressive block smoothing):
    jp.coef_bits / jp.coef_bits_prev -- the progression status table
    (jdphuff.c:126-144), and jp.last_good_imcu_row -- the last input
    iMCU row decoded with sufficient data (jdcoefct.c:233-234)."""
    marker.validate_decodable(jp)
    max_h, max_v = jp.max_h, jp.max_v
    mcus_x = -(-jp.width // (8 * max_h))
    mcus_y = -(-jp.height // (8 * max_v))
    if planes is None:
        planes = []
        for c in jp.components:
            planes.append(np.zeros((mcus_y * c.v, mcus_x * c.h, 64),
                                   dtype=np.int16))
    buf = np.frombuffer(data, dtype=np.uint8)

    ncomps = len(jp.components)
    cb_cur = np.full((ncomps, 64), -1, dtype=np.int32)
    cb_prev = np.full((ncomps, 64), -1, dtype=np.int32)
    last_good = mcus_y - 1
    warn_buf = np.zeros(1, dtype=np.int64)   # per-call counter: the global
    # one is shared by concurrent decodes (decode_many) and cannot be
    # reset/read per image without racing

    def decode_one(si, scan, lg_out):
        htables = jp.scan_htables[si]
        restart = jp.scan_restart[si]
        dc_tables = {i: t for (cls, i), t in htables.items() if cls == 0}
        ac_tables = {i: t for (cls, i), t in htables.items() if cls == 1}
        dmn, dmx, dvp, dvl = _flatten_decode_tables(dc_tables)
        amn, amx, avp, avl = _flatten_decode_tables(ac_tables)
        seg = np.ascontiguousarray(buf[scan.data_start:scan.data_end])
        seg_len = scan.data_end - scan.data_start

        interleaved = len(scan.comp_indices) > 1
        arr = (NativePlane * len(scan.comp_indices))()
        for i, ci in enumerate(scan.comp_indices):
            c = jp.components[ci]
            p = planes[ci]
            arr[i].coef = p.ctypes.data
            if interleaved:
                arr[i].bw, arr[i].bh = p.shape[1], p.shape[0]
                arr[i].h, arr[i].v = c.h, c.v
            else:
                cw = -(-jp.width * c.h // max_h)
                ch = -(-jp.height * c.v // max_v)
                arr[i].bw, arr[i].bh = -(-cw // 8), -(-ch // 8)
                arr[i].h, arr[i].v = 1, 1
            arr[i].stride = p.shape[1]
            arr[i].dc_tbl = scan.dc_tbls[ci]
            arr[i].ac_tbl = scan.ac_tbls[ci]
        if interleaved:
            smx, smy = mcus_x, mcus_y
        else:
            smx, smy = arr[0].bw, arr[0].bh

        if not jp.progressive:
            r = -2
            nseg = (smx * smy + restart - 1) // restart if restart else 1
            if restart and nseg >= 4:
                # restart segments decode concurrently (the reference pays
                # ~20% for restart markers, README-turbo.txt:344-347; here
                # they are the parallelism). Any corruption or structural
                # surprise falls back to the serial warn-and-resync path
                # (the parallel attempt records no warnings itself).
                nthreads = min(8, os.cpu_count() or 1, nseg)
                r = lib.mj_decode_seq_par(
                    _np_ptr(seg, u8p), seg_len, arr,
                    len(scan.comp_indices), smx, smy, restart,
                    _np_ptr(dmn, i32p), _np_ptr(dmx, i64p),
                    _np_ptr(dvp, i32p), _np_ptr(dvl, u8p),
                    _np_ptr(amn, i32p), _np_ptr(amx, i64p),
                    _np_ptr(avp, i32p), _np_ptr(avl, u8p),
                    _np_ptr(lg_out, i32p), nthreads,
                    _np_ptr(warn_buf, i64p))
                if r in (-2, -3):
                    # re-zero this scan's blocks: the serial decoder's
                    # truncation semantics assume pre-zeroed planes
                    for ci in scan.comp_indices:
                        planes[ci][:] = 0
            if r in (-2, -3):
                r = lib.mj_decode_seq(
                    _np_ptr(seg, u8p), seg_len, arr,
                    len(scan.comp_indices), smx, smy, restart,
                    _np_ptr(dmn, i32p), _np_ptr(dmx, i64p),
                    _np_ptr(dvp, i32p), _np_ptr(dvl, u8p),
                    _np_ptr(amn, i32p), _np_ptr(amx, i64p),
                    _np_ptr(avp, i32p), _np_ptr(avl, u8p),
                    _np_ptr(lg_out, i32p), _np_ptr(warn_buf, i64p))
        elif scan.Ss == 0:
            if scan.Ah == 0:
                r = lib.mj_decode_dc_first(
                    _np_ptr(seg, u8p), seg_len, arr, len(scan.comp_indices),
                    smx, smy, restart, scan.Al,
                    _np_ptr(dmn, i32p), _np_ptr(dmx, i64p),
                    _np_ptr(dvp, i32p), _np_ptr(dvl, u8p),
                    _np_ptr(lg_out, i32p), _np_ptr(warn_buf, i64p))
            else:
                r = lib.mj_decode_dc_refine(
                    _np_ptr(seg, u8p), seg_len, arr, len(scan.comp_indices),
                    smx, smy, restart, scan.Al, _np_ptr(lg_out, i32p),
                    _np_ptr(warn_buf, i64p))
        else:
            fn = (lib.mj_decode_ac_first if scan.Ah == 0
                  else lib.mj_decode_ac_refine)
            r = fn(_np_ptr(seg, u8p), seg_len, arr,
                   scan.Ss, scan.Se, scan.Al, restart,
                   _np_ptr(amn, i32p), _np_ptr(amx, i64p), _np_ptr(avp, i32p),
                   _np_ptr(avl, u8p), _np_ptr(lg_out, i32p),
                   _np_ptr(warn_buf, i64p))
        if r < 0:
            raise ValueError("corrupt scan %d" % si)
        # scan-local MCU row -> image iMCU row (jdcoefct consume_data
        # assigns last_good_iMCU_row = input_iMCU_row per MCU)
        if interleaved:
            return int(lg_out[0])
        v = jp.components[scan.comp_indices[0]].v
        return min(int(lg_out[0]) // v, mcus_y - 1)

    # progression status bookkeeping is header-only (jdphuff.c:126-144)
    if jp.progressive:
        for si, scan in enumerate(jp.scans):
            for ci in scan.comp_indices:
                lo, hi = min(scan.Ss, 1), max(scan.Se, 9)
                cb_prev[ci, lo:hi + 1] = (cb_cur[ci, lo:hi + 1]
                                          if si > 0 else 0)
                cb_cur[ci, scan.Ss:scan.Se + 1] = scan.Al

    nscans = len(jp.scans)
    if jp.progressive and nscans > 2 and os.environ.get(
            "MJ_PARALLEL_SCAN_DECODE", "1") not in ("0", "false", "off"):
        # Scans touching disjoint (component, band) regions decode
        # concurrently; refinement chains (same component, overlapping
        # spectral range) stay ordered. Entropy state is per scan, so
        # results are order-independent (jdphuff.c keeps no cross-scan
        # entropy state).
        from concurrent.futures import ThreadPoolExecutor

        def rng_of(scan):
            return (0, 0) if scan.Ss == 0 else (scan.Ss, scan.Se)

        deps = []
        for si, scan in enumerate(jp.scans):
            d = []
            lo, hi = rng_of(scan)
            for sj in range(si - 1, -1, -1):
                pj = jp.scans[sj]
                lo2, hi2 = rng_of(pj)
                if (set(scan.comp_indices) & set(pj.comp_indices)
                        and lo <= hi2 and lo2 <= hi):
                    d.append(sj)       # every overlapping prior: a scan
                                       # can refine several disjoint ones
            deps.append(d)
        futs = [None] * nscans

        def run(si):
            for sj in deps[si]:
                futs[sj].result()
            return decode_one(si, jp.scans[si],
                              np.zeros(1, dtype=np.int32))

        with ThreadPoolExecutor(max_workers=min(8, nscans)) as ex:
            for si in range(nscans):
                futs[si] = ex.submit(run, si)
            lgs = [f.result() for f in futs]
        last_good = lgs[-1]
        if int(warn_buf[0]):
            # corrupt stream: the AC overrun clamp can write outside a
            # scan's band (jdhuff natural-order padding), which races
            # between concurrent scans — redo serially for djpeg-exact
            # warn-and-resync semantics
            for pl in planes:
                pl[:] = 0
            warn_buf[0] = 0
            for si, scan in enumerate(jp.scans):
                last_good = decode_one(si, scan,
                                       np.zeros(1, dtype=np.int32))
    else:
        for si, scan in enumerate(jp.scans):
            last_good = decode_one(si, scan, np.zeros(1, dtype=np.int32))

    jp.coef_bits = cb_cur if jp.progressive else None
    jp.coef_bits_prev = cb_prev if jp.progressive else None
    jp.last_good_imcu_row = last_good
    jp.warnings = int(warn_buf[0])
    lib.mj_set_warnings(int(warn_buf[0]))   # last_warnings() compatibility
    return planes


def last_warnings() -> int:
    """Corrupt-data warning count of the most recent Huffman decode
    (jerror num_warnings): djpeg exits with status 2 when nonzero and
    treats any warning as fatal under -strict (djpeg.c:581,941)."""
    return int(lib.mj_get_warnings())


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _render_plane(zz, qtbl, bh: int, bw: int, ch: int, cw: int,
                  precision: int = 8, dct_method: str = "islow"):
    """(bh, bw, 64) zigzag int16 + qtbl -> (ch, cw) samples."""
    blocks = layout.from_zigzag(zz.astype(jnp.int32))
    if dct_method == "ifast":
        pix = dct.idct_ifast(blocks, qtbl, precision)
    elif dct_method == "float":
        pix = dct.idct_float(blocks, qtbl, precision)
    else:
        pass1_bits = 2 if precision == 8 else 1        # jidctint.c:80-86
        pix = dct.idct_islow(blocks, qtbl, pass1_bits, precision)
    plane = layout.unblockify(pix)
    return plane[:ch, :cw]


def decode_raw_planes_parsed(jp, planes):
    """jpeg_read_raw_data render from already-decoded coefficients:
    per-component (ph, pw) uint8 sample planes at sampling-grid-padded
    dims (the single-image tail of decode_raw_planes)."""
    max_h, max_v = jp.max_h, jp.max_v
    pw0 = -(-jp.width // max_h) * max_h
    ph0 = -(-jp.height // max_v) * max_v
    out = []
    for ci, c in enumerate(jp.components):
        pw = pw0 * c.h // max_h
        ph = ph0 * c.v // max_v
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = _comp_qtable(jp, ci)
        pl = np.asarray(_render_plane(
            jnp.asarray(planes[ci][:bh, :bw]), jnp.asarray(qt),
            bh, bw, min(ph, bh * 8), min(pw, bw * 8), jp.precision))
        full = np.zeros((ph, pw), np.uint8)
        full[:pl.shape[0], :pl.shape[1]] = pl
        out.append(full)
    return out


def decode_raw_planes(data: bytes):
    """jpeg_read_raw_data semantics (jdapistd.c, raw_data_out=TRUE): decode
    to per-component sample planes at sampling-grid-padded dims with no
    upsampling or color conversion. -> (planes, width, height, samp) where
    planes[i] is (ph, pw) uint8 and samp the (h, v) factors."""
    jp = marker.parse(data)
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    max_h, max_v = jp.max_h, jp.max_v
    pw0 = -(-jp.width // max_h) * max_h
    ph0 = -(-jp.height // max_v) * max_v
    out = []
    samp = []
    for ci, c in enumerate(jp.components):
        pw = pw0 * c.h // max_h
        ph = ph0 * c.v // max_v
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = _comp_qtable(jp, ci)
        pl = np.asarray(_render_plane(
            jnp.asarray(planes[ci][:bh, :bw]), jnp.asarray(qt),
            bh, bw, min(ph, bh * 8), min(pw, bw * 8), jp.precision))
        full = np.zeros((ph, pw), np.uint8)
        full[:pl.shape[0], :pl.shape[1]] = pl
        out.append(full)
        samp.append((c.h, c.v))
    return out, jp.width, jp.height, samp


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _upsample_color(y, cb, cr, mode: str, height: int, width: int,
                    precision: int = 8, hexp: int = 1, vexp: int = 1):
    def up(pl):
        if mode == "h2v2":
            return sample.upsample_h2v2_fancy(pl)
        if mode == "h2v1":
            return sample.upsample_h2v1_fancy(pl)
        if mode == "h1v2":
            return sample.upsample_h1v2_fancy(pl)
        if mode == "int":
            # replicate (jdsample.c int_upsample); also the -nosmooth
            # box filter / merged-upsample path
            return sample.upsample_replicate(pl, hexp, vexp)
        return pl

    cb = up(cb)[:height, :width]
    cr = up(cr)[:height, :width]
    ycc = jnp.stack([y[:height, :width], cb, cr], axis=-1)
    return color.ycc_to_rgb(ycc, precision)


def _jpeg_colorspace(jp: marker.ParsedJpeg) -> str:
    """Infer the JPEG colorspace (jdmaster.c default_decompress_parms):
    JFIF implies YCbCr; Adobe transform 0 -> RGB/CMYK, 1 -> YCbCr,
    2 -> YCCK; otherwise guess from component IDs."""
    n = len(jp.components)
    if n == 1:
        return "grayscale"
    if n == 2:
        # libjpeg has no color transform for 2 components
        raise ValueError("unsupported color conversion request "
                         "(2-component frame)")
    if n == 4:
        return "ycck" if jp.adobe_transform == 2 else "cmyk"
    if jp.adobe_transform is not None:
        return "rgb" if jp.adobe_transform == 0 else "ycbcr"
    ids = [c.cid for c in jp.components]
    if ids == [0x52, 0x47, 0x42]:
        return "rgb"
    return "ycbcr"


def _upsample_mode(jp, fancy=True, comp=1):
    """(mode, hexp, vexp) per jdsample.c:448-530 at full size, for the
    given component (each component upsamples independently)."""
    c1 = jp.components[comp]
    hexp = jp.max_h // c1.h
    vexp = jp.max_v // c1.v
    if (hexp, vexp) == (1, 1):
        return "none", 1, 1
    if (hexp, vexp) == (2, 2) and fancy:
        return "h2v2", 2, 2
    if (hexp, vexp) == (2, 1) and fancy:
        return "h2v1", 2, 1
    if (hexp, vexp) == (1, 2) and fancy:
        return "h1v2", 1, 2
    return "int", hexp, vexp


def _smooth_latches(jp):
    """coef_bits latches for block smoothing (smoothing_ok,
    jdcoefct.c:373-420): current = this scan's coef_bits; previous =
    the prior scan's, or -1 when only one scan was started."""
    n = len(jp.components)
    cur = np.asarray(jp.coef_bits)[:, :10].copy()
    prev = np.full((n, 10), -1, dtype=np.int32)
    if len(jp.scans) > 1:
        prev[:, 1:10] = np.asarray(jp.coef_bits_prev)[:, 1:10]
    prev[:, 0] = cur[:, 0]
    return cur, prev


def _maybe_smooth(jp, planes, block_smoothing: bool):
    """Return possibly-smoothed per-component (bh, bw, 64) int arrays."""
    from . import smooth
    max_h, max_v = jp.max_h, jp.max_v
    mcus_y = -(-jp.height // (8 * max_v))
    use = (block_smoothing and getattr(jp, "coef_bits", None) is not None
           and smooth.smoothing_ok(jp, jp.coef_bits))
    out = []
    cur = prev = None
    if use:
        cur, prev = _smooth_latches(jp)
    for ci, c in enumerate(jp.components):
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        if use:
            qt = _comp_qtable(jp, ci)
            out.append(smooth.smooth_component(
                planes[ci], bh, bw, c.v, mcus_y, qt, cur[ci], prev[ci],
                jp.last_good_imcu_row))
        else:
            out.append(planes[ci][:bh, :bw])
    return out


def _render_host_yuv(jp, planes, raw_dims, nthreads: int = 1):
    """Host per-component sample planes at jpeg_read_raw_data dims
    (native mj_host_render), or None outside the host matrix."""
    import os as _os
    from ..native import lib, i16p, i32p, u8p
    if _os.environ.get("MJ_HOST_ENGINE", "1") == "0":
        return None
    if jp.precision != 8:
        return None
    if _jpeg_colorspace(jp) not in ("ycbcr", "grayscale"):
        return None
    gray = _jpeg_colorspace(jp) == "grayscale"
    ncomps = 1 if gray else 3
    max_h, max_v = jp.max_h, jp.max_v
    out = []
    for ci in range(ncomps):
        c = jp.components[ci]
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = np.ascontiguousarray(
            np.asarray(_comp_qtable(jp, ci)).reshape(64).astype(np.int32))
        zz = np.ascontiguousarray(
            np.asarray(planes[ci])[:bh, :bw].astype(np.int16))
        ph, pw = raw_dims[ci]
        # raw planes carry decoded samples out to the BLOCK edge (the
        # last block's IDCT content beyond the image dims), zeros only
        # past that — same as the device chunk path's min() clipping
        rh, rw = min(ph, bh * 8), min(pw, bw * 8)
        full = np.zeros((ph, pw), np.uint8)
        tmp = np.empty((rh, rw), np.uint8)
        lib.mj_host_render(zz.ctypes.data_as(i16p),
                           qt.ctypes.data_as(i32p), bw, bh, rh, rw,
                           tmp.ctypes.data_as(u8p), nthreads)
        full[:rh, :rw] = tmp
        out.append(full)
    return out


def _render_host(jp, planes, colorspace, fancy_upsample,
                 block_smoothing, nthreads=None):
    """Serial decode on host CPU (native mj_host_render dequant+IDCT +
    mj_post_ycc upsample/color): the low-latency twin of the device
    render — a remote-attached device costs two tunnel round trips per
    image. Returns None outside the supported matrix (8-bit islow,
    YCbCr/grayscale, no active block smoothing, h2v2/h2v1/int/none
    upsampling); pixel-identical to the device render (both pinned vs
    djpeg)."""
    import os as _os
    from . import smooth as _smooth
    from ..native import lib, i16p, i32p, u8p
    if _os.environ.get("MJ_HOST_ENGINE", "1") == "0":
        return None
    if jp.precision != 8:
        return None
    cs = colorspace or _jpeg_colorspace(jp)
    if cs not in ("ycbcr", "grayscale"):
        return None
    if (block_smoothing and getattr(jp, "coef_bits", None) is not None
            and _smooth.smoothing_ok(jp, jp.coef_bits)):
        return None
    gray = cs == "grayscale"
    ncomps = 1 if gray else 3
    if len(jp.components) < ncomps:
        return None
    if not gray:
        mode, hexp, vexp = _upsample_mode(jp, fancy_upsample)
        if mode not in _POST_MODES:
            return None
        c1, c2 = jp.components[1], jp.components[2]
        if (c1.h, c1.v) != (c2.h, c2.v):
            return None
    nt = nthreads if nthreads else max(1, (_os.cpu_count() or 4))
    max_h, max_v = jp.max_h, jp.max_v
    sample_planes = []
    for ci in range(ncomps):
        c = jp.components[ci]
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = np.ascontiguousarray(
            np.asarray(_comp_qtable(jp, ci)).reshape(64).astype(np.int32))
        zz = np.ascontiguousarray(
            np.asarray(planes[ci])[:bh, :bw].astype(np.int16))
        out_p = np.empty((ch, cw), np.uint8)
        lib.mj_host_render(zz.ctypes.data_as(i16p),
                           qt.ctypes.data_as(i32p), bw, bh, ch, cw,
                           out_p.ctypes.data_as(u8p), nt)
        sample_planes.append(out_p)
    if gray:
        return sample_planes[0][:jp.height, :jp.width]
    y, cb, cr = sample_planes
    rgb = np.empty((jp.height, jp.width, 3), np.uint8)
    lib.mj_post_ycc(y.ctypes.data_as(u8p), y.shape[0], y.shape[1],
                    cb.ctypes.data_as(u8p), cr.ctypes.data_as(u8p),
                    cb.shape[0], cb.shape[1], _POST_MODES[mode],
                    hexp, vexp, jp.height, jp.width,
                    rgb.ctypes.data_as(u8p))
    return rgb


def render(jp: marker.ParsedJpeg, planes: List[np.ndarray],
           colorspace: Optional[str] = None,
           fancy_upsample: bool = True,
           dct_method: str = "islow",
           block_smoothing: bool = True) -> np.ndarray:
    """Coefficient planes -> pixels: RGB (H, W, 3), gray (H, W), or
    CMYK (H, W, 4) for Adobe 4-component files."""
    if dct_method == "islow":
        host = _render_host(jp, planes, colorspace, fancy_upsample,
                            block_smoothing)
        if host is not None:
            return host
    max_h, max_v = jp.max_h, jp.max_v
    smoothed = _maybe_smooth(jp, planes, block_smoothing)
    sample_planes = []
    for ci, c in enumerate(jp.components):
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = _comp_qtable(jp, ci)
        if dct_method == "ifast":
            qt = dct.ifast_multipliers(qt)
        elif dct_method == "float":
            qt = dct.float_multipliers(qt)
        zz = jnp.asarray(smoothed[ci])
        sample_planes.append(_render_plane(zz, jnp.asarray(qt), bh, bw,
                                           ch, cw, jp.precision,
                                           dct_method))

    cs = colorspace or _jpeg_colorspace(jp)
    if cs == "grayscale":
        return np.asarray(sample_planes[0])[:jp.height, :jp.width]
    if cs in ("rgb", "cmyk"):
        # null conversion: stored components are the output channels
        out = [np.asarray(p)[:jp.height, :jp.width] for p in sample_planes]
        return np.stack(out, axis=-1)
    mode, hexp, vexp = _upsample_mode(jp, fancy_upsample)
    if cs == "ycck":
        y, cb, cr, k = sample_planes
        kmode, khexp, kvexp = _upsample_mode(jp, fancy_upsample, comp=3)
        cmyk = _upsample_ycck(y, cb, cr, k, mode, jp.height, jp.width,
                              jp.precision, hexp, vexp,
                              kmode, khexp, kvexp)
        return np.asarray(cmyk)
    y, cb, cr = sample_planes[:3]
    rgb = _upsample_color(y, cb, cr, mode, jp.height, jp.width,
                          jp.precision, hexp, vexp)
    return np.asarray(rgb)


@functools.partial(jax.jit,
                   static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _upsample_ycck(y, cb, cr, k, mode: str, height: int, width: int,
                   precision: int = 8, hexp: int = 1, vexp: int = 1,
                   kmode: str = "none", khexp: int = 1, kvexp: int = 1):
    from ..ops import color as _color
    def up(pl, m, he, ve):
        if m == "h2v2":
            return sample.upsample_h2v2_fancy(pl)
        if m == "h2v1":
            return sample.upsample_h2v1_fancy(pl)
        if m == "h1v2":
            return sample.upsample_h1v2_fancy(pl)
        if m == "int":
            return sample.upsample_replicate(pl, he, ve)
        return pl
    cb = up(cb, mode, hexp, vexp)
    cr = up(cr, mode, hexp, vexp)
    k = up(k, kmode, khexp, kvexp)           # K upsamples independently
    ycck = jnp.stack([y[:height, :width], cb[:height, :width],
                      cr[:height, :width], k[:height, :width]], axis=-1)
    return _color.ycck_to_cmyk(ycck, precision)


def decode(data: bytes, fancy_upsample: bool = True,
           dct_method: str = "islow",
           block_smoothing: bool = True) -> np.ndarray:
    """Decode a JPEG byte stream to RGB (H, W, 3) or grayscale (H, W).

    fancy_upsample=False is djpeg -nosmooth (box-filter upsampling; pass
    block_smoothing=False too for full -nosmooth semantics);
    dct_method="ifast" is djpeg -dct fast. Truncated/partial progressive
    streams render like djpeg: missing data leaves coefficients at their
    last decoded state and block smoothing interpolates the rest."""
    jp = marker.parse(data)
    if jp.lossless:
        from . import lossless
        return lossless.decode_lossless(jp, data)
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    return render(jp, planes, fancy_upsample=fancy_upsample,
                  dct_method=dct_method, block_smoothing=block_smoothing)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _render_plane_scaled(zz, qtbl, bh: int, bw: int, ch: int, cw: int,
                         size: int):
    """(bh, bw, 64) zigzag -> (ch, cw) samples at any scaled IDCT size
    1..16 (jidctred.c / jidctint.c kernels)."""
    from ..ops import idct_scaled
    blocks = layout.from_zigzag(zz.astype(jnp.int32))
    if size == 8:
        pix = dct.idct_islow(blocks, qtbl)
    elif size == 4:
        pix = idct_scaled.idct_4x4(blocks, qtbl)
    elif size == 2:
        pix = idct_scaled.idct_2x2(blocks, qtbl)
    elif size == 1:
        pix = idct_scaled.idct_1x1(blocks, qtbl)
    elif size in idct_scaled._REDUCED:
        pix = idct_scaled.idct_reduced(blocks, qtbl, size)
    else:
        pix = idct_scaled.idct_expanded(blocks, qtbl, size)
    x = jnp.moveaxis(pix, -2, -3)
    plane = x.reshape(bh * size, bw * size)
    return plane[:ch, :cw]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _upsample_plane_scaled(pl, mode: str, hexp: int, vexp: int,
                           precision: int = 8):
    if mode == "fancy_h2v2":
        return sample.upsample_h2v2_fancy(pl)
    if mode == "fancy_h2v1":
        return sample.upsample_h2v1_fancy(pl)
    if mode == "fancy_h1v2":
        return sample.upsample_h1v2_fancy(pl)
    if mode == "int":
        return sample.upsample_replicate(pl, hexp, vexp)
    return pl


def decode_grayscale(data: bytes, fancy_upsample: bool = True,
                     block_smoothing: bool = True) -> np.ndarray:
    """djpeg -grayscale: YCbCr sources copy the Y channel (jdcolor.c:432
    grayscale/YCbCr->gray is a null conversion of component 0; chroma is
    not even IDCT'd), RGB sources use the fixed-point Y formula
    (rgb_gray_convert, jdcolor.c:338)."""
    jp = marker.parse(data)
    if jp.lossless:
        from . import lossless
        img = lossless.decode_lossless(jp, data)
        return img if img.ndim == 2 else img[..., 0]
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    cs = _jpeg_colorspace(jp)
    if cs == "rgb":
        rgb = render(jp, planes, fancy_upsample=fancy_upsample,
                     block_smoothing=block_smoothing)
        from ..ops import color as _color
        return np.asarray(_color.rgb_to_gray(jnp.asarray(rgb)))
    if cs not in ("grayscale", "ycbcr"):
        raise ValueError("cannot convert %s to grayscale" % cs)
    smoothed = _maybe_smooth(jp, planes, block_smoothing)
    c = jp.components[0]
    max_h, max_v = jp.max_h, jp.max_v
    cw = -(-jp.width * c.h // max_h)
    ch = -(-jp.height * c.v // max_v)
    bw, bh = -(-cw // 8), -(-ch // 8)
    qt = _comp_qtable(jp, 0)
    pl = _render_plane(jnp.asarray(smoothed[0]), jnp.asarray(qt), bh, bw,
                       ch, cw, jp.precision, "islow")
    return np.asarray(pl)[:jp.height, :jp.width]


def decode_scaled(data: bytes, num: int, den: int,
                  fancy_upsample: bool = True,
                  block_smoothing: bool = True,
                  colorspace: Optional[str] = None) -> np.ndarray:
    """Scaled decode (djpeg -scale num/den): output M/8 for M = 1..16.

    Follows jdmaster.c jpeg_core_output_dimensions, the per-component
    scaled-size doubling rule (jdmaster.c:289-296), and jdsample.c's
    upsampler selection (fancy / replicate / integral factors)."""
    jp = marker.parse(data)
    min_size = None
    for sz in range(1, 17):
        if num * 8 <= den * sz:
            min_size = sz
            break
    if min_size is None:
        raise ValueError("scale %d/%d > 2 not supported" % (num, den))
    out_w = -(-jp.width * min_size // 8)
    out_h = -(-jp.height * min_size // 8)

    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    max_h, max_v = jp.max_h, jp.max_v
    smoothed = _maybe_smooth(jp, planes, block_smoothing)

    # fancy upsampling is disabled at 1/8 scale (jdsample.c:444)
    fancy = fancy_upsample and min_size > 1
    sample_planes = []
    for ci, c in enumerate(jp.components):
        ssize = min_size
        while (ssize < 8
               and (max_h * min_size) % (c.h * ssize * 2) == 0
               and (max_v * min_size) % (c.v * ssize * 2) == 0):
            ssize *= 2
        down_w = -(-jp.width * c.h * ssize // (max_h * 8))
        down_h = -(-jp.height * c.v * ssize // (max_v * 8))
        cw_full = -(-jp.width * c.h // max_h)
        ch_full = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw_full // 8), -(-ch_full // 8)
        qt = _comp_qtable(jp, ci)
        zz = jnp.asarray(np.ascontiguousarray(smoothed[ci]))
        pl = _render_plane_scaled(zz, jnp.asarray(qt), bh, bw,
                                  down_h, down_w, ssize)
        # upsampler selection (jdsample.c:448-530)
        h_in = c.h * ssize // min_size
        v_in = c.v * ssize // min_size
        mode, hexp, vexp = "none", 1, 1
        if h_in == max_h and v_in == max_v:
            pass
        elif h_in * 2 == max_h and v_in == max_v:
            mode = "fancy_h2v1" if fancy and down_w > 2 else "int"
            hexp, vexp = 2, 1
        elif h_in == max_h and v_in * 2 == max_v and fancy:
            mode = "fancy_h1v2"
        elif h_in * 2 == max_h and v_in * 2 == max_v:
            mode = "fancy_h2v2" if fancy and down_w > 2 else "int"
            hexp, vexp = 2, 2
        elif max_h % h_in == 0 and max_v % v_in == 0:
            mode = "int"
            hexp, vexp = max_h // h_in, max_v // v_in
        else:
            raise NotImplementedError("fractional upsampling")
        pl = _upsample_plane_scaled(pl, mode, hexp, vexp, jp.precision)
        sample_planes.append(pl)

    cs = colorspace or _jpeg_colorspace(jp)
    if cs == "grayscale":
        return np.asarray(sample_planes[0])[:out_h, :out_w]
    if cs in ("rgb", "cmyk"):
        out = [np.asarray(p)[:out_h, :out_w] for p in sample_planes]
        return np.stack(out, axis=-1)
    if cs == "ycck":
        y, cb, cr, k = sample_planes
        return np.asarray(_upsample_ycck(y, cb, cr, k, "none",
                                         out_h, out_w, jp.precision))
    y, cb, cr = sample_planes[:3]
    rgb = _upsample_color(y, cb, cr, "none", out_h, out_w, jp.precision)
    return np.asarray(rgb)


def quantize_colors(rgb: np.ndarray, ncolors: int,
                    dither: str = "fs", two_pass: bool = True):
    """Color quantization (djpeg -colors N semantics): returns
    (indices (H, W) uint8, colormap (n, 3) uint8).

    two_pass=True is jquant2 (median cut + optional FS dither; ordered
    falls back to FS like the reference); two_pass=False is jquant1's
    fixed orthogonal palette with none/ordered/FS dithering."""
    from ..native import lib, u8p
    if two_pass and ncolors < 8:
        # jinit_2pass_quantizer lower bound (jquant2.c)
        raise ValueError("cannot quantize to fewer than 8 colors")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    gray = rgb.ndim == 2
    if gray and two_pass:
        rgb = np.ascontiguousarray(np.stack([rgb] * 3, axis=-1))
        gray = False
    h, w = rgb.shape[:2]
    idx = np.empty((h, w), np.uint8)
    cmap = np.empty(3 * 256, np.uint8)
    if two_pass:
        lib.mj_quantize_colors.restype = ctypes.c_int
        lib.mj_quantize_colors.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_int,
                                           u8p, u8p]
        n = lib.mj_quantize_colors(
            rgb.ctypes.data_as(u8p), w, h, ncolors,
            0 if dither in ("none", None) else 1,
            idx.ctypes.data_as(u8p), cmap.ctypes.data_as(u8p))
    else:
        lib.mj_quantize_onepass.restype = ctypes.c_int
        lib.mj_quantize_onepass.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, u8p, u8p]
        dmode = {"none": 0, None: 0, "ordered": 1, "fs": 2}[dither]
        n = lib.mj_quantize_onepass(
            rgb.ctypes.data_as(u8p), w, h, ncolors, dmode,
            1 if gray else 0,
            idx.ctypes.data_as(u8p), cmap.ctypes.data_as(u8p))
    if n < 0:
        raise ValueError("quantize_colors failed (need 1..256 colors)")
    cm = np.stack([cmap[:256], cmap[256:512], cmap[512:768]],
                  axis=-1)[:n]
    return idx, cm

def read_color_map(data: bytes) -> np.ndarray:
    """djpeg -map FILE (rdcolmap.c): extract a palette from a GIF global
    colormap or the pixels of a maxval-255 PPM (P3/P6), deduplicated in
    order of first appearance. -> (n, 3) uint8."""
    if not data:
        raise ValueError("bad colormap file")
    out: list = []
    seen = set()

    def add(r, g, b):
        if (r, g, b) not in seen:
            if len(out) >= 256:
                raise ValueError("too many colors in map file")
            seen.add((r, g, b))
            out.append((r, g, b))

    if data[0] == 0x47:                       # GIF
        if len(data) < 13 or data[:3] != b"GIF":
            raise ValueError("bad colormap file")
        flags = data[10]
        if not (flags & 0x80):
            raise ValueError("bad colormap file")
        n = 2 << (flags & 7)
        pal = data[13:13 + 3 * n]
        for i in range(n):
            add(pal[3 * i], pal[3 * i + 1], pal[3 * i + 2])
    elif data[0] == 0x50:                     # PPM
        import re
        m = re.match(rb"P([36])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+"
                     rb"(\d+)\s", data)
        if not m:
            raise ValueError("bad colormap file")
        fmt, w, h, maxval = (int(m.group(1)), int(m.group(2)),
                             int(m.group(3)), int(m.group(4)))
        if maxval != 255:
            raise ValueError("bad colormap file")
        if fmt == 6:
            px = np.frombuffer(data[m.end():m.end() + w * h * 3], np.uint8)
        else:
            px = np.array(data[m.end():].split()[:w * h * 3], np.uint8)
        px = px.reshape(-1, 3)
        for r, g, b in px:
            add(int(r), int(g), int(b))
    else:
        raise ValueError("bad colormap file")
    return np.array(out, np.uint8)


def quantize_to_map(rgb: np.ndarray, cmap: np.ndarray,
                    dither: str = "fs"):
    """Quantize to a supplied colormap (jquant2 pass2 with an external
    palette; ordered dithering falls back to FS like the reference)."""
    from ..native import lib as _lib, u8p as _u8p
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if rgb.ndim == 2:
        rgb = np.ascontiguousarray(np.stack([rgb] * 3, axis=-1))
    h, w = rgb.shape[:2]
    idx = np.empty((h, w), np.uint8)
    cm = np.ascontiguousarray(cmap, np.uint8)
    _lib.mj_quantize_to_map.restype = ctypes.c_int
    _lib.mj_quantize_to_map.argtypes = [_u8p, ctypes.c_int, ctypes.c_int,
                                        _u8p, ctypes.c_int, ctypes.c_int,
                                        _u8p]
    r = _lib.mj_quantize_to_map(
        rgb.ctypes.data_as(_u8p), w, h, cm.ctypes.data_as(_u8p),
        len(cm), 0 if dither in ("none", None) else 1,
        idx.ctypes.data_as(_u8p))
    if r < 0:
        raise ValueError("quantize_to_map failed")
    return idx, cm

_DITHER_565 = np.array([
    [0x0A, 0x02, 0x08, 0x00],
    [0x06, 0x0E, 0x04, 0x0C],
    [0x09, 0x01, 0x0B, 0x03],
    [0x05, 0x0D, 0x07, 0x0F]], np.int32)   # byte c%4 of dither_matrix[r%4]


def decode_rgb565(data: bytes, fancy_upsample: bool = True,
                  dither: bool = True) -> np.ndarray:
    """Decode to packed RGB565 little-endian (H, W) uint16
    (jdcol565.c ycc_rgb565[D]_convert with the 4x4 ordered dither of
    jdcolor.c:617-625; TurboJPEG TJPF_RGB565 semantics)."""
    from ..ops.color import (FIX_1_40200, FIX_1_77200, FIX_0_71414,
                             FIX_0_34414, SCALEBITS, ONE_HALF)
    jp = marker.parse(data)
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    cs = _jpeg_colorspace(jp)
    if cs not in ("ycbcr", "grayscale"):
        raise ValueError("RGB565 output requires YCbCr or grayscale")
    smoothed = _maybe_smooth(jp, planes, True)
    max_h, max_v = jp.max_h, jp.max_v
    comps = []
    for ci, c in enumerate(jp.components):
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = _comp_qtable(jp, ci)
        comps.append(np.asarray(_render_plane(
            jnp.asarray(smoothed[ci]), jnp.asarray(qt), bh, bw, ch, cw,
            jp.precision, "islow")))
    H, W = jp.height, jp.width
    if cs == "grayscale":
        # gray_rgb565D packs the SAME dithered value into all channels
        # (DITHER_565_R for each, jdcol565.c:347-392)
        yv = comps[0][:H, :W].astype(np.int32)
        if dither:
            d = _DITHER_565[np.arange(H)[:, None] % 4,
                            np.arange(W)[None, :] % 4]
            yv = yv + d
        gv = np.clip(yv, 0, 255)
        return (((gv << 8) & 0xF800) | ((gv << 3) & 0x7E0)
                | (gv >> 3)).astype(np.uint16)
    else:
        mode, hexp, vexp = _upsample_mode(jp, fancy_upsample)
        def up(pl):
            return np.asarray(_upsample_plane_scaled(
                jnp.asarray(pl),
                {"h2v2": "fancy_h2v2", "h2v1": "fancy_h2v1",
                 "h1v2": "fancy_h1v2"}.get(mode, mode), hexp, vexp))
        yv = comps[0][:H, :W].astype(np.int32)
        cb = up(comps[1])[:H, :W].astype(np.int32) - 128
        cr = up(comps[2])[:H, :W].astype(np.int32) - 128
        r = yv + ((FIX_1_40200 * cr + ONE_HALF) >> SCALEBITS)
        b = yv + ((FIX_1_77200 * cb + ONE_HALF) >> SCALEBITS)
        g = yv + ((-FIX_0_34414 * cb - FIX_0_71414 * cr + ONE_HALF)
                  >> SCALEBITS)
    if dither:
        d = _DITHER_565[np.arange(H)[:, None] % 4,
                        np.arange(W)[None, :] % 4]
        r = r + d
        g = g + (d >> 1)
        b = b + d
    r = np.clip(r, 0, 255)
    g = np.clip(g, 0, 255)
    b = np.clip(b, 0, 255)
    return (((r << 8) & 0xF800) | ((g << 3) & 0x7E0)
            | (b >> 3)).astype(np.uint16)

def decode_cropped(data: bytes, x: int, w: int,
                   fancy_upsample: bool = True,
                   block_smoothing: bool = True,
                   colorspace: Optional[str] = None):
    """Partial-width decode (jpeg_crop_scanline, jdapistd.c:186-300):
    xoffset aligns DOWN to an iMCU column boundary, the width grows left
    to compensate, and upsampling runs over the region with image-edge
    semantics at both region borders. Returns (rgb_or_gray, aligned_x,
    aligned_w); callers slice rows themselves (jpeg_skip_scanlines is
    a pure row restriction for whole-image decodes)."""
    jp = marker.parse(data)
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    max_h, max_v = jp.max_h, jp.max_v
    ncomps = len(jp.components)
    align = 8 if ncomps == 1 else 8 * max_h
    if w == 0 or x + w > jp.width:
        raise ValueError("bad crop width")
    if w == jp.width:
        img = render(jp, planes, colorspace, fancy_upsample,
                     block_smoothing=block_smoothing)
        return img, 0, jp.width
    ax = (x // align) * align
    w2 = w + x - ax
    smoothed = _maybe_smooth(jp, planes, block_smoothing)
    cs = colorspace or _jpeg_colorspace(jp)
    slices = []
    for ci, c in enumerate(jp.components):
        hsf = 1 if ncomps == 1 else c.h
        cw = -(-jp.width * c.h // max_h)
        ch = -(-jp.height * c.v // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        qt = _comp_qtable(jp, ci)
        pl = np.asarray(_render_plane(
            jnp.asarray(smoothed[ci]), jnp.asarray(qt), bh, bw, ch, cw,
            jp.precision, "islow"))
        start = ax * hsf // align * 8
        dw = -(-w2 * c.h // max_h) if ncomps > 1 else w2
        slices.append(jnp.asarray(
            np.ascontiguousarray(pl[:, start:start + dw])))
    if cs == "grayscale":
        return (np.asarray(slices[0])[:jp.height, :w2], ax, w2)
    mode, hexp, vexp = _upsample_mode(jp, fancy_upsample)
    if cs == "ycck":
        y_, cb, cr, k = slices
        kmode, khexp, kvexp = _upsample_mode(jp, fancy_upsample, comp=3)
        out = _upsample_ycck(y_, cb, cr, k, mode, jp.height, w2,
                             jp.precision, hexp, vexp,
                             kmode, khexp, kvexp)
        return np.asarray(out), ax, w2
    if cs in ("rgb", "cmyk"):
        out = [np.asarray(p)[:jp.height, :w2] for p in slices]
        return np.stack(out, axis=-1), ax, w2
    y_, cb, cr = slices[:3]
    rgb = _upsample_color(y_, cb, cr, mode, jp.height, w2,
                          jp.precision, hexp, vexp)
    return np.asarray(rgb), ax, w2

class BufferedImage:
    """Buffered-image mode (jpeg_start_output/jpeg_finish_output,
    libjpeg.txt): render the image as of each completed input scan.
    Pass k shows the coefficient state after scans 1..k, with block
    smoothing applied to the not-yet-received coefficients exactly like
    an interactive progressive viewer."""

    def __init__(self, data: bytes, fancy_upsample: bool = True,
                 block_smoothing: bool = True,
                 dct_method: str = "islow"):
        self._data = data
        self._jp = marker.parse(data)
        self._fancy = fancy_upsample
        self._smooth = block_smoothing
        self._dct = dct_method

    @property
    def num_scans(self) -> int:
        return len(self._jp.scans)

    @property
    def progressive(self) -> bool:
        return self._jp.progressive

    def render_pass(self, nscans: int) -> np.ndarray:
        """Image after consuming the first nscans scans (1-based)."""
        if not 1 <= nscans <= len(self._jp.scans):
            raise ValueError("pass out of range")
        jp = marker.parse(self._data)
        jp.scans = jp.scans[:nscans]
        jp.scan_htables = jp.scan_htables[:nscans]
        jp.scan_restart = jp.scan_restart[:nscans]
        jp.scan_qtables = jp.scan_qtables[:nscans]
        if jp.arithmetic:
            from . import arith
            planes = arith.decode_coefficients_arith(jp, self._data)
        else:
            planes = decode_coefficients(jp, self._data)
        return render(jp, planes, fancy_upsample=self._fancy,
                      dct_method=self._dct,
                      block_smoothing=self._smooth)

    def __iter__(self):
        """Incremental display passes: each scan is entropy-decoded once
        into persistent coefficient planes (the jpeg_consume_input /
        jpeg_start_output model) instead of re-decoding scans 1..k for
        every pass. Arithmetic streams fall back to per-pass decoding
        (the adaptive coder state is not scan-separable here)."""
        jp0 = marker.parse(self._data)
        if jp0.arithmetic:
            for k in range(1, self.num_scans + 1):
                yield self.render_pass(k)
            return
        n = len(jp0.scans)
        all_state = (jp0.scans, jp0.scan_htables, jp0.scan_restart,
                     jp0.scan_qtables)
        planes = None
        ncomps = len(jp0.components)
        cb_cur = np.full((ncomps, 64), -1, dtype=np.int32)
        cb_prev = np.full((ncomps, 64), -1, dtype=np.int32)
        warnings = 0
        for k in range(1, n + 1):
            jpk = marker.parse(self._data)
            jpk.scans = [all_state[0][k - 1]]
            jpk.scan_htables = [all_state[1][k - 1]]
            jpk.scan_restart = [all_state[2][k - 1]]
            jpk.scan_qtables = [all_state[3][k - 1]]
            planes = decode_coefficients(jpk, self._data, planes=planes)
            warnings += jpk.warnings
            # progression status over scans 1..k (jdphuff.c:126-144)
            if jp0.progressive:
                scan = all_state[0][k - 1]
                for ci in scan.comp_indices:
                    lo, hi = min(scan.Ss, 1), max(scan.Se, 9)
                    cb_prev[ci, lo:hi + 1] = (cb_cur[ci, lo:hi + 1]
                                              if k > 1 else 0)
                    cb_cur[ci, scan.Ss:scan.Se + 1] = scan.Al
            jpk.scans = all_state[0][:k]
            jpk.scan_htables = all_state[1][:k]
            jpk.scan_restart = all_state[2][:k]
            jpk.scan_qtables = all_state[3][:k]
            jpk.coef_bits = cb_cur if jp0.progressive else None
            jpk.coef_bits_prev = cb_prev if jp0.progressive else None
            jpk.warnings = warnings
            yield render(jpk, planes, fancy_upsample=self._fancy,
                         dct_method=self._dct,
                         block_smoothing=self._smooth)



@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _render_ycc_batch(yzz, cbzz, crzz, qty, qtc,
                      dims, mode: str, height: int, width: int,
                      precision: int = 8, hexp: int = 1, vexp: int = 1,
                      gray: bool = False):
    """Batched decode render: (B, bh, bw, 64) zigzag planes + per-image
    quant tables -> (B, H, W, 3) RGB (or (B, H, W) gray). dims =
    ((bh, bw, ch, cw) luma, (bh, bw, ch, cw) chroma)."""
    (lbh, lbw, lch, lcw), (cbh, cbw, cch, ccw) = dims

    def one(y, cb, cr, qy, qc):
        py = _render_plane.__wrapped__(y, qy, lbh, lbw, lch, lcw,
                                       precision)
        if gray:
            return py[:height, :width]
        pcb = _render_plane.__wrapped__(cb, qc, cbh, cbw, cch, ccw,
                                        precision)
        pcr = _render_plane.__wrapped__(cr, qc, cbh, cbw, cch, ccw,
                                        precision)
        return _upsample_color.__wrapped__(py, pcb, pcr, mode, height,
                                           width, precision, hexp, vexp)

    if gray:
        return jax.vmap(lambda y, qy: one(y, None, None, qy, None))(
            yzz, qty)
    return jax.vmap(one)(yzz, cbzz, crzz, qty, qtc)


@functools.partial(jax.jit, static_argnames=(
    "b", "dims", "nt", "n_tot", "capv", "cape", "gray", "precision"))
def _render_packed(masks, vals, esc, qty, qtc, b: int, dims, nt: int,
                   n_tot: int, capv: int, cape: int, gray: bool,
                   precision: int = 8):
    """Sparse-uploaded batched render: per-block nonzero masks + the
    exact flat 1-byte value stream (+int16 escapes) expand on device
    (ops/sparsepack.py expand_flat_dev, ~0.4 B/px upload — host sizes
    the buckets exactly, no overflow) and render to per-component SAMPLE
    planes — upsampling and color conversion happen on host
    (native/post.cpp mj_post_ycc) so the download is 1.5 B/px for 4:2:0
    instead of 3 B/px RGB. Returns (y, cb, cr) uint8 stacks, or just y
    for grayscale. When masks is None, vals is the dense (64, nt) int16
    fallback upload."""
    from ..ops import sparsepack
    (lbh, lbw, lch, lcw), (cbh, cbw, cch, ccw) = dims
    if masks is None:
        dense = vals
    else:
        dense = sparsepack.expand_flat_dev.__wrapped__(
            masks, vals, esc, nt, capv, cape)
    per = dense[:, :b * n_tot].reshape(64, b, n_tot)
    ny, nc = lbh * lbw, cbh * cbw
    yzz = per[:, :, :ny].transpose(1, 2, 0).reshape(b, lbh, lbw, 64)
    py = jax.vmap(lambda z, q: _render_plane.__wrapped__(
        z, q, lbh, lbw, lch, lcw, precision))(yzz, qty)
    if gray:
        return py
    cbzz = per[:, :, ny:ny + nc].transpose(1, 2, 0).reshape(b, cbh, cbw, 64)
    crzz = per[:, :, ny + nc:].transpose(1, 2, 0).reshape(b, cbh, cbw, 64)
    pcb = jax.vmap(lambda z, q: _render_plane.__wrapped__(
        z, q, cbh, cbw, cch, ccw, precision))(cbzz, qtc)
    pcr = jax.vmap(lambda z, q: _render_plane.__wrapped__(
        z, q, cbh, cbw, cch, ccw, precision))(crzz, qtc)
    return py, pcb, pcr


@functools.partial(jax.jit, static_argnames=(
    "b", "dims", "nt", "n_tot", "capv", "cape", "gray", "precision",
    "nst", "nwh"))
def _render_packed_pp(masks, vals, esc, qty, qtc, b: int, dims, nt: int,
                      n_tot: int, capv: int, cape: int, gray: bool,
                      precision: int, nst: int, nwh: int):
    """_render_packed + device plane pack (ops/planepack.py): the sample
    planes leave the chip as a ~0.6-1.0 B/px packed stream instead of
    1.5 B/px raw; the host expands with native mj_plane_expand.
    Returns (words (b, capw) i32, width-nibble words (b, nwh) i32,
    word counts (b,) i32)."""
    from ..ops import planepack
    res = _render_packed.__wrapped__(masks, vals, esc, qty, qtc, b, dims,
                                     nt, n_tot, capv, cape, gray,
                                     precision)
    capw = nst * 4 + 4

    # ONE stream for the whole group (images concatenated): no per-image
    # bucket slack in the download, one width header, one word count
    if gray:
        stream = res.reshape(-1)
    else:
        stream = jnp.concatenate(
            [jnp.concatenate([r[i].reshape(-1) for r in res])
             for i in range(b)])
    words, widths, nw = planepack.pack_stream(stream, nst, capw)
    pad = nwh * 8 - nst
    wpad = (jnp.concatenate([widths, jnp.zeros((pad,), widths.dtype)])
            if pad else widths).reshape(nwh, 8)
    ww = jnp.zeros((nwh,), jnp.int32)
    for k in range(8):
        ww = ww | (wpad[:, k] << (28 - 4 * k))
    return jax.lax.bitcast_convert_type(words, jnp.int32), ww, \
        nw.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n",))
def _pp_trim_concat(nw, ww, words, n: int):
    """[word count | width nibbles | payload prefix] as ONE i32 buffer
    (a blocking transfer costs ~25-50 ms on this attachment)."""
    return jnp.concatenate([nw.reshape(1), ww, words[:n]])


@functools.partial(jax.jit, static_argnames=("n",))
def _pp_trim(words, n: int):
    return words[:n]


_PP_EST: dict = {}     # total -> running max word count (speculative fetch)


def _pp_enabled() -> bool:
    import os as _os
    env = _os.environ.get("MJ_PLANEPACK", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    return jax.default_backend() == "tpu"


def _pp_fetch_planes(masks, vals, esc, qty, qtc, b, dims, nt, n_tot,
                     capv, cape, gray, precision, plane_shapes):
    """Run the packed render + one speculative fetch; -> per-image lists
    of uint8 sample planes (host-expanded), or None to use the raw-stack
    download path."""
    from ..native import lib, u8p, u32p
    from ..ops import planepack
    from ..utils import xfer
    total1 = sum(ph * pw for ph, pw in plane_shapes)
    total = b * total1                 # ONE stream for the whole group
    nst = -(-total // planepack.T)
    nwh = -(-nst // 8)
    words, ww, nw = _render_packed_pp(masks, vals, esc, qty, qtc, b,
                                      dims, nt, n_tot, capv, cape, gray,
                                      precision, nst, nwh)
    est = _PP_EST.get(total, max(1, total // 5))
    bucket = min(nst * 4 + 4, -(-int(est * 1.04) // 8192) * 8192)
    buf = np.asarray(_pp_trim_concat(nw, ww, words, bucket))
    xfer.add_d2h(buf.nbytes)
    need = int(buf[0])
    _PP_EST[total] = need
    ww_h = buf[1:1 + nwh].view(np.uint32)
    if need <= bucket:
        words_h = buf[1 + nwh:1 + nwh + need].view(np.uint32)
    else:
        bucket = min(nst * 4 + 4, -(-need // 8192) * 8192)
        words_h = np.asarray(_pp_trim(words, bucket)).view(np.uint32)
        xfer.add_d2h(words_h.nbytes)
    # width nibbles -> bytes, then ONE native expansion for the group
    wb = np.stack([(ww_h >> np.uint32(28 - 4 * k)) & np.uint32(15)
                   for k in range(8)], axis=1).reshape(nwh * 8)
    wb = np.ascontiguousarray(wb[:nst].astype(np.uint8))
    stream = np.empty(total, np.uint8)
    rc = lib.mj_plane_expand(wb.ctypes.data_as(u8p),
                             np.ascontiguousarray(words_h)
                             .ctypes.data_as(u32p), nst, total,
                             stream.ctypes.data_as(u8p))
    if rc != 0:
        return None
    out = []
    off = 0
    for _ in range(b):
        planes = []
        for ph, pw in plane_shapes:
            planes.append(stream[off:off + ph * pw].reshape(ph, pw)
                          .copy())
            off += ph * pw
        out.append(planes)
    return out


_POST_MODES = {"none": 0, "h2v1": 1, "h2v2": 2, "int": 3}


def _fast_decode_key(jp, planes, fancy_upsample, block_smoothing):
    """Group key for the pipelined sparse-upload decode path, or None
    when the image needs the general renderer."""
    from . import smooth as _smooth
    if planes is None or jp.precision != 8:
        return None
    if (block_smoothing and getattr(jp, "coef_bits", None) is not None
            and _smooth.smoothing_ok(jp, jp.coef_bits)):
        return None
    cs = _jpeg_colorspace(jp)
    if cs not in ("ycbcr", "grayscale"):
        return None
    gray = cs == "grayscale"
    if gray:
        mode, hexp, vexp = "none", 1, 1
    else:
        mode, hexp, vexp = _upsample_mode(jp, fancy_upsample)
        if mode not in _POST_MODES:
            return None
    dims = []
    for c in jp.components[:1 if gray else 3]:
        cw = -(-jp.width * c.h // jp.max_h)
        ch = -(-jp.height * c.v // jp.max_v)
        dims.append((-(-ch // 8), -(-cw // 8), ch, cw))
    if gray:
        dims = [dims[0], (0, 0, 0, 0)]
    elif dims[1] != dims[2]:
        return None                     # exotic Cb/Cr geometry
    else:
        dims = dims[:2]
        if dims[0][2] != jp.height or dims[0][3] != jp.width:
            return None                 # luma not full-size (e.g. 4:4:0)
        if not np.array_equal(_comp_qtable(jp, 1), _comp_qtable(jp, 2)):
            return None                 # distinct Cb/Cr quant tables
    return (jp.width, jp.height, gray, mode, hexp, vexp, tuple(dims))


def _decode_chunk_packed(key, idxs, jps, planes_list, out,
                         fancy_upsample=True, block_smoothing=True,
                         output="rgb"):
    """Render one same-geometry chunk through the sparse-upload path,
    with the same device-runtime recovery as the encode side: a jit
    executable can lose its lifted-constant binding after other shapes'
    programs ran; clear_caches + retry retraces cleanly, and a second
    failure falls back to the per-image renderer."""
    from .encoder import _device_runtime_error
    try:
        return _decode_chunk_packed_inner(key, idxs, jps, planes_list,
                                          out, output)
    except Exception as e:
        if not _device_runtime_error(e):
            raise
    import jax as _jax
    _jax.clear_caches()
    try:
        return _decode_chunk_packed_inner(key, idxs, jps, planes_list,
                                          out, output)
    except Exception as e:
        if not _device_runtime_error(e):
            raise
        for i in idxs:
            if output == "yuv":
                out[i] = decode_raw_planes_parsed(jps[i], planes_list[i])
            else:
                out[i] = render(jps[i], planes_list[i], None,
                                fancy_upsample, "islow", block_smoothing)


def _decode_chunk_packed_inner(key, idxs, jps, planes_list, out,
                               output="rgb"):
    """Render one same-geometry chunk through the sparse-upload path;
    output="rgb" finishes upsample+color on host (native mj_post_ycc),
    output="yuv" returns the per-component sample planes directly at
    jpeg_read_raw_data / tj3DecompressToYUV8 dims — same 1.5 B/px
    download, zero host post (runs on a stage worker thread)."""
    import ctypes
    from ..ops import sparsepack
    from ..native import lib, u8p
    from ..utils import xfer
    w, h, gray, mode, hexp, vexp, dims = key
    raw_dims = None
    if output == "yuv":
        jp0 = jps[idxs[0]]
        pw0 = -(-w // jp0.max_h) * jp0.max_h
        ph0 = -(-h // jp0.max_v) * jp0.max_v
        raw_dims, dims_r = [], []
        ncomp = 1 if gray else 3
        for c, (bh_, bw_, _, _) in zip(
                jp0.components[:ncomp],
                [dims[0]] + [dims[1]] * (ncomp - 1)):
            pw = pw0 * c.h // jp0.max_h
            ph = ph0 * c.v // jp0.max_v
            raw_dims.append((ph, pw))
            dims_r.append((bh_, bw_, min(ph, bh_ * 8), min(pw, bw_ * 8)))
        if gray:
            dims_r.append((0, 0, 0, 0))
        else:
            assert dims_r[1] == dims_r[2]
            dims_r = dims_r[:2]
        dims = tuple(dims_r)
    (lbh, lbw, lch, lcw), (cbh, cbw, cch, ccw) = dims
    b = len(idxs)
    flats = []
    for i in idxs:
        pl = planes_list[i]
        parts = [np.ascontiguousarray(pl[0][:lbh, :lbw]).reshape(-1, 64)]
        if not gray:
            parts.append(np.ascontiguousarray(
                pl[1][:cbh, :cbw]).reshape(-1, 64))
            parts.append(np.ascontiguousarray(
                pl[2][:cbh, :cbw]).reshape(-1, 64))
        flats.append(np.concatenate(parts, axis=0))
    n_tot = flats[0].shape[0]
    flat = np.concatenate(flats, axis=0)
    masks, lo, esc, nt, _total, _nesc = sparsepack.pack_flat_host(flat)
    qty = jnp.stack([jnp.asarray(_comp_qtable(jps[i], 0)) for i in idxs])
    qtc = (None if gray else
           jnp.stack([jnp.asarray(_comp_qtable(jps[i], 1)) for i in idxs]))
    xfer.add_h2d(masks.nbytes + lo.nbytes + esc.nbytes)
    plane_shapes = ([(lch, lcw)] if gray else
                    [(lch, lcw), (cch, ccw), (cch, ccw)])
    per_planes = None
    if _pp_enabled():
        # packed download (~0.6-1.0 B/px instead of 1.5): device packs
        # the rendered planes, host expands (native mj_plane_expand)
        per_planes = _pp_fetch_planes(
            jnp.asarray(masks), jnp.asarray(lo), jnp.asarray(esc), qty,
            qtc, b, dims, nt, n_tot, len(lo), len(esc), gray, 8,
            plane_shapes)
    if per_planes is None:
        res = _render_packed(jnp.asarray(masks), jnp.asarray(lo),
                             jnp.asarray(esc), qty, qtc, b, dims, nt,
                             n_tot, len(lo), len(esc), gray)
        stacks = ([np.asarray(res)] if gray
                  else [np.asarray(r) for r in res])
        xfer.add_d2h(sum(st.nbytes for st in stacks))
        per_planes = [[st[bi] for st in stacks] for bi in range(b)]
    if output == "yuv":
        for bi, i in enumerate(idxs):
            planes = []
            for pl, (ph, pw) in zip(per_planes[bi], raw_dims):
                full = np.zeros((ph, pw), np.uint8)
                full[:pl.shape[0], :pl.shape[1]] = pl
                planes.append(full)
            out[i] = planes
        return
    if gray:
        for bi, i in enumerate(idxs):
            out[i] = per_planes[bi][0][:h, :w]
        return
    m = _POST_MODES[mode]
    for bi, i in enumerate(idxs):
        py, pcb, pcr = per_planes[bi]
        rgb = np.empty((h, w, 3), np.uint8)
        lib.mj_post_ycc(
            py.ctypes.data_as(u8p), lch, lcw,
            pcb.ctypes.data_as(u8p), pcr.ctypes.data_as(u8p),
            cch, ccw, m, hexp, vexp, h, w,
            rgb.ctypes.data_as(u8p))
        out[i] = rgb


def _host_decode_one(jp, planes, fancy_upsample, block_smoothing,
                     output):
    """One image through the native host render, for decode_many on
    remote attachments (runs on a stage worker; nthreads=1 — the pool
    provides the cross-image parallelism). None = not in the matrix."""
    if output == "yuv":
        if _jpeg_colorspace(jp) not in ("ycbcr", "grayscale"):
            return None
        from . import smooth as _smooth
        if (block_smoothing and getattr(jp, "coef_bits", None) is not None
                and _smooth.smoothing_ok(jp, jp.coef_bits)):
            return None
        pw0 = -(-jp.width // jp.max_h) * jp.max_h
        ph0 = -(-jp.height // jp.max_v) * jp.max_v
        gray = _jpeg_colorspace(jp) == "grayscale"
        raw_dims = [(ph0 * c.v // jp.max_v, pw0 * c.h // jp.max_h)
                    for c in jp.components[:1 if gray else 3]]
        return _render_host_yuv(jp, planes, raw_dims, nthreads=1)
    return _render_host(jp, planes, None, fancy_upsample,
                        block_smoothing, nthreads=1)


def decode_many(datas, fancy_upsample: bool = True,
                block_smoothing: bool = True, output: str = "rgb"):
    """Decode a list of JPEGs with a software pipeline: host entropy
    decoding runs on a thread pool; same-geometry groups upload sparse
    coefficients (masks + packed values), render dequant+IDCT on device
    in one batched program, download subsampled SAMPLE planes, and
    finish upsample+color in host C++ — so the tunnel moves ~1/3 the
    bytes of the naive dense-up/RGB-down scheme and every blocking sync
    runs on a stage worker. Exotic paths (CMYK/YCCK, RGB, 12-bit,
    partial progressive needing block smoothing) fall back to grouped or
    single-image rendering.

    output="yuv" returns, per image, the per-component sample planes at
    jpeg_read_raw_data / tj3DecompressToYUV8 dims (no upsample/color,
    no host post — the deployment shape when the consumer wants planar
    YCbCr); output="rgb565" returns (h, w) uint16 RGB565 with the
    reference's ordered dither (per-image path)."""
    from concurrent.futures import ThreadPoolExecutor

    if output not in ("rgb", "yuv", "rgb565"):
        raise ValueError("output must be rgb, yuv or rgb565")
    if output == "rgb565":
        return [decode_rgb565(d, fancy_upsample) for d in datas]

    jps = [marker.parse(d) for d in datas]

    def entropy(i):
        jp = jps[i]
        if jp.lossless:
            return None
        if jp.arithmetic:
            from . import arith
            return arith.decode_coefficients_arith(jp, datas[i])
        return decode_coefficients(jp, datas[i])

    import os as _os
    from ..utils import attachment
    # locally-attached chips render merged upsample+color ON DEVICE and
    # download RGB directly (_render_ycc_batch — the jdmerge analog):
    # 3 B/px is free over PCIe/ICI and the host post drops out. Remote
    # tunnels keep the packed-planes download + native host post.
    merged_local = output == "rgb" and attachment.is_local_tpu()
    # remote attachments: the host render BEATS the device round trip
    # (~29 vs ~17 MP/s measured — the tunnel moves ~1 B/px either way
    # but the host pays no sync latency); images outside the host matrix
    # fall through to the device paths per image
    host_decode = (not attachment.is_local_tpu()
                   and _os.environ.get("MJ_HOST_ENGINE", "1") != "0")
    out: List = [None] * len(datas)
    planes_list: List = [None] * len(datas)
    # r4 re-measured after the flat upload shrank transfers: smaller
    # groups with a deeper stage pool pipeline best (g8/w4 12.3-12.7
    # MP/s vs g16/w2 7.7-8.7 in the same window)
    g = max(1, int(_os.environ.get("MJ_DECODE_GROUP",
                                   _os.environ.get("MJ_BATCH_GROUP",
                                                   "8"))))
    nthreads = min(8, max(2, (_os.cpu_count() or 4)))
    nstage = max(1, int(_os.environ.get("MJ_DECODE_STAGE_WORKERS", "6")))
    leftovers: List[int] = []
    with ThreadPoolExecutor(max_workers=nthreads) as ent_pool, \
            ThreadPoolExecutor(max_workers=nstage) as stage_pool:
        futs = [ent_pool.submit(entropy, i) for i in range(len(datas))]
        pending: dict = {}              # fast-path key -> buffered indices
        jobs = []
        host_jobs = []
        for i in range(len(datas)):
            planes_list[i] = futs[i].result()
            if host_decode and planes_list[i] is not None:
                host_jobs.append((i, stage_pool.submit(
                    _host_decode_one, jps[i], planes_list[i],
                    fancy_upsample, block_smoothing, output)))
                continue
            key = (None if merged_local else
                   _fast_decode_key(jps[i], planes_list[i],
                                    fancy_upsample, block_smoothing))
            if key is None:
                leftovers.append(i)
                continue
            pending.setdefault(key, []).append(i)
            if len(pending[key]) >= g:
                jobs.append(stage_pool.submit(
                    _decode_chunk_packed, key, pending.pop(key), jps,
                    planes_list, out, fancy_upsample, block_smoothing,
                    output))
        for key, idxs in pending.items():
            jobs.append(stage_pool.submit(
                _decode_chunk_packed, key, idxs, jps, planes_list, out,
                fancy_upsample, block_smoothing, output))
        for i, hj in host_jobs:
            r = hj.result()
            if r is not None:
                out[i] = r
            else:                        # outside the host matrix
                leftovers.append(i)
        for j in jobs:
            j.result()

    if output == "yuv":
        for i in leftovers:
            jp = jps[i]
            if planes_list[i] is None:
                raise ValueError(
                    "yuv output requires a lossy (DCT) stream")
            out[i] = decode_raw_planes_parsed(jp, planes_list[i])
        return out

    groups: dict = {}
    for i in leftovers:
        jp = jps[i]
        from . import smooth as _smooth
        cs = _jpeg_colorspace(jp)
        smooth_active = (block_smoothing
                         and getattr(jp, "coef_bits", None) is not None
                         and _smooth.smoothing_ok(jp, jp.coef_bits))
        if (planes_list[i] is None or smooth_active
                or cs not in ("ycbcr", "grayscale")):
            from .lossless import decode_lossless
            out[i] = (decode_lossless(jp, datas[i])
                      if jp.lossless else
                      render(jp, planes_list[i], None, fancy_upsample,
                             "islow", block_smoothing))
            continue
        gray = cs == "grayscale"
        mode, hexp, vexp = ((None, 1, 1) if gray
                            else _upsample_mode(jp, fancy_upsample))
        max_h, max_v = jp.max_h, jp.max_v
        dims = []
        for c in jp.components[:1 if gray else 3]:
            cw = -(-jp.width * c.h // max_h)
            ch = -(-jp.height * c.v // max_v)
            dims.append((-(-ch // 8), -(-cw // 8), ch, cw))
        if gray:
            dims = [dims[0], (0, 0, 0, 0)]
        elif (dims[1] == dims[2]
              and np.array_equal(_comp_qtable(jp, 1),
                                 _comp_qtable(jp, 2))):
            dims = dims[:2]                 # Cb/Cr share geometry + qtable
        else:                               # exotic ratios: single-image
            out[i] = render(jp, planes_list[i], None, fancy_upsample,
                            "islow", block_smoothing)
            continue
        key = (jp.width, jp.height, jp.precision, gray, mode, hexp, vexp,
               tuple(dims), tuple(p.shape for p in planes_list[i]))
        groups.setdefault(key, []).append(i)

    for key, idxs in groups.items():
        w, h, precision, gray, mode, hexp, vexp, dims, _ = key
        (lbh, lbw, _, _), (cbh, cbw, _, _) = dims
        y = jnp.stack([jnp.asarray(planes_list[i][0][:lbh, :lbw])
                       for i in idxs])
        qty = jnp.stack([jnp.asarray(_comp_qtable(jps[i], 0))
                         for i in idxs])
        if gray:
            cb = cr = qtc = None
        else:
            cb = jnp.stack([jnp.asarray(planes_list[i][1][:cbh, :cbw])
                            for i in idxs])
            cr = jnp.stack([jnp.asarray(planes_list[i][2][:cbh, :cbw])
                            for i in idxs])
            qtc = jnp.stack([jnp.asarray(_comp_qtable(jps[i], 1))
                             for i in idxs])
        res = np.asarray(_render_ycc_batch(y, cb, cr, qty, qtc, dims,
                                           mode, h, w, precision, hexp,
                                           vexp, gray))
        for bi, i in enumerate(idxs):
            out[i] = res[bi]
    return out
