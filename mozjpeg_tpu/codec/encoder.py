"""Encoder orchestration: device pipeline + per-scan entropy + markers.

Pass structure mirrors the reference's master control
(/root/reference/jcmaster.c): [trellis passes] -> per output scan
[huff-opt gather -> emit] -> assembled bitstream. Unlike the reference's
sequential pass machinery, all per-block compute is batched on device and
scans are encoded from whole-image coefficient planes.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import consts
from ..entropy import encode as entenc
from ..entropy.huffman import HuffTable
from . import marker, pipeline, report, scans
from .config import DCTMethod, EncoderConfig, Profile

STD_TABLES = {
    (0, 0): HuffTable(*consts.STD_DC_LUMINANCE),
    (0, 1): HuffTable(*consts.STD_DC_CHROMINANCE),
    (1, 0): HuffTable(*consts.STD_AC_LUMINANCE),
    (1, 1): HuffTable(*consts.STD_AC_CHROMINANCE),
}


def make_qtables(cfg) -> List[np.ndarray]:
    """Up to 4 tables: per-table quality ratings replicate the last value
    (rdswitch.c set_quality_ratings); -qtables base tables replace slots
    0..n-1 and are scaled by the same per-slot factors (jpeg_add_quant_table
    semantics, jcparam.c:31-68)."""
    quals = (list(cfg.quality) if isinstance(cfg.quality, (list, tuple))
             else [cfg.quality])
    sfs = [consts.quality_scaling(q) for q in quals[:4]]
    while len(sfs) < 4:
        sfs.append(sfs[-1])
    bases = [consts.STD_LUMINANCE_QUANT_TBL[cfg.quant_tbl_idx],
             consts.STD_CHROMINANCE_QUANT_TBL[cfg.quant_tbl_idx],
             None, None]
    if cfg.base_quant_tables is not None:
        for i, t in enumerate(cfg.base_quant_tables[:4]):
            bases[i] = np.asarray(t, dtype=np.uint32).reshape(-1)
    out = []
    for i in range(4):
        if bases[i] is None:
            out.append(None)
        else:
            out.append(consts.scale_quant_table(
                bases[i], sfs[i], cfg.force_baseline).reshape(8, 8))
    while out and out[-1] is None:
        out.pop()
    return out


def _qt_slots(cfg, cs, ncomps):
    """Per-component quant slot mapping, with -qslots override
    (rdswitch.c set_quant_slots: last value replicates)."""
    if cfg.qslots:
        sl = list(cfg.qslots)[:ncomps]
        while len(sl) < ncomps:
            sl.append(sl[-1])
        return tuple(sl)
    return _CS_INFO[cs][0][:ncomps]


# per-colorspace component layout: (quant slots, huff table slots, comp IDs)
# (jcparam.c:600-646 jpeg_set_colorspace SET_COMP calls)
_CS_INFO = {
    "grayscale": ((0,), (0,), (1,)),
    "ycbcr": ((0, 1, 1), (0, 1, 1), (1, 2, 3)),
    "rgb": ((0, 0, 0), (0, 0, 0), (0x52, 0x47, 0x42)),
    "cmyk": ((0, 0, 0, 0), (0, 0, 0, 0), (0x43, 0x4D, 0x59, 0x4B)),
    "ycck": ((0, 1, 1, 0), (0, 1, 1, 0), (1, 2, 3, 4)),
}


def _std_dc_ac(ncomps, cs="ycbcr"):
    slots = _CS_INFO[cs][1]
    dc_tbls = {ci: slots[ci] for ci in range(ncomps)}
    ac_tbls = dict(dc_tbls)
    return dc_tbls, ac_tbls


def _scan_tables_std(ncomps, cs="ycbcr"):
    dc, ac = {}, {}
    for slot in set(_CS_INFO[cs][1][:ncomps]):
        dc[slot] = STD_TABLES[(0, slot)]
        ac[slot] = STD_TABLES[(1, slot)]
    return dc, ac


def _restart_interval(cfg, mcus_x: int) -> int:
    if cfg.restart_in_rows:
        return min(cfg.restart_in_rows * mcus_x, 65535)
    return cfg.restart_interval


def scan_restart_interval(cfg, scan, geom, ncomps) -> int:
    """Per-scan restart interval (jcmaster.c:595-600 per_scan_setup):
    -restart N rows converts with the SCAN's MCUs_per_row -- the component's
    width_in_blocks for non-interleaved scans (jcmaster.c:533)."""
    mcus_x, _, comps = geom
    if cfg.restart_in_rows:
        mpr = mcus_x if len(scan.comps) > 1 else comps[scan.comps[0]].bw
        return min(cfg.restart_in_rows * mpr, 65535)
    return cfg.restart_interval


class ScanResult:
    __slots__ = ("scan", "data", "dc_tables", "ac_tables", "dc_tbls",
                 "ac_tbls", "restart")

    def __init__(self, scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                 restart=0):
        self.scan = scan
        self.data = data
        self.dc_tables = dc_tables    # {tbl_idx: HuffTable} used by this scan
        self.ac_tables = ac_tables
        self.dc_tbls = dc_tbls        # {comp: tbl_idx}
        self.ac_tbls = ac_tbls
        self.restart = restart        # this scan's restart interval


def _emit_scan_device(sg: entenc.ScanGeometry, dc_tbls, ac_tbls,
                      dc_tables, ac_tables, restart: int,
                      precision: int = 8):
    """Emit a scan's entropy data with the on-device restart-parallel bit
    packers (ops/bitpack.py): sequential full-band scans and all
    progressive scan kinds (DC first/refine, AC first/refine);
    byte-identical to the serial host encoder. Returns None when a needed
    table is absent."""
    from ..entropy.huffman import derive_codes
    from ..ops import bitpack
    scan = sg.scan
    planes = [sg.planes[ci] for ci, _, _ in sg.entries]
    geoms = [(h, v) for _, h, v in sg.entries]
    if scan.Ss == 0 and scan.Se == 63:               # sequential
        dc_codes, ac_codes = [], []
        for ci, _, _ in sg.entries:
            dt = dc_tables.get(dc_tbls.get(ci, 0))
            at = ac_tables.get(ac_tbls.get(ci, 0))
            if dt is None or at is None:
                return None
            dc_codes.append(derive_codes(dt))
            ac_codes.append(derive_codes(at))
        return bitpack.encode_scan_bitpar(planes, geoms, sg.mcus_x,
                                          sg.mcus_y, restart, dc_codes,
                                          ac_codes, precision=precision)
    dc_codes = ac_codes = None
    if scan.Ss == 0 and scan.Ah == 0:                # progressive DC first
        dc_codes = []
        for ci, _, _ in sg.entries:
            dt = dc_tables.get(dc_tbls.get(ci, 0))
            if dt is None:
                return None
            dc_codes.append(derive_codes(dt))
    elif scan.Ss != 0:                               # progressive AC
        at = ac_tables.get(ac_tbls.get(scan.comps[0], 0))
        if at is None:
            return None
        ac_codes = [derive_codes(at)]
    return bitpack.encode_scan_progressive_device(
        planes, geoms, sg.mcus_x, sg.mcus_y, scan.Ss, scan.Se, scan.Ah,
        scan.Al, restart, dc_tables=dc_codes, ac_tables=ac_codes,
        precision=precision)


def _device_emit_ok(sg: entenc.ScanGeometry) -> bool:
    scan = sg.scan
    if scan.Ss == 0 and scan.Se == 63:
        return scan.Ah == 0 and scan.Al == 0         # sequential full band
    return True                                      # progressive forms


def encode_scan_optimal(sg: entenc.ScanGeometry, dc_tbls, ac_tbls,
                        restart: int, device: bool = False,
                        precision: int = 8) -> ScanResult:
    """Gather stats, build optimal tables, emit the scan."""
    scan = sg.scan
    _, dcc, acc = entenc.encode_scan(sg, dc_tbls, ac_tbls, {}, {},
                                     restart, gather=True)
    dc_tables: Dict[int, HuffTable] = {}
    ac_tables: Dict[int, HuffTable] = {}
    is_dc_scan = scan.Ss == 0
    is_ac_scan = scan.Se > 0
    refine = scan.Ah != 0
    for ci in scan.comps:
        if is_dc_scan and not refine:
            t = dc_tbls[ci]
            if t not in dc_tables and dcc[t].any():
                dc_tables[t] = entenc.gen_optimal_table(dcc[t])
        if is_ac_scan:
            t = ac_tbls[ci]
            if t not in ac_tables and acc[t].any():
                ac_tables[t] = entenc.gen_optimal_table(acc[t])
    data = None
    if device and _device_emit_ok(sg):
        data = _emit_scan_device(sg, dc_tbls, ac_tbls, dc_tables,
                                 ac_tables, restart, precision)
    if data is None:
        data, _, _ = entenc.encode_scan(sg, dc_tbls, ac_tbls, dc_tables,
                                        ac_tables, restart, gather=False)
    return ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                      restart)


def encode_scan_fixed(sg: entenc.ScanGeometry, dc_tbls, ac_tbls,
                      dc_tables, ac_tables, restart: int,
                      device: bool = False,
                      precision: int = 8) -> ScanResult:
    scan = sg.scan
    used_dc = {dc_tbls[ci]: dc_tables[dc_tbls[ci]] for ci in scan.comps
               if scan.Ss == 0 and scan.Ah == 0 and dc_tbls[ci] in dc_tables}
    used_ac = {ac_tbls[ci]: ac_tables[ac_tbls[ci]] for ci in scan.comps
               if scan.Se > 0 and ac_tbls[ci] in ac_tables}
    data = None
    if device and _device_emit_ok(sg):
        data = _emit_scan_device(sg, dc_tbls, ac_tbls, dc_tables,
                                 ac_tables, restart, precision)
    if data is None:
        data, _, _ = entenc.encode_scan(sg, dc_tbls, ac_tbls, dc_tables,
                                        ac_tables, restart, gather=False)
    return ScanResult(scan, data, used_dc, used_ac, dc_tbls, ac_tbls,
                      restart)


def assemble(width: int, height: int, geom, qtables, scan_results,
             progressive: bool, ncomps: int,
             icc: Optional[bytes] = None,
             com: Optional[bytes] = None,
             multi_dqt: bool = True, precision: int = 8,
             cs: str = "ycbcr", qt_slots=None,
             extra_markers=None, density=(0, 1, 1),
             write_jfif: bool = True, sof_samp=None) -> bytes:
    """Write markers + scans into the final JPEG byte stream."""
    _, _, comps = geom
    comp_ids = _CS_INFO[cs][2]
    if qt_slots is None:
        qt_slots = _CS_INFO[cs][0]
    w = marker.MarkerWriter()
    w.soi()
    # JFIF only for YCbCr/grayscale; Adobe APP14 flags RGB/CMYK/YCCK
    # (jcmarker.c:649-663, jcparam.c:600-638)
    if cs in ("ycbcr", "grayscale"):
        if write_jfif:
            w.jfif_app0(unit=density[0], xd=density[1], yd=density[2])
    else:
        w.adobe_app14(2 if cs == "ycck" else 0)
    if icc:
        marker.write_icc(w, icc)
    if com:
        w.com(com)
    for code, payload in (extra_markers or ()):
        w.segment(code, payload)
    # tables are emitted in component order, deduplicated on first use
    # (jcmarker.c write_frame_header walks comp_info)
    used_qt = list(dict.fromkeys(qt_slots[:ncomps]))
    if multi_dqt:  # single DQT with all tables (mozjpeg non-FASTEST profile)
        w.dqt_multi([(i, qtables[i]) for i in used_qt])
    else:
        for i in used_qt:
            w.dqt(i, qtables[i])
    # >8-bit sequential uses SOF1 (extended); baseline SOF0 is 8-bit only
    sof_code = (marker.SOF2 if progressive
                else (marker.SOF0 if precision == 8 else marker.SOF1))
    # sof_samp: declared sampling factors when they differ from the
    # geometry factors (grayscale -sample / q>=80 heuristic — the factors
    # are relative to the component max, so a lone component's are
    # cosmetic; rdswitch.c:610-642)
    sof_samp = sof_samp or [(comps[ci].h, comps[ci].v)
                            for ci in range(ncomps)]
    w.sof(sof_code, precision, height, width,
          [(comp_ids[ci], sof_samp[ci][0], sof_samp[ci][1], qt_slots[ci])
           for ci in range(ncomps)])
    sent_dc: Dict[int, HuffTable] = {}
    sent_ac: Dict[int, HuffTable] = {}
    last_dri = 0
    for sr in scan_results:
        scan = sr.scan
        # per scan component: DC table then AC table (jcmarker.c order);
        # non-FASTEST profile merges the scan's tables into one DHT marker
        entries = []
        for ci in scan.comps:
            t = sr.dc_tbls[ci]
            tbl = sr.dc_tables.get(t)
            if tbl is not None and sent_dc.get(t) != tbl:
                entries.append((0, t, tbl))
                sent_dc[t] = tbl
            t = sr.ac_tbls[ci]
            tbl = sr.ac_tables.get(t)
            if tbl is not None and sent_ac.get(t) != tbl:
                entries.append((1, t, tbl))
                sent_ac[t] = tbl
        if multi_dqt:
            w.dht_multi(entries)
        else:
            for c, t, tbl in entries:
                w.dht(c, t, tbl)
        if sr.restart != last_dri:
            w.dri(sr.restart)
            last_dri = sr.restart
        # unused table fields are written as 0 (jcmarker.c:511-518)
        w.sos([(comp_ids[ci],
                sr.dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0 else 0,
                sr.ac_tbls[ci] if scan.Se else 0)
               for ci in scan.comps], scan.Ss, scan.Se, scan.Ah, scan.Al)
        w.raw(sr.data)
    w.eoi()
    return w.bytes()


def _resolve(image, config, overrides):
    if config is None:
        config = EncoderConfig(**overrides)
    cfg = config.resolved()
    channels = 1 if image.ndim == 2 else image.shape[2]
    cs = (cfg.colorspace or "").lower() or None
    if cs is None:
        if config.grayscale or channels == 1:
            cs = "grayscale"
        elif channels == 4:
            cs = "cmyk"           # jpeg_default_colorspace: no translation
        else:
            cs = "ycbcr"
    if cs not in _CS_INFO:
        raise ValueError("unknown colorspace %r" % (cs,))
    ncomps = len(_CS_INFO[cs][0])
    if cs in ("cmyk", "ycck") and channels != 4:
        raise ValueError("%s needs (H, W, 4) input" % cs)
    sub = cfg.subsampling
    if cs == "ycbcr":
        samp = [sub, (1, 1), (1, 1)]
    elif cs == "ycck":
        # Y and K at full rate, chroma 1x1 (jcparam.c:632-638)
        samp = [sub, (1, 1), (1, 1), sub]
    else:
        samp = [(1, 1)] * ncomps
    qtables = make_qtables(cfg)
    return config, cfg, cs, ncomps, samp, qtables


def _gray_sof_samp(cfg, cs):
    """Declared SOF sampling override for grayscale (see assemble)."""
    if cs == "grayscale" and cfg.gray_sample:
        return [tuple(cfg.gray_sample)]
    return None


def _trellis_comps(cfg, cs, comps):
    """Trellis lastDC chains across the v_samp block rows of one iMCU row
    (jccoefct.c:417-419 reset per iMCU row; :423-447 block-row loop), so
    for grayscale the DECLARED sampling factors (-sample / q>=80 heuristic,
    rdswitch.c:610-642) set that chaining granularity even though pixel
    geometry stays full-resolution."""
    if cs == "grayscale" and cfg.gray_sample and cfg.gray_sample[1] > 1:
        return ((comps[0]._replace(v=int(cfg.gray_sample[1])),)
                + tuple(comps[1:]))
    return tuple(comps)


def _trellis_ris(cfg, comps):
    """Restart interval per component for the trellis stats passes: the
    stats gather is a single-component pseudo-scan, so -restart N rows
    converts with that component's width_in_blocks (jcmaster.c:533,595)."""
    if cfg.restart_in_rows:
        return tuple(min(cfg.restart_in_rows * g.bw, 65535) for g in comps)
    if cfg.restart_interval:
        return (cfg.restart_interval,) * len(comps)
    return None


def _phase_p1(image, cfg, samp, qtables, cs):
    from . import pipeline_t
    ncomps = len(samp)
    _, _, comps = pipeline_t.geometry(image.shape[1], image.shape[0], samp)
    geom, comp_res, small = pipeline_t.run_p1(
        image, samp, qtables, cfg.overshoot_deringing, cs == "grayscale",
        cfg.precision, cs, _qt_slots(cfg, cs, ncomps),
        cfg.smoothing_factor, cfg.dct_method.value,
        ris=_trellis_ris(cfg, comps))
    return geom, comp_res, small


def _phase_trellis(geom, comp_res, small, cfg, qtables, cs="ycbcr"):
    """Sync the small array, build tables/lambdas, dispatch trellis (async).
    Returns the device array tuple of final planes."""
    from . import pipeline_t, trellis
    import jax.numpy as jnp
    mcus_x, mcus_y, comps = geom
    comps = _trellis_comps(cfg, cs, comps)
    norms, hists = pipeline_t.unpack_small(geom, small)
    tbl_slots = _CS_INFO[cs][1]
    qt_slots = _qt_slots(cfg, cs, len(comp_res))
    opt = cfg.optimize_coding and not cfg.arithmetic
    lams, dc_sis, qtblzz, ncands = [], [], [], []
    for ci in range(len(comp_res)):
        lams.append(trellis.lambda_from_norm(
            norms[ci], cfg.lambda_log_scale1, cfg.lambda_log_scale2))
        _, dc_si = trellis.trellis_tables_from_hist(
            hists[ci], tbl_slots[ci], False)
        dc_sis.append(dc_si)
        qz = np.asarray(qtables[qt_slots[ci]]) \
            .reshape(64)[consts.JPEG_ZIGZAG].astype(np.int32)
        qtblzz.append(qz)
        ncands.append(trellis.get_num_dc_candidates(int(qz[0])))
    raws = tuple(r[1] for r in comp_res)

    if cfg.arithmetic:
        # Arithmetic trellis (quantize_trellis_arith): the adaptive coder
        # is run over each quantized iMCU row with emission suppressed and
        # -log2 probability tables are snapshotted before each row
        # (jccoefct.c:384, jcarith.c:127).  The pass/comp mapping quirk of
        # optimize_coding=FALSE is reproduced (comp 2 is never visited).
        import ctypes as _ct
        from ..native import lib as _lib
        f32p = _ct.POINTER(_ct.c_float)
        _lib.mj_arith_ctx_new.restype = _ct.c_void_p
        _lib.mj_arith_ctx_free.argtypes = [_ct.c_void_p]
        _lib.mj_arith_get_rates.argtypes = [_ct.c_void_p, f32p, f32p]
        _lib.mj_arith_train_rows.argtypes = [
            _ct.c_void_p, _ct.POINTER(_ct.c_int16), _ct.c_int, _ct.c_int,
            _ct.c_int, _ct.c_int]
        _lib.mj_arith_ctx_restart.argtypes = [_ct.c_void_p, _ct.c_int,
                                              _ct.c_int, _ct.c_int]
        # restart resets during the trellis re-encode follow emit_restart
        # with the GLOBAL progressive flag and the pseudo-scan's Ss=1:
        # progressive files keep DC stats/predictions, AC always resets
        prog_mode = cfg.progressive
        if cfg.scan_script is not None:
            from . import scans as _scans
            _s0 = _scans.ScanInfo(tuple(cfg.scan_script[0][0]),
                                  *cfg.scan_script[0][1:])
            prog_mode = _s0.Ss != 0 or _s0.Se != 63
        fs = cfg.trellis_freq_split
        band_defs = ([(1, fs), (fs + 1, 63)]
                     if cfg.use_scans_in_trellis else [(1, 63)])
        visits = trellis.arith_trellis_comps(
            len(comp_res), max(1, cfg.trellis_num_loops),
            cfg.use_scans_in_trellis)
        cur = [np.array(np.asarray(r[0]), copy=True)
               for r in comp_res]                     # host (64, N) int16
        raws_h = [np.asarray(r[1]) for r in comp_res]
        rate_dc = np.empty(128, np.float32)
        rate_ac = np.empty(512, np.float32)
        for comp, band in visits:
            g = comps[comp]
            bw, bh, v = g.bw, g.bh, g.v
            ss, se = band_defs[band]
            acfn = trellis._arith_ac_row(ss, se, 5)
            qz_dev = jnp.asarray(qtblzz[comp])
            q0 = int(qtblzz[comp][0])
            ltbl0 = np.float32(1.0 / (q0 * q0))
            lam_np = np.asarray(lams[comp])
            q_host = cur[comp]
            raw_host = raws_h[comp]
            ctx = _lib.mj_arith_ctx_new()
            # restart resets in the suppressed re-encode (jcarith.c:383-389):
            # stats + DC predictions reset every restart_interval MCUs; the
            # reset lands AFTER the row's rate snapshot (compress_output runs
            # after quantize_trellis_arith within the iMCU row).  The trellis
            # pass is a single-component pseudo-scan, so -restart N rows
            # converts with the component's width_in_blocks (jcmaster.c:533)
            rint = 0
            tris = _trellis_ris(cfg, comps)
            if tris:
                rint = tris[comp]
            rtg = rint
            nrst = 0
            for ri in range(-(-bh // v)):
                _lib.mj_arith_get_rates(
                    ctx, rate_dc.ctypes.data_as(f32p),
                    rate_ac.ctypes.data_as(f32p))
                ac_dev = jnp.asarray(rate_ac.reshape(256, 2))
                dc_dev = jnp.asarray(rate_dc.reshape(64, 2))
                last_dc = 0
                for br in range(ri * v, min((ri + 1) * v, bh)):
                    sl = slice(br * bw, (br + 1) * bw)
                    raw_row = jnp.asarray(
                        np.ascontiguousarray(raw_host[:, sl]))
                    q_row = jnp.asarray(np.ascontiguousarray(q_host[:, sl]))
                    lam_row = jnp.asarray(lam_np[sl])
                    new_q = acfn(raw_row, q_row, qz_dev, lam_row, ac_dev)
                    if cfg.trellis_quant_dc and band == 0:
                        lam_dc = lam_row * ltbl0
                        dc, fin = trellis._arith_dc_row(
                            raw_row[0], jnp.int32(last_dc),
                            jnp.int32(q0), dc_dev, ncands[comp], lam_dc)
                        last_dc = int(fin)
                        new_q = new_q.at[0].set(dc.astype(jnp.int16))
                    q_host[:, sl] = np.asarray(new_q)
                    blkrow = np.ascontiguousarray(
                        q_host[:, sl].T.astype(np.int16))
                    off = 0
                    while off < bw:
                        if rint and rtg == 0:
                            _lib.mj_arith_ctx_restart(
                                ctx, nrst, 0 if prog_mode else 1, 1)
                            nrst = (nrst + 1) & 7
                            rtg = rint
                        take = min(bw - off, rtg) if rint else bw
                        _lib.mj_arith_train_rows(
                            ctx, blkrow[off:off + take].ctypes.data_as(
                                _ct.POINTER(_ct.c_int16)), take, 0, 1, 5)
                        off += take
                        if rint:
                            rtg -= take
            _lib.mj_arith_ctx_free(ctx)
        finals = tuple(jnp.asarray(c) for c in cur)
        if cfg.trellis_q_opt:
            _apply_q_opt(comp_res, finals, qtables, qt_slots)
        return finals

    if cfg.use_scans_in_trellis:
        # per-band stats are regathered from the CURRENT coefficients
        # after the previous band's trellis (jcmaster pass structure)
        fs = cfg.trellis_freq_split
        cur = tuple(r[0] for r in comp_res)
        for _loop in range(max(1, cfg.trellis_num_loops)):
            for bi_, (ss, se) in enumerate([(1, fs), (fs + 1, 63)]):
                if opt:
                    hist_fn = trellis.make_band_hist_t(
                        ss, se, ris=_trellis_ris(cfg, comps))
                    bh = hist_fn(cur)
                    ac_sis = [trellis.trellis_tables_from_hist(
                        np.asarray(bh[ci])[0], tbl_slots[ci], True)[0]
                        for ci in range(len(comp_res))]
                else:
                    ac_sis = [trellis.trellis_tables_from_hist(
                        None, tbl_slots[ci], False)[0]
                        for ci in range(len(comp_res))]
                packed = jnp.asarray(trellis.pack_trellis_inputs(
                    lams, ac_sis, dc_sis, qtblzz))
                upal, uint = trellis.ac_impl_flags(cfg.precision)
                run = trellis.make_trellis_all_t(
                    tuple(comps), None, ((ss, se),),
                    cfg.trellis_quant_dc and bi_ == 0, tuple(ncands),
                    precision=cfg.precision, eob_opt=cfg.trellis_eob_opt,
                    delta_w=float(cfg.trellis_delta_dc_weight),
                    use_pallas=upal, interpret=uint)
                cur = run(raws, cur, packed)
        finals = cur
    else:
        ac_sis = [trellis.trellis_tables_from_hist(
            hists[ci], tbl_slots[ci], opt)[0]
            for ci in range(len(comp_res))]
        packed = jnp.asarray(trellis.pack_trellis_inputs(
            lams, ac_sis, dc_sis, qtblzz))
        upal, uint = trellis.ac_impl_flags(cfg.precision)
        run = trellis.make_trellis_all_t(
            tuple(comps), None, ((1, 63),), cfg.trellis_quant_dc,
            tuple(ncands), precision=cfg.precision,
            eob_opt=cfg.trellis_eob_opt,
            delta_w=float(cfg.trellis_delta_dc_weight),
            use_pallas=upal, interpret=uint)
        finals = run(raws, tuple(r[0] for r in comp_res), packed)
        nloops = max(1, cfg.trellis_num_loops)
        if nloops > 1 and opt:
            # each loop regathers rate statistics from the previous
            # loop's trellised coefficients (jcmaster.c:1129-1139: a
            # huff_opt gather pass precedes every trellis pass) — with
            # the Annex-K tablegen fused INTO the trellis program
            # (ops/tablegen.py) so no loop iteration syncs to host
            run2 = trellis.make_trellis_all_t(
                tuple(comps), None, ((1, 63),), cfg.trellis_quant_dc,
                tuple(ncands), precision=cfg.precision,
                eob_opt=cfg.trellis_eob_opt,
                delta_w=float(cfg.trellis_delta_dc_weight),
                use_pallas=upal, interpret=uint, dev_tables=True)
            packed2 = jnp.asarray(trellis.pack_trellis_inputs(
                lams, [], dc_sis, qtblzz))
            hist_fn = trellis.make_band_hist_t(
                1, 63, ris=_trellis_ris(cfg, comps))
            for _ in range(nloops - 1):
                finals = run2(raws, finals, packed2,
                              hists=hist_fn(finals))
        else:
            for _ in range(nloops - 1):
                finals = run(raws, finals, packed)
    if cfg.trellis_q_opt:
        _apply_q_opt(comp_res, finals, qtables, qt_slots)
    return finals


def _apply_q_opt(comp_res, finals, qtables, qt_slots):
    """trellis_q_opt (jcdctmgr.c:1299-1305, jcmaster.c:1014-1027): after
    the trellis passes, re-fit each AC quantizer value to the chosen
    levels: q[j] = round(sum(src*coef) / sum(8*coef^2)), clamped 1..254.

    The C sums accumulate in double; int64 sums are exact (products fit
    well under 2^53), so the double division below matches bit-for-bit."""
    import numpy as _np
    nslots = max(qt_slots) + 1
    ns = _np.zeros((nslots, 64), _np.int64)
    nc = _np.zeros((nslots, 64), _np.int64)
    for ci, (q_zz, raw_zz) in enumerate(comp_res):
        src = _np.asarray(raw_zz).astype(_np.int64)       # (64, N)
        coef = _np.asarray(finals[ci]).astype(_np.int64)
        slot = qt_slots[ci]
        ns[slot] += (src * coef).sum(axis=1)
        nc[slot] += 8 * (coef * coef).sum(axis=1)
    for slot in set(qt_slots):
        q = _np.asarray(qtables[slot]).copy()
        for p in range(1, 64):                            # AC positions only
            if nc[slot, p]:
                v = int(_np.float64(ns[slot, p]) / _np.float64(nc[slot, p])
                        + 0.5)
                v = min(max(v, 1), 254)
                j = consts.JPEG_ZIGZAG[p]
                q[j // 8, j % 8] = v
        qtables[slot] = q


def _phase_pack(geom, planes_t):
    """Dispatch the single flat int16 packing of all comps (async)."""
    from . import pipeline_t
    _, _, comps = geom
    return pipeline_t._pack_all(tuple(planes_t), tuple(comps))


class DualPlane(np.ndarray):
    """Host coefficient plane that also carries its device-resident twin
    (``.dev``): the host engine and stats passes read the ndarray, while
    the device bit packers reuse ``.dev`` directly instead of re-uploading
    the plane for every candidate scan (the dominant H2D cost of
    optimize_scans on remote-attached TPUs)."""
    dev = None


def _split_flat(geom, flat, flat_dev=None):
    _, _, comps = geom
    out = []
    off = 0
    for g in comps:
        n = g.bh_pad * g.bw_pad * 64
        arr = flat[off:off + n].reshape(g.bh_pad, g.bw_pad, 64)
        if flat_dev is not None:
            arr = arr.view(DualPlane)
            arr.dev = flat_dev[off:off + n].reshape(g.bh_pad, g.bw_pad, 64)
        out.append(arr)
        off += n
    return out


def _phase_entropy(width, height, geom, planes, qtables, config, cfg,
                   ncomps, restart, cs="ycbcr", extra_markers=None,
                   qt_slots=None, parallel=True):
    if cfg.icc:
        extra_markers = tuple(marker.icc_chunks(cfg.icc)) \
            + tuple(extra_markers or ())
    dc_tbls, ac_tbls = _std_dc_ac(ncomps, cs)
    ycbcr = cs == "ycbcr"
    if cfg.arithmetic:
        return _entropy_arith(width, height, geom, planes, qtables, config,
                              cfg, ncomps, restart, dc_tbls, ac_tbls, cs,
                              extra_markers, qt_slots=qt_slots)
    progressive = cfg.progressive
    if cfg.scan_script is not None:
        # a custom script may be sequential: progressive iff the first
        # scan isn't full-spectrum (jcmaster.c validate_script)
        script = [scans.ScanInfo(tuple(s[0]), *s[1:])
                  for s in cfg.scan_script]
        progressive = script[0].Ss != 0 or script[0].Se != 63
    elif cfg.progressive:
        if cfg.optimize_scans and (ncomps == 1 or (ncomps == 3 and ycbcr)):
            from . import scanopt
            import os as _os
            if _os.environ.get("MJ_NATIVE_SCANSEARCH", "1") != "0":
                # parallel=True marks the latency path (serial encode /
                # one group): thread the candidate sweep across cores;
                # batched groups already parallelize across images
                data = scanopt.encode_optimize_scans_native(
                    width, height, geom, planes, qtables, cfg, ncomps,
                    cfg.precision, extra_markers,
                    nthreads=(max(1, (_os.cpu_count() or 4))
                              if parallel else 1))
                if data is not None:
                    return data
            return scanopt.encode_optimize_scans(
                width, height, geom, planes, qtables, cfg, ncomps, restart,
                cfg.precision, extra_markers, parallel=parallel)
        elif (config.profile == Profile.MAX_COMPRESSION
              or cfg.optimize_scans):
            # scan search bails for non-YCbCr multi-component images
            # (jcparam.c:753-756) and falls back to the simple script
            script = scans.simple_progression_max(ncomps,
                                                  cfg.dc_scan_opt_mode,
                                                  ycbcr)
        else:
            script = scans.simple_progression_legacy(ncomps, ycbcr)
    else:
        script = scans.baseline_script(ncomps)

    results = []
    report.add_passes(len(script))
    dev = cfg.device_entropy and cfg.precision <= 12
    for scan in script:
        sg = entenc.ScanGeometry(scan, geom, planes)
        r = scan_restart_interval(cfg, scan, geom, ncomps)
        if cfg.optimize_coding or progressive:
            results.append(encode_scan_optimal(sg, dc_tbls, ac_tbls, r,
                                               device=dev,
                                               precision=cfg.precision))
        else:
            dct_, act_ = _scan_tables_std(ncomps, cs)
            results.append(encode_scan_fixed(sg, dc_tbls, ac_tbls, dct_,
                                             act_, r, device=dev,
                                             precision=cfg.precision))
        report.pass_done("scan %d-%d" % (scan.Ss, scan.Se))
    return assemble(width, height, geom, qtables, results,
                    progressive, ncomps,
                    multi_dqt=config.profile != Profile.FASTEST,
                    precision=cfg.precision, cs=cs,
                    qt_slots=(qt_slots if qt_slots is not None
                              else _qt_slots(cfg, cs, ncomps)),
                    extra_markers=extra_markers, density=cfg.density,
                    write_jfif=cfg.write_jfif,
                    sof_samp=_gray_sof_samp(cfg, cs))




def _entropy_arith(width, height, geom, planes, qtables, config, cfg,
                   ncomps, restart, dc_tbls, ac_tbls, cs="ycbcr",
                   extra_markers=None, qt_slots=None):
    """Arithmetic-coded output scans (SOF9/SOF10 + DAC markers)."""
    from . import arith
    _, _, comps = geom
    _, _tbl, comp_ids = _CS_INFO[cs]
    if qt_slots is None:
        qt_slots = _qt_slots(cfg, cs, ncomps)
    ycbcr = cs == "ycbcr"
    if cfg.progressive:
        if cfg.scan_script is not None:
            script = [scans.ScanInfo(tuple(s[0]), *s[1:])
                      for s in cfg.scan_script]
        elif (cfg.optimize_scans and (ncomps == 1
                                      or (ncomps == 3 and ycbcr))):
            # the scan search runs with the arithmetic coder too
            # (jcparam.c:739-742 jpeg_simple_progression -> search)
            from . import scanopt
            return scanopt.encode_optimize_scans(
                width, height, geom, planes, qtables, cfg, ncomps, restart,
                cfg.precision, extra_markers, arith=True)
        elif config.profile == Profile.MAX_COMPRESSION:
            script = scans.simple_progression_max(ncomps,
                                                  cfg.dc_scan_opt_mode,
                                                  ycbcr)
        else:
            script = scans.simple_progression_legacy(ncomps, ycbcr)
    else:
        script = scans.baseline_script(ncomps)

    w = marker.MarkerWriter()
    w.soi()
    if cs in ("ycbcr", "grayscale"):
        if cfg.write_jfif:
            w.jfif_app0(unit=cfg.density[0], xd=cfg.density[1],
                        yd=cfg.density[2])
    else:
        w.adobe_app14(2 if cs == "ycck" else 0)
    for code, payload in (extra_markers or ()):
        w.segment(code, payload)
    used_qt = list(dict.fromkeys(qt_slots[:ncomps]))
    if config.profile != Profile.FASTEST:
        w.dqt_multi([(i, qtables[i]) for i in used_qt])
    else:
        for i in used_qt:
            w.dqt(i, qtables[i])
    sof_code = marker.SOF10 if cfg.progressive else marker.SOF9
    a_samp = (_gray_sof_samp(cfg, cs)
              or [(comps[ci].h, comps[ci].v) for ci in range(ncomps)])
    w.sof(sof_code, 8, height, width,
          [(comp_ids[ci], a_samp[ci][0], a_samp[ci][1], qt_slots[ci])
           for ci in range(ncomps)])
    last_dri = 0
    for scan in script:
        r = scan_restart_interval(cfg, scan, geom, ncomps)
        entries = []
        for ci in scan.comps:
            if scan.Ss == 0 and scan.Ah == 0:
                t = dc_tbls[ci]
                e = (0, t, (int(arith.DC_U[t]) << 4) | int(arith.DC_L[t]))
                if e not in entries:
                    entries.append(e)
            if scan.Se:
                t = ac_tbls[ci]
                e = (1, t, int(arith.AC_K[t]))
                if e not in entries:
                    entries.append(e)
        if entries:
            w.dac(entries)
        if r != last_dri:
            w.dri(r)
            last_dri = r
        w.sos([(comp_ids[ci],
                dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0 else 0,
                ac_tbls[ci] if scan.Se else 0)
               for ci in scan.comps], scan.Ss, scan.Se, scan.Ah, scan.Al)
        w.raw(arith.encode_scan_arith(scan, geom, planes, dc_tbls, ac_tbls,
                                      r))
    w.eoi()
    return w.bytes()


def encode(image: np.ndarray, config: Optional[EncoderConfig] = None,
           progress=None, trace=None, **overrides) -> bytes:
    """Encode an RGB (H, W, 3) or grayscale (H, W) uint8 image to JPEG.

    Single images route through the host CPU engine (codec/host_engine:
    native FDCT+dering+trellis, zero device warmup — the low-latency
    serial path) when the config is in its supported matrix; otherwise
    through the device pipeline. Byte-identical either way;
    MJ_HOST_ENGINE=0 forces the device path.

    progress(completed, total, desc): per-pass callback (the
    jpeg_progress_mgr analog, cdjpeg.c:29-59); trace(msg): trace-message
    stream (cinfo->err->trace_level analog, jcmaster.c:747-754).
    """
    from . import host_engine
    if host_engine.enabled() and image.ndim in (2, 3):
        cfg_o, cfg, cs, ncomps, samp, qt = _resolve(image, config,
                                                    overrides)
        if (host_engine.supported(cfg, cs)
                and _qt_slots(cfg, cs, ncomps) == _CS_INFO[cs][0][:ncomps]):
            with report.reporting(progress, trace):
                return host_engine.encode_host(image, cfg_o, cfg, cs,
                                               ncomps, samp, qt)
    return encode_many([image], config, progress=progress, trace=trace,
                       **overrides)[0]


def encode_many(images, config: Optional[EncoderConfig] = None,
                progress=None, trace=None, **overrides):
    """Encode a list of images with a software pipeline: device programs for
    image i+1 are queued (JAX async dispatch) while the host entropy-codes
    image i; all transfers are single packed arrays. Same-shape groups run
    fully batched: one dispatch and one transfer each way for the group.

    Device-runtime recovery: a jit executable can lose its
    lifted-constant binding after other shapes' programs ran (observed
    as "supplied N buffers but compiled program expected M" on CPU and
    TPU alike); dropping the executable caches and retrying retraces
    cleanly. Encoding is pure, so the retry is exact."""
    with report.reporting(progress, trace):
        try:
            return _encode_many(images, config, **overrides)
        except Exception as e:
            if not _device_runtime_error(e):
                raise
        _reset_device_programs()
        return _encode_many(images, config, **overrides)


def _reset_device_programs():
    """Drop every cached compiled program: jax's executable caches AND
    this package's lru-held jit closures (a pjit function kept alive by
    an lru_cache retains its own dispatch cache, which is where the
    corrupted lifted-constant binding lives)."""
    import jax as _jax
    from . import trellis as _trellis
    _trellis.make_trellis_all_t.cache_clear()
    _trellis.make_band_hist_t.cache_clear()
    _jax.clear_caches()


def _batch_max_mp() -> float:
    """Per-image megapixel ceiling for the batched fast path; larger
    images take the row-sharded encoder (multi-device, restart configs)
    or the staged per-image path. Group sizes shrink automatically for
    big frames (MJ_BATCH_BUDGET_MP), so the ceiling only bounds device
    memory for truly huge singles."""
    import os as _os
    return float(_os.environ.get("MJ_BATCH_MAX_MP", "48.0"))


def _batch_budget_mp() -> float:
    """Total megapixels per batched device group (bounds device memory:
    big frames get proportionally smaller groups). 128 = the proven r3
    envelope (16 MP x 8)."""
    import os as _os
    return float(_os.environ.get("MJ_BATCH_BUDGET_MP", "128.0"))


def _route_rows(img, config, overrides) -> Optional[bytes]:
    """Huge singles on a multi-device attachment: encode via
    parallel/rows.py row sharding (VERDICT r4 item 5). Only taken when
    the config is the rows profile — full mozjpeg default with
    restart_in_rows set (shard independence needs the restart markers,
    so a non-restart config's bytes would differ) — and more than one
    device is attached. Byte-exact vs the staged encoder."""
    import jax as _jax
    if img.ndim != 3 or len(_jax.devices()) < 2:
        return None
    cfg_o = config if config is not None else EncoderConfig()
    if overrides:
        import dataclasses as _dc
        cfg_o = _dc.replace(cfg_o, **overrides)
    rr = cfg_o.restart_in_rows
    if not rr:
        return None
    if cfg_o != EncoderConfig(quality=cfg_o.quality, restart_in_rows=rr):
        return None
    if not isinstance(cfg_o.quality, (int, float)):
        return None
    from ..parallel import rows as _rows
    return _rows.encode_row_sharded_scanopt(
        img, float(cfg_o.quality), restart_rows=rr)


def _fast_ctx(img, config, overrides):
    """Resolve the pipelined fast-path context for one image shape, or
    None when the config/shape needs the general per-image path."""
    from . import pipeline_t
    from .pipeline import geometry
    if img.ndim not in (2, 3):    # 2-D = grayscale sample plane (r5)
        return None
    if img.shape[0] * img.shape[1] > _batch_max_mp() * 1e6:
        return None
    cfg_o, cfg, cs, ncomps, samp, qt = _resolve(img, config, overrides)
    h, w = img.shape[:2]
    geom = geometry(w, h, samp)
    if (pipeline_t.batchable(geom)
            and cs in ("ycbcr", "grayscale", "rgb", "cmyk", "ycck")
            and not cfg.trellis_q_opt
            # the arithmetic TRELLIS (quantize_trellis_arith: adaptive
            # per-row rate snapshots) is a host-sequential pass the
            # batch pipeline does not carry — arithmetic without
            # trellis batches fine
            and not (cfg.arithmetic and cfg.trellis_quant)
            and _qt_slots(cfg, cs, ncomps) == _CS_INFO[cs][0][:ncomps]):
        # restart intervals, ifast/float DCT, input smoothing,
        # arithmetic-sans-trellis, use_scans_in_trellis, every batchable
        # colorspace (r4) AND arbitrary non-iMCU-aligned dimensions (r5:
        # dummy blocks are host-synthesized post-download) ride the
        # batched pipeline
        return (cfg_o, cfg, cs, ncomps, samp, qt)
    return None


def _encode_many(images, config: Optional[EncoderConfig] = None,
                 **overrides):
    import numpy as _np
    from . import pipeline_t
    if len(images) >= 1:
        # group by shape: every shape streams through the batched path
        # (its own device programs; singles run as b=1 batches — the
        # batch path's device tables + exact sparse download beat the
        # staged path's dense coefficient transfer even for one image);
        # non-fast configs fall to the per-image staged path. A
        # mixed-size corpus therefore keeps near-full throughput
        # instead of hitting the serial cliff (padding to a common
        # bucket would change bytes: the trellis EOB DP sees trailing
        # pad blocks).
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape, []).append(i)
        fast_groups = []
        slow_idx = []
        rows_done = {}
        for shape, idxs in by_shape.items():
            ctx = _fast_ctx(images[idxs[0]], config, overrides)
            if ctx is not None:
                fast_groups.append((idxs, ctx))
                continue
            img0 = images[idxs[0]]
            if (img0.ndim == 3
                    and img0.shape[0] * img0.shape[1]
                    > _batch_max_mp() * 1e6):
                routed = True
                for i in idxs:
                    r = _route_rows(images[i], config, overrides)
                    if r is None:
                        routed = False
                        break
                    rows_done[i] = r
                if routed:
                    continue
                for i in idxs:
                    rows_done.pop(i, None)
            slow_idx.extend(idxs)
        if rows_done and not fast_groups:
            out = [None] * len(images)
            for i, r in rows_done.items():
                out[i] = r
            if slow_idx:
                slow_out = _encode_many([images[i] for i in slow_idx],
                                        config, **overrides)
                for j, i in enumerate(slow_idx):
                    out[i] = slow_out[j]
            return out
        if fast_groups:
            out = [None] * len(images)
            for i, r in rows_done.items():
                out[i] = r
            _encode_pipelined_groups(images, fast_groups, out)
            if slow_idx:
                slow_out = _encode_many([images[i] for i in slow_idx],
                                        config, **overrides) \
                    if len(slow_idx) > 1 else None
                if slow_out is not None:
                    for j, i in enumerate(slow_idx):
                        out[i] = slow_out[j]
                else:
                    i = slow_idx[0]
                    out[i] = _encode_many([images[i]], config,
                                          **overrides)[0]
            return out
    out = [None] * len(images)
    resolved = [_resolve(img, config, overrides) for img in images]
    # r5: images whose config fell off the batched path but sits in the
    # host engine's matrix (arithmetic trellis, trellis_q_opt, ...)
    # encode natively on a thread pool — the staged device path pays
    # per-row tunnel round trips for exactly these configs
    from . import host_engine
    if host_engine.enabled():
        host_idx = [
            i for i in range(len(images))
            if out[i] is None and images[i].ndim in (2, 3)
            and host_engine.supported(resolved[i][1], resolved[i][2])
            and _qt_slots(resolved[i][1], resolved[i][2], resolved[i][3])
            == _CS_INFO[resolved[i][2]][0][:resolved[i][3]]]
        if host_idx:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=2) as ex:
                futs = {i: ex.submit(
                    host_engine.encode_host, images[i], resolved[i][0],
                    resolved[i][1], resolved[i][2], resolved[i][3],
                    resolved[i][4], resolved[i][5]) for i in host_idx}
                for i, f in futs.items():
                    out[i] = f.result()
            if all(o is not None for o in out):
                return out
    states = []
    idx_rest = [i for i in range(len(images)) if out[i] is None]
    images = [images[i] for i in idx_rest]
    resolved = [resolved[i] for i in idx_rest]
    report.add_passes(sum(1 + (1 if r[1].trellis_quant else 0)
                          for r in resolved))
    # stage 1: dispatch all device pipelines
    for img, (cfg_o, cfg, cs, ncomps, samp, qt) in zip(images, resolved):
        geom, comp_res, small = _phase_p1(img, cfg, samp, qt, cs)
        states.append({"geom": geom, "comp_res": comp_res, "small": small})
        report.pass_done("main")
    # stage 2: trellis dispatch (one host sync per image for norms/hists)
    for st, (cfg_o, cfg, cs, ncomps, samp, qt) in zip(states, resolved):
        if cfg.trellis_quant:
            finals = _phase_trellis(st["geom"], st["comp_res"], st["small"],
                                    cfg, qt, cs)
            report.pass_done("trellis")
        else:
            finals = tuple(r[0] for r in st["comp_res"])
        st["flat"] = _phase_pack(st["geom"], finals)
    # stage 3: download + host entropy
    for i, (st, img, (cfg_o, cfg, cs, ncomps, samp, qt)) in \
            enumerate(zip(states, images, resolved)):
        planes = _split_flat(st["geom"], _np.asarray(st["flat"]),
                             flat_dev=st["flat"])
        mcus_x = st["geom"][0]
        restart = _restart_interval(cfg, mcus_x)
        out[idx_rest[i]] = _phase_entropy(
            img.shape[1], img.shape[0], st["geom"], planes, qt, cfg_o,
            cfg, ncomps, restart, cs)
    return out


def _group_size() -> int:
    # r3 re-measured after the smalls sync moved on device: smaller
    # groups with a deeper stage pool interleave best (g8/stage4 median
    # 8.8 MP/s vs g16/stage2 7.5-8.5 with fade; r2's g16 optimum was set
    # by the per-group host sync that no longer exists)
    import os as _os
    return max(1, int(_os.environ.get("MJ_BATCH_GROUP", "8")))


def _encode_pipelined_groups(images, fast_groups, out):
    """Software pipeline over shape groups: the main thread only preps
    (host C++ color+downsample) and uploads chunk k+1 while stage
    workers run everything downstream for chunk k — trellis dispatch,
    sparse-header syncs, and host entropy/stitching. Chunks from
    DIFFERENT image shapes share the same pipeline, so a mixed-size
    corpus keeps the tunnel busy end to end. All blocking host<->device
    syncs happen off the dispatch path."""
    from concurrent.futures import ThreadPoolExecutor
    import os as _os
    g = _group_size()
    chunks = []
    for idxs, ctx in fast_groups:
        img0 = images[idxs[0]]
        mp = img0.shape[0] * img0.shape[1] / 1e6
        ge = max(1, min(g, int(_batch_budget_mp() / max(mp, 1e-6))))
        for k in range(0, len(idxs), ge):
            chunks.append((idxs[k:k + ge], ctx))
    if len(chunks) == 1:
        idxs, (cfg_o, cfg, cs, ncomps, samp, qt) = chunks[0]
        imgs = [images[i] for i in idxs]
        p1 = _batch_p1(imgs, cfg, samp, qt, cs)
        res = _batch_finish(imgs, p1, cfg_o, cfg, cs, ncomps, samp, qt)
        for k, i in enumerate(idxs):
            out[i] = res[k]
        return
    nthreads = max(2, (_os.cpu_count() or 4) - 1)
    nstage = max(1, int(_os.environ.get("MJ_STAGE_WORKERS", "6")))
    with ThreadPoolExecutor(max_workers=nstage) as stage_pool, \
            ThreadPoolExecutor(max_workers=nthreads) as ent_pool:
        jobs = []
        for idxs, (cfg_o, cfg, cs, ncomps, samp, qt) in chunks:
            imgs = [images[i] for i in idxs]
            p1 = _batch_p1(imgs, cfg, samp, qt, cs)
            jobs.append((idxs, stage_pool.submit(
                _batch_finish, imgs, p1, cfg_o, cfg, cs, ncomps, samp,
                qt, ent_pool)))
        for idxs, j in jobs:
            res = j.result()
            for k, i in enumerate(idxs):
                out[i] = res[k]


def _batch_finish(images, p1, config, cfg, cs, ncomps, samp, qtables,
                  ent_pool=None):
    """Everything downstream of the p1 dispatch for one group: trellis +
    scan-search dispatch and their blocking syncs, then host entropy.
    Runs on a stage worker so the main thread can keep uploading.

    Device-runtime failures (observed on the remote-attached TPU runtime
    when large and small programs interleave) are retried once from the
    host inputs; a second failure falls back to the per-image path —
    the batch must degrade, never error (the per-image-error-isolation
    contract of SURVEY.md §5)."""
    try:
        st = _batch_rest(images, p1, config, cfg, cs, ncomps, samp,
                         qtables)
        if isinstance(st, list):
            return st                   # device scan search produced bytes
        return _batch_host(images, st, config, cfg, cs, ncomps, qtables,
                           ent_pool)
    except Exception as e:
        if not _device_runtime_error(e):
            raise
        report.trace(1, "batch group: device runtime error (%s); "
                        "resetting programs and retrying" % (e,))
    # a jit executable can lose its lifted-constant buffers after other
    # shapes' programs ran ("supplied N buffers but compiled program
    # expected M"); dropping the in-process executable caches retraces
    # cleanly (the on-disk compile cache keeps it cheap)
    _reset_device_programs()
    try:
        p1 = _batch_p1(images, cfg, samp, qtables, cs)   # fresh dispatch
        st = _batch_rest(images, p1, config, cfg, cs, ncomps, samp,
                         qtables)
        if isinstance(st, list):
            return st
        return _batch_host(images, st, config, cfg, cs, ncomps, qtables,
                           ent_pool)
    except Exception as e:
        if not _device_runtime_error(e):
            raise
        report.trace(1, "batch group: device runtime failed twice; "
                        "falling back to per-image encode")
        return [_encode_many([img], config)[0] for img in images]


def _device_runtime_error(e) -> bool:
    """A TPU/accelerator runtime failure (as opposed to a codec bug):
    the remote runtime surfaces these as JaxRuntimeError OR as plain
    ValueError carrying the XLA status string."""
    import jax.errors as _jerr
    if isinstance(e, _jerr.JaxRuntimeError):
        return True
    s = str(e)
    return any(tag in s for tag in
               ("INVALID_ARGUMENT: TPU backend error",
                "UNAVAILABLE", "INTERNAL", "DEADLINE_EXCEEDED",
                "TPU worker",
                # jit executable lost its lifted-constant binding after
                # other shapes' programs ran (clear_caches + retrace
                # recovers; seen on CPU and TPU backends alike)
                "buffers but compiled program expected"))


def _batch_p1(images, cfg, samp, qtables, cs="ycbcr"):
    """Upload + p1 dispatch for one group (async; nothing blocks). The
    smalls D2H starts immediately so the stage worker's later sync is
    usually already resident."""
    import numpy as _np
    from . import pipeline_t
    from .pipeline import geometry as _geometry
    _, _, comps = _geometry(images[0].shape[1], images[0].shape[0], samp)
    ris = _trellis_ris(cfg, comps)
    dctm = (cfg.dct_method.value if hasattr(cfg.dct_method, "value")
            else cfg.dct_method)
    if (cfg.host_prep and cfg.smoothing_factor == 0
            and cfg.precision == 8 and cs == "ycbcr"
            and cfg.plane_pack):
        # host C++ color+downsample + plane pack: ~0.6-1.0 B/px upload
        # (vs 1.5 prepped / 3.0 raw), device-expanded before p1
        geom, merged, smalls = pipeline_t.run_p1_batch_packed(
            images, samp, qtables, cfg.overshoot_deringing, cfg.precision,
            ris=ris, dct_method=dctm)
    elif (cfg.host_prep and cfg.smoothing_factor == 0
            and cfg.precision == 8 and cs == "ycbcr"):
        # host C++ color+downsample halves the pixel upload (prep.cpp);
        # uint8 YCbCr only — other colorspaces / deep precision /
        # smoothing take the device prep path
        geom, merged, smalls = pipeline_t.run_p1_batch_pre(
            images, samp, qtables, cfg.overshoot_deringing, cfg.precision,
            ris=ris, dct_method=dctm)
    else:
        stack = _np.stack(images)
        geom, merged, smalls = pipeline_t.run_p1_batch(
            stack, samp, qtables, cfg.overshoot_deringing, cfg.precision,
            ris=ris, smoothing=cfg.smoothing_factor, dct_method=dctm,
            cs=cs, qt_slots=_qt_slots(cfg, cs, len(samp)))
    if cfg.trellis_quant and (cfg.arithmetic or not cfg.optimize_coding):
        # only the host-tablegen trellis path reads smalls on host —
        # prefetch for it. (The dev-first trellis consumes them on
        # device; the no-trellis path no longer needs them at all.)
        try:
            smalls.copy_to_host_async()
        except Exception:
            pass
    return geom, merged, smalls


def _batch_trellis_bands(geom, merged, smalls, cfg, cs, ncomps,
                         qtables, b):
    """Batched use_scans_in_trellis: the staged per-band pass structure
    (each band's rate statistics regather from the CURRENT coefficients
    after the previous band's trellis, DC trellis only in band 0 —
    _phase_trellis) run with batch=b device programs. Host tablegen per
    band (the sequential band dependency already forces a sync)."""
    import numpy as _np
    import jax.numpy as jnp
    from . import pipeline_t, trellis
    mcus_x, mcus_y, comps = geom
    tcomps = _trellis_comps(cfg, cs, comps)
    tbl_slots = _CS_INFO[cs][1]
    qt_slots = _qt_slots(cfg, cs, ncomps)
    opt = cfg.optimize_coding and not cfg.arithmetic
    per_img = pipeline_t.unpack_small_batch(geom, smalls, b)
    lams, dc_sis, qtblzz, ncands = [], [], [], []
    for ci in range(ncomps):
        lam_imgs = []
        for (norms, hists) in per_img:
            lam_imgs.append(trellis.lambda_from_norm(
                norms[ci], cfg.lambda_log_scale1, cfg.lambda_log_scale2))
            _, dc_si = trellis.trellis_tables_from_hist(
                hists[ci], tbl_slots[ci], False)
        lams.append(_np.concatenate(lam_imgs))
        dc_sis.append(dc_si)
        qz = _np.asarray(qtables[min(qt_slots[ci], len(qtables) - 1)]) \
            .reshape(64)[consts.JPEG_ZIGZAG].astype(_np.int32)
        qtblzz.append(qz)
        ncands.append(trellis.get_num_dc_candidates(int(qz[0])))
    upal, uint = trellis.ac_impl_flags(cfg.precision)
    fs = cfg.trellis_freq_split
    cur = tuple(m[0] for m in merged)
    raws_b = tuple(m[1] for m in merged)
    ris = _trellis_ris(cfg, comps)
    for _loop in range(max(1, cfg.trellis_num_loops)):
        for bi_, (ss, se) in enumerate([(1, fs), (fs + 1, 63)]):
            if opt:
                hist_fn = trellis.make_band_hist_t(ss, se, batch=b,
                                                   ris=ris)
                bh = hist_fn(cur)
                ac_sis = [_np.stack([
                    trellis.trellis_tables_from_hist(
                        _np.asarray(bh[ci])[im], tbl_slots[ci], True)[0]
                    for im in range(b)]) for ci in range(ncomps)]
            else:
                ac_sis = [_np.stack([
                    trellis.trellis_tables_from_hist(
                        None, tbl_slots[ci], False)[0]] * b)
                    for ci in range(ncomps)]
            packed = jnp.asarray(trellis.pack_trellis_inputs(
                lams, ac_sis, dc_sis, qtblzz))
            run = trellis.make_trellis_all_t(
                tuple(tcomps), None, ((ss, se),),
                cfg.trellis_quant_dc and bi_ == 0, tuple(ncands),
                batch=b, precision=cfg.precision,
                eob_opt=cfg.trellis_eob_opt,
                delta_w=float(cfg.trellis_delta_dc_weight),
                use_pallas=upal, interpret=uint)
            cur = run(raws_b, cur, packed)
    return cur


def _batch_rest(images, p1, config, cfg, cs, ncomps, samp, qtables):
    """Post-p1 device work for one group: trellis (+ device scan search).
    Blocks on the smalls sync; run it off the main dispatch thread."""
    import numpy as _np
    import jax.numpy as jnp
    from . import pipeline_t, trellis
    b = len(images)
    geom, merged, smalls = p1
    mcus_x, mcus_y, comps = geom
    restart = _restart_interval(cfg, mcus_x)
    tcomps = _trellis_comps(cfg, cs, comps)
    tbl_slots = _CS_INFO[cs][1]
    qt_slots = _qt_slots(cfg, cs, ncomps)

    if cfg.trellis_quant and cfg.use_scans_in_trellis:
        finals = _batch_trellis_bands(geom, merged, smalls, cfg, cs,
                                      ncomps, qtables, b)
    elif cfg.trellis_quant:
        bands = [(1, 63)]
        import os as _os
        # the device-tablegen trellis front is verified for the 2-slot
        # YCbCr/grayscale layouts; other colorspaces use host tables
        dev_first = (cfg.optimize_coding and not cfg.arithmetic
                     and cs in ("ycbcr", "grayscale")
                     and _os.environ.get("MJ_DEV_FIRST", "1") != "0")
        dc_sis, qtblzz, ncands = [], [], []
        lams, ac_sis = [], []
        per_img = None
        if not dev_first:
            per_img = pipeline_t.unpack_small_batch(geom, smalls, b)
        for ci in range(ncomps):
            slot = tbl_slots[ci]
            if dev_first:
                from ..entropy.huffman import derive_codes as _dc
                dc_si = _dc(STD_TABLES[(0, slot)])[1].astype(_np.int32)
            else:
                lam_imgs = []
                ac_tbl_imgs = []
                for (norms, hists) in per_img:
                    lam_imgs.append(trellis.lambda_from_norm(
                        norms[ci], cfg.lambda_log_scale1,
                        cfg.lambda_log_scale2))
                    ac_si, dc_si = trellis.trellis_tables_from_hist(
                        hists[ci], slot,
                        cfg.optimize_coding and not cfg.arithmetic)
                    ac_tbl_imgs.append(ac_si)
                lams.append(_np.concatenate(lam_imgs))
                ac_sis.append(_np.stack(ac_tbl_imgs))
            dc_sis.append(dc_si)
            qz = _np.asarray(
                qtables[min(qt_slots[ci], len(qtables) - 1)]) \
                .reshape(64)[consts.JPEG_ZIGZAG].astype(_np.int32)
            qtblzz.append(qz)
            ncands.append(trellis.get_num_dc_candidates(int(qz[0])))
        df = ((float(cfg.lambda_log_scale1), float(cfg.lambda_log_scale2))
              if dev_first else None)
        packed = jnp.asarray(trellis.pack_trellis_inputs(
            lams, ac_sis, dc_sis, qtblzz))
        upal, uint = trellis.ac_impl_flags(cfg.precision)
        run = trellis.make_trellis_all_t(tuple(tcomps), None, tuple(bands),
                                         cfg.trellis_quant_dc,
                                         tuple(ncands), batch=b,
                                         precision=cfg.precision,
                                         eob_opt=cfg.trellis_eob_opt,
                                         delta_w=float(
                                             cfg.trellis_delta_dc_weight),
                                         use_pallas=upal, interpret=uint,
                                         dev_first=df)
        raws_b = tuple(m[1] for m in merged)
        finals = run(raws_b, tuple(m[0] for m in merged), packed,
                     smalls if dev_first else None)
        nloops = max(1, cfg.trellis_num_loops)
        if nloops > 1 and cfg.optimize_coding and not cfg.arithmetic:
            # regather PER-IMAGE rate tables from the previous loop's
            # coefficients, like the first loop's per-image stats — with
            # the Annex-K tablegen fused INTO the trellis program
            # (ops/tablegen.py), so the loop never syncs to host
            run2 = trellis.make_trellis_all_t(
                tuple(tcomps), None, tuple(bands), cfg.trellis_quant_dc,
                tuple(ncands), batch=b, precision=cfg.precision,
                eob_opt=cfg.trellis_eob_opt,
                delta_w=float(cfg.trellis_delta_dc_weight),
                use_pallas=upal, interpret=uint, dev_tables=True,
                dev_first=df)
            packed2 = (packed if dev_first else jnp.asarray(
                trellis.pack_trellis_inputs(lams, [], dc_sis, qtblzz)))
            hist_fn = trellis.make_band_hist_t(1, 63, batch=b)
            for _ in range(nloops - 1):
                finals = run2(raws_b, finals, packed2,
                              smalls if dev_first else None,
                              hist_fn(finals))
        else:
            for _ in range(nloops - 1):
                finals = run(raws_b, finals, packed,
                             smalls if dev_first else None)
    else:
        finals = tuple(m[0] for m in merged)

    # fully-device scan search: coefficients never leave the device; two
    # small transfers replace the whole-plane download + host entropy
    # (codec/scanopt_dev.py)
    if (cfg.progressive and cfg.optimize_scans and cfg.scan_script is None
            and not cfg.arithmetic and cfg.device_scanopt):
        from . import scanopt_dev
        if scanopt_dev.supported(cfg, cs, ncomps,
                                 _restart_interval(cfg, mcus_x), geom):
            extra = None
            if cfg.icc:
                chunks = tuple(marker.icc_chunks(cfg.icc))
                extra = [chunks] * b
            try:
                return scanopt_dev.encode_batch_scans(
                    [img.shape[1] for img in images],
                    [img.shape[0] for img in images], geom, finals,
                    qtables, cfg, ncomps, b, extra_markers_per_img=extra)
            except scanopt_dev._FallbackNeeded:
                pass

    st = {"geom": geom, "finals": finals, "b": b, "restart": restart}
    if cfg.coef_transport:
        # device-Huffman transport download (~0.15 B/px vs ~1.0 for the
        # sparse layout, ops/transport.py); the header sync + bucketed
        # word download happen in _batch_fetch. On overflow the sparse
        # pack is dispatched lazily there from st["finals"]. 12-bit
        # batches use the extended fixed tables (r5, transport._tables).
        from ..ops import transport
        st["transport"] = transport.pack_batch(tuple(finals), comps, b,
                                               precision=cfg.precision)
        st["precision"] = cfg.precision
    elif cfg.sparse_download:
        # dispatch the exact-global sparse pack (ops/sparsepack.py
        # pack_planes_exact): masks + value stream with no slack; the
        # header sync then a value download sized by the ACTUAL nonzero
        # count happen in _batch_host (possibly on an IO thread).
        from ..ops import sparsepack
        st["sparse2"] = sparsepack.pack_planes_exact(finals, comps, b)
    return st


def _batch_fetch(st, cfg):
    """Sync the coefficient download -> per-image host plane lists.

    Every download path returns REAL-block planes; iMCU dummy blocks
    (non-16-aligned dims) are synthesized here on host (repeat-DC fill,
    jccoefct.c:300-347) so the entropy stage always sees padded planes."""
    from . import pipeline_t
    geom = st["geom"]
    _, _, comps = geom
    b = st["b"]

    def pad(images_planes):
        if all(g.bw == g.bw_pad and g.bh == g.bh_pad for g in comps):
            return images_planes
        return [[pipeline_t.add_dummy_blocks_host(p, g)
                 for p, g in zip(planes, comps)]
                for planes in images_planes]
    if "transport" in st:
        from ..ops import sparsepack, transport
        prec = st.get("precision", 8)
        fetched = transport.fetch(st["transport"])
        if fetched is None:
            # symbol capacity overflow (denser than the default bucket):
            # retry once at the big bucket before giving up on transport
            fetched = transport.fetch(transport.pack_batch(
                tuple(st["finals"]), tuple(comps), b, scap=32,
                precision=prec))
        if fetched is not None:
            words, bits = fetched
            planes = transport.decode_to_planes(words, bits, b, comps,
                                                precision=prec)
            if planes is not None:
                return pad(planes)
        # still over (or malformed): sparse download (rare)
        st["sparse2"] = sparsepack.pack_planes_exact(
            tuple(st["finals"]), tuple(comps), b)
    if "sparse2" in st:
        from ..ops import sparsepack
        header_dev, words_dev, nt, n_tot = st["sparse2"]
        fetched = sparsepack.fetch_exact(header_dev, words_dev, nt)
        if fetched is not None:
            masks, lo, esc, _total = fetched
            planes = sparsepack.expand_flat_to_planes(masks, lo, esc, nt,
                                                      n_tot, b, comps)
            if planes is not None:
                return pad(planes)
    flat_dev = pipeline_t._pack_all_batch(tuple(st["finals"]),
                                          tuple(comps), b)
    try:
        flat_dev.copy_to_host_async()
    except Exception:
        pass
    flat_h = np.asarray(flat_dev)
    from ..utils import xfer
    xfer.add_d2h(flat_h.nbytes)
    return pad(pipeline_t.split_flat_batch(geom, flat_h, b))


def _batch_host(images, st, config, cfg, cs, ncomps, qtables,
                ent_pool=None):
    """Host half: coefficient download + per-image entropy (threaded)."""
    from concurrent.futures import ThreadPoolExecutor
    import contextvars
    per_image_planes = _batch_fetch(st, cfg)
    geom = st["geom"]
    restart = st["restart"]
    b = st["b"]
    report.add_passes(b)
    own_pool = ent_pool is None
    ex = ent_pool or ThreadPoolExecutor(max_workers=min(8, b))
    try:
        futs = []
        for img, planes in zip(images, per_image_planes):
            ctx = contextvars.copy_context()   # progress/trace reporter
            futs.append(ex.submit(
                ctx.run, _phase_entropy, img.shape[1], img.shape[0], geom,
                planes, qtables, config, cfg, ncomps, restart, cs,
                parallel=(b == 1)))
        outs = []
        for f in futs:
            outs.append(f.result())
            report.pass_done("entropy")
        return outs
    finally:
        if own_pool:
            ex.shutdown(wait=False)

def encode_raw_yuv(planes, width: int, height: int, samp,
                   config: Optional[EncoderConfig] = None,
                   **overrides) -> bytes:
    """Encode pre-subsampled component planes (jpeg_write_raw_data /
    tj3CompressFromYUV8): skips color conversion and downsampling but
    runs the full mozjpeg pass machinery (dering, trellis, scan search).

    planes: list of (ph, pw) uint8 arrays with tjPlaneWidth/Height dims;
    samp: [(h, v), ...] sampling factors."""
    import numpy as _np
    from . import pipeline_t
    if config is None:
        config = EncoderConfig()
    cfg = config.resolved()
    cs = "grayscale" if len(planes) == 1 else "ycbcr"
    ncomps = len(planes)
    qtables = make_qtables(cfg)
    _, _, comps = pipeline_t.geometry(width, height, samp)
    geom, comp_res, small = pipeline_t.run_p1_raw(
        planes, width, height, samp, qtables, cfg.overshoot_deringing,
        cfg.precision, _qt_slots(cfg, cs, ncomps),
        ris=_trellis_ris(cfg, comps), dct_method=cfg.dct_method.value
        if hasattr(cfg.dct_method, "value") else cfg.dct_method)
    if cfg.trellis_quant:
        finals = _phase_trellis(geom, comp_res, small, cfg, qtables, cs)
    else:
        finals = tuple(r[0] for r in comp_res)
    flat = _phase_pack(geom, finals)
    out_planes = _split_flat(geom, _np.asarray(flat), flat_dev=flat)
    restart = _restart_interval(cfg, geom[0])
    return _phase_entropy(width, height, geom, out_planes, qtables,
                          config, cfg, ncomps, restart, cs)

