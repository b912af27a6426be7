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
from . import marker, pipeline, scans
from .config import EncoderConfig, Profile

STD_TABLES = {
    (0, 0): HuffTable(*consts.STD_DC_LUMINANCE),
    (0, 1): HuffTable(*consts.STD_DC_CHROMINANCE),
    (1, 0): HuffTable(*consts.STD_AC_LUMINANCE),
    (1, 1): HuffTable(*consts.STD_AC_CHROMINANCE),
}


def make_qtables(cfg) -> List[np.ndarray]:
    sf = consts.quality_scaling(cfg.quality)
    ql = consts.scale_quant_table(
        consts.STD_LUMINANCE_QUANT_TBL[cfg.quant_tbl_idx], sf,
        cfg.force_baseline).reshape(8, 8)
    qc = consts.scale_quant_table(
        consts.STD_CHROMINANCE_QUANT_TBL[cfg.quant_tbl_idx], sf,
        cfg.force_baseline).reshape(8, 8)
    return [ql, qc]


def _std_dc_ac(ncomps):
    dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(ncomps)}
    ac_tbls = dict(dc_tbls)
    return dc_tbls, ac_tbls


def _scan_tables_std(ncomps):
    dc = {0: STD_TABLES[(0, 0)]}
    ac = {0: STD_TABLES[(1, 0)]}
    if ncomps > 1:
        dc[1] = STD_TABLES[(0, 1)]
        ac[1] = STD_TABLES[(1, 1)]
    return dc, ac


def _restart_interval(cfg, mcus_x: int) -> int:
    if cfg.restart_in_rows:
        return cfg.restart_in_rows * mcus_x
    return cfg.restart_interval


class ScanResult:
    __slots__ = ("scan", "data", "dc_tables", "ac_tables", "dc_tbls",
                 "ac_tbls")

    def __init__(self, scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls):
        self.scan = scan
        self.data = data
        self.dc_tables = dc_tables    # {tbl_idx: HuffTable} used by this scan
        self.ac_tables = ac_tables
        self.dc_tbls = dc_tbls        # {comp: tbl_idx}
        self.ac_tbls = ac_tbls


def encode_scan_optimal(sg: entenc.ScanGeometry, dc_tbls, ac_tbls,
                        restart: int) -> ScanResult:
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
    data, _, _ = entenc.encode_scan(sg, dc_tbls, ac_tbls, dc_tables,
                                    ac_tables, restart, gather=False)
    return ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls)


def encode_scan_fixed(sg: entenc.ScanGeometry, dc_tbls, ac_tbls,
                      dc_tables, ac_tables, restart: int) -> ScanResult:
    scan = sg.scan
    used_dc = {dc_tbls[ci]: dc_tables[dc_tbls[ci]] for ci in scan.comps
               if scan.Ss == 0 and scan.Ah == 0 and dc_tbls[ci] in dc_tables}
    used_ac = {ac_tbls[ci]: ac_tables[ac_tbls[ci]] for ci in scan.comps
               if scan.Se > 0 and ac_tbls[ci] in ac_tables}
    data, _, _ = entenc.encode_scan(sg, dc_tbls, ac_tbls, dc_tables,
                                    ac_tables, restart, gather=False)
    return ScanResult(scan, data, used_dc, used_ac, dc_tbls, ac_tbls)


def assemble(width: int, height: int, geom, qtables, scan_results,
             restart: int, progressive: bool, ncomps: int,
             icc: Optional[bytes] = None,
             com: Optional[bytes] = None,
             multi_dqt: bool = True) -> bytes:
    """Write markers + scans into the final JPEG byte stream."""
    _, _, comps = geom
    w = marker.MarkerWriter()
    w.soi()
    w.jfif_app0()
    if icc:
        marker.write_icc(w, icc)
    if com:
        w.com(com)
    if multi_dqt:  # single DQT with all tables (mozjpeg non-FASTEST profile)
        w.dqt_multi([(i, qtables[i]) for i in range(min(ncomps, 2))])
    else:
        w.dqt(0, qtables[0])
        if ncomps > 1:
            w.dqt(1, qtables[1])
    sof_code = marker.SOF2 if progressive else marker.SOF0
    comp_ids = [1, 2, 3][:ncomps]
    w.sof(sof_code, 8, height, width,
          [(comp_ids[ci], comps[ci].h, comps[ci].v, 0 if ci == 0 else 1)
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
        if restart != last_dri:
            w.dri(restart)
            last_dri = restart
        # unused table fields are written as 0 (jcmarker.c:511-518)
        w.sos([(comp_ids[ci],
                sr.dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0 else 0,
                sr.ac_tbls[ci] if scan.Se else 0)
               for ci in scan.comps], scan.Ss, scan.Se, scan.Ah, scan.Al)
        w.raw(sr.data)
    w.eoi()
    return w.bytes()


def encode(image: np.ndarray, config: Optional[EncoderConfig] = None,
           **overrides) -> bytes:
    """Encode an RGB (H, W, 3) or grayscale (H, W) uint8 image to JPEG."""
    if config is None:
        config = EncoderConfig(**overrides)
    cfg = config.resolved()

    grayscale = config.grayscale or image.ndim == 2
    ncomps = 1 if grayscale else 3
    samp = ([(1, 1)] if grayscale
            else [cfg.subsampling, (1, 1), (1, 1)])
    qtables = make_qtables(cfg)

    geom, planes, raw = pipeline.encode_planes(
        image, samp, qtables, grayscale,
        dering_on=cfg.overshoot_deringing)
    mcus_x, mcus_y, comps = geom
    restart = _restart_interval(cfg, mcus_x)

    if cfg.trellis_quant:
        from . import trellis
        planes = trellis.trellis_optimize(planes, raw, qtables, geom, cfg)

    dc_tbls, ac_tbls = _std_dc_ac(ncomps)

    if cfg.progressive:
        if cfg.scan_script is not None:
            script = [scans.ScanInfo(tuple(s[0]), *s[1:])
                      for s in cfg.scan_script]
        elif cfg.optimize_scans:
            from . import scanopt
            return scanopt.encode_optimize_scans(
                image.shape[1], image.shape[0], geom, planes, qtables,
                cfg, ncomps, restart)
        elif config.profile == Profile.MAX_COMPRESSION:
            script = scans.simple_progression_max(ncomps,
                                                  cfg.dc_scan_opt_mode)
        else:
            script = scans.simple_progression_legacy(ncomps)
    else:
        script = scans.baseline_script(ncomps)

    results = []
    for scan in script:
        sg = entenc.ScanGeometry(scan, geom, planes)
        if cfg.optimize_coding or cfg.progressive:
            results.append(encode_scan_optimal(sg, dc_tbls, ac_tbls, restart))
        else:
            dct_, act_ = _scan_tables_std(ncomps)
            results.append(encode_scan_fixed(sg, dc_tbls, ac_tbls, dct_,
                                             act_, restart))

    return assemble(image.shape[1], image.shape[0], geom, qtables, results,
                    restart, cfg.progressive, ncomps,
                    multi_dqt=config.profile != Profile.FASTEST)
