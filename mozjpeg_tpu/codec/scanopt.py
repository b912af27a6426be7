"""jpegrescan-style scan optimization (optimize_scans).

Reproduces the reference's greedy search over the 64-candidate (YCbCr) /
23-candidate (gray) scan script: successive-approximation depth Al for
luma/chroma, spectral frequency split, DC interleave choice — including the
early-exit rules and the stitched output layout where each winning scan
buffer carries its own DHT+SOS and scan 0 carries the frame header
(/root/reference/jcmaster.c:773-962 select_scans, jcparam.c:734-852
jpeg_search_progression).

Unlike the reference (64 sequential trial encode passes over the image),
candidate scans here are encoded from the already-resident coefficient
planes; only the entropy pass runs per candidate.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

from ..entropy import encode as entenc
from . import marker, report, scans
from .scans import ScanInfo

AL_MAX_LUMA = scans.AL_MAX_LUMA          # 3
AL_MAX_CHROMA = scans.AL_MAX_CHROMA      # 2
NUM_FREQ_SPLITS = len(scans.FREQUENCY_SPLITS)  # 5


def _scan_restart(scan, geom, cfg, ncomps):
    from .encoder import scan_restart_interval
    return scan_restart_interval(cfg, scan, geom, ncomps)


def _scan_result(scan: ScanInfo, geom, planes, dc_tbls, ac_tbls,
                 restart: int, device: bool = False, precision: int = 8):
    """The expensive half of a candidate scan: gather + optimal tables +
    entropy emission. Pure in (scan, restart) given the planes, so
    candidates within a greedy group precompute concurrently."""
    from .encoder import encode_scan_optimal
    sg = entenc.ScanGeometry(scan, geom, planes)
    return encode_scan_optimal(sg, dc_tbls, ac_tbls, restart, device=device,
                               precision=precision)


def _scan_buffer(scan: ScanInfo, geom, planes, dc_tbls, ac_tbls,
                 restart: int, frame_header: Optional[bytes],
                 emit_dri: bool = False, device: bool = False,
                 precision: int = 8, sr=None) -> bytes:
    """Encode one candidate scan: [frame hdr] + DHT(s) + [DRI] + SOS + data."""
    if sr is None:
        sr = _scan_result(scan, geom, planes, dc_tbls, ac_tbls, restart,
                          device=device, precision=precision)
    w = marker.MarkerWriter()
    if frame_header:
        w.raw(frame_header)
    entries = []
    seen = set()
    for ci in scan.comps:
        if scan.Ss == 0 and scan.Ah == 0:
            t = sr.dc_tbls[ci]
            if t in sr.dc_tables and ("d", t) not in seen:
                entries.append((0, t, sr.dc_tables[t]))
                seen.add(("d", t))
        if scan.Se > 0:
            t = sr.ac_tbls[ci]
            if t in sr.ac_tables and ("a", t) not in seen:
                entries.append((1, t, sr.ac_tables[t]))
                seen.add(("a", t))
    w.dht_multi(entries)
    if emit_dri:
        w.dri(restart)
    comp_ids = [1, 2, 3]
    w.sos([(comp_ids[ci],
            sr.dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0 else 0,
            sr.ac_tbls[ci] if scan.Se else 0)
           for ci in scan.comps], scan.Ss, scan.Se, scan.Ah, scan.Al)
    w.raw(sr.data)
    return w.bytes()


def _scan_buffer_arith(scan: ScanInfo, geom, planes, dc_tbls, ac_tbls,
                       restart: int, frame_header: Optional[bytes],
                       emit_dri: bool = False) -> bytes:
    """Arith candidate scan: [frame hdr] + DAC + [DRI] + SOS + data
    (jcmarker.c:404-446 emit_dac writes the scan's tables every scan)."""
    from . import arith
    w = marker.MarkerWriter()
    if frame_header:
        w.raw(frame_header)
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
    if emit_dri:
        w.dri(restart)
    comp_ids = [1, 2, 3]
    w.sos([(comp_ids[ci],
            dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0 else 0,
            ac_tbls[ci] if scan.Se else 0)
           for ci in scan.comps], scan.Ss, scan.Se, scan.Ah, scan.Al)
    w.raw(arith.encode_scan_arith(scan, geom, planes, dc_tbls, ac_tbls,
                                  restart))
    return w.bytes()


class SearchLayout:
    """Index arithmetic of the 64-scan (YCbCr) / 23-scan (gray) search
    script (select_scans, jcmaster.c:773-962)."""

    def __init__(self, ncomps: int):
        self.ncomps = ncomps
        self.num_scans_luma_dc = 1
        self.num_scans_luma = (self.num_scans_luma_dc
                               + (3 * AL_MAX_LUMA + 2)
                               + (2 * NUM_FREQ_SPLITS + 1))      # 23
        self.num_scans_chroma_dc = 3 if ncomps == 3 else 0
        self.luma_split_start = (self.num_scans_luma_dc
                                 + 3 * AL_MAX_LUMA + 2)          # 12
        self.chroma_split_start = (self.num_scans_luma
                                   + self.num_scans_chroma_dc
                                   + (6 * AL_MAX_CHROMA + 4))    # 42
        self.num_scans = self.num_scans_luma if ncomps == 1 else 64

    def scan_al(self, sn: int, scan, best_Al_luma: int,
                best_Al_chroma: int):
        """The Al actually used when candidate sn is emitted: frequency-
        split scans inherit the winning successive-approximation depth
        (jcmaster.c:482-494)."""
        if self.luma_split_start <= sn < self.num_scans_luma:
            return ScanInfo(scan.comps, scan.Ss, scan.Se, scan.Ah,
                            best_Al_luma)
        if self.ncomps == 3 and self.chroma_split_start <= sn:
            return ScanInfo(scan.comps, scan.Ss, scan.Se, scan.Ah,
                            best_Al_chroma)
        return scan


class SearchResult:
    __slots__ = ("sizes", "used_scans", "best_Al_luma", "best_Al_chroma",
                 "best_split_luma", "best_split_chroma",
                 "interleave_chroma_dc")


def _run_selection(layout: SearchLayout, script, get_size,
                   on_candidate=None) -> SearchResult:
    """The greedy selection state machine, shared verbatim between the
    host path (get_size encodes the candidate) and the device path
    (codec/scanopt_dev.py: get_size reads a precomputed size array).
    Candidates are visited in exactly the reference's trial order
    including its skip-ahead early-exits; get_size(sn, scan) must return
    the FULL buffer size (DHT [+DRI] + SOS + entropy bytes; frame header
    excluded)."""
    L = layout
    num_scans = L.num_scans
    luma_split_start = L.luma_split_start
    num_scans_luma = L.num_scans_luma
    num_scans_chroma_dc = L.num_scans_chroma_dc
    chroma_split_start = L.chroma_split_start
    ncomps = L.ncomps

    sizes: Dict[int, int] = {}
    used_scans: Dict[int, ScanInfo] = {}
    best_Al_luma = 0
    best_Al_chroma = 0
    best_cost = 0
    best_split_luma = 0
    best_split_chroma = 0
    interleave_chroma_dc = False

    sn = 0
    while sn < num_scans:
        scan = L.scan_al(sn, script[sn], best_Al_luma, best_Al_chroma)
        sizes[sn] = get_size(sn, scan)
        used_scans[sn] = scan
        if on_candidate is not None:
            on_candidate(sn)
        nxt = sn + 1

        # --- selection state machine (select_scans) ---
        if 1 < nxt <= luma_split_start:
            if (nxt - 1) % 3 == 2:
                Al = (nxt - 1) // 3
                cost = sizes[nxt - 2] + sizes[nxt - 1] \
                    + sum(sizes[3 + 3 * i] for i in range(Al))
                if Al == 0 or cost < best_cost:
                    best_cost = cost
                    best_Al_luma = Al
                else:
                    sn = luma_split_start - 1  # jump: next is split start
        elif luma_split_start < nxt <= num_scans_luma:
            if nxt == luma_split_start + 1:
                best_split_luma = 0
                best_cost = sizes[nxt - 1]
            elif (nxt - luma_split_start) % 2 == 1:
                idx = (nxt - luma_split_start) >> 1
                cost = sizes[nxt - 2] + sizes[nxt - 1]
                if cost < best_cost:
                    best_cost = cost
                    best_split_luma = idx
                if ((idx == 2 and best_split_luma == 0)
                        or (idx == 3 and best_split_luma != 2)
                        or (idx == 4 and best_split_luma != 4)):
                    sn = num_scans_luma - 1
        elif num_scans > num_scans_luma:
            base = num_scans_luma
            if nxt == num_scans_luma + num_scans_chroma_dc:
                interleave_chroma_dc = (sizes[base] <= sizes[base + 1]
                                        + sizes[base + 2])
            elif (num_scans_luma + num_scans_chroma_dc < nxt
                  <= chroma_split_start):
                base = num_scans_luma + num_scans_chroma_dc
                if (nxt - base) % 6 == 4:
                    Al = (nxt - base) // 6
                    cost = (sizes[nxt - 4] + sizes[nxt - 3]
                            + sizes[nxt - 2] + sizes[nxt - 1]
                            + sum(sizes[base + 4 + 6 * i]
                                  + sizes[base + 5 + 6 * i]
                                  for i in range(Al)))
                    if Al == 0 or cost < best_cost:
                        best_cost = cost
                        best_Al_chroma = Al
                    else:
                        sn = chroma_split_start - 1
            elif chroma_split_start < nxt <= num_scans:
                if nxt == chroma_split_start + 2:
                    best_split_chroma = 0
                    best_cost = sizes[nxt - 2] + sizes[nxt - 1]
                elif (nxt - chroma_split_start) % 4 == 2:
                    idx = (nxt - chroma_split_start) >> 2
                    cost = (sizes[nxt - 4] + sizes[nxt - 3]
                            + sizes[nxt - 2] + sizes[nxt - 1])
                    if cost < best_cost:
                        best_cost = cost
                        best_split_chroma = idx
                    if ((idx == 2 and best_split_chroma == 0)
                            or (idx == 3 and best_split_chroma != 2)
                            or (idx == 4 and best_split_chroma != 4)):
                        sn = num_scans - 1
        sn += 1

    r = SearchResult()
    r.sizes = sizes
    r.used_scans = used_scans
    r.best_Al_luma = best_Al_luma
    r.best_Al_chroma = best_Al_chroma
    r.best_split_luma = best_split_luma
    r.best_split_chroma = best_split_chroma
    r.interleave_chroma_dc = interleave_chroma_dc
    return r


def display_order(layout: SearchLayout, r: SearchResult,
                  dc_scan_opt_mode: int) -> List[int]:
    """Final scan ordering from the search result (copy_buffer stitching
    order, jcmaster.c:898-961)."""
    L = layout
    ncomps = L.ncomps
    min_Al = min(r.best_Al_luma, r.best_Al_chroma)
    order: List[int] = [0]
    if ncomps == 3 and dc_scan_opt_mode != 0:
        base = L.num_scans_luma
        if r.interleave_chroma_dc and dc_scan_opt_mode != 1:
            order.append(base)
        else:
            order += [base + 1, base + 2]
    if r.best_split_luma == 0:
        order.append(L.luma_split_start)
    else:
        order += [L.luma_split_start + 2 * (r.best_split_luma - 1) + 1,
                  L.luma_split_start + 2 * (r.best_split_luma - 1) + 2]
    for Al in range(r.best_Al_luma - 1, min_Al - 1, -1):
        order.append(3 + 3 * Al)
    if ncomps == 3:
        if r.best_split_chroma == 0:
            order += [L.chroma_split_start, L.chroma_split_start + 1]
        else:
            b = L.chroma_split_start + 4 * (r.best_split_chroma - 1)
            order += [b + 2, b + 3, b + 4, b + 5]
        cbase = L.num_scans_luma + L.num_scans_chroma_dc
        for Al in range(r.best_Al_chroma - 1, min_Al - 1, -1):
            order += [cbase + 6 * Al + 4, cbase + 6 * Al + 5]
    for Al in range(min_Al - 1, -1, -1):
        order.append(3 + 3 * Al)
        if ncomps == 3:
            cbase = L.num_scans_luma + L.num_scans_chroma_dc
            order += [cbase + 6 * Al + 4, cbase + 6 * Al + 5]
    return order


def encode_optimize_scans(width: int, height: int, geom, planes, qtables,
                          cfg, ncomps: int, restart: int,
                          precision: int = 8, extra_markers=None,
                          arith: bool = False,
                          parallel: bool = True) -> bytes:
    script = scans.search_progression(ncomps, cfg.dc_scan_opt_mode)
    num_scans = len(script)
    _, _, comps = geom
    dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(ncomps)}
    ac_tbls = dict(dc_tbls)

    layout = SearchLayout(ncomps)
    num_scans_luma_dc = layout.num_scans_luma_dc
    num_scans_luma = layout.num_scans_luma
    num_scans_chroma_dc = layout.num_scans_chroma_dc
    luma_split_start = layout.luma_split_start
    chroma_split_start = layout.chroma_split_start

    # frame header: DQT(s) + SOF2, goes into scan 0's buffer
    fh = marker.MarkerWriter()
    fh.dqt_multi([(i, qtables[i]) for i in range(min(ncomps, 2))])
    comp_ids = [1, 2, 3][:ncomps]
    # declared gray SOF factors (rdswitch.c:610-642; see encoder.assemble)
    sof_samp = [(comps[ci].h, comps[ci].v) for ci in range(ncomps)]
    if ncomps == 1 and getattr(cfg, "gray_sample", None):
        sof_samp[0] = tuple(cfg.gray_sample)
    fh.sof(marker.SOF10 if arith else marker.SOF2, precision, height, width,
           [(comp_ids[ci], sof_samp[ci][0], sof_samp[ci][1],
             0 if ci == 0 else 1) for ci in range(ncomps)])
    frame_header = fh.bytes()

    bufs: Dict[int, bytes] = {}
    dri_state = [0]
    report.add_passes(num_scans)

    dev = (not arith) and bool(getattr(cfg, "device_entropy", False)) \
        and precision <= 12
    groups = [(0, 1), (1, luma_split_start),
              (luma_split_start, num_scans_luma)]
    if ncomps == 3:
        cb = num_scans_luma + num_scans_chroma_dc
        groups += [(num_scans_luma, cb), (cb, chroma_split_start),
                   (chroma_split_start, num_scans)]
    executor = None
    futures: Dict[int, object] = {}
    submitted = set()

    def prefetch(sn_, scan_):
        """On first touch of a greedy group, submit every candidate in it
        (Al overrides are fixed at group entry, so the group's override is
        read off the triggering scan); selection order and all emitted
        bytes stay exactly the serial machine's — skipped candidates are
        merely wasted work."""
        if arith or executor is None:
            return None
        for gi, (g0, g1) in enumerate(groups):
            if not (g0 <= sn_ < g1) or gi in submitted:
                continue
            submitted.add(gi)
            for sj in range(g0, g1):
                sc = script[sj]
                if (luma_split_start <= sj < num_scans_luma
                        or (ncomps == 3
                            and chroma_split_start <= sj < num_scans)):
                    sc = ScanInfo(sc.comps, sc.Ss, sc.Se, sc.Ah, scan_.Al)
                rj = _scan_restart(sc, geom, cfg, ncomps)
                futures[sj] = executor.submit(
                    _scan_result, sc, geom, planes, dc_tbls, ac_tbls, rj,
                    dev, precision)
        f = futures.pop(sn_, None)
        return f.result() if f is not None else None

    import os as _os
    # candidate prefetch threads pay off for a SINGLE image on an idle
    # host, but thrash when the caller already runs one image per core
    # (encoder._batch_host); parallel=False disables them.
    if not arith and parallel:
        from concurrent.futures import ThreadPoolExecutor
        executor = ThreadPoolExecutor(
            max_workers=min(8, _os.cpu_count() or 1))

    def get_size(sn, scan):
        mk = _scan_buffer_arith if arith else functools.partial(
            _scan_buffer, device=dev, precision=precision,
            sr=prefetch(sn, scan))
        # per-scan restart interval; DRI emitted when it changes along the
        # candidate-encode order -- the search captures scan buffers in
        # trial order and stitches them verbatim (jcmaster.c:672-683,
        # jcmarker.c:778-780)
        r = _scan_restart(scan, geom, cfg, ncomps)
        buf = mk(scan, geom, planes, dc_tbls, ac_tbls, r,
                 frame_header if sn == 0 else None,
                 emit_dri=(r != dri_state[0]))
        if r != dri_state[0]:
            dri_state[0] = r
        bufs[sn] = buf
        report.pass_done("candidate scan %d/%d" % (sn + 1, num_scans))
        return len(buf) - (len(frame_header) if sn == 0 else 0)

    try:
        res = _run_selection(layout, script, get_size)
    finally:
        if executor is not None:
            executor.shutdown(wait=False, cancel_futures=True)
    used_scans = res.used_scans

    # --- final assembly (display order) ---
    out = marker.MarkerWriter()
    out.soi()
    if cfg.write_jfif:
        out.jfif_app0(unit=cfg.density[0], xd=cfg.density[1],
                      yd=cfg.density[2])
    for code, payload in (extra_markers or ()):
        out.segment(code, payload)
    order = display_order(layout, res, cfg.dc_scan_opt_mode)

    for idx in order:
        # scan-size trace at the reference's copy_buffer point
        # (jcmaster.c:747-754), with the Al actually used during emission
        s = used_scans[idx]
        report.trace_scan(s.comps, s.Ss, s.Se, s.Ah, s.Al)
        out.raw(bufs[idx])
    out.eoi()
    return out.bytes()


def encode_optimize_scans_native(width: int, height: int, geom, planes,
                                 qtables, cfg, ncomps: int,
                                 precision: int = 8,
                                 extra_markers=None,
                                 nthreads: int = 1) -> Optional[bytes]:
    """One-call native scan search (native/scansearch.cpp): the whole
    candidate sweep, greedy selection and stitching run in C++ with the
    GIL released — ~0.4 ms/candidate of Python orchestration used to
    serialize batched encodes across host threads. Byte-identical to
    encode_optimize_scans (pinned by tests/test_scansearch_native.py).
    Returns None when the native engine bails (buffer overflow)."""
    import ctypes
    import numpy as np
    from ..native import lib, SearchComp, i32p, u8p
    from . import report as _report
    from .encoder import scan_restart_interval

    mcus_x, mcus_y, comps = geom
    script = scans.search_progression(ncomps, cfg.dc_scan_opt_mode)
    restarts = np.asarray(
        [scan_restart_interval(cfg, s, geom, ncomps) for s in script],
        dtype=np.int32)

    arr = (SearchComp * ncomps)()
    keep = []
    for ci in range(ncomps):
        p = np.ascontiguousarray(planes[ci], dtype=np.int16)
        keep.append(p)
        g = comps[ci]
        arr[ci].coef = p.ctypes.data
        arr[ci].bw = g.bw
        arr[ci].bh = g.bh
        arr[ci].bw_pad = g.bw_pad
        arr[ci].bh_pad = g.bh_pad
        arr[ci].stride = p.shape[1]
        arr[ci].h = g.h
        arr[ci].v = g.v

    total_blocks = sum(g.bw_pad * g.bh_pad for g in comps[:ncomps])
    cap = total_blocks * 384 + (1 << 20)
    out = np.empty(cap, np.uint8)
    meta = np.zeros(1 + 8 * 40, np.int32)
    n = lib.mj_scan_search(arr, ncomps, mcus_x, mcus_y,
                           cfg.dc_scan_opt_mode,
                           restarts.ctypes.data_as(i32p),
                           out.ctypes.data_as(u8p), cap,
                           meta.ctypes.data_as(i32p), int(nthreads))
    del keep
    if n < 0:
        return None

    # frame header + assembly (mirrors encode_optimize_scans tail)
    w = marker.MarkerWriter()
    w.soi()
    if cfg.write_jfif:
        w.jfif_app0(unit=cfg.density[0], xd=cfg.density[1],
                    yd=cfg.density[2])
    for code, payload in (extra_markers or ()):
        w.segment(code, payload)
    w.dqt_multi([(i, qtables[i]) for i in range(min(ncomps, 2))])
    comp_ids = [1, 2, 3][:ncomps]
    sof_samp = [(comps[ci].h, comps[ci].v) for ci in range(ncomps)]
    if ncomps == 1 and getattr(cfg, "gray_sample", None):
        sof_samp[0] = tuple(cfg.gray_sample)
    w.sof(marker.SOF2, precision, height, width,
          [(comp_ids[ci], sof_samp[ci][0], sof_samp[ci][1],
            0 if ci == 0 else 1) for ci in range(ncomps)])
    nord = int(meta[0])
    _report.add_passes(1)
    for i in range(nord):
        nc0, c0, Ss, Se, Ah, Al = (int(meta[1 + 8 * i + k])
                                   for k in range(1, 7))
        cs_ = (tuple(range(nc0)) if c0 == 0 and nc0 > 1
               else ((1, 2) if nc0 == 2 else (c0,)))
        _report.trace_scan(cs_, Ss, Se, Ah, Al)
    _report.pass_done("scan search (native)")
    w.raw(out[:n].tobytes())
    w.eoi()
    return w.bytes()
