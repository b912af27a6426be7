"""Fully-device jpegrescan scan search (optimize_scans).

Replaces the reference's 64 sequential trial encodes (jcmaster.c:773-962)
with TWO device programs per image batch and two small transfers:

  PROG-SIZES: for every candidate (comp, Ss, Se, Ah, Al) variant — the 64
    search scans expanded over every successive-approximation depth the
    frequency-split scans can inherit (jcmaster.c:482-494) — symbolize,
    histogram, build the optimal Huffman table (ops/tablegen.py), pack the
    bits, and measure the EXACT finished byte size (incl. 0xFF stuffing).
    One D2H sidecar: sizes + bit counts + table payloads (~40 KB/image).

  host: the same greedy selection state machine as the host path
    (codec/scanopt.py _run_selection / display_order — shared code), fed
    from the size array. Byte-identical decisions by construction.

  PROG-WINNERS: re-pack only the ~10-17 winning scans per image and
    compact their words into one flat buffer (one D2H, ~50 KB/image).

The coefficient planes never leave the device; the host only stitches
headers and does O(bytes) byte-stuffing.

Covers the default mozjpeg profile: 8-bit, Huffman, restart interval 0,
YCbCr (3 comp) or grayscale; callers fall back to the host search
otherwise (codec/encoder.py chooses).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..entropy.huffman import HuffTable
from ..ops import scanopt_kernels as sk
from ..ops import tablegen
from ..ops.bitpack import _nbits, _scatter_bits, _finish_segments
from . import marker, report, scans
from .scanopt import SearchLayout, _run_selection, display_order
from .scans import ScanInfo

AL_MAX_LUMA = scans.AL_MAX_LUMA
AL_MAX_CHROMA = scans.AL_MAX_CHROMA

AC_BITS_PER_BLOCK = 30 + 63 * 26 + 48          # first-scan worst case
REF_BITS_PER_BLOCK = 30 + 1001 + 63 * 26 + 48 + 30
DC_BITS_PER_BLOCK = 27


class CandidateSet:
    """Static expansion of the search script into device variant tables."""

    def __init__(self, ncomps: int, dc_mode: int):
        self.ncomps = ncomps
        self.dc_mode = dc_mode
        self.layout = SearchLayout(ncomps)
        self.script = scans.search_progression(ncomps, dc_mode)
        L = self.layout
        # per comp: list of (Ss, Se, Al); lookup (sn, Al) -> local idx
        self.first_params: List[List[Tuple[int, int, int]]] = \
            [[] for _ in range(ncomps)]
        self.first_idx: Dict[Tuple[int, int], Tuple[int, int]] = {}
        self.ref_params: List[List[Tuple[int, int, int]]] = \
            [[] for _ in range(ncomps)]
        self.ref_idx: Dict[int, Tuple[int, int]] = {}
        self.dc_scans: List[Tuple[int, ScanInfo]] = []
        for sn, scan in enumerate(self.script):
            ci = scan.comps[0]
            if scan.Ss == 0:
                self.dc_scans.append((sn, scan))
                continue
            if scan.Ah != 0:
                self.ref_idx[sn] = (ci, len(self.ref_params[ci]))
                self.ref_params[ci].append((scan.Ss, scan.Se, scan.Al))
                continue
            if (L.luma_split_start <= sn < L.num_scans_luma
                    or (ncomps == 3 and L.chroma_split_start <= sn)):
                almax = AL_MAX_LUMA if ci == 0 else AL_MAX_CHROMA
                for Al in range(almax + 1):
                    self.first_idx[(sn, Al)] = \
                        (ci, len(self.first_params[ci]))
                    self.first_params[ci].append((scan.Ss, scan.Se, Al))
            else:
                self.first_idx[(sn, scan.Al)] = \
                    (ci, len(self.first_params[ci]))
                self.first_params[ci].append((scan.Ss, scan.Se, scan.Al))
        # table index layout: firsts (comp-major), refines, dc slot tables
        self.n_first = [len(p) for p in self.first_params]
        self.n_ref = [len(p) for p in self.ref_params]
        self.dc_tables: List[Tuple[int, int]] = []  # (dc scan pos, slot)
        for pos, (sn, scan) in enumerate(self.dc_scans):
            slots = list(dict.fromkeys(
                0 if ci == 0 else 1 for ci in scan.comps))
            for slot in slots:
                self.dc_tables.append((pos, slot))
        self.n_tables = sum(self.n_first) + sum(self.n_ref) \
            + len(self.dc_tables)

    def first_table_index(self, ci: int, li: int) -> int:
        return sum(self.n_first[:ci]) + li

    def ref_table_index(self, ci: int, li: int) -> int:
        return sum(self.n_first) + sum(self.n_ref[:ci]) + li

    def dc_table_index(self, pos: int, slot: int) -> int:
        base = sum(self.n_first) + sum(self.n_ref)
        return base + self.dc_tables.index((pos, slot))


@functools.lru_cache(maxsize=8)
def get_candidates(ncomps: int, dc_mode: int) -> CandidateSet:
    return CandidateSet(ncomps, dc_mode)


# ---------------------------------------------------------------------------
# DC scan helpers ((64, B*n) coefficient-major layout)
# ---------------------------------------------------------------------------

def _dc_seq(plane, g, b: int, mcus_x: int, mcus_y: int,
            interleaved: bool):
    """(64, B*n) -> (B, n) DC values in scan traversal order: MCU order
    for interleaved scans, raster over real blocks for single-component
    scans (jcmaster.c:533 per_scan_setup)."""
    dc = plane[0].reshape(b, g.bh, g.bw).astype(jnp.int32)
    if not interleaved or (g.h == 1 and g.v == 1):
        return dc.reshape(b, -1)
    m = dc.reshape(b, mcus_y, g.v, mcus_x, g.h)
    return jnp.transpose(m, (0, 1, 3, 2, 4)).reshape(b, -1)


def _dc_deltas(seq):
    prev = jnp.concatenate(
        [jnp.zeros((seq.shape[0], 1), jnp.int32), seq[:, :-1]], axis=1)
    return seq - prev


def _dc_hist(deltas):
    """(B, n) deltas -> (B, 256) size-category counts."""
    size = _nbits(jnp.abs(deltas))
    b = deltas.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], size.shape)
    return jnp.zeros((b, 256), jnp.int32).at[
        rows.reshape(-1), size.reshape(-1)].add(1)


def _dc_lanes(deltas, co, si):
    """-> (vals, lens) per block lane; co/si (B, 256)."""
    mag = jnp.abs(deltas)
    nb = _nbits(mag)
    t2 = jnp.where(deltas < 0, deltas - 1, deltas).astype(jnp.uint32)
    code = jnp.take_along_axis(co, nb.astype(jnp.int32), axis=1)
    ln = jnp.take_along_axis(si, nb.astype(jnp.int32), axis=1)
    val = (code << nb) | (t2 & ((jnp.uint32(1) << nb) - 1))
    return val, (ln + nb).astype(jnp.int32)


def _dc_scan_data(planes, geoms, scan, b, mcus_x, mcus_y, cos, sis,
                  nwords):
    """Pack one interleaved/single DC scan for all B images.
    cos/sis: per scan comp (B, 256) code tables (slot-resolved).
    -> (words (B, nwords), bits (B,))."""
    per_comp = []
    for k, ci in enumerate(scan.comps):
        g = geoms[ci]
        seq = _dc_seq(planes[ci], g, b, mcus_x, mcus_y,
                      len(scan.comps) > 1)
        deltas = _dc_deltas(seq)
        vals, lens = _dc_lanes(deltas, cos[k], sis[k])
        vh = g.h * g.v
        per_comp.append((vals.reshape(b, -1, vh),
                         lens.reshape(b, -1, vh)))
    vals = jnp.concatenate([v for v, _ in per_comp], axis=2) \
        .reshape(b, -1)
    lens = jnp.concatenate([l for _, l in per_comp], axis=2) \
        .reshape(b, -1)
    csum = jnp.cumsum(lens, axis=1)
    bits = csum[:, -1].astype(jnp.int32)
    words = _scatter_bits(vals, lens, csum - lens, nwords)
    return words, bits


# ---------------------------------------------------------------------------
# PROG-SIZES
# ---------------------------------------------------------------------------

def _build_sizes_program(cand: CandidateSet, geoms, b: int,
                         mcus_x: int, mcus_y: int):
    ncomps = cand.ncomps

    @jax.jit
    def prog(planes):
        # planes: tuple per comp of (64, B*n) int16
        fhists, rhists = [], []
        planes_r = [p.reshape(64, b, -1) for p in planes]
        for ci in range(ncomps):
            if cand.first_params[ci]:
                params = jnp.asarray(cand.first_params[ci], jnp.int32)

                def fh(p, _pr=planes_r[ci]):
                    return jax.vmap(
                        lambda pl: sk.ac_first_symbolize_rt(
                            pl, p[0], p[1], p[2]).hist,
                        in_axes=1)(_pr)

                fhists.append(jax.lax.map(fh, params))     # (V, B, 256)
            else:
                fhists.append(None)
            if cand.ref_params[ci]:
                params = jnp.asarray(cand.ref_params[ci], jnp.int32)

                def rh(p, _pr=planes_r[ci]):
                    def per_img(pl):
                        s = sk.ac_refine_symbolize_rt(pl, p[0], p[1], p[2])
                        sched = sk.ac_refine_schedule_dev(s.e, s.br, s.ev)
                        return sk.ac_refine_hist_rt(s, sched)
                    return jax.vmap(per_img, in_axes=1)(_pr)

                rhists.append(jax.lax.map(rh, params))
            else:
                rhists.append(None)

        # DC histograms per table slot
        dc_hists = []                                  # (B, 256) per table
        dc_seqs = {}
        for pos, (sn, scan) in enumerate(cand.dc_scans):
            slots = list(dict.fromkeys(
                0 if ci == 0 else 1 for ci in scan.comps))
            for slot in slots:
                h = jnp.zeros((b, 256), jnp.int32)
                for ci in scan.comps:
                    if (0 if ci == 0 else 1) != slot:
                        continue
                    key = (ci, len(scan.comps) > 1)
                    if key not in dc_seqs:
                        dc_seqs[key] = _dc_deltas(_dc_seq(
                            planes[ci], geoms[ci], b, mcus_x, mcus_y,
                            len(scan.comps) > 1))
                    h = h + _dc_hist(dc_seqs[key])
                dc_hists.append(h)

        # one batched tablegen over every (variant, image) table
        blocks = []
        for ci in range(ncomps):
            if fhists[ci] is not None:
                blocks.append(fhists[ci].reshape(-1, 256))
        for ci in range(ncomps):
            if rhists[ci] is not None:
                blocks.append(rhists[ci].reshape(-1, 256))
        for h in dc_hists:
            blocks.append(h)
        allh = jnp.concatenate(blocks, axis=0)          # (T*B, 256)
        freqs = jnp.zeros((allh.shape[0], 257), jnp.int32) \
            .at[:, :256].set(allh)
        tbits, tvals, tok = tablegen.gen_optimal_tables_t(freqs)
        co_all, si_all = tablegen.derive_codes_t(tbits, tvals)

        # per-variant pack + exact size
        off = 0
        fsizes, fbits = [], []
        for ci in range(ncomps):
            if fhists[ci] is None:
                continue
            V = fhists[ci].shape[0]
            n = planes_r[ci].shape[2]
            nwords = -(-(n * AC_BITS_PER_BLOCK + 64) // 32) + 2
            params = jnp.asarray(cand.first_params[ci], jnp.int32)
            co_v = co_all[off:off + V * b].reshape(V, b, 256)
            si_v = si_all[off:off + V * b].reshape(V, b, 256)
            off += V * b

            def fsz(args, _pr=planes_r[ci], _nw=nwords):
                p, co_b, si_b = args

                def per_img(pl, co1, si1):
                    s = sk.ac_first_symbolize_rt(pl, p[0], p[1], p[2])
                    w, nb_ = sk.ac_first_pack_from_syms(s, co1, si1, _nw)
                    return sk.stuffed_size(w, nb_), nb_

                return jax.vmap(per_img, in_axes=(1, 0, 0))(
                    _pr, co_b, si_b)

            sz, nb_ = jax.lax.map(fsz, (params, co_v, si_v))
            fsizes.append(sz)                            # (V, B)
            fbits.append(nb_)
        rsizes, rbits = [], []
        for ci in range(ncomps):
            if rhists[ci] is None:
                continue
            V = rhists[ci].shape[0]
            n = planes_r[ci].shape[2]
            nwords = -(-(n * REF_BITS_PER_BLOCK) // 32) + 34
            params = jnp.asarray(cand.ref_params[ci], jnp.int32)
            co_v = co_all[off:off + V * b].reshape(V, b, 256)
            si_v = si_all[off:off + V * b].reshape(V, b, 256)
            off += V * b

            def rsz(args, _pr=planes_r[ci], _nw=nwords):
                p, co_b, si_b = args

                def per_img(pl, co1, si1):
                    s = sk.ac_refine_symbolize_rt(pl, p[0], p[1], p[2])
                    sched = sk.ac_refine_schedule_dev(s.e, s.br, s.ev)
                    w, nb_ = sk.ac_refine_pack_from_syms(s, sched, co1,
                                                         si1, _nw)
                    return sk.stuffed_size(w, nb_), nb_

                return jax.vmap(per_img, in_axes=(1, 0, 0))(
                    _pr, co_b, si_b)

            sz, nb_ = jax.lax.map(rsz, (params, co_v, si_v))
            rsizes.append(sz)
            rbits.append(nb_)

        # DC scans: pack with their slot tables
        dc_sizes, dc_bits = [], []
        dc_tbl_of = {t: i for i, t in enumerate(cand.dc_tables)}
        dcbase = off
        for pos, (sn, scan) in enumerate(cand.dc_scans):
            bpm = sum(geoms[ci].h * geoms[ci].v for ci in scan.comps)
            nmcu = (mcus_x * mcus_y if len(scan.comps) > 1
                    else geoms[scan.comps[0]].bw * geoms[scan.comps[0]].bh)
            nwords = -(-(nmcu * bpm * DC_BITS_PER_BLOCK) // 32) + 2
            cos, sis = [], []
            for ci in scan.comps:
                slot = 0 if ci == 0 else 1
                ti = dcbase + dc_tbl_of[(pos, slot)] * b
                cos.append(co_all[ti:ti + b])
                sis.append(si_all[ti:ti + b])
            words, bits_ = _dc_scan_data(planes, geoms, scan, b, mcus_x,
                                         mcus_y, cos, sis, nwords)
            sz = jax.vmap(sk.stuffed_size)(words, bits_)
            dc_sizes.append(sz)                          # (B,)
            dc_bits.append(bits_)

        # ---- sidecar: one uint8 buffer ----
        i32_parts = []
        for lst in (fsizes, fbits, rsizes, rbits):
            for a in lst:
                i32_parts.append(jnp.transpose(a, (1, 0)).reshape(-1))
        for lst in (dc_sizes, dc_bits):
            for a in lst:
                i32_parts.append(a.reshape(-1))
        i32_blob = jnp.concatenate(i32_parts).astype(jnp.int32)
        u8_i32 = jax.lax.bitcast_convert_type(
            i32_blob, jnp.uint8).reshape(-1)
        tb = tbits[:, 1:17].astype(jnp.uint8)            # (T*B, 16)
        tv = tvals.astype(jnp.uint8)                     # (T*B, 256)
        tk = tok.astype(jnp.uint8)[:, None]              # (T*B, 1)
        tables_u8 = jnp.concatenate([tb, tv, tk], axis=1).reshape(-1)
        return jnp.concatenate([u8_i32, tables_u8])

    return prog


@functools.lru_cache(maxsize=16)
def _sizes_program(ncomps, dc_mode, geoms, b, mcus_x, mcus_y):
    return _build_sizes_program(get_candidates(ncomps, dc_mode), geoms, b,
                                mcus_x, mcus_y)


# ---------------------------------------------------------------------------
# PROG-WINNERS
# ---------------------------------------------------------------------------

# per-image winner slot capacities (padded; masked work is discarded)
MAX_FIRST = {0: 8, 1: 4, 2: 4}       # luma / chroma per comp
MAX_REF = {0: 3, 1: 2, 2: 2}
MAX_DC = 3


def _build_winner_program(cand: CandidateSet, geoms, b: int,
                          mcus_x: int, mcus_y: int):
    ncomps = cand.ncomps
    ndc = len(cand.dc_scans)

    @functools.partial(jax.jit, static_argnames=("out_words",))
    def prog(planes, fparams, fco, fsi, rparams, rco, rsi,
             dco, dsi, gather_idx, out_words: int):
        """fparams (B, MF_total, 3); fco/fsi (B, MF_total, 256);
        rparams (B, MR_total, 3); dco/dsi (B, ndc, 2, 256) per dc scan,
        slot-indexed; gather_idx (out_words,) absolute indices into the
        concatenated word pools (see _pool_layout)."""
        planes_r = [p.reshape(64, b, -1) for p in planes]
        pools = []
        foff = 0
        for ci in range(ncomps):
            MF = MAX_FIRST[ci]
            n = planes_r[ci].shape[2]
            nwords = -(-(n * AC_BITS_PER_BLOCK + 64) // 32) + 2

            def pack_first(img_and_slot, _pr=planes_r[ci], _nw=nwords,
                           _f=foff):
                i, s = img_and_slot
                p = fparams[i, _f + s]
                co1 = fco[i, _f + s]
                si1 = fsi[i, _f + s]
                sy = sk.ac_first_symbolize_rt(_pr[:, i], p[0], p[1], p[2])
                w, _bits = sk.ac_first_pack_from_syms(sy, co1, si1, _nw)
                return w

            grid = jnp.stack(jnp.meshgrid(jnp.arange(b),
                                          jnp.arange(MF),
                                          indexing="ij"),
                             axis=-1).reshape(-1, 2)
            words = jax.lax.map(lambda g: pack_first((g[0], g[1])), grid)
            pools.append(words.reshape(-1))
            foff += MF
        roff = 0
        for ci in range(ncomps):
            MR = MAX_REF[ci]
            n = planes_r[ci].shape[2]
            nwords = -(-(n * REF_BITS_PER_BLOCK) // 32) + 34

            def pack_ref(g, _pr=planes_r[ci], _nw=nwords, _r=roff):
                i, s = g[0], g[1]
                p = rparams[i, _r + s]
                co1 = rco[i, _r + s]
                si1 = rsi[i, _r + s]
                sy = sk.ac_refine_symbolize_rt(_pr[:, i], p[0], p[1], p[2])
                sched = sk.ac_refine_schedule_dev(sy.e, sy.br, sy.ev)
                w, _bits = sk.ac_refine_pack_from_syms(sy, sched, co1,
                                                       si1, _nw)
                return w

            grid = jnp.stack(jnp.meshgrid(jnp.arange(b),
                                          jnp.arange(MR),
                                          indexing="ij"),
                             axis=-1).reshape(-1, 2)
            words = jax.lax.map(pack_ref, grid)
            pools.append(words.reshape(-1))
            roff += MR
        # DC scans: pack every dc scan for every image (tiny), pool them
        for pos in range(ndc):
            _sn, scan = cand.dc_scans[pos]
            bpm = sum(geoms[ci].h * geoms[ci].v for ci in scan.comps)
            nmcu = (mcus_x * mcus_y if len(scan.comps) > 1
                    else geoms[scan.comps[0]].bw * geoms[scan.comps[0]].bh)
            nwords = -(-(nmcu * bpm * DC_BITS_PER_BLOCK) // 32) + 2
            cos = [dco[:, pos, (0 if ci == 0 else 1)]
                   for ci in scan.comps]
            sis = [dsi[:, pos, (0 if ci == 0 else 1)].astype(jnp.int32)
                   for ci in scan.comps]
            words, _bits = _dc_scan_data(planes, geoms, scan, b, mcus_x,
                                         mcus_y, cos, sis, nwords)
            pools.append(words.reshape(-1))
        pool = jnp.concatenate(pools)
        return pool[gather_idx]

    return prog


@functools.lru_cache(maxsize=16)
def _winner_program(ncomps, dc_mode, geoms, b, mcus_x, mcus_y):
    return _build_winner_program(get_candidates(ncomps, dc_mode), geoms,
                                 b, mcus_x, mcus_y)


def _pool_layout(cand: CandidateSet, geoms, b: int, mcus_x: int,
                 mcus_y: int):
    """Word-pool offsets mirroring the winner program's concatenation.
    -> (first_base[ci], first_nwords[ci], ref_base[ci], ref_nwords[ci],
        dc_base[pos], dc_nwords[pos])."""
    ncomps = cand.ncomps
    off = 0
    fbase, fnw, rbase, rnw, dbase, dnw = {}, {}, {}, {}, {}, {}
    for ci in range(ncomps):
        n = geoms[ci].bw * geoms[ci].bh
        nwords = -(-(n * AC_BITS_PER_BLOCK + 64) // 32) + 2
        fbase[ci] = off
        fnw[ci] = nwords
        off += b * MAX_FIRST[ci] * nwords
    for ci in range(ncomps):
        n = geoms[ci].bw * geoms[ci].bh
        nwords = -(-(n * REF_BITS_PER_BLOCK) // 32) + 34
        rbase[ci] = off
        rnw[ci] = nwords
        off += b * MAX_REF[ci] * nwords
    for pos, (_sn, scan) in enumerate(cand.dc_scans):
        bpm = sum(geoms[ci].h * geoms[ci].v for ci in scan.comps)
        nmcu = (mcus_x * mcus_y if len(scan.comps) > 1
                else geoms[scan.comps[0]].bw * geoms[scan.comps[0]].bh)
        nwords = -(-(nmcu * bpm * DC_BITS_PER_BLOCK) // 32) + 2
        dbase[pos] = off
        dnw[pos] = nwords
        off += b * nwords
    return fbase, fnw, rbase, rnw, dbase, dnw


class _Sidecar:
    """Parsed PROG-SIZES output for one batch."""

    def __init__(self, cand: CandidateSet, buf: np.ndarray, b: int):
        self.cand = cand
        ncomps = cand.ncomps
        i32_count = 2 * (sum(cand.n_first) + sum(cand.n_ref)) * b \
            + 2 * len(cand.dc_scans) * b
        i32 = buf[:i32_count * 4].view(np.int32)
        off = 0
        self.fsizes, self.fbits = [], []
        self.rsizes, self.rbits = [], []

        def take_vb(V):
            nonlocal off
            a = i32[off:off + V * b].reshape(b, V)
            off += V * b
            return a

        for lst, counts in ((self.fsizes, cand.n_first),
                            (self.fbits, cand.n_first),
                            (self.rsizes, cand.n_ref),
                            (self.rbits, cand.n_ref)):
            for ci in range(ncomps):
                lst.append(take_vb(counts[ci]) if counts[ci] else None)
        ndc = len(cand.dc_scans)
        self.dcsizes = [take_vb(1)[:, 0] for _ in range(ndc)]
        self.dcbits = [take_vb(1)[:, 0] for _ in range(ndc)]
        t = buf[i32_count * 4:].reshape(-1, 273)
        self.tbits = t[:, :16]                     # lengths 1..16
        self.tvals = t[:, 16:272]
        self.tok = t[:, 272]
        self.b = b

    def table(self, tbl_idx: int, img: int) -> HuffTable:
        row = tbl_idx * self.b + img
        bits = np.zeros(17, np.uint8)
        bits[1:] = self.tbits[row]
        n = int(bits.sum())
        return HuffTable(bits, self.tvals[row][:n].copy())

    def table_ok(self, tbl_idx: int, img: int) -> bool:
        return bool(self.tok[tbl_idx * self.b + img])

    def nvals(self, tbl_idx: int, img: int) -> int:
        return int(self.tbits[tbl_idx * self.b + img].sum())


def supported(cfg, cs: str, ncomps: int, restart: int,
              geom=None) -> bool:
    """Device search covers the default profile: 8-bit Huffman
    progressive, restart interval 0, YCbCr or grayscale."""
    if cfg.precision != 8 or cfg.arithmetic or restart:
        return False
    if cfg.restart_in_rows or cfg.restart_interval:
        return False
    if ncomps == 3 and cs != "ycbcr":
        return False
    if ncomps not in (1, 3):
        return False
    if geom is not None:
        _, _, comps = geom
        if any(g.bw != g.bw_pad or g.bh != g.bh_pad for g in comps):
            return False
    return True


class _FallbackNeeded(Exception):
    pass


def encode_batch_scans(widths, heights, geom, planes_dev, qtables, cfg,
                       ncomps: int, b: int, extra_markers_per_img=None,
                       gray_sample=None) -> List[bytes]:
    """Run the device scan search for a batch of b same-geometry images.

    planes_dev: tuple per comp of (64, B*n) int16 device arrays (final
    trellised coefficients, coefficient-major, raster real blocks).
    Returns the complete JPEG byte stream per image."""
    mcus_x, mcus_y, comps = geom
    comps = tuple(comps)
    dc_mode = cfg.dc_scan_opt_mode
    cand = get_candidates(ncomps, dc_mode)
    layout = cand.layout
    script = cand.script
    report.add_passes(b)

    prog = _sizes_program(ncomps, dc_mode, comps, b, mcus_x, mcus_y)
    sidecar = np.asarray(prog(planes_dev))
    sc = _Sidecar(cand, sidecar, b)

    SOS_N = {k: 8 + 2 * k for k in (1, 2, 3)}

    # per-image selection
    per_img = []
    for i in range(b):
        def get_size(sn, scan, _i=i):
            if scan.Ss == 0:
                pos = next(p for p, (s, _) in enumerate(cand.dc_scans)
                           if s == sn)
                slots = list(dict.fromkeys(
                    0 if ci == 0 else 1 for ci in scan.comps))
                dht = 4 + sum(
                    17 + sc.nvals(cand.dc_table_index(pos, sl), _i)
                    for sl in slots)
                ent = int(sc.dcsizes[pos][_i])
            elif scan.Ah != 0:
                ci, li = cand.ref_idx[sn]
                if not sc.table_ok(cand.ref_table_index(ci, li), _i):
                    raise _FallbackNeeded()
                dht = 4 + 17 + sc.nvals(cand.ref_table_index(ci, li), _i)
                ent = int(sc.rsizes[ci][_i, li])
            else:
                ci, li = cand.first_idx[(sn, scan.Al)]
                if not sc.table_ok(cand.first_table_index(ci, li), _i):
                    raise _FallbackNeeded()
                dht = 4 + 17 + sc.nvals(cand.first_table_index(ci, li), _i)
                ent = int(sc.fsizes[ci][_i, li])
            return dht + SOS_N[len(scan.comps)] + ent

        res = _run_selection(layout, script, get_size)
        order = display_order(layout, res, dc_mode)
        per_img.append((res, order))
        report.pass_done("scan search")

    # ---- winner slot assignment + gather indices ----
    fbase, fnw, rbase, rnw, dbase, dnw = _pool_layout(
        cand, comps, b, mcus_x, mcus_y)
    MF_total = sum(MAX_FIRST[ci] for ci in range(ncomps))
    MR_total = sum(MAX_REF[ci] for ci in range(ncomps))
    MF_off = {ci: sum(MAX_FIRST[c] for c in range(ci))
              for ci in range(ncomps)}
    MR_off = {ci: sum(MAX_REF[c] for c in range(ci))
              for ci in range(ncomps)}
    ndc = len(cand.dc_scans)

    fparams = np.ones((b, MF_total, 3), np.int32)
    fco = np.zeros((b, MF_total, 256), np.uint32)
    fsi = np.zeros((b, MF_total, 256), np.int32)
    rparams = np.ones((b, MR_total, 3), np.int32)
    rco = np.zeros((b, MR_total, 256), np.uint32)
    rsi = np.zeros((b, MR_total, 256), np.int32)
    dco = np.zeros((b, ndc, 2, 256), np.uint32)
    dsi = np.zeros((b, ndc, 2, 256), np.int32)
    rparams[..., 2] = 0
    fparams[..., 2] = 0

    from ..entropy.huffman import derive_codes

    gather_parts = []
    win_meta = []     # per image: list of (scan_idx, scan, kind, info)
    goff = 0
    for i in range(b):
        res, order = per_img[i]
        fslots = {ci: 0 for ci in range(ncomps)}
        rslots = {ci: 0 for ci in range(ncomps)}
        metas = []
        for idx in order:
            scan = res.used_scans[idx]
            if scan.Ss == 0:
                pos = next(p for p, (s, _) in enumerate(cand.dc_scans)
                           if s == idx)
                slots = list(dict.fromkeys(
                    0 if ci == 0 else 1 for ci in scan.comps))
                tbls = {}
                for sl in slots:
                    ti = cand.dc_table_index(pos, sl)
                    tbl = sc.table(ti, i)
                    co, si = derive_codes(tbl)
                    dco[i, pos, sl] = co
                    dsi[i, pos, sl] = si
                    tbls[sl] = tbl
                bits = int(sc.dcbits[pos][i])
                nw = -(-bits // 32) if bits else 0
                base = dbase[pos] + i * dnw[pos]
                gather_parts.append(np.arange(base, base + nw, dtype=np.int32))
                metas.append((idx, scan, "dc", tbls, goff, nw, bits))
                goff += nw
            else:
                refine = scan.Ah != 0
                if refine:
                    ci, li = cand.ref_idx[idx]
                    ti = cand.ref_table_index(ci, li)
                    bits = int(sc.rbits[ci][i, li])
                    slot = rslots[ci]
                    if slot >= MAX_REF[ci]:
                        raise _FallbackNeeded()
                    rslots[ci] += 1
                    gslot = MR_off[ci] + slot
                    tbl = sc.table(ti, i)
                    co, si = derive_codes(tbl)
                    rparams[i, gslot] = (scan.Ss, scan.Se, scan.Al)
                    rco[i, gslot] = co
                    rsi[i, gslot] = si
                    base = rbase[ci] + (i * MAX_REF[ci] + slot) * rnw[ci]
                    nw = -(-bits // 32) if bits else 0
                else:
                    ci, li = cand.first_idx[(idx, scan.Al)]
                    ti = cand.first_table_index(ci, li)
                    bits = int(sc.fbits[ci][i, li])
                    slot = fslots[ci]
                    if slot >= MAX_FIRST[ci]:
                        raise _FallbackNeeded()
                    fslots[ci] += 1
                    gslot = MF_off[ci] + slot
                    tbl = sc.table(ti, i)
                    co, si = derive_codes(tbl)
                    fparams[i, gslot] = (scan.Ss, scan.Se, scan.Al)
                    fco[i, gslot] = co
                    fsi[i, gslot] = si
                    base = fbase[ci] + (i * MAX_FIRST[ci] + slot) * fnw[ci]
                    nw = -(-bits // 32) if bits else 0
                gather_parts.append(
                    np.arange(base, base + nw, dtype=np.int32))
                metas.append((idx, scan, "ref" if refine else "first",
                              tbl, goff, nw, bits))
                goff += nw
        win_meta.append(metas)

    total_words = goff
    bucket = 1 << max(10, (total_words - 1).bit_length())
    gather_idx = np.zeros(bucket, np.int32)
    if gather_parts:
        gi = np.concatenate(gather_parts)
        gather_idx[:gi.size] = gi

    wprog = _winner_program(ncomps, dc_mode, comps, b, mcus_x, mcus_y)
    words_all = np.asarray(wprog(
        planes_dev, jnp.asarray(fparams), jnp.asarray(fco),
        jnp.asarray(fsi), jnp.asarray(rparams), jnp.asarray(rco),
        jnp.asarray(rsi), jnp.asarray(dco), jnp.asarray(dsi),
        jnp.asarray(gather_idx), out_words=bucket))

    # ---- assembly ----
    outs = []
    comp_ids = [1, 2, 3][:ncomps]
    for i in range(b):
        res, order = per_img[i]
        w = marker.MarkerWriter()
        w.soi()
        if cfg.write_jfif:
            w.jfif_app0(unit=cfg.density[0], xd=cfg.density[1],
                        yd=cfg.density[2])
        em = (extra_markers_per_img[i]
              if extra_markers_per_img else None) or ()
        for code, payload in em:
            w.segment(code, payload)
        first = True
        for (idx, scan, kind, tblinfo, off, nw, bits) in win_meta[i]:
            s = res.used_scans[idx]
            report.trace_scan(s.comps, s.Ss, s.Se, s.Ah, s.Al)
            if first:
                w.dqt_multi([(t, qtables[t])
                             for t in range(min(ncomps, 2))])
                sof_samp = [(comps[ci].h, comps[ci].v)
                            for ci in range(ncomps)]
                if ncomps == 1 and gray_sample:
                    sof_samp[0] = tuple(gray_sample)
                w.sof(marker.SOF2, cfg.precision, heights[i], widths[i],
                      [(comp_ids[ci], sof_samp[ci][0], sof_samp[ci][1],
                        0 if ci == 0 else 1) for ci in range(ncomps)])
                first = False
            # DHT
            if kind == "dc":
                entries = []
                seen = set()
                for ci in scan.comps:
                    sl = 0 if ci == 0 else 1
                    if sl not in seen:
                        entries.append((0, sl, tblinfo[sl]))
                        seen.add(sl)
                w.dht_multi(entries)
                sos = [(comp_ids[ci], 0 if ci == 0 else 1, 0)
                       for ci in scan.comps]
            else:
                ci = scan.comps[0]
                sl = 0 if ci == 0 else 1
                w.dht_multi([(1, sl, tblinfo)])
                sos = [(comp_ids[ci], 0, sl)]
            w.sos(sos, scan.Ss, scan.Se, scan.Ah, scan.Al)
            seg = _finish_segments(words_all[off:off + nw][None],
                                   np.asarray([bits], np.int32), False)
            w.raw(seg)
        w.eoi()
        outs.append(w.bytes())
    return outs
