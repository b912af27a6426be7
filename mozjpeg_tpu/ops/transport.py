"""Device coefficient transport: entropy-coded D2H instead of raw planes.

The encode pipeline's dominant D2H transfer is the trellised coefficient
download that feeds the host scan search + entropy stage (~1.0 B/px via
the exact sparse pack, ops/sparsepack.py).  But quantized JPEG
coefficients entropy-code to ~0.12-0.16 B/px — so this module
Huffman-packs them ON DEVICE with FIXED tables (ITU T.81 Annex K std
tables at 8-bit; deterministic extended tables at 12-bit, see _tables)
into an internal baseline-style stream the host
C++ decodes back into planes (native/entropy.cpp mj_transport_decode).
A ~7x smaller download unties encode throughput from tunnel D2H health
(VERDICT r3 "what's missing" #1: shrink D2H toward finished bytes).

This is an INTERNAL transport format, not a JPEG scan:
  - one independent stream per image, word-aligned, MSB-first u32 words,
    no 0xFF byte stuffing, no markers;
  - block order: image-major, components in order, raster blocks (the
    exact-sparse-pack flat order, so the host expansion is shared);
  - per block: DC delta (predictor resets per image, chains across
    component boundaries) coded with the std LUMA DC table, then the
    usual (run,size)+magnitude AC symbols with ZRL/EOB using the std
    LUMA AC table for every component (jchuff.c F.1.2 semantics).

TPU-shaped pack (docs/perf_notes.md: scatter/gather ~9 ns/element,
lax.sort over small minor dims ~free):
  1. per block, nonzeros compact by a bitonic `lax.sort` over the 63
     zigzag keys (carries values — no gathers);
  2. per-rank symbol metadata builds elementwise; a second lax.sort over
     a stream-ordered fixed lane list compacts (DC, ZRLs, symbols, EOB)
     per block;
  3. global compaction by the boundary-scatter + cummax + gather trick
     (ops/sparsepack.py), so every later gather/scatter touches only
     ~1.05x the REAL symbol count, never the lane capacity;
  4. code/length lookup AFTER compaction (one 256-entry LUT gather),
     segmented per-image bit offsets by cumsum, and a two-contribution
     word scatter (ops/bitpack._scatter_bits math).

Overflow (a block with > 48 nonzeros, more symbols than the static
capacity, or out-of-range magnitudes) flags the header; callers fall
back to the sparse coefficient download.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

CAPR = 48                   # per-block nonzero capacity (sparse pack's 48)
LANES_PER_RANK = 3          # [zrlA(<=2 codes)] [zrlB(1 code)] [sym]
TRIM_STEP = 8192            # word-download bucket (32 KB) bounds programs


def _scap() -> int:
    return int(os.environ.get("MJ_TRANSPORT_SCAP", "12"))


def _tables(precision: int = 8):
    """Transport Huffman tables: the std luma pair at 8-bit; fixed
    EXTENDED tables at 12-bit (sizes to 15 DC / 14 AC exceed the std
    tables' symbol sets). This is an internal format — any prefix code
    both sides share works — so the extended pair is generated once,
    deterministically, by Annex-K-optimal-coding a geometric synthetic
    frequency profile (small sizes likelier)."""
    from ..codec.encoder import STD_TABLES
    if precision == 8:
        return STD_TABLES[(0, 0)], STD_TABLES[(1, 0)]
    from ..entropy import encode as entenc
    f = np.zeros(257, np.int64)
    for s in range(16):
        f[s] = 1 << (16 - s)
    dc = entenc.gen_optimal_table(f)
    f = np.zeros(257, np.int64)
    f[0x00] = 1 << 16
    f[0xF0] = 1 << 12
    for run in range(16):
        for size in range(1, 15):
            f[(run << 4) | size] = max(1, (1 << 14) >> (run + size))
    ac = entenc.gen_optimal_table(f)
    return dc, ac


def _luts(precision: int = 8):
    """(dc_co u32[n], dc_si i32[n], ac_lut u32[256] = co | si<<24,
    zco, zsi, eco, esi) — plain numpy so traced functions inline them
    as literals (perf_notes: captured-constant rule)."""
    from ..entropy.huffman import derive_codes
    dct, act = _tables(precision)
    dco, dsi = derive_codes(dct)
    aco, asi = derive_codes(act)
    ac_lut = (aco.astype(np.uint32)
              | (asi.astype(np.uint32) << np.uint32(24)))
    ndc = 12 if precision == 8 else 16
    return (dco[:ndc].astype(np.int64).astype(np.uint32),
            dsi[:ndc].astype(np.int32),
            ac_lut, int(aco[0xF0]), int(asi[0xF0]),
            int(aco[0x00]), int(asi[0x00]))


@functools.lru_cache(maxsize=2)
def _luts_cached(precision: int = 8):
    return _luts(precision)


def _nbits(v):
    v = v.astype(jnp.int32)
    return jnp.where(v > 0, 32 - jax.lax.clz(jnp.maximum(v, 1)), 0)


# meta u32 layout: kind<<28 | payload
#   kind 0 DC:  nb(4 @0) | t2low15(@4)
#   kind 1 ZRL: count 1..2 (@0)
#   kind 2 SYM: sym8(@0) | nb4(@8) | t2low14(@12)
#   kind 3 EOB: -
K_DC, K_ZRL, K_SYM, K_EOB = 0, 1, 2, 3


@functools.partial(
    jax.jit, static_argnames=("b", "n_tot", "captot", "capw",
                              "precision"))
def _pack_transport(flat, b: int, n_tot: int, captot: int, capw: int,
                    precision: int = 8):
    """flat (64, nt) int16 zigzag planes (nt = b*n_tot, exact-sparse-pack
    block order) -> (words (b, capw) u32, header i32 (b+2,):
    [per-image bits..., total_syms, overflow])."""
    dco_np, dsi_np, ac_lut_np, zco, zsi, eco, esi = \
        _luts_cached(precision)
    nbmax_ac = 10 if precision == 8 else 14
    nt = b * n_tot
    x = jnp.transpose(flat).astype(jnp.int32)          # (nt, 64)

    # ---- DC lanes ----
    dc = x[:, 0].reshape(b, n_tot)
    prev = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), dc[:, :-1]], axis=1)
    delta = (dc - prev).reshape(nt)
    dnb = _nbits(jnp.abs(delta))
    dt2 = jnp.where(delta < 0, delta - 1, delta)
    dc_meta = ((dnb & 15)
               | ((dt2 & 0x7FFF) << 4)).astype(jnp.uint32)  # kind 0

    # ---- per-block nonzero compaction (bitonic sort, no gathers) ----
    ac = x[:, 1:]                                       # (nt, 63)
    kcol = np.arange(1, 64, dtype=np.int32)
    keys = jnp.where(ac != 0, kcol[None, :], np.int32(64))
    p_s, v_s = jax.lax.sort((keys, ac), dimension=-1, num_keys=1)
    real_full = p_s < 64
    over_rank = jnp.any(real_full[:, CAPR:])
    p_s = p_s[:, :CAPR]
    v_s = v_s[:, :CAPR]
    real = real_full[:, :CAPR]

    prev_p = jnp.concatenate(
        [jnp.zeros((nt, 1), jnp.int32), p_s[:, :-1]], axis=1)
    run = jnp.where(real, p_s - prev_p - 1, 0)
    zc = run >> 4                                       # 0..3
    anb = jnp.where(real, _nbits(jnp.abs(v_s)), 0)
    over_mag = jnp.any(anb > nbmax_ac)
    at2 = jnp.where(v_s < 0, v_s - 1, v_s)
    rsym = (((run & 15) << 4) | anb) & 255
    sym_meta = (rsym | ((anb & 15) << 8)
                | ((at2 & 0x3FFF) << 12)).astype(jnp.uint32) \
        | jnp.uint32(K_SYM << 28)

    cA = jnp.minimum(zc, 2)
    hasB = zc == 3
    zA_meta = (cA.astype(jnp.uint32) | jnp.uint32(K_ZRL << 28))
    zB_meta = jnp.full((nt, CAPR), (K_ZRL << 28) | 1, jnp.uint32)

    p_max = jnp.max(jnp.where(real, p_s, 0), axis=1)    # 0 if none
    need_eob = p_max < 63

    # ---- stream-ordered lane list + within-block compaction ----
    LN = 1 + LANES_PER_RANK * CAPR + 1
    lane_idx = np.arange(LN, dtype=np.int32)
    contA = real & (zc >= 1)
    contB = real & hasB
    rank_meta = jnp.stack([zA_meta, zB_meta, sym_meta], axis=2) \
        .reshape(nt, 3 * CAPR)
    rank_cont = jnp.stack([contA, contB, real], axis=2) \
        .reshape(nt, 3 * CAPR)
    meta_all = jnp.concatenate(
        [dc_meta[:, None],
         rank_meta,
         jnp.full((nt, 1), np.uint32(K_EOB << 28), jnp.uint32)], axis=1)
    cont_all = jnp.concatenate(
        [jnp.ones((nt, 1), bool), rank_cont, need_eob[:, None]], axis=1)
    sort_keys = jnp.where(cont_all, lane_idx[None, :], np.int32(1 << 20))
    _, meta_srt = jax.lax.sort((sort_keys, meta_all), dimension=-1,
                               num_keys=1)

    counts = jnp.sum(cont_all.astype(jnp.int32), axis=1)  # (nt,)
    off_b = jnp.cumsum(counts) - counts
    total = off_b[-1] + counts[-1]
    over = over_rank | over_mag | (total > captot)

    # ---- global compaction (boundary scatter + cummax + gather) ----
    bnd = jnp.zeros((captot,), jnp.int32).at[off_b].add(
        jnp.ones((nt,), jnp.int32), mode="drop")
    blk = jnp.clip(jnp.cumsum(bnd) - 1, 0, nt - 1)
    sidx = jnp.arange(captot, dtype=jnp.int32)
    rank_in_blk = jnp.clip(sidx - off_b[blk], 0, LN - 1)
    meta_c = meta_srt.reshape(-1)[blk * LN + rank_in_blk]
    live = sidx < total

    # ---- meta -> (val, len) ----
    kind = (meta_c >> 28).astype(jnp.int32)
    # DC (small unrolled select: table too small to pay a gather)
    nb_dc = (meta_c & 15).astype(jnp.int32)
    t2_dc = ((meta_c >> 4) & 0x7FFF).astype(jnp.uint32)
    dcode = jnp.zeros_like(meta_c)
    dlen = jnp.zeros_like(nb_dc)
    for i in range(len(dco_np)):
        m = nb_dc == i
        dcode = jnp.where(m, np.uint32(int(dco_np[i])), dcode)
        dlen = jnp.where(m, np.int32(int(dsi_np[i])), dlen)
    v_dc = (dcode << nb_dc) | (t2_dc & ((jnp.uint32(1) << nb_dc) - 1))
    l_dc = dlen + nb_dc
    # ZRL
    zcnt = (meta_c & 3).astype(jnp.int32)
    v_z = jnp.where(zcnt == 2,
                    (np.uint32(zco) << np.uint32(zsi)) | np.uint32(zco),
                    np.uint32(zco))
    l_z = zcnt * np.int32(zsi)
    # SYM
    sym = (meta_c & 255).astype(jnp.int32)
    nb_s = ((meta_c >> 8) & 15).astype(jnp.int32)
    t2_s = ((meta_c >> 12) & 0x3FFF).astype(jnp.uint32)
    # LUT lookup as a one-hot contraction (MXU) instead of a gather:
    # ~9 ns per gathered element vs ~1 ms of streamed HBM traffic for
    # the whole batch (docs/perf_notes.md). co | si<<16 < 2^21 is
    # f32-exact and each row has exactly one hot term.
    lut21 = (ac_lut_np & np.uint32(0xFFFF)).astype(np.float32) \
        + (ac_lut_np >> np.uint32(24)).astype(np.float32) * 65536.0
    sym_r = sym.reshape(-1, 512)
    oh = (sym_r[:, :, None] ==
          np.arange(256, dtype=np.int32)[None, None, :]).astype(
        jnp.float32)
    ent = jnp.einsum("cls,s->cl", oh, lut21,
                     preferred_element_type=jnp.float32) \
        .reshape(-1).astype(jnp.uint32)
    aco_c = ent & jnp.uint32(0xFFFF)
    asi_c = (ent >> 16).astype(jnp.int32)
    v_s2 = (aco_c << nb_s) | (t2_s & ((jnp.uint32(1) << nb_s) - 1))
    l_s2 = asi_c + nb_s

    val = jnp.where(kind == K_DC, v_dc,
                    jnp.where(kind == K_ZRL, v_z,
                              jnp.where(kind == K_SYM, v_s2,
                                        np.uint32(eco))))
    ln = jnp.where(kind == K_DC, l_dc,
                   jnp.where(kind == K_ZRL, l_z,
                             jnp.where(kind == K_SYM, l_s2,
                                       np.int32(esi))))
    ln = jnp.where(live, ln, 0)

    # ---- segmented per-image bit offsets ----
    img = blk // n_tot                                  # (captot,)
    cums = jnp.cumsum(ln)
    excl = cums - ln
    prev_img = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), img[:-1]])
    first = img != prev_img
    base = jax.lax.cummax(jnp.where(first, excl, 0))
    off_bits = excl - base
    bits_img = []
    for i in range(b):
        bits_img.append(jnp.max(jnp.where((img == i) & live,
                                          cums - base, 0)))
    bits_v = jnp.stack(bits_img)
    over = over | jnp.any(bits_v > capw * 32)

    # ---- word scatter (bitpack._scatter_bits math, explicit rows) ----
    sh = (off_bits & 31).astype(jnp.uint32)
    w0 = off_bits >> 5
    lnu = ln.astype(jnp.uint32)
    space0 = jnp.uint32(32) - sh
    spill = jnp.maximum(ln - space0.astype(jnp.int32), 0).astype(
        jnp.uint32)
    keep0 = lnu - spill
    c0 = jnp.where(ln > 0,
                   (val >> spill) << (space0 - keep0), 0).astype(
        jnp.uint32)
    c1 = jnp.where(spill > 0,
                   (val << (jnp.uint32(32) - spill)), 0).astype(
        jnp.uint32)
    d0 = img * capw + w0
    d1 = jnp.where(w0 + 1 < capw, d0 + 1, b * capw)
    words = jnp.zeros((b * capw,), jnp.uint32)
    words = words.at[d0].add(jnp.where(live, c0, 0), mode="drop")
    words = words.at[d1].add(jnp.where(live, c1, 0), mode="drop")

    header = jnp.concatenate(
        [bits_v.astype(jnp.int32), total[None].astype(jnp.int32),
         over.astype(jnp.int32)[None]])
    return words.reshape(b, capw), header


@functools.partial(jax.jit, static_argnames=("n",))
def _trim_rows(w, n: int):
    return w[:, :n]


@functools.partial(jax.jit, static_argnames=("n",))
def _trim_concat(header, w, n: int):
    """[header | per-row word prefixes] as ONE i32 buffer so the fetch
    is a single blocking transfer (each np.asarray on this attachment
    costs a ~25-50 ms round trip)."""
    return jnp.concatenate(
        [header, jax.lax.bitcast_convert_type(
            w[:, :n], jnp.int32).reshape(-1)])


# running per-geometry estimate of the largest image's word count, so
# the speculative single-transfer fetch rarely needs a second trip
_EST_WORDS: dict = {}


def pack_batch(finals, comps, b: int, scap: int = 0,
               precision: int = 8):
    """finals: tuple per comp of (64, B*n_c) int16 device arrays ->
    (words_dev, header_dev, n_tot, capw).  Same flat block order as
    sparsepack.pack_planes_exact.  scap overrides the per-block symbol
    capacity (the retry path packs again at 32 when the default
    overflows — denser than that falls back to the sparse download).
    precision selects the table set (std at 8-bit, extended at 12-bit;
    see _tables)."""
    per_img = [f.reshape(64, b, -1) for f in finals]
    flat = jnp.concatenate(per_img, axis=2)            # (64, B, n_tot)
    n_tot = flat.shape[2]
    nt = b * n_tot
    flat = flat.reshape(64, nt)
    captot = -(-nt * (scap or _scap()) // 512) * 512
    capw = 13 * n_tot + 2
    words, header = _pack_transport(flat, b, n_tot, captot, capw,
                                    precision)
    return words, header, n_tot, capw


def fetch(packed):
    """One speculative transfer: [header | per-row word prefix] sized by
    the running estimate for this geometry; a second (exact) transfer
    only when an image outgrew the guess.  -> (words_host (b, w) u32,
    bits (b,) int32) or None on overflow (caller falls back to the
    sparse download)."""
    from ..utils import xfer
    words_dev, header_dev, n_tot, capw = packed
    b = words_dev.shape[0]
    est = _EST_WORDS.get(n_tot, max(1, n_tot * 5 // 32))
    bucket = min(capw, -(-int(est * 1.3) // TRIM_STEP) * TRIM_STEP)
    buf = np.asarray(_trim_concat(header_dev, words_dev, bucket))
    xfer.add_d2h(buf.nbytes)
    header = buf[:b + 2]
    if int(header[-1]):
        return None
    bits = header[:-2]
    need = int(max(1, (int(bits.max()) + 31) // 32))
    _EST_WORDS[n_tot] = need
    if need <= bucket:
        words = buf[b + 2:].view(np.uint32).reshape(b, bucket)
        return words, bits.astype(np.int32)
    # guess too small: one exact follow-up transfer
    bucket = min(capw, -(-need // TRIM_STEP) * TRIM_STEP)
    words = np.asarray(_trim_rows(words_dev, bucket))
    xfer.add_d2h(words.nbytes)
    return words, bits.astype(np.int32)


@functools.lru_cache(maxsize=2)
def _dec_tables(precision: int = 8):
    """Flattened decoder arrays for the C++ walker (table set per
    precision, see _tables)."""
    from ..entropy.huffman import derive_decode_table
    out = []
    for tbl in _tables(precision):
        mn, mx, vp, vals = derive_decode_table(tbl)
        v = np.zeros(256, np.uint8)
        v[:len(vals)] = vals
        out.append((np.ascontiguousarray(mn.astype(np.int32)),
                    np.ascontiguousarray(mx.astype(np.int64)),
                    np.ascontiguousarray(vp.astype(np.int32)),
                    np.ascontiguousarray(v)))
    return out


def decode_to_planes(words: np.ndarray, bits: np.ndarray, b: int,
                     comps, precision: int = 8):
    """Host decode of the transport stream -> per image per-comp
    (bh, bw, 64) int16 planes (native mj_transport_decode), or None on
    a malformed stream."""
    from ..native import lib, u32p, i16p, i32p, i64p, u8p
    n_tot = sum(g.bh * g.bw for g in comps)
    nt = b * n_tot
    out = np.zeros((nt, 64), np.int16)
    (dmn, dmx, dvp, dvl), (amn, amx, avp, avl) = _dec_tables(precision)
    words = np.ascontiguousarray(words)
    bits = np.ascontiguousarray(bits.astype(np.int32))
    rc = lib.mj_transport_decode(
        words.ctypes.data_as(u32p), words.shape[1],
        bits.ctypes.data_as(i32p), b, n_tot,
        dmn.ctypes.data_as(i32p), dmx.ctypes.data_as(i64p),
        dvp.ctypes.data_as(i32p), dvl.ctypes.data_as(u8p),
        amn.ctypes.data_as(i32p), amx.ctypes.data_as(i64p),
        avp.ctypes.data_as(i32p), avl.ctypes.data_as(u8p),
        out.ctypes.data_as(i16p))
    if rc != 0:
        return None
    images = []
    off = 0
    for _ in range(b):
        planes = []
        for g in comps:
            n = g.bh * g.bw
            planes.append(out[off:off + n].reshape(g.bh, g.bw, 64))
            off += n
        images.append(planes)
    return images
