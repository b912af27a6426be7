"""Runtime-parameterized progressive-scan kernels for the device scan search.

The jpegrescan search (codec/scanopt.py; /root/reference/jcmaster.c:773-962)
evaluates ~130 candidate (comp, Ss, Se, Ah, Al) scan encodings per image.
Compiling one XLA subgraph per candidate would take minutes and dispatching
one program per candidate costs a ~1 ms tunnel round trip each — so these
kernels take the band bounds and successive-approximation shift as RUNTIME
scalars (full 63-wide arrays + masks, no data-dependent shapes) and are
`lax.map`ed over a stacked candidate list inside ONE jitted program.

Semantics are exactly jcphuff.c's (AC_first / AC_refine encoders incl.
cross-block EOB-run accumulation, the 0x7FFF forced flush, and AC-refine's
correction-bit buffering with the MAX_CORR_BITS flush rule), verified
byte-for-byte against the host engine (native/entropy.cpp).

Restart intervals: the search candidates are emitted with the scan's
restart interval; the device path currently covers restart == 0 (the
default) — callers fall back to the host search otherwise.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bitpack import _nbits, _scatter_bits
from .symbols import hist256


class ACFirstSyms(NamedTuple):
    """Per-candidate AC-first symbolization of one component plane."""
    sym: jnp.ndarray        # (n, 63) i32 (run&15)<<4 | size, valid where nz
    nb: jnp.ndarray         # (n, 63) i32 magnitude bit count
    t2: jnp.ndarray         # (n, 63) u32 magnitude bits (complement coding)
    nz: jnp.ndarray         # (n, 63) bool
    zrl_ct: jnp.ndarray     # (n, 63) i32 number of ZRL(0xF0) codes (0..3)
    flush_run: jnp.ndarray  # (n,) i32 EOB run flushed before this block
    forced: jnp.ndarray     # (n,) bool 0x7FFF forced flush after this block
    end_run: jnp.ndarray    # () i32 run flushed at end of scan
    hist: jnp.ndarray       # (256,) i32 symbol counts (gather-mode exact)


def ac_first_symbolize_rt(plane_t, Ss, Se, Al):
    """plane_t: (64, n) int zigzag coefficients, raster block order (real
    blocks only). Ss/Se/Al: runtime i32 scalars, 1 <= Ss <= Se <= 63.
    Single segment (restart interval 0)."""
    band = jnp.transpose(plane_t[1:64]).astype(jnp.int32)   # (n, 63)
    n = band.shape[0]
    k1 = jnp.arange(1, 64, dtype=jnp.int32)[None, :]        # position
    m = (k1 >= Ss) & (k1 <= Se)

    sign = band < 0
    a = jnp.where(m, jnp.abs(band) >> Al, 0)
    t2 = jnp.where(sign, ~a, a).astype(jnp.uint32)
    nz = a != 0
    zero_in = m & ~nz

    # zeros since the previous in-band nonzero (within the block)
    zc = jnp.cumsum(zero_in.astype(jnp.int32), axis=1)      # incl, by col
    zc_pad = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), zc], axis=1)
    nzpos = jnp.where(nz, k1, 0)                            # 1-based
    last_excl = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jax.lax.cummax(nzpos, axis=1)[:, :-1]], axis=1)    # pos of prev nz
    # zeros in (prev_nz_pos, k): zc[col(k)-1] - zc[col(prev)] with
    # zc_pad[p] = zeros among positions <= p (position-indexed = col+1)
    run = (jnp.take_along_axis(zc_pad, jnp.maximum(k1 - 1, 0), axis=1)
           - jnp.take_along_axis(zc_pad, last_excl, axis=1))
    nb = _nbits(a)
    sym = ((run & 15) << 4) + nb
    zrl_ct = jnp.where(nz, run >> 4, 0)

    # trailing zeros -> EOB contribution
    last_nz = jnp.max(nzpos, axis=1)                        # 0 = none
    total_zero = zc[:, -1]
    tz = total_zero - jnp.take_along_axis(
        zc_pad, last_nz[:, None], axis=1)[:, 0]
    e = (tz > 0).astype(jnp.int32)                          # (n,)
    has_sym = last_nz > 0

    # cross-block EOB-run bookkeeping (single segment): see
    # bitpack._pack_ac_first for the prefix-sum derivation
    C = jnp.cumsum(e)                                       # inclusive
    D = C - e
    D_at_sym = jnp.where(has_sym, D, 0)
    prev_D = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jax.lax.cummax(jnp.where(has_sym, D_at_sym + 1, 0))[:-1]])
    prev_D = jnp.maximum(prev_D - 1, 0)
    pending = (D - prev_D) % 32767
    flush_run = jnp.where(has_sym & (pending > 0), pending, 0)
    since = C - prev_D
    forced = (e > 0) & ~has_sym & (since > 0) & (since % 32767 == 0)
    last_D = jnp.max(jnp.where(has_sym, D_at_sym, 0))
    end_run = (C[-1] - last_D) % 32767

    # gather-mode histogram (jcphuff.c AC_first with gather_statistics)
    hist = hist256(jnp.where(nz, sym, 0), nz.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(zrl_ct))
    hist = hist.at[14 << 4].add(jnp.sum(forced.astype(jnp.int32)))

    def run_cat(r):
        return jnp.maximum(_nbits(jnp.maximum(r, 0)) - 1, 0) << 4

    fvalid = flush_run > 0
    hist = hist.at[jnp.where(fvalid, run_cat(flush_run), 0)] \
        .add(fvalid.astype(jnp.int32))
    hist = hist.at[run_cat(end_run[None])] \
        .add(jnp.where(end_run > 0, 1, 0)[None]
             if end_run.ndim else (end_run > 0).astype(jnp.int32))

    return ACFirstSyms(sym, nb, t2, nz, zrl_ct, flush_run, forced,
                       end_run, hist)


def ac_first_pack_from_syms(s: ACFirstSyms, ac_co, ac_si, nwords: int):
    """Pack an AC-first scan's bits from its symbolization + code tables.
    ac_co (256,) u32, ac_si (256,) i32. -> (words (nwords,) u32, bits i32)."""
    n = s.sym.shape[0]
    sym_len = jnp.where(s.nz, ac_si[s.sym] + s.nb, 0)
    sym_val = ((ac_co[s.sym] << s.nb)
               | (s.t2 & ((jnp.uint32(1) << s.nb) - 1)))
    z_lens = [jnp.where(s.nz & (s.zrl_ct >= i), ac_si[0xF0], 0)
              for i in (1, 2, 3)]

    def eob_lane(runv, active):
        nbr = jnp.maximum(_nbits(runv) - 1, 0)
        symv = nbr << 4
        val = (ac_co[symv] << nbr) | \
            (runv.astype(jnp.uint32) & ((jnp.uint32(1) << nbr) - 1))
        ln = jnp.where(active & (runv > 0), ac_si[symv] + nbr, 0)
        return val, ln

    f_val, f_len = eob_lane(s.flush_run, s.flush_run > 0)
    ff_val, ff_len = eob_lane(jnp.full((n,), 32767, jnp.int32), s.forced)
    zvals = jnp.broadcast_to(ac_co[0xF0], (n, 63, 3)).astype(jnp.uint32)
    pos_vals = jnp.concatenate([zvals, sym_val[:, :, None]], axis=2) \
        .reshape(n, 63 * 4)
    pos_lens = jnp.stack(z_lens + [sym_len], axis=2).reshape(n, 63 * 4)
    vals = jnp.concatenate([f_val[:, None], pos_vals, ff_val[:, None]],
                           axis=1).reshape(1, -1)
    lens = jnp.concatenate([f_len[:, None], pos_lens, ff_len[:, None]],
                           axis=1).reshape(1, -1)
    e_val, e_len = eob_lane(s.end_run[None], (s.end_run > 0)[None])
    vals = jnp.concatenate([vals, e_val[None]], axis=1)
    lens = jnp.concatenate([lens, e_len[None]], axis=1)
    csum = jnp.cumsum(lens, axis=1)
    bits = csum[:, -1]
    words = _scatter_bits(vals, lens, csum - lens, nwords)
    return words[0], bits[0].astype(jnp.int32)


def stuffed_size(words, bits):
    """Exact byte length of the finished segment: ceil(bits/8) data bytes
    after 1-padding, plus one 0x00 stuff byte per 0xFF
    (bitpack._finish_segments semantics). -> i32 total bytes."""
    nwords = words.shape[0]
    nbytes = (bits + 7) >> 3
    sh = jnp.array([24, 16, 8, 0], jnp.uint32)
    byts = ((words[:, None] >> sh[None, :]) & jnp.uint32(0xFF)) \
        .reshape(-1).astype(jnp.int32)                    # (nwords*4,)
    idx = jnp.arange(nwords * 4, dtype=jnp.int32)
    pad = (-bits) % 8
    last = jnp.maximum(nbytes - 1, 0)
    byts = jnp.where(idx == last, byts | ((1 << pad) - 1), byts)
    ff = jnp.sum(((byts == 0xFF) & (idx < nbytes)).astype(jnp.int32))
    return nbytes + ff


# ---------------------------------------------------------------------------
# AC refinement (jcphuff.c encode_mcu_AC_refine), runtime band bounds.
# ---------------------------------------------------------------------------

class ACRefSyms(NamedTuple):
    newly: jnp.ndarray        # (n, 63) bool |coef|>>Al == 1
    prevnz: jnp.ndarray       # (n, 63) bool |coef|>>Al > 1
    sgn: jnp.ndarray          # (n, 63) i32 1 = non-negative
    corr: jnp.ndarray         # (n, 63) u32 correction bit
    r_sym: jnp.ndarray        # (n, 63) i32 run & 15 at newly positions
    zrl_ct: jnp.ndarray       # (n, 63) i32
    bktA_len: jnp.ndarray     # (n, 63) i32 correction bits after 1st ZRL
    bktB_len: jnp.ndarray     # (n, 63) i32 correction bits after sym
    is_event: jnp.ndarray     # (n, 63) bool emission event (ZRL or newly)
    nxt_ev: jnp.ndarray       # (n, 63) i32 next event pos (1-based; 64=none)
    prev_ev: jnp.ndarray      # (n, 63) i32 previous event pos (1-based)
    rank_local: jnp.ndarray   # (n, 63) i32 rank within attached bucket
    rank_unflushed: jnp.ndarray  # (n, 63) i32 rank among block's tail bits
    e: jnp.ndarray            # (n,) i32 EOB contribution
    br: jnp.ndarray           # (n,) i32 tail correction-bit count
    ev: jnp.ndarray           # (n,) i32 block has events
    hist_part: jnp.ndarray    # (256,) i32 counts sans EOBn bins


def ac_refine_symbolize_rt(plane_t, Ss, Se, Al):
    """Runtime-band AC-refine symbolization (single component)."""
    band = jnp.transpose(plane_t[1:64]).astype(jnp.int32)   # (n, 63)
    n = band.shape[0]
    k1 = jnp.arange(1, 64, dtype=jnp.int32)[None, :]
    m = (k1 >= Ss) & (k1 <= Se)

    absv = jnp.where(m, jnp.abs(band) >> Al, 0)
    sgn = (band >= 0).astype(jnp.int32)
    newly = absv == 1
    prevnz = absv > 1
    zero = m & (absv == 0)
    corr = (absv & 1).astype(jnp.uint32)

    newly_pos = jnp.where(newly, k1, 0)
    EOB = jnp.max(newly_pos, axis=1)                         # 1-based pos
    le_eob = k1 <= EOB[:, None]

    zi = jnp.cumsum(zero.astype(jnp.int32), axis=1)
    zi_pad = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), zi], axis=1)
    ln = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jax.lax.cummax(newly_pos, axis=1)[:, :-1]], axis=1)  # last newly <k
    # zeros in (ln, k): position-indexed gather
    Zw = (jnp.take_along_axis(zi_pad, jnp.maximum(k1 - 1, 0), axis=1)
          - jnp.take_along_axis(zi_pad, ln, axis=1))
    nzm = m & (absv != 0)
    nz_pos = jnp.where(nzm, k1, 0)
    pnz = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jax.lax.cummax(nz_pos, axis=1)[:, :-1]], axis=1)
    in_win = pnz > ln
    Zw_pad = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), Zw], axis=1)
    Zw_j = jnp.where(in_win, jnp.take_along_axis(Zw_pad, pnz, axis=1), 0)
    r_before = (Zw_j & 15) + (Zw - Zw_j)
    zrl_ct = jnp.where(nzm & le_eob, r_before >> 4, 0)
    r_sym = r_before & 15

    is_event = (zrl_ct > 0) | newly
    ev_pos = jnp.where(is_event, k1, 0)
    prev_ev = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jax.lax.cummax(ev_pos, axis=1)[:, :-1]], axis=1)
    pz = jnp.cumsum(prevnz.astype(jnp.int32), axis=1)
    pz_pad = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), pz], axis=1)
    pz_excl = jnp.take_along_axis(pz_pad, jnp.maximum(k1 - 1, 0), axis=1)
    # bucket takes prevnz in [prev_ev, k): inclusive of the previous event
    # position (a ZRL at a previously-nonzero position buffers its own
    # correction bit after its flush, jcphuff.c:885-889)
    pz_at_pe = jnp.take_along_axis(pz_pad, jnp.maximum(prev_ev - 1, 0),
                                   axis=1)
    bkt_len = jnp.where(is_event, pz_excl - pz_at_pe, 0)
    bktA_len = jnp.where(zrl_ct > 0, bkt_len, 0)
    bktB_len = jnp.where(newly & (zrl_ct == 0), bkt_len, 0)

    last_ev = jnp.max(ev_pos, axis=1)
    big = jnp.int32(64)
    evp = jnp.where(is_event, k1, big)
    sufmin = jax.lax.associative_scan(jnp.minimum, evp, axis=1,
                                      reverse=True)
    nxt_ev = jnp.concatenate([sufmin[:, 1:], jnp.full((n, 1), big)],
                             axis=1)                        # min event > k

    q0 = jnp.clip(nxt_ev - 1, 0, 62)
    pe_q = jnp.take_along_axis(prev_ev, q0, axis=1)
    pz_at_peq = jnp.take_along_axis(pz_pad, jnp.maximum(pe_q - 1, 0),
                                    axis=1)
    rank_local = pz_excl - pz_at_peq
    pz_at_le = jnp.take_along_axis(pz_pad,
                                   jnp.maximum(last_ev - 1, 0)[:, None],
                                   axis=1)
    rank_unflushed = pz_excl - pz_at_le

    ev = (EOB > 0).astype(jnp.int32)
    e = jnp.where(EOB < Se, 1, 0)            # trailing zeros/bits -> EOB
    br = jnp.sum((prevnz & (k1 > EOB[:, None])).astype(jnp.int32), axis=1)

    sym = (r_sym << 4) + 1
    hist = hist256(jnp.where(newly, sym, 0), newly.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(zrl_ct))

    return ACRefSyms(newly, prevnz, sgn, corr, r_sym, zrl_ct,
                     bktA_len, bktB_len, is_event, nxt_ev, prev_ev,
                     rank_local, rank_unflushed, e, br, ev, hist)


def ac_refine_schedule_dev(e, br, ev):
    """Device port of mj_ac_refine_schedule (native/entropy.cpp:1075-1128):
    the sequential (eobrun, BE) state machine across blocks of one segment
    — flush before a symbol-bearing block, forced flush when eobrun hits
    0x7FFF or the buffered correction bits exceed 937 (MAX_CORR_BITS -
    DCTSIZE2 + 1), exactly as encode_mcu_AC_refine schedules them.

    e/br/ev: (n,) i32 per-block summaries. Returns (flush_run, flush_be,
    forced_run, forced_be, attach_blk, attach_kind, attach_base,
    end_run, end_be) with the lane semantics of bitpack._pack_ac_refine:
    attach_kind 0 = the bits ride a kind-0 flush at attach_blk, 1 = a
    forced flush at attach_blk, 2 = the segment-end flush; attach_base =
    bit rank within that flush's correction-bit bucket."""
    n = e.shape[0]

    def step(carry, x):
        eobrun, BE = carry
        e_b, br_b, ev_b = x
        flush0 = (ev_b > 0) & (eobrun > 0)
        flush_run = jnp.where(flush0, eobrun, 0)
        flush_be = jnp.where(flush0, BE, 0)
        eobrun = jnp.where(ev_b > 0, 0, eobrun)
        BE = jnp.where(ev_b > 0, 0, BE)
        eobrun = eobrun + e_b
        BE = BE + jnp.where(e_b > 0, br_b, 0)
        force = (e_b > 0) & ((eobrun == 0x7FFF) | (BE > 937))
        forced_run = jnp.where(force, eobrun, 0)
        forced_be = jnp.where(force, BE, 0)
        eobrun = jnp.where(force, 0, eobrun)
        BE = jnp.where(force, 0, BE)
        return (eobrun, BE), (flush_run, flush_be, forced_run, forced_be,
                              flush0, force)

    (end_run, end_be), outs = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0)), (e, br, ev))
    flush_run, flush_be, forced_run, forced_be, flush0, force = outs

    # --- attachment of each block's tail correction bits ---
    # A block q's br bits enter the buffer when its e is processed ("time"
    # 2q+1); a kind-0 flush at b drains the buffer at time 2b, a forced
    # flush at b at time 2b+1 (after b's contribution), segment end last.
    # attach(q) = first flush with time >= 2q+1.
    idx = jnp.arange(n, dtype=jnp.int32)
    BIGT = jnp.int32(2 * n + 2)
    t0 = jnp.where(flush0, 2 * idx, BIGT)         # kind-0 times
    t1 = jnp.where(force, 2 * idx + 1, BIGT)      # kind-1 times
    tmin = jnp.minimum(t0, t1)
    suf = jax.lax.associative_scan(jnp.minimum, tmin, reverse=True)
    # first flush time >= 2q+1: a kind-0 at q (time 2q) does NOT cover q
    suf_after = jnp.concatenate([suf[1:], jnp.full(1, BIGT, jnp.int32)])
    attach_t = jnp.where(t1 < BIGT, t1, suf_after)  # own forced flush wins
    has_tail = br > 0
    attach_kind = jnp.where(attach_t >= BIGT, 2,
                            jnp.where((attach_t & 1) == 1, 1, 0))
    attach_blk = jnp.where(attach_t >= BIGT, n - 1, attach_t >> 1)
    attach_kind = jnp.where(has_tail, attach_kind, 2)

    # attach_base: exclusive prefix sum of br among blocks with the same
    # attach event (attach_t is non-decreasing over tail blocks)
    cbr = jnp.cumsum(jnp.where(has_tail, br, 0))
    cbr_excl = cbr - jnp.where(has_tail, br, 0)
    # group start = first TAIL block of each attach event (skip non-tail
    # blocks when comparing: cummax carries the previous tail's event)
    seen = jax.lax.cummax(jnp.where(has_tail, attach_t, -1))
    prev_seen = jnp.concatenate([jnp.full(1, -1, jnp.int32), seen[:-1]])
    is_start = has_tail & (attach_t != prev_seen)
    start_val = jnp.where(is_start, cbr_excl, -1)
    grp_start = jax.lax.cummax(start_val)
    attach_base = jnp.where(has_tail, cbr_excl - grp_start, 0)
    return (flush_run, flush_be, forced_run, forced_be,
            attach_blk, attach_kind, attach_base, end_run, end_be)


def ac_refine_hist_rt(s: ACRefSyms, sched):
    """Full gather-mode histogram for an AC-refine scan: the device parts
    plus EOBn bins from the flush schedule."""
    (flush_run, _, forced_run, _, _, _, _, end_run, _) = sched
    hist = s.hist_part

    def add_runs(hist, runs, valid):
        cat = jnp.maximum(_nbits(jnp.maximum(runs, 0)) - 1, 0) << 4
        w = (valid & (runs > 0)).astype(jnp.int32)
        return hist.at[jnp.where(w > 0, cat, 0).reshape(-1)] \
            .add(w.reshape(-1))

    hist = add_runs(hist, flush_run, flush_run > 0)
    hist = add_runs(hist, forced_run, forced_run > 0)
    hist = add_runs(hist, end_run[None], (end_run > 0)[None])
    return hist


def ac_refine_pack_from_syms(s: ACRefSyms, sched, ac_co, ac_si,
                             nwords: int):
    """Pack an AC-refine scan (single segment) from its symbolization and
    flush schedule — the runtime-band analog of bitpack._pack_ac_refine.
    -> (words (nwords,) u32, bits i32)."""
    (flush_run, flush_be, forced_run, forced_be, attach_blk, attach_kind,
     attach_base, end_run, end_be) = sched
    n = s.newly.shape[0]
    W = 63

    def eob_lane(runv, active):
        runv = runv.astype(jnp.int32)
        nb = jnp.maximum(_nbits(runv) - 1, 0)
        symv = nb << 4
        val = (ac_co[symv] << nb) | \
            (runv.astype(jnp.uint32) & ((jnp.uint32(1) << nb) - 1))
        ln_ = jnp.where(active & (runv > 0), ac_si[symv] + nb, 0)
        return val.astype(jnp.uint32), ln_.astype(jnp.int32)

    f_val, f_len = eob_lane(flush_run, flush_run > 0)
    fo_val, fo_len = eob_lane(forced_run, forced_run > 0)
    e_val, e_len = eob_lane(end_run[None], (end_run > 0)[None])

    zrl_val = jnp.broadcast_to(ac_co[0xF0], (n, W)).astype(jnp.uint32)
    z_lens = [jnp.where(s.zrl_ct >= i, ac_si[0xF0], 0) for i in (1, 2, 3)]
    symv = (s.r_sym << 4) + 1
    sym_val = ((ac_co[symv] << 1) | s.sgn.astype(jnp.uint32))
    sym_len = jnp.where(s.newly, ac_si[symv] + 1, 0)

    zero_u = jnp.zeros((n, W), jnp.uint32)
    pos_vals = jnp.stack([zrl_val, zero_u, zrl_val, zrl_val,
                          sym_val.astype(jnp.uint32), zero_u],
                         axis=2).reshape(n, 6 * W)
    pos_lens = jnp.stack([z_lens[0], s.bktA_len, z_lens[1], z_lens[2],
                          sym_len, s.bktB_len], axis=2).reshape(n, 6 * W)

    blk_vals = jnp.concatenate(
        [f_val[:, None], jnp.zeros((n, 1), jnp.uint32), pos_vals,
         fo_val[:, None], jnp.zeros((n, 1), jnp.uint32)], axis=1)
    blk_lens = jnp.concatenate(
        [f_len[:, None], flush_be[:, None], pos_lens,
         fo_len[:, None], forced_be[:, None]], axis=1)
    L = blk_vals.shape[1]                              # 4 + 6W
    seg_vals = jnp.concatenate(
        [blk_vals.reshape(1, n * L), e_val[:, None],
         jnp.zeros((1, 1), jnp.uint32)], axis=1)
    seg_lens = jnp.concatenate(
        [blk_lens.reshape(1, n * L), e_len[:, None],
         end_be.reshape(1, 1)], axis=1)

    csum = jnp.cumsum(seg_lens, axis=1)
    bits = csum[:, -1]
    off = csum - seg_lens
    words = _scatter_bits(seg_vals, seg_lens, off, nwords)

    # ---- correction-bit scatter ----
    off_flat = off.reshape(-1)
    seg_end_lane = n * L + 1

    q0 = jnp.clip(s.nxt_ev - 1, 0, W - 1)
    q_zrl = jnp.take_along_axis(s.zrl_ct, q0, axis=1) > 0
    bucket_lane = 2 + 6 * q0 + jnp.where(q_zrl, 1, 5)
    has_local = s.prevnz & (s.nxt_ev <= W)
    is_global = s.prevnz & (s.nxt_ev > W)

    blk_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, W))
    ab = jnp.clip(attach_blk, 0, n - 1)[:, None]
    ak = attach_kind[:, None]
    g_lane = jnp.where(ak == 0, 1, jnp.where(ak == 1, L - 1, -1))
    tgt_blk = jnp.where(is_global, jnp.broadcast_to(ab, (n, W)), blk_ids)
    tgt_lane = jnp.where(is_global,
                         jnp.broadcast_to(g_lane, (n, W)), bucket_lane)
    use_seg_end = is_global & (jnp.broadcast_to(g_lane, (n, W)) < 0)
    flat_lane = jnp.where(use_seg_end, seg_end_lane,
                          tgt_blk * L + tgt_lane)
    base_off = off_flat[flat_lane.reshape(-1)].reshape(n, W)
    rank = jnp.where(is_global,
                     jnp.broadcast_to(attach_base[:, None], (n, W))
                     + s.rank_unflushed, s.rank_local)
    bit_off = base_off + rank
    bit_len = jnp.where(has_local | is_global, 1, 0)
    words2 = _scatter_bits(
        s.corr.reshape(1, n * W), bit_len.reshape(1, n * W),
        bit_off.reshape(1, n * W), nwords)
    return (words | words2)[0], bits[0].astype(jnp.int32)
