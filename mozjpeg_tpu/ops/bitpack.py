"""On-device Huffman bit-packing for sequential scans, restart-parallel.

The reference's entropy coding is a strictly serial bit stream
(/root/reference/jchuff.c:563-661 encode_one_block + the 64-bit
accumulator at jchuff.c:364-435); its only format-level parallelism
affordance is the restart interval — DC predictors and byte alignment
reset at every RSTn marker (jchuff.c:668-686), making inter-restart
segments independently encodable (SURVEY.md §2.6).

This module exploits exactly that: every restart segment of a baseline
sequential scan is bit-packed *on device, in parallel* —

  1. per block, each potential symbol gets a fixed lane holding
     (value, bit-length): one DC lane (code+appended magnitude bits),
     and per AC position three ZRL lanes + one (run,size)+magnitude
     lane, plus an EOB lane — data-dependence becomes masking
     (len = 0), never control flow;
  2. a segmented exclusive prefix-sum of lane lengths yields every
     symbol's absolute bit offset inside its restart segment;
  3. each lane's value is split into (at most) two 32-bit word
     contributions and scatter-added into the segment's word buffer —
     bit ranges are disjoint, so add == or.

The host then only trims each segment to its byte length, ORs in the
1-padding (jchuff.c flush semantics), stuffs 0x00 after 0xFF bytes, and
concatenates segments with RSTn markers between them — O(bytes) work
with no bit manipulation.  Byte-for-byte identical to the serial C
encoder (native/entropy.cpp mj_encode_seq) and therefore to the
reference.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# worst-case bits per 8x8 block: DC (16-bit code + max magnitude bits) +
# 63 AC symbols of (16-bit code + max magnitude bits); ZRL runs only
# replace (never add to) nonzero positions, so this bounds every block.
# 8-bit: mag <= 11 DC / 10 AC; 12-bit: <= 16 / 14 (ITU T.81 tables F.1/F.2)
def max_block_bits(precision: int = 8) -> int:
    if precision <= 8:
        return 27 + 63 * 26
    return 32 + 63 * 30


MAX_BLOCK_BITS = max_block_bits(8)


def _nbits(v):
    """jpeg_nbits for v >= 0 (exact integer bit-length, no float log)."""
    n = jnp.zeros_like(v)
    for k in range(16):
        n = n + (v > ((1 << k) - 1)).astype(v.dtype)
    return n


def _block_lanes(zz, dc_delta, dc_co, dc_si, ac_co, ac_si):
    """Symbol lanes for one block. zz: (64,) int32 zigzag coefficients,
    dc_delta: scalar int32. Tables: (256,) uint32 / int32 per slot.
    -> (vals (L,) uint32, lens (L,) int32) in emission order."""
    # DC: symbol nb, then nb magnitude bits (jchuff.c F.1.2.1)
    t = dc_delta
    mag = jnp.abs(t)
    nb = _nbits(mag)
    t2 = jnp.where(t < 0, t - 1, t).astype(jnp.uint32)
    dc_code = dc_co[nb]
    dc_len = dc_si[nb]
    dc_val = (dc_code << nb) | (t2 & ((jnp.uint32(1) << nb) - 1))
    dc_lane_len = dc_len + nb

    ac = zz[1:64]
    k_idx = jnp.arange(1, 64, dtype=jnp.int32)
    nz = ac != 0
    # position of previous nonzero AC (0 = none yet): exclusive cummax
    marked = jnp.where(nz, k_idx, 0)
    last_excl = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jax.lax.cummax(marked)[:-1]])
    run = k_idx - last_excl - 1                      # zeros since last nz
    amag = jnp.abs(ac)
    anb = _nbits(amag)
    a2 = jnp.where(ac < 0, ac - 1, ac).astype(jnp.uint32)
    sym = ((run & 15) << 4) + anb
    sym_code = ac_co[sym]
    sym_len = jnp.where(nz, ac_si[sym] + anb, 0)
    sym_val = (sym_code << anb) | (a2 & ((jnp.uint32(1) << anb) - 1))

    nzrl = run >> 4                                  # 0..3 ZRL(0xF0) codes
    zrl_code = ac_co[0xF0]
    zrl_len = ac_si[0xF0]
    z_lens = [jnp.where(nz & (nzrl >= i), zrl_len, 0) for i in (1, 2, 3)]

    last_nz = jnp.max(marked)
    eob_len = jnp.where(last_nz < 63, ac_si[0x00], 0)
    eob_val = ac_co[0x00]

    # emission order: DC, then per position [z1 z2 z3 sym], then EOB
    zvals = jnp.broadcast_to(zrl_code, (63,)).astype(jnp.uint32)
    pos_vals = jnp.stack([zvals, zvals, zvals, sym_val], 1).reshape(-1)
    pos_lens = jnp.stack(z_lens + [sym_len], 1).reshape(-1)
    vals = jnp.concatenate([dc_val[None], pos_vals,
                            eob_val[None].astype(jnp.uint32)])
    lens = jnp.concatenate([dc_lane_len[None], pos_lens, eob_len[None]])
    return vals, lens.astype(jnp.int32)


def _dc_deltas(dc_seq):
    """dc_seq: (S, seg_blocks) int32 per-component DC values in MCU block
    order; delta vs previous block of the segment (predictor resets at
    segment start, jchuff.c:668-686)."""
    prev = jnp.concatenate(
        [jnp.zeros((dc_seq.shape[0], 1), dc_seq.dtype), dc_seq[:, :-1]], 1)
    return dc_seq - prev


@functools.partial(
    jax.jit,
    static_argnames=("geoms", "mcus_x", "mcus_y", "restart", "nwords"))
def _pack_segments(planes, dc_tab, ac_tab, geoms, mcus_x, mcus_y,
                   restart, nwords):
    """planes: tuple of (bh_pad, bw_pad, 64) int16 zigzag coefficient
    planes; dc_tab/ac_tab: (ncomp, 2, 256) uint32 codes / int32 lengths.
    geoms: ((h, v), ...) static sampling factors. restart: MCUs per
    segment. -> (words (S, nwords) uint32, bits (S,) int32)."""
    num_mcus = mcus_x * mcus_y
    S = -(-num_mcus // restart)
    num_mcus_p = S * restart
    blocks_per_mcu = sum(h * v for h, v in geoms)
    seg_blocks = restart * blocks_per_mcu

    # per component: MCU-order block streams (num_mcus_p, vh, 64)
    comp_blocks = []
    for ci, (h, v) in enumerate(geoms):
        p = planes[ci][:mcus_y * v, :mcus_x * h].astype(jnp.int32)
        p = p.reshape(mcus_y, v, mcus_x, h, 64).transpose(0, 2, 1, 3, 4)
        p = p.reshape(num_mcus, v * h, 64)
        p = jnp.pad(p, ((0, num_mcus_p - num_mcus), (0, 0), (0, 0)))
        comp_blocks.append(p)

    # DC deltas per component (segment-reset predictor), then lanes
    all_vals, all_lens = [], []
    for ci, (h, v) in enumerate(geoms):
        vh = h * v
        dc_seq = comp_blocks[ci][:, :, 0].reshape(S, restart * vh)
        deltas = _dc_deltas(dc_seq).reshape(num_mcus_p, vh)
        fn = jax.vmap(jax.vmap(
            _block_lanes, in_axes=(0, 0, None, None, None, None)),
            in_axes=(0, 0, None, None, None, None))
        vals, lens = fn(comp_blocks[ci], deltas,
                        dc_tab[ci, 0], dc_tab[ci, 1].astype(jnp.int32),
                        ac_tab[ci, 0], ac_tab[ci, 1].astype(jnp.int32))
        all_vals.append(vals)    # (num_mcus_p, vh, L)
        all_lens.append(lens)

    # interleave components into MCU emission order, then per segment
    L = all_vals[0].shape[-1]
    vals = jnp.concatenate(all_vals, axis=1).reshape(num_mcus_p, -1)
    lens = jnp.concatenate(all_lens, axis=1).reshape(num_mcus_p, -1)
    # mask out padding MCUs entirely
    real = (jnp.arange(num_mcus_p) < num_mcus)[:, None]
    lens = jnp.where(real, lens, 0)
    lanes_per_seg = seg_blocks * L
    vals = vals.reshape(S, lanes_per_seg)
    lens = lens.reshape(S, lanes_per_seg)

    return _scatter_pack(vals, lens, nwords)


def _scatter_pack(vals, lens, nwords: int):
    """(S, L) lane values/bit-lengths -> ((S, nwords) uint32 MSB-first
    words, (S,) total bits): segmented exclusive prefix sum of lengths
    gives each lane's bit offset; every lane splits into at most two
    32-bit word contributions scattered with add (disjoint bit ranges)."""
    csum = jnp.cumsum(lens, axis=1)
    bits = csum[:, -1]
    off = csum - lens
    words = _scatter_bits(vals, lens, off, nwords)
    return words, bits.astype(jnp.int32)


def _scatter_bits(vals, lens, off, nwords: int):
    """Scatter (S, L) lanes at explicit bit offsets into segment words."""
    S = vals.shape[0]

    sh = (off & 31).astype(jnp.uint32)
    w0 = off >> 5
    lens_u = lens.astype(jnp.uint32)
    space0 = jnp.uint32(32) - sh                    # bits left in word0
    spill = jnp.maximum(lens_u.astype(jnp.int32) - space0.astype(jnp.int32),
                        0).astype(jnp.uint32)       # bits into word1
    keep0 = lens_u - spill
    # contribution to word0: top keep0 bits of val, left-aligned at sh
    c0 = jnp.where(lens > 0,
                   (vals >> spill) << (space0 - keep0), 0).astype(jnp.uint32)
    c1 = jnp.where(spill > 0,
                   (vals << (jnp.uint32(32) - spill)) &
                   jnp.uint32(0xFFFFFFFF), 0).astype(jnp.uint32)

    seg_ids = jnp.arange(S, dtype=jnp.int32)[:, None]
    flat0 = (seg_ids * nwords + w0).reshape(-1)
    flat1 = (seg_ids * nwords + w0 + 1).reshape(-1)
    out = jnp.zeros((S * nwords,), jnp.uint32)
    out = out.at[flat0].add(c0.reshape(-1), mode="drop")
    out = out.at[flat1].add(c1.reshape(-1), mode="drop")
    return out.reshape(S, nwords)


def _as_dev(p):
    """Device twin of a plane: DualPlane.dev when the encoder attached
    one (no transfer), else upload the host array."""
    d = getattr(p, "dev", None)
    return d if d is not None else jnp.asarray(np.asarray(p))


@functools.partial(jax.jit, static_argnames=("n",))
def _trim_words(w, n):
    return w[:, :n]


@functools.partial(
    jax.jit, static_argnames=("bh", "bw", "Ss", "Se", "N_p"))
def _band_extract(plane, bh, bw, Ss, Se, N_p):
    """(bh_pad, bw_pad, 64) zigzag plane -> (N_p, W) int32 band in raster
    block order, zero-padded to the segment grid (one fused program; the
    eager equivalent is 4 dispatches per candidate scan)."""
    W = Se - Ss + 1
    band = plane[:bh, :bw, Ss:Se + 1].astype(jnp.int32).reshape(bh * bw, W)
    return jnp.pad(band, ((0, N_p - bh * bw), (0, 0)))


def _fetch_trimmed(words, bits):
    """Sync the per-segment bit counts (tiny), then download only the
    word prefix actually filled: the packers allocate worst-case
    capacity (max_block_bits per block), which is 10-100x the real scan
    size, and capacity-sized D2H transfers dominate encode time on
    remote-attached TPUs.  The trim length is rounded up to a power of
    two so the slice program cache stays bounded (this backend compiles
    remotely — every distinct shape is a network round trip).
    -> (words_host, bits_host)."""
    bits_h = np.asarray(bits)
    if bits_h.size == 0 or not hasattr(words, "devices"):
        return np.asarray(words), bits_h
    need = max(1, (int(bits_h.max()) + 31) // 32)
    cap = words.shape[1]
    if need < cap:
        bucket = 1 << (need - 1).bit_length()
        if bucket < cap:
            words = _trim_words(words, bucket)
    words_h = np.asarray(words)
    from ..utils import xfer
    xfer.add_d2h(words_h.nbytes + bits_h.nbytes)
    return words_h, bits_h


def _finish_segments(words: np.ndarray, bits: np.ndarray,
                     restart: bool, rst_offset: int = 0,
                     trailing_rst: bool = False) -> bytes:
    """Host finishing: trim, 1-pad to byte boundary, 0xFF-stuff, join
    with RSTn markers (BitWriter flush/restart semantics). rst_offset
    shifts the modulo-8 RST numbering and trailing_rst appends a marker
    after the final segment -- both for stitching a shard's segments
    into a larger scan (SURVEY.md §2.6 restart-parallel stitching)."""
    out = []
    S = words.shape[0]
    for s in range(S):
        n = int(bits[s])
        nbytes = (n + 7) >> 3
        raw = words[s].view(np.uint32).byteswap().tobytes()[:nbytes]
        b = bytearray(raw)
        pad = (-n) % 8
        if pad:
            b[-1] |= (1 << pad) - 1
        seg = bytes(b)
        # byte stuffing: 0x00 after every 0xFF
        if b"\xff" in seg:
            a = np.frombuffer(seg, np.uint8)
            idx = np.flatnonzero(a == 0xFF)
            stuffed = np.insert(a, idx + 1, 0)
            seg = stuffed.tobytes()
        out.append(seg)
        if restart and (s != S - 1 or trailing_rst):
            out.append(bytes([0xFF, 0xD0 + ((s + rst_offset) & 7)]))
    return b"".join(out)


def encode_scan_bitpar(planes: Sequence, geoms: Sequence[Tuple[int, int]],
                       mcus_x: int, mcus_y: int, restart: int,
                       dc_tables: List, ac_tables: List,
                       rst_offset: int = 0,
                       trailing_rst: bool = False,
                       precision: int = 8) -> bytes:
    """Baseline sequential interleaved scan, bit-packed on device per
    restart segment.  planes: per-comp (bh_pad, bw_pad, 64) zigzag
    coefficient arrays (device or host); dc_tables/ac_tables: per-comp
    (ehufco uint32[256], ehufsi uint8[256]) pairs.  Byte-identical to
    the serial encoder."""
    num_mcus = mcus_x * mcus_y
    r = restart if restart > 0 else num_mcus
    blocks_per_mcu = sum(h * v for h, v in geoms)
    nwords = -(-(r * blocks_per_mcu * max_block_bits(precision)) // 32) + 1
    dc_tab = np.stack([np.stack([co.astype(np.uint32),
                                 si.astype(np.uint32)])
                       for co, si in dc_tables])
    ac_tab = np.stack([np.stack([co.astype(np.uint32),
                                 si.astype(np.uint32)])
                       for co, si in ac_tables])
    words, bits = _pack_segments(
        tuple(_as_dev(p) for p in planes),
        jnp.asarray(dc_tab), jnp.asarray(ac_tab),
        tuple(geoms), mcus_x, mcus_y, r, nwords)
    words_h, bits_h = _fetch_trimmed(words, bits)
    return _finish_segments(words_h, bits_h,
                            restart > 0, rst_offset, trailing_rst)


# ---------------------------------------------------------------------------
# Progressive-scan device packers (jcphuff.c semantics), restart-parallel.
# Non-interleaved scans treat each block as one "MCU" in raster order over
# the component's real block grid (jcmaster.c:533 per_scan_setup).
# ---------------------------------------------------------------------------

def _mcu_block_streams(planes, geoms, mcus_x, mcus_y, num_mcus_p):
    """Per component: (num_mcus_p, v*h, 64) int32 blocks in MCU order."""
    num_mcus = mcus_x * mcus_y
    out = []
    for ci, (h, v) in enumerate(geoms):
        p = planes[ci][:mcus_y * v, :mcus_x * h].astype(jnp.int32)
        p = p.reshape(mcus_y, v, mcus_x, h, 64).transpose(0, 2, 1, 3, 4)
        p = p.reshape(num_mcus, v * h, 64)
        p = jnp.pad(p, ((0, num_mcus_p - num_mcus), (0, 0), (0, 0)))
        out.append(p)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("geoms", "mcus_x", "mcus_y", "restart", "Al", "nwords"))
def _pack_dc_first(planes, dc_tab, geoms, mcus_x, mcus_y, restart, Al,
                   nwords):
    """Progressive DC-first scan (jcphuff.c encode_mcu_DC_first): per block
    one lane of Huffman(nbits(delta)) + delta magnitude bits, where the
    value chain is the point-transformed DC (arithmetic shift by Al)."""
    num_mcus = mcus_x * mcus_y
    S = -(-num_mcus // restart)
    num_mcus_p = S * restart
    comp_blocks = _mcu_block_streams(planes, geoms, mcus_x, mcus_y,
                                     num_mcus_p)
    all_vals, all_lens = [], []
    for ci, (h, v) in enumerate(geoms):
        vh = h * v
        dc = comp_blocks[ci][:, :, 0] >> Al            # IRIGHT_SHIFT
        dc_seq = dc.reshape(S, restart * vh)
        deltas = _dc_deltas(dc_seq).reshape(num_mcus_p, vh)
        mag = jnp.abs(deltas)
        nb = _nbits(mag)
        t2 = jnp.where(deltas < 0, deltas - 1, deltas).astype(jnp.uint32)
        co = dc_tab[ci, 0]
        si = dc_tab[ci, 1].astype(jnp.int32)
        val = (co[nb] << nb) | (t2 & ((jnp.uint32(1) << nb) - 1))
        all_vals.append(val)
        all_lens.append(si[nb] + nb)
    vals = jnp.concatenate(all_vals, axis=1).reshape(num_mcus_p, -1)
    lens = jnp.concatenate(all_lens, axis=1).reshape(num_mcus_p, -1)
    real = (jnp.arange(num_mcus_p) < num_mcus)[:, None]
    lens = jnp.where(real, lens, 0)
    L = vals.shape[1]
    return _scatter_pack(vals.reshape(S, restart * L),
                         lens.reshape(S, restart * L), nwords)


@functools.partial(
    jax.jit,
    static_argnames=("geoms", "mcus_x", "mcus_y", "restart", "Al", "nwords"))
def _pack_dc_refine(planes, geoms, mcus_x, mcus_y, restart, Al, nwords):
    """Progressive DC refinement: one raw bit per block, MCU order."""
    num_mcus = mcus_x * mcus_y
    S = -(-num_mcus // restart)
    num_mcus_p = S * restart
    comp_blocks = _mcu_block_streams(planes, geoms, mcus_x, mcus_y,
                                     num_mcus_p)
    vals = jnp.concatenate(
        [((cb[:, :, 0] >> Al) & 1).astype(jnp.uint32)
         for cb in comp_blocks], axis=1)
    real = (jnp.arange(num_mcus_p) < num_mcus)[:, None]
    lens = jnp.where(real, 1, 0) * jnp.ones_like(vals, jnp.int32)
    L = vals.shape[1]
    return _scatter_pack(vals.reshape(S, restart * L),
                         lens.reshape(S, restart * L), nwords)


@functools.partial(
    jax.jit,
    static_argnames=("Ss", "Se", "Al", "restart", "nwords", "nreal"))
def _pack_ac_first(band, ac_co, ac_si, Ss: int, Se: int, Al: int,
                   restart: int, nwords: int, nreal: int = -1):
    """Progressive AC-first scan (jcphuff.c encode_mcu_AC_first) for one
    component: band (N_p, W) int32 coefficients (N_p = S*restart blocks in
    raster order, zero-padded past the real count which the caller masks
    via `nreal`), W = Se-Ss+1.

    Lane layout per block: [EOB-run flush] + W x [ZRL x3, (run,size)+mag];
    one extra per-segment lane flushes the end-of-segment EOB run. The
    cross-block EOB-run state becomes prefix sums: with C = cumsum of the
    per-block run contribution e and D(q) = C(q)-e(q) at the previous
    symbol-bearing block q, the run flushed before block b is
    C(b-1)-D(q) (mod 32767 across forced flushes at 0x7FFF,
    jcphuff.c emit_eobrun)."""
    N_p, W = band.shape
    S = N_p // restart

    sign = band < 0
    a = jnp.abs(band) >> Al                           # shift magnitude
    t2 = jnp.where(sign, ~a, a).astype(jnp.uint32)
    nz = a != 0

    k_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    marked = jnp.where(nz, k_idx + 1, 0)              # 1-based to spot none
    last_excl = jnp.concatenate(
        [jnp.zeros((N_p, 1), jnp.int32),
         jax.lax.cummax(marked, axis=1)[:, :-1]], axis=1)
    run = k_idx + 1 - last_excl - 1                   # zeros since last nz
    anb = _nbits(a)
    sym = ((run & 15) << 4) + anb
    sym_len = jnp.where(nz, ac_si[sym] + anb, 0)
    sym_val = (ac_co[sym] << anb) | (t2 & ((jnp.uint32(1) << anb) - 1))
    nzrl = run >> 4
    z_lens = [jnp.where(nz & (nzrl >= i), ac_si[0xF0], 0) for i in (1, 2, 3)]

    last_nz = jnp.max(marked, axis=1)                 # 0 = all-zero block
    has_sym = last_nz > 0
    e = (last_nz < W).astype(jnp.int32)               # EOB-run contribution
    if nreal >= 0:                                    # zero-padded blocks
        e = jnp.where(jnp.arange(N_p) < nreal, e, 0)  # are inert

    # segmented cross-block EOB-run bookkeeping
    e_seg = e.reshape(S, restart)
    hs = has_sym.reshape(S, restart)
    C = jnp.cumsum(e_seg, axis=1)                     # inclusive
    D = C - e_seg                                     # exclusive
    # D at the previous symbol-bearing block (per segment, 0 if none)
    D_at_sym = jnp.where(hs, D, 0)
    prev_D = jnp.concatenate(
        [jnp.zeros((S, 1), jnp.int32),
         jax.lax.cummax(jnp.where(hs, D_at_sym + 1, 0), axis=1)[:, :-1]],
        axis=1)                                       # +1 so cummax works
    prev_D = jnp.maximum(prev_D - 1, 0)
    pending = (D - prev_D) % 32767                    # run before this block
    flush_run = jnp.where(hs & (pending > 0), pending, 0).reshape(N_p)
    # forced flush when the run counter hits 0x7FFF mid-run (emit_eobrun
    # at eobrun == 0x7FFF): at e-blocks where the since-flush count is a
    # positive multiple of 32767
    since = C - prev_D
    # a symbol-bearing block just flushed: its running counter is only its
    # own contribution, so a forced flush can never legitimately fire there
    forced = ((e_seg > 0) & ~hs & (since > 0)
              & (since % 32767 == 0)).reshape(N_p)
    # end-of-segment flush
    last_D = jnp.max(jnp.where(hs, D_at_sym, 0), axis=1)
    end_run = (C[:, -1] - last_D) % 32767
    # a final segment CAN end with exactly 32767 pending (forced flush
    # already emitted it), so end_run is the true remainder

    def eob_lane(runv, active):
        nb = jnp.maximum(_nbits(runv) - 1, 0)
        symv = nb << 4
        val = (ac_co[symv] << nb) | \
            (runv.astype(jnp.uint32) & ((jnp.uint32(1) << nb) - 1))
        ln = jnp.where(active & (runv > 0), ac_si[symv] + nb, 0)
        return val, ln

    f_val, f_len = eob_lane(flush_run, flush_run > 0)
    ff_val, ff_len = eob_lane(jnp.full((N_p,), 32767, jnp.int32), forced)

    zvals = jnp.broadcast_to(ac_co[0xF0], (N_p, W, 3)).astype(jnp.uint32)
    pos_vals = jnp.concatenate([zvals, sym_val[:, :, None]], axis=2) \
        .reshape(N_p, W * 4)
    pos_lens = jnp.stack(z_lens + [sym_len], axis=2).reshape(N_p, W * 4)
    # forced-flush lane sits after the block's own lanes (the run count
    # reaches 0x7FFF only via this block's trailing-zero contribution)
    vals = jnp.concatenate([f_val[:, None], pos_vals, ff_val[:, None]],
                           axis=1)
    lens = jnp.concatenate([f_len[:, None], pos_lens, ff_len[:, None]],
                           axis=1)
    L = vals.shape[1]
    vals = vals.reshape(S, restart * L)
    lens = lens.reshape(S, restart * L)
    e_val, e_len = eob_lane(end_run, end_run > 0)
    vals = jnp.concatenate([vals, e_val[:, None]], axis=1)
    lens = jnp.concatenate([lens, e_len[:, None]], axis=1)
    return _scatter_pack(vals, lens, nwords)


def encode_scan_progressive_device(planes, geoms, mcus_x: int, mcus_y: int,
                                   scan_Ss: int, scan_Se: int, scan_Ah: int,
                                   scan_Al: int, restart: int,
                                   dc_tables=None, ac_tables=None,
                                   rst_offset: int = 0,
                                   trailing_rst: bool = False,
                                   precision: int = 8) -> bytes:
    """Device bit-packing for progressive DC-first / DC-refine / AC-first
    scans; byte-identical to the serial engine (AC refinement stays on
    host -- its deferred correction-bit buffering is the one part that
    does not map to fixed lanes; see native/entropy.cpp
    mj_encode_ac_refine).

    For DC scans, planes/geoms cover the scan's components in MCU order.
    For AC scans (non-interleaved by spec) pass one plane and its real
    block dims via geoms=[(1, 1)] and mcus_x/mcus_y = bw/bh."""
    num_mcus = mcus_x * mcus_y
    r = restart if restart > 0 else num_mcus
    dcbits = 27 if precision <= 8 else 32
    acbits = 26 if precision <= 8 else 30
    if scan_Ss == 0 and scan_Ah == 0:                 # DC first
        bpm = sum(h * v for h, v in geoms)
        nwords = -(-(r * bpm * dcbits) // 32) + 1
        dc_tab = np.stack([np.stack([co.astype(np.uint32),
                                     si.astype(np.uint32)])
                           for co, si in dc_tables])
        words, bits = _pack_dc_first(
            tuple(_as_dev(p) for p in planes), jnp.asarray(dc_tab),
            tuple(geoms), mcus_x, mcus_y, r, scan_Al, nwords)
    elif scan_Ss == 0:                                # DC refine
        bpm = sum(h * v for h, v in geoms)
        nwords = -(-(r * bpm) // 32) + 1
        words, bits = _pack_dc_refine(
            tuple(_as_dev(p) for p in planes),
            tuple(geoms), mcus_x, mcus_y, r, scan_Al, nwords)
    elif scan_Ah == 0:                                # AC first
        W = scan_Se - scan_Ss + 1
        S = -(-num_mcus // r)
        N_p = S * r
        co, si = ac_tables[0]
        if getattr(planes[0], "dev", None) is not None:
            band = _band_extract(planes[0].dev, mcus_y, mcus_x,
                                 scan_Ss, scan_Se, N_p)
        else:
            p = np.asarray(planes[0])
            band = np.zeros((N_p, W), np.int32)
            band[:num_mcus] = p[:mcus_y, :mcus_x, scan_Ss:scan_Se + 1] \
                .reshape(num_mcus, W)
        max_bits = 30 + W * acbits + 48
        nwords = -(-(r * max_bits) // 32) + 2
        words, bits = _pack_ac_first(
            jnp.asarray(band), jnp.asarray(co.astype(np.uint32)),
            jnp.asarray(si.astype(np.int32)), scan_Ss, scan_Se, scan_Al,
            r, nwords, num_mcus if N_p != num_mcus else -1)
    else:                                             # AC refine
        words, bits = _pack_ac_refine_host(
            np.asarray(planes[0]), mcus_x, mcus_y, scan_Ss, scan_Se,
            scan_Al, r, ac_tables[0])
    words_h, bits_h = _fetch_trimmed(words, bits)
    return _finish_segments(words_h, bits_h,
                            restart > 0, rst_offset, trailing_rst)


def _pack_ac_refine_host(p, bw_, bh_, Ss, Se, Al, r, ac_table):
    """Host orchestration for the AC-refine device packer: band extraction,
    the sequential (eobrun, BE) flush schedule (native C++), then the
    device pack."""
    from ..native import lib, i32p

    W = Se - Ss + 1
    num = bw_ * bh_
    S = -(-num // r)
    N_p = S * r
    co, si = ac_table
    band = np.zeros((N_p, W), np.int32)
    raw = p[:bh_, :bw_, Ss:Se + 1].reshape(num, W).astype(np.int32)
    band[:num] = np.abs(raw)
    sgn = np.ones((N_p, W), np.int32)
    sgn[:num] = (raw >= 0).astype(np.int32)

    absv = band >> Al
    newly = absv == 1
    kk = np.arange(1, W + 1, dtype=np.int32)
    eob = np.max(np.where(newly, kk[None, :], 0), axis=1)   # 1-based
    ev = (eob > 0).astype(np.int32)
    e = (eob < W).astype(np.int32)
    prevnz = absv > 1
    br = np.sum(prevnz & (kk[None, :] > eob[:, None]), axis=1)         .astype(np.int32)
    if N_p != num:                                    # pad blocks inert
        e[num:] = 0
        br[num:] = 0
        ev[num:] = 0

    def ptr(a):
        return a.ctypes.data_as(i32p)

    flush_run = np.zeros(N_p, np.int32)
    flush_be = np.zeros(N_p, np.int32)
    forced_run = np.zeros(N_p, np.int32)
    forced_be = np.zeros(N_p, np.int32)
    attach_blk = np.zeros(N_p, np.int32)
    attach_kind = np.zeros(N_p, np.int32)
    attach_base = np.zeros(N_p, np.int32)
    end_run = np.zeros(S, np.int32)
    end_be = np.zeros(S, np.int32)
    ec = np.ascontiguousarray(e)
    brc = np.ascontiguousarray(br)
    evc = np.ascontiguousarray(ev)
    lib.mj_ac_refine_schedule(
        ptr(ec), ptr(brc), ptr(evc), N_p, r,
        ptr(flush_run), ptr(flush_be), ptr(forced_run), ptr(forced_be),
        ptr(attach_blk), ptr(attach_kind), ptr(attach_base),
        ptr(end_run), ptr(end_be))

    # worst case bits/block: flush (30 + BE<=1001) + W sym/corr + 48 ZRL
    max_bits = 30 + 1001 + W * 26 + 48 + 30
    nwords = -(-(r * max_bits) // 32) + 34
    return _pack_ac_refine(
        jnp.asarray(band), jnp.asarray(sgn),
        jnp.asarray(co.astype(np.uint32)), jnp.asarray(si.astype(np.int32)),
        jnp.asarray(flush_run), jnp.asarray(flush_be),
        jnp.asarray(forced_run), jnp.asarray(forced_be),
        jnp.asarray(attach_blk), jnp.asarray(attach_kind),
        jnp.asarray(attach_base), jnp.asarray(end_run), jnp.asarray(end_be),
        Ss, Se, Al, r, nwords)


@functools.partial(
    jax.jit,
    static_argnames=("Ss", "Se", "Al", "restart", "nwords"))
def _pack_ac_refine(band, sgn, ac_co, ac_si, flush_run, flush_be,
                    forced_run, forced_be, attach_blk, attach_kind,
                    attach_base, end_run, end_be,
                    Ss: int, Se: int, Al: int, restart: int, nwords: int):
    """Progressive AC refinement (jcphuff.c encode_mcu_AC_refine) for one
    component. band (N_p, W) = |coef| (magnitudes), sgn (N_p, W) sign bits
    (1 = non-negative); the cross-block (eobrun, BE) flush schedule comes
    precomputed from mj_ac_refine_schedule (native/entropy.cpp).

    Lane layout per block: [EOBn flush][BE bucket] + per position
    [ZRL1][bucketA][ZRL2][ZRL3][sym+sign][bucketB] + [forced EOBn]
    [forced BE]; per segment two final lanes [end EOBn][end BE]. Buckets
    are length-only lanes; every correction bit scatters individually at
    bucket offset + rank."""
    N_p, W = band.shape
    S = N_p // restart

    absv = band >> Al
    newly = absv == 1
    prevnz = absv > 1
    zero = absv == 0
    corr = (absv & 1).astype(jnp.uint32)

    kk = jnp.arange(W, dtype=jnp.int32)[None, :]
    # EOB: last newly position (1-based; 0 = none)
    newly_pos = jnp.where(newly, kk + 1, 0)
    EOB = jnp.max(newly_pos, axis=1)                  # (N,)
    le_eob = (kk + 1) <= EOB[:, None]

    # zeros strictly before k since the last newly (reset) position
    zi = jnp.cumsum(zero.astype(jnp.int32), axis=1)   # zeros at <= k
    zi_excl = zi - zero.astype(jnp.int32)             # zeros at < k
    ln = jnp.concatenate(                             # last newly < k
        [jnp.zeros((N_p, 1), jnp.int32),
         jax.lax.cummax(newly_pos, axis=1)[:, :-1]], axis=1)
    zi_at_ln = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((N_p, 1), jnp.int32), zi_excl], axis=1),
        ln, axis=1)                                   # zeros < ln position
    Zw = zi_excl - zi_at_ln                           # zeros in (ln, k)

    nz = ~zero
    # previous nonzero position in the same window (1-based; 0 = none)
    nz_pos_w = jnp.where(nz, kk + 1, 0)
    pnz = jnp.concatenate(
        [jnp.zeros((N_p, 1), jnp.int32),
         jax.lax.cummax(nz_pos_w, axis=1)[:, :-1]], axis=1)
    in_win = pnz > ln                                 # same reset window
    Zw_j = jnp.where(in_win,
                     jnp.take_along_axis(
                         jnp.concatenate([jnp.zeros((N_p, 1), jnp.int32),
                                          Zw], axis=1), pnz, axis=1), 0)
    r_before = (Zw_j & 15) + (Zw - Zw_j)
    zrl_ct = jnp.where(nz & le_eob, r_before >> 4, 0)  # 0..3 ZRLs
    r_sym = r_before & 15

    # emission events (position order): first-ZRL or newly
    is_event = (zrl_ct > 0) | newly
    ev_pos = jnp.where(is_event, kk + 1, 0)
    prev_ev = jnp.concatenate(
        [jnp.zeros((N_p, 1), jnp.int32),
         jax.lax.cummax(ev_pos, axis=1)[:, :-1]], axis=1)
    # bucket length at event k: prevnz positions in (prev_ev, k)
    pz = jnp.cumsum(prevnz.astype(jnp.int32), axis=1)
    pz_excl = pz - prevnz.astype(jnp.int32)
    pz_pad = jnp.concatenate([jnp.zeros((N_p, 1), jnp.int32), pz], axis=1)
    # bucket at event k takes prevnz in [prev_ev, k): INCLUSIVE of the
    # previous event position -- a ZRL at a previously-nonzero position
    # buffers its own correction bit after its flush (jcphuff.c:885-889)
    pz_at_pe = jnp.take_along_axis(pz_pad,
                                   jnp.maximum(prev_ev - 1, 0), axis=1)
    bkt_len = jnp.where(is_event, pz_excl - pz_at_pe, 0)
    bktA_len = jnp.where(zrl_ct > 0, bkt_len, 0)
    bktB_len = jnp.where(newly & (zrl_ct == 0), bkt_len, 0)

    # per-block unflushed count and whether blocks have events at all
    last_ev = jnp.max(ev_pos, axis=1)                 # (N,)
    # (the C++ schedule already received br/e/ev; recompute ranks here)
    # local attach for each prevnz p: first event position q > p
    # (suffix-min of (event? k+1 : BIG), exclusive of k)
    big = jnp.int32(W + 1)
    evp = jnp.where(is_event, kk + 1, big)
    sufmin = jax.lax.associative_scan(jnp.minimum, evp, axis=1,
                                      reverse=True)
    nxt_ev = jnp.concatenate([sufmin[:, 1:], jnp.full((N_p, 1), big)],
                             axis=1)                  # min event pos > k

    # EOBn lane helper
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
    e_val, e_len = eob_lane(end_run, end_run > 0)

    zrl_val = jnp.broadcast_to(ac_co[0xF0], (N_p, W)).astype(jnp.uint32)
    z_lens = [jnp.where(zrl_ct >= i, ac_si[0xF0], 0) for i in (1, 2, 3)]
    symv = (r_sym << 4) + 1
    sym_val = ((ac_co[symv] << 1) | sgn.astype(jnp.uint32))
    sym_len = jnp.where(newly, ac_si[symv] + 1, 0)

    zero_u = jnp.zeros((N_p, W), jnp.uint32)
    pos_vals = jnp.stack([zrl_val, zero_u, zrl_val, zrl_val,
                          sym_val.astype(jnp.uint32), zero_u],
                         axis=2).reshape(N_p, 6 * W)
    pos_lens = jnp.stack([z_lens[0], bktA_len, z_lens[1], z_lens[2],
                          sym_len, bktB_len], axis=2).reshape(N_p, 6 * W)

    # block lanes: [flush EOBn][flush BE] + positions + [forced][forced BE]
    blk_vals = jnp.concatenate(
        [f_val[:, None], jnp.zeros((N_p, 1), jnp.uint32), pos_vals,
         fo_val[:, None], jnp.zeros((N_p, 1), jnp.uint32)], axis=1)
    blk_lens = jnp.concatenate(
        [f_len[:, None], flush_be[:, None], pos_lens,
         fo_len[:, None], forced_be[:, None]], axis=1)
    L = blk_vals.shape[1]                              # 4 + 6W
    seg_vals = jnp.concatenate(
        [blk_vals.reshape(S, restart * L), e_val[:, None],
         jnp.zeros((S, 1), jnp.uint32)], axis=1)
    seg_lens = jnp.concatenate(
        [blk_lens.reshape(S, restart * L), e_len[:, None],
         end_be[:, None]], axis=1)

    csum = jnp.cumsum(seg_lens, axis=1)
    bits = csum[:, -1]
    off = csum - seg_lens
    words = _scatter_bits(seg_vals, seg_lens, off, nwords)

    # ---- correction-bit scatter (explicit offsets) ----
    seg_of = jnp.arange(N_p, dtype=jnp.int32) // restart
    off_flat = off.reshape(-1)                         # (S * (r*L + 2),)
    seg_stride = restart * L + 2

    # local attach: event position q (1-based col) -> bucket lane index
    q = nxt_ev                                         # (N, W)
    has_local = prevnz & (q <= W)
    q0 = jnp.clip(q - 1, 0, W - 1)
    q_zrl = jnp.take_along_axis(zrl_ct, q0, axis=1) > 0
    bucket_lane = 2 + 6 * q0 + jnp.where(q_zrl, 1, 5)  # lane in same block
    # rank among bits attaching to q: prevnz in (prev_ev(q), p)
    pe_q = jnp.take_along_axis(prev_ev, q0, axis=1)    # (N, W) 1-based
    pz_at_peq = jnp.take_along_axis(pz_pad,
                                    jnp.maximum(pe_q - 1, 0), axis=1)
    rank_local = pz_excl - pz_at_peq

    # global attach: bits after the last event of the block
    is_global = prevnz & (q > W)
    # rank among the block's unflushed bits: prevnz after last_ev
    pz_at_le = jnp.take_along_axis(
        pz_pad, jnp.maximum(last_ev - 1, 0)[:, None], axis=1)
    rank_unflushed = pz_excl - pz_at_le
    ak = attach_kind[:, None]
    ab = jnp.clip(attach_blk, 0, N_p - 1)[:, None]
    g_lane = jnp.where(ak == 0, 1,
                       jnp.where(ak == 1, L - 1, -1))  # -1 = segment end
    seg_end_lane = restart * L + 1

    blk_ids = jnp.broadcast_to(
        jnp.arange(N_p, dtype=jnp.int32)[:, None], (N_p, W))
    tgt_blk = jnp.where(is_global, jnp.broadcast_to(ab, (N_p, W)), blk_ids)
    tgt_lane = jnp.where(is_global,
                         jnp.broadcast_to(g_lane, (N_p, W)), bucket_lane)
    # segment-end target: lane index relative to the segment, not a block
    use_seg_end = is_global & (jnp.broadcast_to(g_lane, (N_p, W)) < 0)
    tgt_lane = jnp.where(use_seg_end, 0, tgt_lane)     # placeholder
    seg_ids_b = jnp.broadcast_to(seg_of[:, None], (N_p, W))
    flat_lane = jnp.where(
        use_seg_end, seg_end_lane,
        (tgt_blk % restart) * L + tgt_lane)
    tgt_seg = jnp.where(use_seg_end, seg_ids_b, tgt_blk // restart)
    base_off = off_flat[(tgt_seg * seg_stride + flat_lane).reshape(-1)]         .reshape(N_p, W)
    rank = jnp.where(is_global,
                     jnp.broadcast_to(attach_base[:, None], (N_p, W))
                     + rank_unflushed, rank_local)
    bit_off = base_off + rank
    bit_len = jnp.where(has_local | is_global, 1, 0)
    words2 = _scatter_bits(
        corr.reshape(S, restart * W),
        bit_len.reshape(S, restart * W),
        bit_off.reshape(S, restart * W), nwords)
    return words | words2, bits.astype(jnp.int32)


def ac_refine_eob_bins(e: np.ndarray, br: np.ndarray, ev: np.ndarray,
                       ri: int) -> np.ndarray:
    """EOBn symbol counts for an AC-refinement scan from the per-block
    (e, br, ev) summaries: runs the sequential (eobrun, BE) flush schedule
    (mj_ac_refine_schedule) and bins every emitted run as
    (nbits(run)-1)<<4 — the host complement of
    symbols.ac_refine_histogram_parts_t."""
    from ..native import lib, i32p
    N = len(e)
    r = ri if ri > 0 else N
    S = -(-N // r)
    N_p = S * r
    def pad(a):
        out = np.zeros(N_p, np.int32)
        out[:N] = a
        return np.ascontiguousarray(out)
    e_, br_, ev_ = pad(e), pad(br), pad(ev)
    outs = [np.zeros(N_p, np.int32) for _ in range(7)]
    end_run = np.zeros(S, np.int32)
    end_be = np.zeros(S, np.int32)
    def ptr(a):
        return a.ctypes.data_as(i32p)
    lib.mj_ac_refine_schedule(
        ptr(e_), ptr(br_), ptr(ev_), N_p, r,
        ptr(outs[0]), ptr(outs[1]), ptr(outs[2]), ptr(outs[3]),
        ptr(outs[4]), ptr(outs[5]), ptr(outs[6]),
        ptr(end_run), ptr(end_be))
    hist = np.zeros(256, np.int64)
    for runs in (outs[0], outs[2], end_run):           # flush/forced/end
        rv = runs[runs > 0]
        if rv.size:
            cat = (np.floor(np.log2(rv)).astype(np.int64)) << 4
            np.add.at(hist, cat, 1)
    return hist
