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

# worst-case bits per 8x8 block: DC (16-bit code + 11 magnitude bits) +
# 63 AC symbols of (16-bit code + 10 magnitude bits); ZRL runs only
# replace (never add to) nonzero positions, so this bounds every block
MAX_BLOCK_BITS = 27 + 63 * 26


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


def _dc_deltas(dc_seq, seg_blocks):
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
        deltas = _dc_deltas(dc_seq, restart * vh) \
            .reshape(num_mcus_p, vh)
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

    # absolute bit offset of every lane inside its segment
    csum = jnp.cumsum(lens, axis=1)
    bits = csum[:, -1]
    off = csum - lens

    # split each lane into two u32 word contributions (MSB-first stream)
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
    return out.reshape(S, nwords), bits.astype(jnp.int32)


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
                       trailing_rst: bool = False) -> bytes:
    """Baseline sequential interleaved scan, bit-packed on device per
    restart segment.  planes: per-comp (bh_pad, bw_pad, 64) zigzag
    coefficient arrays (device or host); dc_tables/ac_tables: per-comp
    (ehufco uint32[256], ehufsi uint8[256]) pairs.  Byte-identical to
    the serial encoder."""
    num_mcus = mcus_x * mcus_y
    r = restart if restart > 0 else num_mcus
    blocks_per_mcu = sum(h * v for h, v in geoms)
    nwords = -(-(r * blocks_per_mcu * MAX_BLOCK_BITS) // 32) + 1
    dc_tab = np.stack([np.stack([co.astype(np.uint32),
                                 si.astype(np.uint32)])
                       for co, si in dc_tables])
    ac_tab = np.stack([np.stack([co.astype(np.uint32),
                                 si.astype(np.uint32)])
                       for co, si in ac_tables])
    words, bits = _pack_segments(
        tuple(jnp.asarray(p) for p in planes),
        jnp.asarray(dc_tab), jnp.asarray(ac_tab),
        tuple(geoms), mcus_x, mcus_y, r, nwords)
    return _finish_segments(np.asarray(words), np.asarray(bits),
                            restart > 0, rst_offset, trailing_rst)
