"""Sparse coefficient transfer: masks + exactly-compacted value stream.

Quantized JPEG coefficient planes are ~90% zero at typical qualities, and
the remote-attached TPU tunnel charges ~50 ns per transferred ELEMENT
(docs/perf_notes.md) — downloading dense (64, N) int16 planes for host
entropy coding dominated round-1 encode time.

ENCODE download (`pack_planes_exact`): per-block 64-bit nonzero masks
plus the nonzero values concatenated in block order with NO slack —
level-1 per-block compaction by a stable argsort over the 64 zigzag keys
(a one-hot einsum materializes O(64*CAP*Nt) and OOMs 4K batches), then
boundary-scatter + cumsum + gather place values at their exact global
offsets. The host syncs the header first and downloads only the value
bucket the ACTUAL nonzero count needs (`fetch_exact`), then expands with
a popcount walk (native/entropy.cpp mj_sparse_expand_flat).

DECODE upload (`pack_host` / `expand_dev`): the host packs per-superblock
value slabs (native mj_sparse_pack) sized exactly by the known counts;
the device expands with popcount prefix sums and two one-hot einsums
(small here: decode superblocks cap at CAP_SB_CHOICES).

Overflow (a block denser than CAP_BLOCK, or more values than the static
capacity) is flagged and callers fall back to the dense transfer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CAP_BLOCK = 48
G = 8                       # blocks per superblock
CAP_SB_CHOICES = (128, 192, 256, 320)   # adaptive per-superblock slots


@functools.partial(jax.jit, static_argnames=("nt", "cap_sb"))
def expand_dev(masks, vals, nt: int, cap_sb: int):
    """Device-side inverse of _pack, for the decode-side sparse UPLOAD
    (host packs with native/post.cpp mj_sparse_pack): masks (nt, 2) int32
    = per-block 64-bit nonzero bitmaps, vals (S, cap_sb//2) int32 = each
    superblock's nonzero values packed int16-pairwise in (block, zigzag)
    order -> dense (64, nt) int16 zigzag planes. Same no-scatter strategy
    as _pack: positions from popcount prefix sums, values moved by two
    one-hot einsums (exact in f32 — each slot receives one int16)."""
    m2 = jax.lax.bitcast_convert_type(masks, jnp.uint32)     # (nt, 2)
    k = jnp.arange(64, dtype=jnp.uint32)[:, None]
    word = jnp.where(k < 32, m2[:, 0][None, :], m2[:, 1][None, :])
    nzb = ((word >> (k & 31)) & 1).astype(jnp.int32)         # (64, nt)
    rank = jnp.cumsum(nzb, axis=0) - nzb
    counts = jnp.sum(nzb, axis=0)                            # (nt,)

    S = nt // G
    c_sb = counts.reshape(S, G)
    start = jnp.cumsum(c_sb, axis=1) - c_sb                  # (S, G)

    # level 2 inverse: superblock value slabs -> per-block CAP_BLOCK slots
    r2 = jnp.arange(CAP_BLOCK, dtype=jnp.int32)
    tgt = start[:, :, None] + r2[None, None, :]              # (S, G, CAP)
    valid = r2[None, None, :] < c_sb[:, :, None]
    tgt = jnp.where(valid, tgt, -1).reshape(S, G * CAP_BLOCK)
    slot2 = jnp.arange(cap_sb, dtype=jnp.int32)
    oh2 = (tgt[:, None, :] == slot2[None, :, None]).astype(jnp.float32)
    v16 = jax.lax.bitcast_convert_type(vals, jnp.int16)      # (S, c/2, 2)
    v2 = v16.reshape(S, cap_sb).astype(jnp.float32)
    v1 = jnp.einsum("scl,sc->sl", oh2, v2,
                    preferred_element_type=jnp.float32)      # (S, G*CAP)
    v1 = v1.reshape(nt, CAP_BLOCK)

    # level 1 inverse: per-block slots -> 64 zigzag rows
    slot = jnp.arange(CAP_BLOCK, dtype=jnp.int32)
    oh1 = (jnp.where(nzb.astype(bool), rank, -1)[:, None, :]
           == slot[None, :, None]).astype(jnp.float32)       # (64, CAP, nt)
    dense = jnp.einsum("kct,tc->kt", oh1, v1,
                       preferred_element_type=jnp.float32)
    return dense.astype(jnp.int16)


def pack_host(planes_flat: np.ndarray, cap_choices=CAP_SB_CHOICES):
    """Host-side pack (native mj_sparse_count/mj_sparse_pack) of
    (nblocks, 64) int16 zigzag planes for upload. Pads nblocks to a
    multiple of G, picks the smallest capacity bucket that fits the worst
    superblock exactly (the host knows all counts — no overflow path).
    Returns (masks (nt,2) int32 view, vals (S, cap_sb//2) int32 view,
    nt, cap_sb) or None when no bucket fits (caller uploads dense) or a
    block has more than CAP_BLOCK nonzeros."""
    from ..native import lib, u32p, i16p, i32p as _i32p
    n = planes_flat.shape[0]
    nt = -(-n // G) * G
    if nt != n or not planes_flat.flags.c_contiguous:
        buf = np.zeros((nt, 64), np.int16)
        buf[:n] = planes_flat
        planes_flat = buf
    S = nt // G
    counts = np.empty(S, np.int32)
    maxc = lib.mj_sparse_count(planes_flat.ctypes.data_as(i16p), nt, G,
                               counts.ctypes.data_as(_i32p))
    cap_sb = next((c for c in cap_choices if maxc <= c), None)
    if cap_sb is None:
        return None
    masks = np.empty((nt, 2), np.uint32)
    vals = np.empty((S, cap_sb // 2), np.int32)
    rc = lib.mj_sparse_pack(planes_flat.ctypes.data_as(i16p), nt, G,
                            cap_sb, masks.ctypes.data_as(u32p),
                            vals.ctypes.data_as(i16p))
    if rc != 0:
        return None
    # per-block capacity: expand_dev's level-1 one-hot covers CAP_BLOCK
    # slots; a denser block (>CAP_BLOCK nonzeros) must go dense instead
    if maxc > CAP_BLOCK and np.any(
            np.sum(planes_flat.reshape(nt, 64) != 0, axis=1) > CAP_BLOCK):
        return None
    return masks.view(np.int32), vals, nt, cap_sb


# ---------------------------------------------------------------------------
# Exact global compaction: values concatenated in block order with NO
# per-superblock slack, so the D2H transfer is sized by the actual nonzero
# count (bucketed), not a density estimate.  Layout: header int32 buffer
# [per-block 64-bit masks | total_nz | overflow], plus a separate uint32
# value buffer of int16 pairs trimmed to the needed bucket after the
# header sync.  The host expands with a sequential popcount walk
# (native/entropy.cpp mj_sparse_expand_flat).
# ---------------------------------------------------------------------------

VALS_PER_BLOCK_CAP = 16          # static value capacity = Nt * this


@functools.partial(jax.jit, static_argnames=("nt",))
def _pack_exact(flat, nt: int):
    """flat (64, Nt) int16 zigzag planes -> (header int32
    [masks (Nt*2) | total | total_esc | overflow],
    lo bytes packed (capv//4,) uint32, escape int16 pairs (capv//8,)
    uint32)."""
    x = flat.astype(jnp.int32)                       # (64, Nt)
    nz = x != 0
    kidx = jnp.arange(64, dtype=jnp.uint32)[:, None]
    bit = jnp.where(kidx < 32, jnp.uint32(1) << (kidx & 31), 0)
    mask_lo = jnp.sum(jnp.where(nz, bit, 0), axis=0, dtype=jnp.uint32)
    bit_hi = jnp.where(kidx >= 32, jnp.uint32(1) << (kidx & 31), 0)
    mask_hi = jnp.sum(jnp.where(nz, bit_hi, 0), axis=0, dtype=jnp.uint32)

    nzi = nz.astype(jnp.int32)
    counts = jnp.sum(nzi, axis=0)                    # (Nt,)
    over_blk = jnp.any(counts > CAP_BLOCK)

    # level 1: per-block compaction by stable argsort of zigzag keys with
    # zeros pushed to the end — memory stays O(64*Nt) where the one-hot
    # einsum materializes O(64*CAP*Nt) and OOMs concurrent 4K batches
    kcol = jnp.arange(64, dtype=jnp.int32)[:, None]
    keys = jnp.where(nz, kcol, 64).T                 # (Nt, 64)
    order = jnp.argsort(keys, axis=1, stable=True)   # nonzeros first, by k
    idx = order[:, :CAP_BLOCK]                       # (Nt, CAP)
    v1 = jnp.take_along_axis(x.T, idx, axis=1)       # zeros at spare slots

    # global exact placement: value v of the stream lives in block
    # blk(v) = last block whose exclusive offset <= v (empty blocks tie
    # with their successor and lose), at slot v - offset[blk(v)]
    capv = nt * VALS_PER_BLOCK_CAP
    off = jnp.cumsum(counts) - counts                # (Nt,) exclusive
    total = off[-1] + counts[-1]
    over = over_blk | (total > capv)
    bnd = jnp.zeros((capv,), jnp.int32).at[off].add(
        jnp.ones((nt,), jnp.int32), mode="drop")
    blk = jnp.cumsum(bnd) - 1                        # (capv,)
    blk = jnp.clip(blk, 0, nt - 1)
    vidx = jnp.arange(capv, dtype=jnp.int32)
    slot_of = jnp.clip(vidx - off[blk], 0, CAP_BLOCK - 1)
    vals = v1[blk, slot_of]                          # gather (capv,) i32
    live = vidx < total
    vals = jnp.where(live, vals, 0)

    # byte stream with escapes: quantized AC values are mostly tiny, so
    # each value ships as ONE byte; 0x80 marks an escape whose real
    # int16 rides in a side stream (mostly DC terms) — ~1.3 B/value vs
    # 2, directly tunnel-bound throughput
    esc = live & ((vals < -127) | (vals > 127))
    lo = jnp.where(esc, jnp.int32(-128), vals).astype(jnp.uint32) \
        & jnp.uint32(0xFF)
    quad = lo.reshape(capv // 4, 4)
    words_lo = (quad[:, 0] | (quad[:, 1] << 8)
                | (quad[:, 2] << 16) | (quad[:, 3] << 24))
    # escape side stream: exact compaction by scatter to the escape rank
    # (capacity = half the value capacity; JPEG data escapes are mostly
    # DC terms, ~15% of values at q75 — pathological data falls back to
    # the dense download via the overflow flag)
    cap_esc = capv // 2
    eidx = jnp.cumsum(esc.astype(jnp.int32)) - esc.astype(jnp.int32)
    total_esc = eidx[-1] + esc[-1].astype(jnp.int32)
    over = over | (total_esc > cap_esc)
    edst = jnp.where(esc, eidx, cap_esc)
    evals = jnp.zeros((cap_esc,), jnp.int32).at[edst].add(
        vals, mode="drop")
    evals = evals.astype(jnp.uint32) & jnp.uint32(0xFFFF)
    epair = evals.reshape(cap_esc // 2, 2)
    words_esc = epair[:, 0] | (epair[:, 1] << 16)

    masks = jnp.stack([mask_lo, mask_hi], axis=1).reshape(-1)
    header = jnp.concatenate([
        jax.lax.bitcast_convert_type(masks, jnp.int32),
        total[None].astype(jnp.int32),
        total_esc[None].astype(jnp.int32),
        over.astype(jnp.int32)[None]])
    return header, words_lo, words_esc


TRIM_WORDS_STEP = 32768          # 128 KB granularity bounds program cache


@functools.partial(jax.jit, static_argnames=("n",))
def _trim_flat(words, n: int):
    return words[:n]


def pack_planes_exact(finals, comps, b: int):
    """finals: tuple per comp of (64, B*n_c) int16 device arrays ->
    (header_dev, (lo_dev, esc_dev), nt, n_tot). Block order:
    image-major, comps in order, raster blocks."""
    per_img = [f.reshape(64, b, -1) for f in finals]
    flat = jnp.concatenate(per_img, axis=2)          # (64, B, n_tot)
    n_tot = flat.shape[2]
    nt = b * n_tot
    flat = flat.reshape(64, nt)
    header, lo, escw = _pack_exact(flat, nt)
    return header, (lo, escw), nt, n_tot


def _bucket(n: int) -> int:
    return -(-max(n, 1) // TRIM_WORDS_STEP) * TRIM_WORDS_STEP


def fetch_exact(header_dev, words_dev, nt: int):
    """Sync the header, then only the needed byte/escape buckets.
    -> (masks uint32 (nt*2,), lo uint8 view, esc int16 view, total) or
    None on overflow (caller falls back to the dense download)."""
    header = np.asarray(header_dev)
    if int(header[-1]):
        return None
    total = int(header[-3])
    total_esc = int(header[-2])
    masks = header[: nt * 2].view(np.uint32)
    lo_dev, esc_dev = words_dev
    nb = _bucket((total + 3) // 4)
    if nb < lo_dev.shape[0]:
        lo_dev = _trim_flat(lo_dev, nb)
    ne = _bucket((total_esc + 1) // 2)
    if total_esc == 0:
        esc = np.zeros(0, np.int16)
    else:
        if ne < esc_dev.shape[0]:
            esc_dev = _trim_flat(esc_dev, ne)
        esc = np.asarray(esc_dev).view(np.int16)
    lo = np.asarray(lo_dev).view(np.uint8)
    from ..utils import xfer
    xfer.add_d2h(header.nbytes + lo.nbytes + esc.nbytes)
    return masks, lo, esc, total


def expand_flat_to_planes(masks: np.ndarray, lo: np.ndarray,
                          esc: np.ndarray, nt: int, n_tot: int, b: int,
                          comps) -> list:
    """Host expansion of the exact layout -> per image per-comp
    (bh, bw, 64) int16 planes (native mj_sparse_expand_flat)."""
    from ..native import lib, u32p, u8p, i16p
    out = np.zeros((nt, 64), np.int16)
    rc = lib.mj_sparse_expand_flat(
        np.ascontiguousarray(masks).ctypes.data_as(u32p),
        np.ascontiguousarray(lo).ctypes.data_as(u8p),
        np.ascontiguousarray(esc).ctypes.data_as(i16p),
        nt, len(lo), len(esc), out.ctypes.data_as(i16p))
    if rc != 0:
        return None
    images = []
    off = 0
    for i in range(b):
        planes = []
        for g in comps:
            n = g.bh * g.bw
            planes.append(out[off:off + n].reshape(g.bh, g.bw, 64))
            off += n
        images.append(planes)
    return images


# ---------------------------------------------------------------------------
# Decode-direction exact flat upload: the same [masks | 1-byte values with
# 0x80-escape | int16 escapes] layout as the ENCODE download
# (pack_planes_exact), packed on host in numpy and expanded on device.
# Replaces the superblock int16-pair upload whose worst-superblock bucket
# slack measured ~1.3 B/px on real corpora (~0.4 B/px here): host sizes
# the value buckets exactly, so there is NO overflow path, and a block
# may hold up to all 64 nonzeros.
# ---------------------------------------------------------------------------

def _relbucket(n: int, floor_step: int) -> int:
    """Round n up to a coarse-mantissa bucket (<=20% relative
    slack, never finer than floor_step). The bucket is a STATIC
    shape of the downstream jitted render program — fine-grained
    absolute steps would recompile it every time a batch's nonzero
    count crossed a step (30-60 s per remote TPU compile); relative
    buckets keep the variants per geometry to a handful."""
    n = max(n, 1)
    step = max(floor_step, 1 << max((n - 1).bit_length() - 3, 0))
    return -(-n // step) * step


def pack_flat_host(flat: np.ndarray):
    """(n, 64) int16 zigzag planes -> (masks (nt*2,) int32 view,
    lo (capv,) uint8, esc (cape//2*2,) int16, nt, total, nesc).
    Buckets are exact-by-construction (the host knows all counts)."""
    n = flat.shape[0]
    nt = n
    m = flat != 0                                  # (n, 64)
    masks = np.packbits(m, axis=1, bitorder="little")   # (n, 8) u8
    vals = flat[m].astype(np.int32)                # block-major, k-order
    total = int(vals.size)
    esc_mask = (vals < -127) | (vals > 127)
    esc = vals[esc_mask].astype(np.int16)
    nesc = int(esc.size)
    capv = _relbucket(total, 16384)
    cape = _relbucket(nesc, 2048)
    lo = np.zeros(capv, np.uint8)
    lo[:total] = np.where(esc_mask, 0x80, vals & 0xFF).astype(np.uint8)
    esc_buf = np.zeros(cape, np.int16)
    esc_buf[:nesc] = esc
    return (np.ascontiguousarray(masks).view(np.int32).reshape(-1),
            lo, esc_buf, nt, total, nesc)


@functools.partial(jax.jit, static_argnames=("nt", "capv", "cape"))
def expand_flat_dev(masks, lo, esc, nt: int, capv: int, cape: int):
    """Device inverse of pack_flat_host: masks (nt*2,) int32, lo (capv,)
    uint8, esc (cape,) int16 -> dense (64, nt) int16 zigzag planes.
    Value slots map to (block, rank) by the boundary-scatter + cummax
    trick; rank -> zigzag position by a bitonic sort over the 64 mask
    bits (no per-position gathers)."""
    m2 = jax.lax.bitcast_convert_type(masks.reshape(nt, 2), jnp.uint32)
    k = np.arange(64, dtype=np.int32)
    word = jnp.where(k[None, :] < 32, m2[:, 0:1], m2[:, 1:2])
    nzb = ((word >> (k[None, :] & 31).astype(jnp.uint32)) & 1)         .astype(jnp.int32)                            # (nt, 64)
    counts = jnp.sum(nzb, axis=1)
    off = jnp.cumsum(counts) - counts
    total = off[-1] + counts[-1]

    keys = jnp.where(nzb > 0, k[None, :], np.int32(64))
    pos_s = jax.lax.sort(keys, dimension=-1)          # set bits ascending

    vidx = jnp.arange(capv, dtype=jnp.int32)
    bnd = jnp.zeros((capv,), jnp.int32).at[off].add(
        jnp.ones((nt,), jnp.int32), mode="drop")
    # empty blocks tie with their successor at the same offset and lose
    # (cumsum counts every block with off <= v, so blk is the LAST one)
    blk = jnp.clip(jnp.cumsum(bnd) - 1, 0, nt - 1)
    r = jnp.clip(vidx - off[blk], 0, 63)
    kpos = pos_s.reshape(-1)[blk * 64 + r]

    byte = lo.astype(jnp.int32)
    is_esc = byte == 0x80
    erank = jnp.cumsum(is_esc.astype(jnp.int32)) - is_esc.astype(jnp.int32)
    ev = esc[jnp.clip(erank, 0, cape - 1)].astype(jnp.int32)
    small = jnp.where(byte >= 128, byte - 256, byte)
    val = jnp.where(is_esc, ev, small)
    live = vidx < total
    dense = jnp.zeros((64 * nt,), jnp.int32).at[
        jnp.where(live, kpos * nt + blk, 64 * nt)].add(
        jnp.where(live, val, 0), mode="drop")
    return dense.reshape(64, nt).astype(jnp.int16)
