"""Sparse coefficient download: two-level one-hot compaction, no scatters.

Quantized JPEG coefficient planes are ~90% zero at typical qualities, and
the remote-attached TPU tunnel charges ~50 ns per transferred ELEMENT
(docs/perf_notes.md) — downloading dense (64, N) int16 planes for
host entropy coding dominated round-1 encode time. This module packs the
planes on device into [per-block 64-bit nonzero masks | compacted nonzero
values] using only elementwise ops, cumsums, and one-hot MATMULS (MXU),
because TPU scatters cost ~8.7 ns per scattered element while batched
one-hot contractions run at MXU speed (docs/perf_notes.md):

  level 1: each block's <=CAP_BLOCK nonzero values gather into fixed
           slots via a (blocks, CAP_BLOCK, 64) one-hot einsum — exact in
           f32 because each slot receives exactly one int16 value;
  level 2: each superblock of G blocks compacts its <=G*CAP_BLOCK slots
           into CAP_SB via a second one-hot einsum.

The host expands with a popcount walk (native/entropy.cpp
mj_sparse_expand). Per-block or per-superblock overflow (too many nonzero
values for the static capacities) is flagged and callers fall back to the
dense download — at quality 75 the densities are ~7 values/block vs
CAP_BLOCK=32, CAP_SB=G*16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CAP_BLOCK = 48
G = 8                       # blocks per superblock
CAP_SB_CHOICES = (128, 192, 256, 320)   # adaptive per-superblock slots


def choose_cap_sb(nz_estimate_per_block: float) -> int:
    """Pick the superblock value capacity from a density estimate (mean
    nonzeros per block, e.g. from the pre-trellis symbol histograms) with
    a 2.4x safety factor for local variance; measured maxima on the Kodak
    corpus are ~2.2x the mean (docs/perf_notes.md)."""
    want = (nz_estimate_per_block + 1.0) * G * 2.4
    for c in CAP_SB_CHOICES:
        if want <= c:
            return c
    return CAP_SB_CHOICES[-1]


@functools.partial(jax.jit, static_argnames=("nt", "cap_sb"))
def _pack(flat, nt: int, cap_sb: int):
    """flat: (64, Nt) int16 zigzag planes, block-major over the batch.
    -> int32 buffer [masks (Nt*2) | sb_counts (S) | values (S*CAP_SB/2) |
    overflow flag (1)]."""
    x = flat.astype(jnp.int32)                       # (64, Nt)
    nz = x != 0
    kidx = jnp.arange(64, dtype=jnp.uint32)[:, None]
    bit = jnp.where(kidx < 32, jnp.uint32(1) << (kidx & 31), 0)
    mask_lo = jnp.sum(jnp.where(nz, bit, 0), axis=0, dtype=jnp.uint32)
    bit_hi = jnp.where(kidx >= 32, jnp.uint32(1) << (kidx & 31), 0)
    mask_hi = jnp.sum(jnp.where(nz, bit_hi, 0), axis=0, dtype=jnp.uint32)

    nzi = nz.astype(jnp.int32)
    rank = jnp.cumsum(nzi, axis=0) - nzi             # rank within block
    counts = jnp.sum(nzi, axis=0)                    # (Nt,)
    over_blk = jnp.any(counts > CAP_BLOCK)

    # level 1: (Nt, CAP_BLOCK) <- one-hot over the 64 coefficient rows
    slot = jnp.arange(CAP_BLOCK, dtype=jnp.int32)
    oh1 = (jnp.where(nz, rank, -1)[:, None, :]
           == slot[None, :, None]).astype(jnp.float32)   # (64, CAP, Nt)
    v1 = jnp.einsum("kct,kt->tc", oh1, x.astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # (Nt, CAP)

    # level 2: superblocks of G blocks -> cap_sb slots
    S = nt // G
    c_sb = counts.reshape(S, G)
    sb_counts = jnp.sum(c_sb, axis=1)                # (S,)
    over_sb = jnp.any(sb_counts > cap_sb)
    start = jnp.cumsum(c_sb, axis=1) - c_sb          # value offset in SB
    # target slot of (block g, local rank r) = start[g] + r
    r2 = jnp.arange(CAP_BLOCK, dtype=jnp.int32)
    tgt = start[:, :, None] + r2[None, None, :]      # (S, G, CAP)
    valid = r2[None, None, :] < c_sb[:, :, None]
    tgt = jnp.where(valid, tgt, -1).reshape(S, G * CAP_BLOCK)
    slot2 = jnp.arange(cap_sb, dtype=jnp.int32)
    oh2 = (tgt[:, None, :] == slot2[None, :, None]).astype(jnp.float32)
    v1_sb = v1.reshape(S, G * CAP_BLOCK)
    v2 = jnp.einsum("scl,sl->sc", oh2, v1_sb,
                    preferred_element_type=jnp.float32)  # (S, CAP_SB)

    vals16 = v2.astype(jnp.int16).reshape(S, cap_sb // 2, 2)
    vals32 = jax.lax.bitcast_convert_type(vals16, jnp.int32) \
        .reshape(-1)
    masks = jnp.stack([mask_lo, mask_hi], axis=1).reshape(-1)
    over = (over_blk | over_sb).astype(jnp.int32)[None]
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(masks, jnp.int32),
        sb_counts.astype(jnp.int32),
        vals32, over])


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
    """flat (64, Nt) int16 zigzag planes -> (header (Nt*2+2,) int32,
    words (Nt*VALS_PER_BLOCK_CAP//2,) uint32)."""
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
    vals = v1[blk, slot_of]                          # gather (capv,)
    vals = jnp.where(vidx < total, vals, 0).astype(jnp.uint32) \
        & jnp.uint32(0xFFFF)
    pair = vals.reshape(capv // 2, 2)
    words = pair[:, 0] | (pair[:, 1] << 16)

    masks = jnp.stack([mask_lo, mask_hi], axis=1).reshape(-1)
    header = jnp.concatenate([
        jax.lax.bitcast_convert_type(masks, jnp.int32),
        total[None].astype(jnp.int32),
        over.astype(jnp.int32)[None]])
    return header, words


TRIM_WORDS_STEP = 65536          # 256 KB granularity bounds program cache


@functools.partial(jax.jit, static_argnames=("n",))
def _trim_flat(words, n: int):
    return words[:n]


def pack_planes_exact(finals, comps, b: int):
    """finals: tuple per comp of (64, B*n_c) int16 device arrays ->
    (header_dev, words_dev, nt, n_tot). Same block order as pack_planes:
    image-major, comps in order, raster blocks."""
    per_img = [f.reshape(64, b, -1) for f in finals]
    flat = jnp.concatenate(per_img, axis=2)          # (64, B, n_tot)
    n_tot = flat.shape[2]
    nt = b * n_tot
    flat = flat.reshape(64, nt)
    header, words = _pack_exact(flat, nt)
    return header, words, nt, n_tot


def fetch_exact(header_dev, words_dev, nt: int):
    """Sync the header, then only the needed value-word bucket.
    -> (masks uint32 (nt*2,), vals int16 view, total) or None on
    overflow (caller falls back to the dense download)."""
    header = np.asarray(header_dev)
    if int(header[-1]):
        return None
    total = int(header[-2])
    masks = header[: nt * 2].view(np.uint32)
    need = (total + 1) // 2
    bucket = -(-max(need, 1) // TRIM_WORDS_STEP) * TRIM_WORDS_STEP
    if bucket < words_dev.shape[0]:
        words_dev = _trim_flat(words_dev, bucket)
    words = np.asarray(words_dev)
    return masks, words.view(np.int16), total


def expand_flat_to_planes(masks: np.ndarray, vals: np.ndarray,
                          nt: int, n_tot: int, b: int, comps) -> list:
    """Host expansion of the exact layout -> per image per-comp
    (bh, bw, 64) int16 planes (native mj_sparse_expand_flat)."""
    from ..native import lib, u32p, i16p
    out = np.zeros((nt, 64), np.int16)
    rc = lib.mj_sparse_expand_flat(
        np.ascontiguousarray(masks).ctypes.data_as(u32p),
        np.ascontiguousarray(vals).ctypes.data_as(i16p),
        nt, len(vals), out.ctypes.data_as(i16p))
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


def pack_planes(finals, comps, b: int, cap_sb: int = 192):
    """finals: tuple per comp of (64, B*n_c) int16 device arrays.
    -> (buf_dev int32 device array, nt, layout info) where the buffer is
    ordered image-major, comps in order, raster blocks; Nt is padded to a
    multiple of G with zero blocks (stripped on expand)."""
    ncomp = len(finals)
    per_img = [f.reshape(64, b, -1) for f in finals]
    flat = jnp.concatenate(per_img, axis=2)          # (64, B, n_tot)
    n_tot = flat.shape[2]
    flat = flat.reshape(64, b * n_tot)
    nt = b * n_tot
    pad = (-nt) % G
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
        nt += pad
    return _pack(flat, nt, cap_sb), nt, n_tot, cap_sb


def expand_to_planes(buf: np.ndarray, nt: int, n_tot: int, b: int,
                     comps, cap_sb: int = 192) -> list:
    """Host expansion -> per image list of per-comp (bh, bw, 64) int16
    planes. Returns None when the device flagged overflow."""
    from ..native import lib, u32p, i16p
    import ctypes
    if int(buf[-1]):
        return None
    S = nt // G
    masks = buf[: nt * 2].view(np.uint32)
    sb_counts = buf[nt * 2: nt * 2 + S]
    vals = buf[nt * 2 + S: nt * 2 + S + S * (cap_sb // 2)].view(np.int16)
    out = np.zeros((nt, 64), np.int16)
    rc = lib.mj_sparse_expand(
        masks.ctypes.data_as(u32p), vals.ctypes.data_as(i16p),
        sb_counts.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        nt, G, cap_sb, out.ctypes.data_as(i16p))
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
