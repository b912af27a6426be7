"""Device-side entropy symbolization and histogramming.

Computes baseline-Huffman symbol statistics for whole coefficient planes as
batched array ops: per-block (run,size) AC symbols, ZRL/EOB counts, and DC
delta categories in MCU traversal order. These are the `dc_counts/ac_counts`
arrays of the reference's gather pass (/root/reference/jchuff.c:886-944)
computed without a sequential MCU walk — and the building block for
multi-chip shared-table encoding (histograms psum over the device mesh).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nbits(v):
    v = v.astype(jnp.int32)
    return jnp.where(v > 0, 32 - jax.lax.clz(jnp.maximum(v, 1)), 0)


def hist256(sym, w):
    """Weighted 256-bin histogram as a one-hot contraction (MXU) instead
    of a scatter-add (~8.7 ns per scattered element on TPU — a (63, N)
    plane histogram costs ~28 ms as a scatter, <1 ms as a matmul).
    sym: int array (any shape) with values in [0, 256); w: same-shape
    int32 weights. Counts must stay < 2^24 per bin (f32-exact)."""
    sf = sym.reshape(-1)
    wf = w.reshape(-1).astype(jnp.float32)
    pad = (-sf.shape[0]) % 256
    if pad:
        sf = jnp.pad(sf, (0, pad))
        wf = jnp.pad(wf, (0, pad))
    c = sf.shape[0] // 256
    s2 = sf.reshape(c, 256)
    w2 = wf.reshape(c, 256)
    oh = (s2[:, :, None] == jnp.arange(256, dtype=sf.dtype)[None, None, :]
          ).astype(jnp.float32)                      # (c, 256, 256)
    return jnp.einsum("clv,cl->v", oh, w2,
                      preferred_element_type=jnp.float32).astype(jnp.int32)


def ac_histogram(zz: jnp.ndarray) -> jnp.ndarray:
    """(N, 64) int zigzag blocks -> (256,) int32 AC symbol counts.

    Sequential-scan semantics per block: runs of zeros before each nonzero
    AC coefficient produce (run>>4) ZRL symbols plus ((run&15)<<4 | nbits);
    trailing zeros produce one EOB (symbol 0) unless position 63 is nonzero.
    """
    ac = zz[:, 1:].astype(jnp.int32)                   # (N, 63)
    nz = ac != 0
    pos = jnp.arange(1, 64)

    # previous nonzero position (or 0) at each position
    idx = jnp.where(nz, pos[None, :], 0)
    prev_incl = jax.lax.cummax(idx, axis=1)            # last nz pos <= i
    prev_excl = jnp.concatenate(
        [jnp.zeros((ac.shape[0], 1), jnp.int32), prev_incl[:, :-1]], axis=1)
    run = pos[None, :] - prev_excl - 1                 # zeros before pos

    size = _nbits(jnp.abs(ac))
    sym = ((run & 15) << 4) | size                     # valid where nz
    zrl_count = jnp.where(nz, run >> 4, 0)

    hist = hist256(jnp.where(nz, sym, 0), nz.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(zrl_count))
    # EOB: one per block whose last AC (pos 63) is zero... unless all-zero
    # block (still EOB). EOB emitted iff trailing zeros exist.
    has_trailing = ac[:, -1] == 0
    hist = hist.at[0x00].add(jnp.sum(has_trailing.astype(jnp.int32)))
    return hist


def dc_histogram_interleaved(plane: jnp.ndarray, h: int, v: int,
                             mcus_x: int, mcus_y: int) -> jnp.ndarray:
    """DC delta-category counts over interleaved-MCU traversal order.

    plane: (bh_pad, bw_pad, 64) zigzag coeffs. The DC predictor chains
    across the component's blocks in MCU order (jchuff encode_one_block).
    """
    dc = plane[:, :, 0].astype(jnp.int32)
    # reorder to MCU traversal: (my, mx, v, h)
    m = dc.reshape(mcus_y, v, mcus_x, h)
    seq = jnp.transpose(m, (0, 2, 1, 3)).reshape(-1)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), seq[:-1]])
    delta = seq - prev
    size = _nbits(jnp.abs(delta))
    return hist256(size, jnp.ones_like(size))


def dc_histogram_restart(plane: jnp.ndarray, h: int, v: int,
                         mcus_x: int, mcus_y: int, r: int,
                         Al: int = 0) -> jnp.ndarray:
    """dc_histogram_interleaved with the predictor reset every r MCUs
    (restart intervals, jchuff.c emit_restart: last_dc_val zeroed).
    Al > 0: point-transformed DC (arithmetic shift, jcphuff DC_first)."""
    dc = plane[:, :, 0].astype(jnp.int32) >> Al
    m = dc.reshape(mcus_y, v, mcus_x, h)
    seq = jnp.transpose(m, (0, 2, 1, 3)).reshape(-1)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), seq[:-1]])
    bpm = h * v
    idx = jnp.arange(seq.shape[0])
    prev = jnp.where((idx % (r * bpm)) == 0, 0, prev)
    size = _nbits(jnp.abs(seq - prev))
    return hist256(size, jnp.ones_like(size))


def dc_histogram_single(plane: jnp.ndarray, bw: int, bh: int) -> jnp.ndarray:
    """DC histogram for a non-interleaved scan (raster over real blocks)."""
    dc = plane[:bh, :bw, 0].astype(jnp.int32).reshape(-1)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), dc[:-1]])
    size = _nbits(jnp.abs(dc - prev))
    return hist256(size, jnp.ones_like(size))


# ---------------------------------------------------------------------------
# Coefficient-major ("t") layout + progressive AC-first statistics.
# ---------------------------------------------------------------------------

def ac_first_histogram_t(zz: jnp.ndarray, Ss: int = 1, Se: int = 63,
                         ri: int = 0, Al: int = 0) -> jnp.ndarray:
    """Exact phuff AC-first (Ah=0, Al=0) symbol counts for one component.

    zz: (64, N) zigzag coefficients in SCAN ORDER (raster over real blocks).
    Reproduces encode_mcu_AC_first gather semantics incl. cross-block EOB-run
    accumulation and the 0x7FFF forced flush (/root/reference/jcphuff.c).
    ri > 0: restart interval in blocks -- EOB runs flush at each boundary
    (emit_restart, jcphuff.c), so segments are statistically independent.
    """
    N = zz.shape[1]
    if ri and ri < N:
        nfull = N // ri
        hists = []
        if nfull:
            segs = zz[:, :nfull * ri].reshape(64, nfull, ri)
            hists.append(jax.vmap(
                lambda a: _ac_first_hist_seg(a, Ss, Se, Al),
                in_axes=1)(segs).sum(0))
        if N - nfull * ri:
            hists.append(_ac_first_hist_seg(zz[:, nfull * ri:], Ss, Se, Al))
        return sum(hists)
    return _ac_first_hist_seg(zz, Ss, Se, Al)


def _ac_first_hist_seg(zz: jnp.ndarray, Ss: int, Se: int,
                       Al: int = 0) -> jnp.ndarray:
    band = zz[Ss:Se + 1].astype(jnp.int32)             # (L, N)
    if Al:
        # point transform: shift magnitude (jcphuff.c AC_first)
        band = jnp.sign(band) * (jnp.abs(band) >> Al)
    L, N = band.shape
    nz = band != 0
    pos = jnp.arange(L)[:, None]

    # per-block run/size symbols (within-block zero runs)
    idx = jnp.where(nz, pos + 1, 0)                    # 1-based to use 0=none
    prev_incl = jax.lax.cummax(idx, axis=0)
    prev_excl = jnp.concatenate(
        [jnp.zeros((1, N), jnp.int32), prev_incl[:-1]], axis=0)
    run = pos + 1 - prev_excl - 1
    size = _nbits(jnp.abs(band))
    sym = ((run & 15) << 4) | size
    zrl = jnp.where(nz, run >> 4, 0)

    hist = hist256(jnp.where(nz, sym, 0), nz.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(zrl))

    # EOB runs across blocks: a run starts at a block with trailing zeros,
    # extends over following all-zero blocks, ends before the next block
    # containing any nonzero (or at stream end).
    has_nz = jnp.any(nz, axis=0)                       # (N,)
    trailing = ~nz[-1]                                 # block ends early
    bidx = jnp.arange(N)
    # previous nonzero block strictly before b (or -1)
    nzpos = jnp.where(has_nz, bidx, -1)
    prev_nzb_incl = jax.lax.cummax(nzpos)
    prev_nzb = jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                prev_nzb_incl[:-1]])
    # at each nonzero block b: pending run R = gap zeros + trailing(prev_nzb)
    gap = bidx - prev_nzb - 1
    prev_trail = jnp.where(prev_nzb >= 0,
                           jnp.take(trailing, jnp.maximum(prev_nzb, 0)),
                           False)
    run_at = gap + prev_trail.astype(jnp.int32)        # run emitted before b
    emit_here = has_nz & (run_at > 0)

    # final run at stream end
    last_nzb = prev_nzb_incl[-1]
    tail_gap = (N - 1) - last_nzb
    last_trail = jnp.where(last_nzb >= 0,
                           jnp.take(trailing, jnp.maximum(last_nzb, 0)),
                           False)
    final_run = jnp.where(last_nzb >= 0,
                          tail_gap + last_trail.astype(jnp.int32),
                          N)  # no nonzero block at all: N all-zero blocks

    def add_runs(hist, runs, valid):
        # split runs at the 0x7FFF forced-flush boundary
        k = jnp.where(valid, runs // 0x7FFF, 0)
        r = jnp.where(valid, runs % 0x7FFF, 0)
        # k full symbols of EOB(32767): category nbits(32767)-1 = 14
        hist = hist.at[14 << 4].add(jnp.sum(k))
        cat = jnp.maximum(_nbits(r) - 1, 0)
        w = (valid & (r > 0)).astype(jnp.int32)
        hist = hist.at[jnp.where(w > 0, cat << 4, 0).reshape(-1)] \
            .add(w.reshape(-1))
        return hist

    hist = add_runs(hist, run_at, emit_here)
    hist = add_runs(hist, final_run[None], jnp.array([True])[None])
    return hist


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def ac_refine_histogram_parts_t(zz: jnp.ndarray, Ss: int, Se: int,
                                Al: int):
    """Device part of the AC-refinement gather (jcphuff.c
    encode_mcu_AC_refine, gather mode): per-block (r,1) and ZRL symbol
    counts plus the (e, br, ev) block summaries. EOBn bins require the
    sequential (eobrun, BE>937) flush schedule — add them on host with
    mj_ac_refine_schedule (see entropy.cpp).

    zz: (64, N) zigzag coefficients, raster block order.
    -> (hist (256,) int32 without EOBn bins, e (N,), br (N,), ev (N,))."""
    band = zz[Ss:Se + 1].astype(jnp.int32)             # (W, N)
    W, N = band.shape
    absv = jnp.abs(band) >> Al
    newly = (absv == 1).transpose()                    # (N, W)
    prevnz = (absv > 1).transpose()
    zero = (absv == 0).transpose()

    kk = jnp.arange(W, dtype=jnp.int32)[None, :]
    newly_pos = jnp.where(newly, kk + 1, 0)
    EOB = jnp.max(newly_pos, axis=1)
    le_eob = (kk + 1) <= EOB[:, None]
    zi = jnp.cumsum(zero.astype(jnp.int32), axis=1)
    zi_excl = zi - zero.astype(jnp.int32)
    ln = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32),
         jax.lax.cummax(newly_pos, axis=1)[:, :-1]], axis=1)
    zi_at_ln = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((N, 1), jnp.int32), zi_excl], axis=1),
        ln, axis=1)
    Zw = zi_excl - zi_at_ln
    nz = ~zero
    nz_pos = jnp.where(nz, kk + 1, 0)
    pnz = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32),
         jax.lax.cummax(nz_pos, axis=1)[:, :-1]], axis=1)
    in_win = pnz > ln
    Zw_j = jnp.where(in_win,
                     jnp.take_along_axis(
                         jnp.concatenate([jnp.zeros((N, 1), jnp.int32),
                                          Zw], axis=1), pnz, axis=1), 0)
    r_before = (Zw_j & 15) + (Zw - Zw_j)
    zrl_ct = jnp.where(nz & le_eob, r_before >> 4, 0)
    r_sym = r_before & 15

    sym = (r_sym << 4) + 1
    hist = hist256(jnp.where(newly, sym, 0), newly.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(zrl_ct))

    ev = (EOB > 0).astype(jnp.int32)
    e = (EOB < W).astype(jnp.int32)
    br = jnp.sum(prevnz & ((kk + 1) > EOB[:, None]), axis=1) \
        .astype(jnp.int32)
    return hist, e, br, ev
