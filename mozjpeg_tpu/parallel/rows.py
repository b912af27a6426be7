"""Single-image scale-out: iMCU-row sharding over a device mesh.

The reference is a strictly sequential single-image pipeline; its only
intra-image parallelism affordance is the restart interval (RST markers
reset the DC predictor and byte-align the stream, SURVEY.md §2.6). This
module is the TPU-native realization: one large image's iMCU rows are
sharded over the mesh's 'rows' axis, every device runs the full pixel
pipeline (color convert, downsample, dering, DCT, quantize) on its band,
DC/AC symbol histograms are all-reduced with psum so the optimal Huffman
tables are global, and each shard's restart segments are bit-packed on
device and stitched host-side with correctly-numbered RSTn markers.

Byte-exact contract: the output equals the single-device encoder's output
for the same config with `restart_in_rows=restart_rows` — verified in
tests/test_parallel.py.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, **kw):
    """shard_map with replication checking off: the scan carries inside
    the pipeline (sequential-exact f32 accumulations) start as replicated
    zeros and become shard-varying, which the vma checker rejects."""
    try:
        return _shard_map(f, check_vma=False, **kw)
    except TypeError:
        return _shard_map(f, check_rep=False, **kw)

from ..codec import pipeline
from ..ops import color, dct, layout, quant, sample, symbols


def _rows_mesh(mesh: Optional[Mesh], mcus_y: int,
               restart_rows: int = 1, mcus_x: int = 1) -> Mesh:
    """A 1-D 'rows' mesh whose size divides the image's iMCU row count and
    whose per-shard row count is a multiple of restart_rows (segments must
    not cross shards); excess devices are left idle. A single shard is
    always valid (no cross-shard boundaries), so this never fails — e.g.
    when restart_rows does not divide mcus_y, or when the DRI interval
    would exceed the 16-bit cap and segment alignment cannot hold."""
    devices = (mesh.devices.reshape(-1) if mesh is not None
               else np.array(jax.devices()))
    n = len(devices)
    if restart_rows * mcus_x > 65535:
        n = 1
    while n > 1 and (mcus_y % n or (mcus_y // n) % restart_rows):
        n -= 1
    return Mesh(devices[:n], ("rows",))


def make_row_sharded_p1(mesh: Mesh, width: int, height: int,
                        samp: List[Tuple[int, int]], restart_rows: int):
    """Build the jitted sharded pixel->coefficient step.

    (H16, W, 3) uint8 (H16 = iMCU-padded height, sharded on rows) ->
    (per-comp coefficient planes sharded on rows, replicated global
    (2, 256) AC and DC histograms). The psum over 'rows' is the
    collective that makes one optimal Huffman table set cover the whole
    image (the distributed analog of jchuff.c:100-101 dc/ac_counts)."""
    ndev = mesh.devices.size
    mcus_x, mcus_y, geom = pipeline.geometry(width, height, samp)
    if mcus_y % ndev:
        raise ValueError("iMCU rows %d %% devices %d != 0" % (mcus_y, ndev))
    rps = mcus_y // ndev                       # iMCU rows per shard
    shard_h = rps * 8 * geom[0].v
    _, _, geom_s = pipeline.geometry(width, shard_h, samp)
    geom_st = tuple(geom_s)
    r = min(restart_rows * mcus_x, 65535)

    real_bh = tuple(g.bh for g in geom)      # GLOBAL real block rows
    h2 = -(-height // geom[0].v) * geom[0].v # input-pad height (jcprepct)
    c_real = h2 // 2                         # real downsampled chroma rows
    shard_ph = rps * 8 * geom[0].v           # shard pixel rows
    pw = mcus_x * 8 * geom[0].h

    def shard_fn(img, qluma, qchroma):
        # The single-device pipeline pads in two stages (jcprepct.c:158-188):
        # pixel rows replicate only to h2 = ceil(h/max_v)*max_v, and a
        # VERTICALLY DOWNSAMPLED chroma plane is then edge-replicated to
        # iMCU height. The host feeds pixel rows replicated to full iMCU
        # height — correct except past c_real for v-subsampled chroma,
        # which the shard rewrites with the last real downsampled row
        # (avg(h-1, h-1) != avg(h-2, h-1) when h is even but unaligned).
        idx = jax.lax.axis_index("rows")
        ycc = (color.rgb_to_ycc(img) if img.ndim == 3
               else img[..., None])
        q = []
        for ci, g in enumerate(geom_st):
            p = layout.pad_plane(ycc[..., ci], shard_ph, pw)
            if g.h < geom[0].h and g.v < geom[0].v:
                p = sample.downsample_h2v2(p)
            elif g.h < geom[0].h:
                p = sample.downsample_h2v1(p)
            if g.v < geom[0].v:              # vertical: fix padded rows
                c0 = idx * (rps * 8)
                rowc = c0 + jnp.arange(rps * 8)
                src = jnp.clip(c_real - 1 - c0, 0, rps * 8 - 1)
                p = jnp.where((rowc >= c_real)[:, None], p[src][None, :], p)
            blocks = layout.blockify(p.astype(jnp.int32) - 128)
            qtbl = qluma if ci == 0 else qchroma
            zz = layout.to_zigzag(quant.quantize_islow(
                dct.fdct_islow(blocks), qtbl))
            zz = zz.reshape(g.bh_pad, g.bw_pad, 64).astype(jnp.int16)
            # right dummy columns (static, same in every shard)
            zz = layout.add_dummy_blocks(zz, g.bw, g.bh_pad, g.h, g.v)
            q.append(zz)
        # Bottom dummy-block rows (jccoefct.c:300-347) exist in the GLOBAL
        # geometry only; the shard pipeline DCT'd replicated pixels there.
        # Rewrite them on device (same SPMD program in every shard): per
        # MCU column, DC of the last real row's last in-MCU block, AC = 0.
        fixed = []
        for ci, g in enumerate(geom_st):
            bh_s = rps * g.v
            row0 = idx * bh_s
            rowg = row0 + jnp.arange(bh_s)
            is_dummy = rowg >= real_bh[ci]
            src_local = jnp.clip(real_bh[ci] - 1 - row0, 0, bh_s - 1)
            bwp = q[ci].shape[1]
            srcdc = q[ci][src_local, :, 0] \
                .reshape(bwp // g.h, g.h)[:, -1:]
            dcrow = jnp.broadcast_to(srcdc, (bwp // g.h, g.h)).reshape(bwp)
            dummy = jnp.concatenate(
                [dcrow[:, None],
                 jnp.zeros((bwp, 63), q[ci].dtype)], axis=-1)
            fixed.append(jnp.where(is_dummy[:, None, None], dummy[None],
                                   q[ci]))
        q = tuple(fixed)
        ac_h = jnp.zeros((2, 256), jnp.int32)
        dc_h = jnp.zeros((2, 256), jnp.int32)
        for ci, g in enumerate(geom_st):
            slot = 0 if ci == 0 else 1
            ac_h = ac_h.at[slot].add(symbols.ac_histogram(
                q[ci].reshape(-1, 64)))
            dc_h = dc_h.at[slot].add(symbols.dc_histogram_restart(
                q[ci], g.h, g.v, mcus_x, rps, r))
        ac_g = jax.lax.psum(ac_h, "rows")
        dc_g = jax.lax.psum(dc_h, "rows")
        return tuple(qq[None] for qq in q), ac_g, dc_g

    n = len(geom_s)
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P("rows"), None, None),
                   out_specs=(tuple([P("rows")] * n), P(), P()))
    return jax.jit(fn), (mcus_x, mcus_y, geom), rps


def _optimal_table(counts):
    from ..entropy import encode as entenc
    f = np.zeros(257, np.int64)
    f[:256] = np.asarray(counts)
    return entenc.gen_optimal_table(f)


def _samp_of(image, subsampling):
    if image.ndim == 2:
        return [(1, 1)], 1
    if tuple(subsampling) not in ((2, 2), (2, 1), (1, 1)):
        raise NotImplementedError(
            "row-sharded encode supports 4:2:0/4:2:2/4:4:4, got %r"
            % (subsampling,))
    return [subsampling, (1, 1), (1, 1)], 3


def encode_row_sharded(image: np.ndarray, quality: float = 75.0,
                       mesh: Optional[Mesh] = None,
                       restart_rows: int = 1,
                       subsampling: Tuple[int, int] = (2, 2)) -> bytes:
    """Encode ONE image with its iMCU rows sharded over the mesh.

    Sequential baseline scan with globally-optimal Huffman tables and
    restart_rows MCU rows per restart interval (the segment boundary that
    makes shards independent). subsampling: (2,2)/(2,1)/(1,1), or a 2-D
    image for grayscale. Returns the complete JPEG."""
    from ..codec.config import EncoderConfig, Profile
    from ..codec.encoder import make_qtables, assemble, ScanResult
    from ..codec.scans import baseline_script
    from ..entropy import encode as entenc
    from ..entropy.huffman import derive_codes
    from ..ops import bitpack

    if restart_rows < 1:
        raise ValueError("restart_rows must be >= 1 (shard independence)")
    h, w = image.shape[:2]
    samp, ncomp = _samp_of(image, subsampling)
    mcus_x0, mcus_y0, geom0 = pipeline.geometry(w, h, samp)
    mesh = _rows_mesh(mesh, mcus_y0, restart_rows, mcus_x0)
    ndev = mesh.devices.size

    step, (mcus_x, mcus_y, comps), rps = make_row_sharded_p1(
        mesh, w, h, samp, restart_rows)
    if ndev > 1 and rps % restart_rows:
        raise ValueError("rows per shard %d %% restart_rows %d != 0"
                         % (rps, restart_rows))

    cfg = EncoderConfig(quality=quality, profile=Profile.FASTEST,
                        progressive=False, optimize_coding=True,
                        optimize_scans=False, trellis_quant=False,
                        overshoot_deringing=False, subsampling=subsampling,
                        restart_in_rows=restart_rows).resolved()
    qt = make_qtables(cfg)

    # pad to full iMCU height with edge replication (jcprepct edge expand)
    h16 = mcus_y * 8 * comps[0].v
    img16 = image
    if h16 != h:
        img16 = np.concatenate(
            [image, np.repeat(image[-1:], h16 - h, axis=0)], axis=0)

    planes, ac_g, dc_g = step(jnp.asarray(img16), jnp.asarray(qt[0]),
                              jnp.asarray(qt[1 if len(qt) > 1 else 0]))
    ac_g = np.asarray(ac_g)
    dc_g = np.asarray(dc_g)


    nt = min(ncomp, 2)
    dc_tables = {t: _optimal_table(dc_g[t]) for t in range(nt)}
    ac_tables = {t: _optimal_table(ac_g[t]) for t in range(nt)}
    dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(ncomp)}
    ac_tbls = dict(dc_tbls)
    codes = {k: derive_codes(t) for k, t in dc_tables.items()}
    acodes = {k: derive_codes(t) for k, t in ac_tables.items()}

    r = min(restart_rows * mcus_x, 65535)
    segs_per_shard = (rps * mcus_x) // r
    parts = []
    for s in range(ndev):
        shard_planes = [planes[ci][s] for ci in range(ncomp)]
        parts.append(bitpack.encode_scan_bitpar(
            shard_planes, [(g.h, g.v) for g in comps], mcus_x, rps, r,
            [codes[dc_tbls[ci]] for ci in range(ncomp)],
            [acodes[ac_tbls[ci]] for ci in range(ncomp)],
            rst_offset=s * segs_per_shard,
            trailing_rst=(s != ndev - 1)))
    data = b"".join(parts)

    scan = baseline_script(ncomp)[0]
    sr = ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                    restart=r)
    return assemble(w, h, (mcus_x, mcus_y, comps), qt, [sr], False,
                    ncomp, multi_dqt=False,
                    cs="grayscale" if ncomp == 1 else "ycbcr")


# ---------------------------------------------------------------------------
# Row-sharded TRELLIS encode: the full mozjpeg rate-distortion path across
# the mesh. Three sharded programs with host table-building between them:
#   A. pixels -> (q, raw) coefficient-major shards + psum'd AC-first hists
#      (the trellis pseudo-scan statistics, jcmaster.c:451-468)
#   B. per-shard trellis DP (AC Viterbi + DC trellis) with the GLOBAL rate
#      tables broadcast in a packed array; emits psum'd sequential-scan
#      histograms of the final coefficients for the Huffman optimization
#   C. per-shard restart-segment device bit packing + host stitching
# Shard boundaries are iMCU rows: the AC DP is per block, the DC trellis
# chains only within an iMCU row group (trellis.py make_trellis_all_t), and
# trellis statistics segments are single component rows (restart_in_rows),
# so no state crosses shards and the output is byte-exact vs single-device.
# ---------------------------------------------------------------------------

def _shard_p1_trellis(mesh, width, height, samp, cfg, rps):
    """Program A: (shard_h, W, 3) uint8 -> per comp (q_zz, raw_zz, lam)
    sharded + psum'd trellis AC-first histograms (fake-row corrected).
    Lambdas are computed ON DEVICE from the norms (ops/softfloat.py
    bit-exact f64 emulation), so nothing per-shard ever crosses to the
    host — a requirement for multi-host meshes where other processes'
    shards are not addressable."""
    from ..codec import pipeline_t
    from ..ops import dct as _dct, dering as _dering, quant as _quant
    from ..ops import softfloat as _sf

    mcus_x, mcus_y, geom = pipeline.geometry(width, height, samp)
    shard_h = rps * 8 * geom[0].v
    _, _, geom_s = pipeline.geometry(width, shard_h, samp)
    geom_st = tuple(geom_s)
    real_bh = tuple(g.bh for g in geom)
    h2 = -(-height // geom[0].v) * geom[0].v
    c_real = h2 // 2
    pw = mcus_x * 8 * geom[0].h
    ndev = mesh.devices.size
    ris = tuple(min(cfg.restart_in_rows * g.bw, 65535) for g in geom)

    def shard_fn(img, qluma, qchroma):
        idx = jax.lax.axis_index("rows")
        ycc = (color.rgb_to_ycc(img) if img.ndim == 3
               else img[..., None])
        outs = []
        ac_hists = []
        for ci, g in enumerate(geom_st):
            p = layout.pad_plane(ycc[..., ci], rps * 8 * geom[0].v, pw)
            if g.h < geom[0].h and g.v < geom[0].v:
                p = sample.downsample_h2v2(p)
            elif g.h < geom[0].h:
                p = sample.downsample_h2v1(p)
            if g.v < geom[0].v:
                c0 = idx * (rps * 8)
                rowc = c0 + jnp.arange(rps * 8)
                src = jnp.clip(c_real - 1 - c0, 0, rps * 8 - 1)
                p = jnp.where((rowc >= c_real)[:, None], p[src][None, :], p)
            blocks = layout.blockify_t(
                p[: g.bh * 8, : g.bw * 8].astype(jnp.int32) - 128)
            qtbl = qluma if ci == 0 else qchroma
            if cfg.overshoot_deringing:
                szz = layout.to_zigzag_t(blocks)
                szz = _dering.dering_t(szz, qtbl[0, 0, 0])
                blocks = layout.from_zigzag_t(szz)
            coeffs = _dct.fdct_islow_t(blocks, 2)
            qz = _quant.quantize_islow_t(coeffs, qtbl)
            if cfg.overshoot_deringing:
                qz = jnp.clip(qz, -1023, 1023)
            q_zz = layout.to_zigzag_t(qz).astype(jnp.int16)
            raw_zz = layout.to_zigzag_t(coeffs)
            norm = pipeline_t._norm_seq(raw_zz)
            lam = _sf.lambda_from_norm_t.__wrapped__(
                norm, float(cfg.lambda_log_scale1),
                float(cfg.lambda_log_scale2))
            hist = symbols.ac_first_histogram_t(q_zz, ri=ris[ci])
            # fake-row correction: global dummy rows live only in the last
            # shard and must not contribute statistics. They share their
            # stats segment with real rows when restart_in_rows > 1, so
            # replace the LAST segment's histogram (fake rows included)
            # with the histogram of its real prefix — exactly how the
            # single-device gather sees a partial final segment.
            nfake = g.bh * ndev - real_bh[ci]
            if nfake > 0:
                if cfg.restart_in_rows * g.bw > 65535:
                    raise NotImplementedError(
                        "sharded trellis stats need row-aligned restart "
                        "segments (interval exceeds the 16-bit cap)")
                tail_rows = ((g.bh - 1) % cfg.restart_in_rows) + 1
                is_last = jnp.where(idx == ndev - 1, 1, 0)
                tail = q_zz[:, -tail_rows * g.bw:]
                hist = hist - is_last * symbols.ac_first_histogram_t(tail)
                if tail_rows > nfake:
                    real = tail[:, : (tail_rows - nfake) * g.bw]
                    hist = hist + is_last *                         symbols.ac_first_histogram_t(real)
            ac_hists.append(jax.lax.psum(hist, "rows"))
            outs.append((q_zz[None], raw_zz[None], lam[None]))
        return tuple(outs), tuple(ac_hists)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P("rows"), None, None),
                   out_specs=(tuple([(P("rows"),) * 3] * len(geom_s)),
                              tuple([P()] * len(geom_s))))
    return jax.jit(fn), (mcus_x, mcus_y, geom), geom_st


def _shard_trellis_run(mesh, geom_st, comps, cfg, ncands, mcus_x, rps):
    """Program B: per-shard trellis + sequential-scan hists (psum).
    Per-shard lambdas arrive sharded from program A (device-computed);
    `packed` carries only the shard-invariant [ac_si | dc_si | qtbl]."""
    from ..codec import trellis as _trellis

    real_bh = tuple(g.bh for g in comps)
    ndev = mesh.devices.size
    r_mcus = min(cfg.restart_in_rows * mcus_x, 65535)

    run = _trellis.make_trellis_all_t(
        geom_st, None, ((1, 63),), cfg.trellis_quant_dc,
        tuple(ncands), precision=cfg.precision,
        eob_opt=cfg.trellis_eob_opt,
        delta_w=float(cfg.trellis_delta_dc_weight))

    def shard_fn(qs, raws, lams, packed_static):
        idx = jax.lax.axis_index("rows")
        cur = tuple(q[0] for q in qs)
        raws0 = tuple(r[0] for r in raws)
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(l[0], jnp.int32) for l in lams]
            + [packed_static])
        for _ in range(max(1, cfg.trellis_num_loops)):
            cur = run(raws0, cur, packed)
        # block-major with right dummy columns + GLOBAL bottom dummy rows
        planes = []
        ac_h = jnp.zeros((2, 256), jnp.int32)
        dc_h = jnp.zeros((2, 256), jnp.int32)
        for ci, g in enumerate(geom_st):
            z = layout.add_dummy_blocks_t(cur[ci], g.bw, g.bh,
                                          g.bw_pad, g.bh_pad, g.h, g.v)
            pl = jnp.transpose(z.reshape(64, g.bh_pad, g.bw_pad),
                               (1, 2, 0))
            bh_s = g.bh_pad
            row0 = idx * bh_s
            rowg = row0 + jnp.arange(bh_s)
            is_dummy = rowg >= real_bh[ci]
            src_local = jnp.clip(real_bh[ci] - 1 - row0, 0, bh_s - 1)
            bwp = pl.shape[1]
            srcdc = pl[src_local, :, 0].reshape(bwp // g.h, g.h)[:, -1:]
            dcrow = jnp.broadcast_to(srcdc, (bwp // g.h, g.h)).reshape(bwp)
            dummy = jnp.concatenate(
                [dcrow[:, None], jnp.zeros((bwp, 63), pl.dtype)], axis=-1)
            pl = jnp.where(is_dummy[:, None, None], dummy[None], pl)
            planes.append(pl)
            slot = 0 if ci == 0 else 1
            ac_h = ac_h.at[slot].add(symbols.ac_histogram(
                pl.reshape(-1, 64)))
            dc_h = dc_h.at[slot].add(symbols.dc_histogram_restart(
                pl, g.h, g.v, mcus_x, rps, r_mcus))
        ac_g = jax.lax.psum(ac_h, "rows")
        dc_g = jax.lax.psum(dc_h, "rows")
        return tuple(pp[None] for pp in planes), ac_g, dc_g

    n = len(geom_st)
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(tuple([P("rows")] * n), tuple([P("rows")] * n),
                             tuple([P("rows")] * n), None),
                   out_specs=(tuple([P("rows")] * n), P(), P()))
    return jax.jit(fn)


def _trellis_front(image, quality, mesh, restart_rows, subsampling,
                   progressive):
    """Shared front half of the sharded trellis encoders: config, qtables,
    sharded P1 with psum'd trellis statistics, host rate tables + packed
    per-shard lambdas, and the sharded trellis run. Returns everything the
    scan-emission back halves need."""
    from ..codec import trellis as _trellis
    from ..codec.config import EncoderConfig
    from ..codec.encoder import make_qtables
    from ..consts import JPEG_ZIGZAG

    h, w = image.shape[:2]
    samp, ncomp = _samp_of(image, subsampling)
    mcus_x0, mcus_y0, _ = pipeline.geometry(w, h, samp)
    mesh = _rows_mesh(mesh, mcus_y0, restart_rows, mcus_x0)
    ndev = mesh.devices.size

    cfg = EncoderConfig(quality=quality, progressive=progressive,
                        optimize_scans=False, trellis_quant=True,
                        overshoot_deringing=True, optimize_coding=True,
                        subsampling=subsampling,
                        restart_in_rows=restart_rows).resolved()
    qt = make_qtables(cfg)
    rps = mcus_y0 // ndev
    if ndev > 1 and rps % restart_rows:
        raise ValueError("rows per shard %d %% restart_rows %d != 0"
                         % (rps, restart_rows))
    stepA, (mcus_x, mcus_y, comps), geom_st = _shard_p1_trellis(
        mesh, w, h, samp, cfg, rps)

    h16 = mcus_y * 8 * comps[0].v
    img16 = image
    if h16 != h:
        img16 = np.concatenate(
            [image, np.repeat(image[-1:], h16 - h, axis=0)], axis=0)
    q81 = [jnp.asarray(np.asarray(qt[i]).reshape(8, 8, 1).astype(np.int32))
           for i in (0, 1 if len(qt) > 1 else 0)]
    if jax.process_count() > 1:
        # multi-host: every process passes the same full image; each
        # device materializes only its row band
        from jax.sharding import NamedSharding
        img_in = jax.make_array_from_callback(
            img16.shape, NamedSharding(mesh, P("rows")),
            lambda idx: np.ascontiguousarray(img16[idx]))
    else:
        img_in = jnp.asarray(img16)
    outs, ac_hists = stepA(img_in, q81[0], q81[1])

    qtblzz, dc_sis, ac_sis, ncands = [], [], [], []
    for ci in range(ncomp):
        slot = 0 if ci == 0 else 1
        # ac_hists are psum'd -> replicated: readable on every host
        ac_si, dc_si = _trellis.trellis_tables_from_hist(
            np.asarray(ac_hists[ci]), slot, cfg.optimize_coding)
        ac_sis.append(ac_si)
        dc_sis.append(dc_si)
        qz = np.asarray(qt[slot]).reshape(64)[JPEG_ZIGZAG].astype(np.int32)
        qtblzz.append(qz)
        ncands.append(_trellis.get_num_dc_candidates(int(qz[0])))
    packed_static = _trellis.pack_trellis_inputs([], ac_sis, dc_sis,
                                                 qtblzz)
    stepB = _shard_trellis_run(mesh, geom_st, comps, cfg, ncands,
                               mcus_x, rps)
    planes, ac_g, dc_g = stepB(
        tuple(outs[ci][0] for ci in range(ncomp)),
        tuple(outs[ci][1] for ci in range(ncomp)),
        tuple(outs[ci][2] for ci in range(ncomp)),
        jnp.asarray(packed_static))
    return (cfg, qt, ncomp, ndev, rps, (mcus_x, mcus_y, comps), planes,
            ac_g, dc_g)


def encode_row_sharded_trellis(image: np.ndarray, quality: float = 75.0,
                               mesh: Optional[Mesh] = None,
                               restart_rows: int = 1,
                               subsampling: Tuple[int, int] = (2, 2)
                               ) -> bytes:
    """Full mozjpeg-quality trellis encode of ONE image, iMCU rows sharded
    over the mesh: overshoot deringing, AC+DC trellis quantization with
    globally-psum'd rate statistics, optimal Huffman tables from global
    histograms, restart-parallel device bit packing. Sequential baseline
    scan output; byte-exact vs the single-device encoder with the same
    config."""
    from ..codec.encoder import assemble, ScanResult
    from ..codec.scans import baseline_script
    from ..entropy.huffman import derive_codes
    from ..ops import bitpack

    if restart_rows < 1:
        raise ValueError("restart_rows must be >= 1 (shard independence)")
    (cfg, qt, ncomp, ndev, rps, (mcus_x, mcus_y, comps), planes,
     ac_g, dc_g) = _trellis_front(image, quality, mesh, restart_rows,
                                  subsampling, progressive=False)
    h, w = image.shape[:2]

    nt = min(ncomp, 2)
    dc_tables = {t: _optimal_table(dc_g[t]) for t in range(nt)}
    ac_tables = {t: _optimal_table(ac_g[t]) for t in range(nt)}
    dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(ncomp)}
    ac_tbls = dict(dc_tbls)
    codes = {k: derive_codes(t) for k, t in dc_tables.items()}
    acodes = {k: derive_codes(t) for k, t in ac_tables.items()}

    r = min(restart_rows * mcus_x, 65535)
    segs_per_shard = (rps * mcus_x) // r
    parts = []
    for s in range(ndev):
        shard_planes = [planes[ci][s] for ci in range(ncomp)]
        parts.append(bitpack.encode_scan_bitpar(
            shard_planes, [(g.h, g.v) for g in comps], mcus_x, rps, r,
            [codes[dc_tbls[ci]] for ci in range(ncomp)],
            [acodes[ac_tbls[ci]] for ci in range(ncomp)],
            rst_offset=s * segs_per_shard,
            trailing_rst=(s != ndev - 1)))
    data = b"".join(parts)

    scan = baseline_script(ncomp)[0]
    sr = ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                    restart=r)
    return assemble(w, h, (mcus_x, mcus_y, comps), qt, [sr], False,
                    ncomp, multi_dqt=True,
                    cs="grayscale" if ncomp == 1 else "ycbcr")


def encode_row_sharded_progressive(image: np.ndarray, quality: float = 75.0,
                                   mesh: Optional[Mesh] = None,
                                   restart_rows: int = 1,
                                   subsampling: Tuple[int, int] = (2, 2)
                                   ) -> bytes:
    """Progressive mozjpeg encode (simple_progression 9-scan script +
    AC/DC trellis + deringing + per-scan optimal tables) of ONE image,
    iMCU rows sharded over the mesh. Every scan's statistics psum across
    shards (AC-refine EOBn bins run the sequential flush schedule on the
    host over trimmed per-shard block summaries) and every scan's restart
    segments bit-pack on device per shard. Byte-exact vs the
    single-device encoder with the same config (= mozjpeg -fastcrush
    with -restart N rows)."""
    from ..codec import scans as _scans
    from ..codec.encoder import (assemble, ScanResult,
                                 scan_restart_interval)
    from ..entropy.huffman import derive_codes
    from ..ops import bitpack

    if restart_rows < 1:
        raise ValueError("restart_rows must be >= 1 (shard independence)")
    (cfg, qt, ncomp, ndev, rps, (mcus_x, mcus_y, comps), planes,
     _, _) = _trellis_front(image, quality, mesh, restart_rows,
                            subsampling, progressive=True)
    h, w = image.shape[:2]
    planes_h = [[np.asarray(planes[ci][s]) for s in range(ndev)]
                for ci in range(ncomp)]

    geom = (mcus_x, mcus_y, comps)
    shards = {s: [planes_h[ci][s] for ci in range(ncomp)]
              for s in range(ndev)}
    codec = _ShardScanCodec(cfg, ncomp, ndev, rps, geom, shards)
    return _progressive_rows(cfg, qt, ncomp, geom, codec, w, h)


def _progressive_rows(cfg, qt, ncomp, geom, codec, w, h,
                      collect_bytes=None) -> bytes:
    """Fixed-script progressive emission over row shards (shared by the
    single-host and multi-host encoders)."""
    from ..codec import scans as _scans
    from ..codec.encoder import (assemble, ScanResult,
                                 scan_restart_interval)
    from ..entropy.huffman import derive_codes

    collect_bytes = collect_bytes or (
        lambda parts: b"".join(parts[s] for s in sorted(parts)))
    script = _scans.simple_progression_max(ncomp, cfg.dc_scan_opt_mode,
                                           True)
    results = []
    for scan in script:
        r_scan = scan_restart_interval(cfg, scan, geom, ncomp)
        dch, ach = codec.gather(scan, r_scan)
        dc_tables = {t: _optimal_table(hh) for t, hh in dch.items()
                     if hh.any()}
        ac_tables = {t: _optimal_table(hh) for t, hh in ach.items()
                     if hh.any()}
        dc_codes = ([derive_codes(dc_tables[codec.dc_tbls[ci]])
                     for ci in scan.comps]
                    if dc_tables else None)
        ac_codes = ([derive_codes(ac_tables[codec.ac_tbls[scan.comps[0]]])]
                    if ac_tables else None)
        parts, _ = codec.emit(scan, r_scan, dc_codes, ac_codes)
        data = collect_bytes(parts)
        results.append(ScanResult(scan, data, dc_tables, ac_tables,
                                  codec.dc_tbls, codec.ac_tbls,
                                  restart=r_scan))
    return assemble(w, h, geom, qt, results,
                    True, ncomp, multi_dqt=True,
                    cs="grayscale" if ncomp == 1 else "ycbcr")


class _ShardScanCodec:
    """Per-scan statistics + emission over a (possibly partial) set of
    row shards, with reduction hooks so the single-host path (all shards
    local, identity reduce) and the multi-host path (local shards only,
    DCN all-reduce) share one implementation.

    local_shards: {global shard index: [per-comp (bh_s, bw_pad, 64)
    int16 host planes]}; reduce_sum(a) must return the elementwise sum
    of `a` over all participating processes (identity on one host) —
    partial statistics are placed into GLOBAL-shaped zero arrays first,
    so a plain sum reconstructs exact sequential state everywhere."""

    def __init__(self, cfg, ncomp: int, ndev: int, rps: int, geom,
                 local_shards, reduce_sum=None):
        self.cfg = cfg
        self.ncomp = ncomp
        self.ndev = ndev
        self.rps = rps
        self.geom = geom
        self.shards = local_shards
        self.reduce = reduce_sum if reduce_sum is not None else (
            lambda a: a)
        self.dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(ncomp)}
        self.ac_tbls = dict(self.dc_tbls)

    def _real_rows(self, ci: int, s: int) -> int:
        g = self.geom[2][ci]
        sh_rows = self.rps * g.v       # block rows per shard for comp ci
        return max(0, min(sh_rows, g.bh - s * sh_rows))

    def gather(self, scan, r_scan):
        """-> (dc hists {slot: (256,)}, ac hists {slot: (256,)}),
        globally summed."""
        from ..ops import bitpack
        mcus_x, _, comps = self.geom
        if scan.Ss == 0 and scan.Ah == 0:      # DC first (interleaved)
            acc = np.zeros((2, 256), np.int64)
            for ci in scan.comps:
                g = comps[ci]
                t = self.dc_tbls[ci]
                for s, pls in self.shards.items():
                    acc[t] += np.asarray(symbols.dc_histogram_restart(
                        jnp.asarray(pls[ci]), g.h, g.v,
                        mcus_x, self.rps, r_scan,
                        Al=scan.Al)).astype(np.int64)
            acc = self.reduce(acc)
            return {t: acc[t] for t in (0, 1)}, {}
        if scan.Ss == 0:
            return {}, {}                      # DC refine: no stats
        ci = scan.comps[0]
        g = comps[ci]
        t = self.ac_tbls[ci]
        if scan.Ah == 0:                       # AC first
            hist = np.zeros(256, np.int64)
            for s, pls in self.shards.items():
                real_rows = self._real_rows(ci, s)
                if real_rows <= 0:
                    continue
                zz = jnp.asarray(np.ascontiguousarray(
                    pls[ci][:real_rows, :g.bw].reshape(-1, 64).T))
                hist += np.asarray(symbols.ac_first_histogram_t(
                    zz, scan.Ss, scan.Se, ri=r_scan,
                    Al=scan.Al)).astype(np.int64)
            return {}, {t: self.reduce(hist)}
        # AC refine: per-shard device summaries placed into global-shaped
        # arrays (block order), summed globally, then the sequential
        # (eobrun, BE) flush schedule runs identically on every host
        hist = np.zeros(256, np.int64)
        nblk = g.bh * g.bw
        e_g = np.zeros(nblk, np.int32)
        br_g = np.zeros(nblk, np.int32)
        ev_g = np.zeros(nblk, np.int32)
        for s, pls in self.shards.items():
            real_rows = self._real_rows(ci, s)
            if real_rows <= 0:
                continue
            zz = jnp.asarray(np.ascontiguousarray(
                pls[ci][:real_rows, :g.bw].reshape(-1, 64).T))
            hs, e, br, ev = symbols.ac_refine_histogram_parts_t(
                zz, scan.Ss, scan.Se, scan.Al)
            hist += np.asarray(hs).astype(np.int64)
            off = s * self.rps * g.v * g.bw
            n = real_rows * g.bw
            e_g[off:off + n] = np.asarray(e)
            br_g[off:off + n] = np.asarray(br)
            ev_g[off:off + n] = np.asarray(ev)
        hist = self.reduce(hist)
        e_g = self.reduce(e_g)
        br_g = self.reduce(br_g)
        ev_g = self.reduce(ev_g)
        hist = hist + bitpack.ac_refine_eob_bins(e_g, br_g, ev_g, r_scan)
        return {}, {t: hist}

    def _seg_layout(self, scan, r_scan):
        """Per-shard (nseg, rst_offset, last?) in global shard order."""
        mcus_x, _, comps = self.geom
        out = {}
        rst_off = 0
        last_s = -1
        for s in range(self.ndev):
            if scan.Ss == 0:
                nseg = (-(-(mcus_x * self.rps) // r_scan)
                        if r_scan else 1)
                last_s = s
            else:
                real_rows = self._real_rows(scan.comps[0], s)
                if real_rows <= 0:
                    continue
                g = comps[scan.comps[0]]
                nseg = (-(-(g.bw * real_rows) // r_scan)
                        if r_scan else 1)
                last_s = s
            out[s] = [nseg, rst_off, False]
            rst_off += nseg
        if last_s >= 0:
            out[last_s][2] = True
        return out

    def emit(self, scan, r_scan, dc_codes, ac_codes):
        """-> ({global shard idx: entropy bytes}, local length sum)."""
        from ..ops import bitpack
        mcus_x, _, comps = self.geom
        layout_ = self._seg_layout(scan, r_scan)
        parts = {}
        for s, pls in sorted(self.shards.items()):
            if s not in layout_:
                continue
            nseg, rst_off, last = layout_[s]
            if scan.Ss == 0:
                pl = [pls[ci] for ci in scan.comps]
                gs = [(comps[ci].h, comps[ci].v) for ci in scan.comps]
                smx, smy = mcus_x, self.rps
            else:
                ci = scan.comps[0]
                g = comps[ci]
                real_rows = self._real_rows(ci, s)
                pl = [pls[ci][:real_rows, :g.bw]]
                gs = [(1, 1)]
                smx, smy = g.bw, real_rows
            parts[s] = bitpack.encode_scan_progressive_device(
                pl, gs, smx, smy, scan.Ss, scan.Se, scan.Ah, scan.Al,
                r_scan, dc_tables=dc_codes, ac_tables=ac_codes,
                rst_offset=rst_off, trailing_rst=not last)
        return parts, sum(len(p) for p in parts.values())


def _scanopt_rows(cfg, qt, ncomp, ndev, rps, geom, codec, w, h,
                  sum_scalar=None, collect_bytes=None) -> bytes:
    """Row-sharded jpegrescan search (jcmaster.c:773-962 select_scans):
    candidate sizes are global sums of per-shard entropy lengths
    (restart alignment makes shard parts exact byte slices), the greedy
    selection replays identically on every host, and winning scans are
    stitched from the shard parts in display order. Single-host and
    multi-host share this body; hooks sum scalars / collect winner
    bytes across processes."""
    from ..codec import marker, scans as _scans
    from ..codec.encoder import scan_restart_interval
    from ..codec.scanopt import SearchLayout, _run_selection, display_order
    from ..entropy.huffman import derive_codes

    sum_scalar = sum_scalar or (lambda v: v)
    collect_bytes = collect_bytes or (
        lambda parts: b"".join(parts[s] for s in sorted(parts)))
    mcus_x, mcus_y, comps = geom
    script = _scans.search_progression(ncomp, cfg.dc_scan_opt_mode)
    layout = SearchLayout(ncomp)
    comp_ids = [1, 2, 3][:ncomp]

    fh = marker.MarkerWriter()
    fh.dqt_multi([(i, qt[i]) for i in range(min(ncomp, 2))])
    fh.sof(marker.SOF2, cfg.precision, h, w,
           [(comp_ids[ci], comps[ci].h, comps[ci].v,
             0 if ci == 0 else 1) for ci in range(ncomp)])
    frame_header = fh.bytes()

    bufs = {}
    dri_state = [0]

    def get_size(sn, scan):
        r = scan_restart_interval(cfg, scan, geom, ncomp)
        dch, ach = codec.gather(scan, r)
        dc_tables = {t: _optimal_table(hh) for t, hh in dch.items()
                     if hh.any()}
        ac_tables = {t: _optimal_table(hh) for t, hh in ach.items()
                     if hh.any()}
        hdr = marker.MarkerWriter()
        if sn == 0:
            hdr.raw(frame_header)
        entries = []
        seen = set()
        for ci in scan.comps:
            if scan.Ss == 0 and scan.Ah == 0:
                t = codec.dc_tbls[ci]
                if t in dc_tables and ("d", t) not in seen:
                    entries.append((0, t, dc_tables[t]))
                    seen.add(("d", t))
            if scan.Se > 0:
                t = codec.ac_tbls[ci]
                if t in ac_tables and ("a", t) not in seen:
                    entries.append((1, t, ac_tables[t]))
                    seen.add(("a", t))
        hdr.dht_multi(entries)
        if r != dri_state[0]:
            hdr.dri(r)
            dri_state[0] = r
        hdr.sos([(comp_ids[ci],
                  codec.dc_tbls[ci] if scan.Ss == 0 and scan.Ah == 0
                  else 0,
                  codec.ac_tbls[ci] if scan.Se else 0)
                 for ci in scan.comps], scan.Ss, scan.Se, scan.Ah,
                scan.Al)
        dc_codes = ([derive_codes(dc_tables[codec.dc_tbls[ci]])
                     for ci in scan.comps] if dc_tables else None)
        ac_codes = ([derive_codes(ac_tables[codec.ac_tbls[scan.comps[0]]])]
                    if ac_tables else None)
        parts, local_len = codec.emit(scan, r, dc_codes, ac_codes)
        bufs[sn] = (hdr.bytes(), parts)
        return (len(hdr.bytes()) - (len(frame_header) if sn == 0 else 0)
                + int(sum_scalar(local_len)))

    res = _run_selection(layout, script, get_size)
    order = display_order(layout, res, cfg.dc_scan_opt_mode)

    out = marker.MarkerWriter()
    out.soi()
    if cfg.write_jfif:
        out.jfif_app0(unit=cfg.density[0], xd=cfg.density[1],
                      yd=cfg.density[2])
    for idx in order:
        hdr, parts = bufs[idx]
        out.raw(hdr)
        out.raw(collect_bytes(parts))
    out.eoi()
    return out.bytes()


def encode_row_sharded_scanopt(image: np.ndarray, quality: float = 75.0,
                               mesh: Optional[Mesh] = None,
                               restart_rows: int = 1,
                               subsampling: Tuple[int, int] = (2, 2)
                               ) -> bytes:
    """FULL mozjpeg-default encode (progressive + AC/DC trellis +
    deringing + jpegrescan optimize_scans) of ONE image with its iMCU
    rows sharded over the mesh. Byte-exact vs the single-device encoder
    with the same config (= cjpeg default with -restart N)."""
    if restart_rows < 1:
        raise ValueError("restart_rows must be >= 1 (shard independence)")
    (cfg, qt, ncomp, ndev, rps, geom, planes,
     _, _) = _trellis_front(image, quality, mesh, restart_rows,
                            subsampling, progressive=True)
    h, w = image.shape[:2]
    shards = {s: [np.asarray(planes[ci][s]) for ci in range(ncomp)]
              for s in range(ndev)}
    codec = _ShardScanCodec(cfg, ncomp, ndev, rps, geom, shards)
    return _scanopt_rows(cfg, qt, ncomp, ndev, rps, geom, codec, w, h)
