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
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..codec import pipeline
from ..ops import color, dct, layout, quant, sample, symbols


def _rows_mesh(mesh: Optional[Mesh], mcus_y: int) -> Mesh:
    """A 1-D 'rows' mesh whose size divides the image's iMCU row count
    (equal static shards; excess devices are left idle)."""
    devices = (mesh.devices.reshape(-1) if mesh is not None
               else np.array(jax.devices()))
    n = len(devices)
    while mcus_y % n:
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
    r = restart_rows * mcus_x

    real_bh = tuple(g.bh for g in geom)      # GLOBAL real block rows
    h2 = -(-height // geom[0].v) * geom[0].v # input-pad height (jcprepct)
    c_real = h2 // 2                         # real downsampled chroma rows
    shard_ph = rps * 8 * geom[0].v           # shard pixel rows
    pw = mcus_x * 8 * geom[0].h

    def shard_fn(img, qluma, qchroma):
        # The single-device pipeline pads in two stages (jcprepct.c:158-188):
        # pixel rows replicate only to h2 = ceil(h/max_v)*max_v, and the
        # DOWNSAMPLED chroma plane is then edge-replicated to iMCU height.
        # The host feeds pixel rows replicated to full iMCU height — correct
        # for luma, but the shard must rewrite chroma rows past c_real with
        # the last real downsampled row (they differ whenever h is even but
        # not iMCU-aligned: avg(h-1, h-1) != avg(h-2, h-1)).
        idx = jax.lax.axis_index("rows")
        ycc = color.rgb_to_ycc(img)
        q = []
        for ci, g in enumerate(geom_st):
            p = layout.pad_plane(ycc[..., ci], shard_ph, pw)
            if g.v < geom[0].v:              # chroma: downsample + row fix
                p = sample.downsample_h2v2(p)
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


def encode_row_sharded(image: np.ndarray, quality: float = 75.0,
                       mesh: Optional[Mesh] = None,
                       restart_rows: int = 1) -> bytes:
    """Encode ONE image with its iMCU rows sharded over the mesh.

    Sequential baseline scan with globally-optimal Huffman tables and
    restart_rows MCU rows per restart interval (the segment boundary that
    makes shards independent). Returns the complete JPEG."""
    from ..codec.config import EncoderConfig, Profile
    from ..codec.encoder import make_qtables, assemble, ScanResult
    from ..codec.scans import baseline_script
    from ..entropy import encode as entenc
    from ..entropy.huffman import derive_codes
    from ..ops import bitpack

    if restart_rows < 1:
        raise ValueError("restart_rows must be >= 1 (shard independence)")
    h, w = image.shape[:2]
    samp = [(2, 2), (1, 1), (1, 1)]
    _, mcus_y0, geom0 = pipeline.geometry(w, h, samp)
    mesh = _rows_mesh(mesh, mcus_y0)
    ndev = mesh.devices.size

    step, (mcus_x, mcus_y, comps), rps = make_row_sharded_p1(
        mesh, w, h, samp, restart_rows)
    if rps % restart_rows:
        raise ValueError("rows per shard %d %% restart_rows %d != 0"
                         % (rps, restart_rows))

    cfg = EncoderConfig(quality=quality, profile=Profile.FASTEST,
                        progressive=False, optimize_coding=True,
                        optimize_scans=False, trellis_quant=False,
                        overshoot_deringing=False,
                        restart_in_rows=restart_rows).resolved()
    qt = make_qtables(cfg)

    # pad to full iMCU height with edge replication (jcprepct edge expand)
    h16 = mcus_y * 8 * comps[0].v
    img16 = image
    if h16 != h:
        img16 = np.concatenate(
            [image, np.repeat(image[-1:], h16 - h, axis=0)], axis=0)

    planes, ac_g, dc_g = step(jnp.asarray(img16),
                              jnp.asarray(qt[0]), jnp.asarray(qt[1]))
    ac_g = np.asarray(ac_g)
    dc_g = np.asarray(dc_g)

    def mk(counts):
        f = np.zeros(257, np.int64)
        f[:256] = counts
        return entenc.gen_optimal_table(f)

    dc_tables = {0: mk(dc_g[0]), 1: mk(dc_g[1])}
    ac_tables = {0: mk(ac_g[0]), 1: mk(ac_g[1])}
    dc_tbls = {0: 0, 1: 1, 2: 1}
    ac_tbls = {0: 0, 1: 1, 2: 1}
    codes = {k: derive_codes(t) for k, t in dc_tables.items()}
    acodes = {k: derive_codes(t) for k, t in ac_tables.items()}

    r = restart_rows * mcus_x
    segs_per_shard = (rps * mcus_x) // r
    parts = []
    for s in range(ndev):
        shard_planes = [np.asarray(planes[ci][s]) for ci in range(3)]
        parts.append(bitpack.encode_scan_bitpar(
            shard_planes, [(g.h, g.v) for g in comps], mcus_x, rps, r,
            [codes[dc_tbls[ci]] for ci in range(3)],
            [acodes[ac_tbls[ci]] for ci in range(3)],
            rst_offset=s * segs_per_shard,
            trailing_rst=(s != ndev - 1)))
    data = b"".join(parts)

    scan = baseline_script(3)[0]
    sr = ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                    restart=r)
    return assemble(w, h, (mcus_x, mcus_y, comps), qt, [sr], r, False, 3,
                    multi_dqt=False)
