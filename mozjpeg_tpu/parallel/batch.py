"""Multi-chip batched encoding over a jax.sharding.Mesh.

The reference is strictly single-threaded (SURVEY.md §2.6); this module is
the TPU-native scale-out it never had: the image batch is sharded over the
mesh's 'batch' axis, every chip runs the full device pipeline on its shard,
and per-scan symbol histograms are all-reduced (psum over ICI) so one shared
Huffman table set covers the whole corpus — the distributed analog of the
reference's dc_counts/ac_counts gather (/root/reference/jchuff.c:100-101).
Host ranks then emit their shard's bitstreams with the shared tables.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import color, dct, layout, quant, sample, symbols
from ..codec import pipeline


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _single_image_planes(rgb, geom_t, qluma, qchroma):
    """Device pipeline for one image -> (q_planes, ac_hist, dc_hist)."""
    gl = geom_t[0]
    mcus_x = gl.bw_pad // gl.h
    mcus_y = gl.bh_pad // gl.v
    q, _raw = pipeline._encode_planes_420.__wrapped__(
        rgb, mcus_x, mcus_y, geom_t, False, qluma, qchroma)
    ac_h = jnp.zeros((2, 256), jnp.int32)
    dc_h = jnp.zeros((2, 256), jnp.int32)
    for ci, g in enumerate(geom_t):
        slot = 0 if ci == 0 else 1
        zz = q[ci].reshape(-1, 64)
        ac_h = ac_h.at[slot].add(symbols.ac_histogram(zz))
        dc_h = dc_h.at[slot].add(symbols.dc_histogram_interleaved(
            q[ci], g.h, g.v, mcus_x, mcus_y))
    return q, ac_h, dc_h


def make_batch_encode_step(mesh: Mesh, height: int, width: int,
                           samp: List[Tuple[int, int]], axis: str = "batch"):
    """Build the jitted multi-chip step: (B, H, W, 3) uint8 images sharded
    over `axis` -> (sharded coefficient planes, replicated global histograms).

    The psum over `axis` is the cross-chip collective that lets every host
    emit bitstreams with identical shared Huffman tables.
    """
    mcus_x, mcus_y, geom = pipeline.geometry(width, height, samp)
    geom_t = tuple(geom)

    def shard_fn(images, qluma, qchroma):
        def one(img):
            return _single_image_planes(img, geom_t, qluma, qchroma)

        planes, ac_h, dc_h = jax.vmap(one)(images)
        ac_g = jax.lax.psum(jnp.sum(ac_h, axis=0), axis)
        dc_g = jax.lax.psum(jnp.sum(dc_h, axis=0), axis)
        return tuple(planes), ac_g, dc_g

    n = len(geom)
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(axis), None, None),
                   out_specs=(tuple([P(axis)] * n), P(), P()))
    return jax.jit(fn), geom


def encode_batch(images: np.ndarray, quality: float = 75.0,
                 mesh: Mesh = None, restart_interval: int = 0,
                 device_entropy: bool = False) -> List[bytes]:
    """Encode a batch of same-shape RGB images with shared optimal tables,
    sharded over the mesh. Returns per-image baseline JPEG bytes.

    device_entropy=True packs every image's bitstream on device with the
    restart-parallel packer (ops/bitpack.py): each restart segment is an
    independent bit stream packed in parallel, the host only stitches —
    the full SURVEY.md §2.6 flow (shard → psum histograms → shared
    tables → per-segment device pack → host concat)."""
    from ..codec import marker
    from ..codec.encoder import make_qtables, assemble, ScanResult
    from ..codec.config import EncoderConfig, Profile
    from ..codec.scans import baseline_script
    from ..entropy import encode as entenc

    mesh = mesh or make_mesh()
    b, h, w, _ = images.shape
    cfg = EncoderConfig(quality=quality, profile=Profile.FASTEST,
                        progressive=False, optimize_coding=True,
                        optimize_scans=False, trellis_quant=False,
                        overshoot_deringing=False).resolved()
    qt = make_qtables(cfg)
    samp = [cfg.subsampling, (1, 1), (1, 1)]
    step, geom_list = make_batch_encode_step(mesh, h, w, samp)
    mcus_x, mcus_y, comps = pipeline.geometry(w, h, samp)

    planes, ac_g, dc_g = step(jnp.asarray(images),
                              jnp.asarray(qt[0]), jnp.asarray(qt[1]))
    ac_g = np.asarray(ac_g)
    dc_g = np.asarray(dc_g)

    # shared optimal tables from the global (psum'd) histograms
    def mk(counts):
        f = np.zeros(257, np.int64)
        f[:256] = counts
        return entenc.gen_optimal_table(f)

    dc_tables = {0: mk(dc_g[0]), 1: mk(dc_g[1])}
    ac_tables = {0: mk(ac_g[0]), 1: mk(ac_g[1])}
    dc_tbls = {0: 0, 1: 1, 2: 1}
    ac_tbls = {0: 0, 1: 1, 2: 1}

    out = []
    scan = baseline_script(3)[0]
    geom = (mcus_x, mcus_y, comps)
    ri = restart_interval
    if device_entropy:
        from ..entropy.huffman import derive_codes
        from ..ops import bitpack
        codes = {k: derive_codes(t) for k, t in dc_tables.items()}
        acodes = {k: derive_codes(t) for k, t in ac_tables.items()}
    for i in range(b):
        if device_entropy:
            data = bitpack.encode_scan_bitpar(
                [planes[ci][i] for ci in range(3)],
                [(g.h, g.v) for g in comps], mcus_x, mcus_y, ri,
                [codes[dc_tbls[ci]] for ci in range(3)],
                [acodes[ac_tbls[ci]] for ci in range(3)])
        else:
            pl = [np.asarray(planes[ci][i]) for ci in range(3)]
            sg = entenc.ScanGeometry(scan, geom, pl)
            data, _, _ = entenc.encode_scan(sg, dc_tbls, ac_tbls, dc_tables,
                                            ac_tables, ri, gather=False)
        sr = ScanResult(scan, data, dc_tables, ac_tables, dc_tbls, ac_tbls,
                        restart=ri)
        out.append(assemble(w, h, geom, qt, [sr], False, 3,
                            multi_dqt=False))
    return out
