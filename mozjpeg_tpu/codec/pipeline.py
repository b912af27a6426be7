"""Device-side encode pipeline: RGB -> quantized zigzag coefficient planes.

One jitted XLA program per (image shape, sampling, ncomp): color convert,
pad, downsample, blockify, exact-integer DCT, quantize, zigzag — all batched
over every 8x8 block of the image at once. Quant tables are traced inputs so
requantization (trellis loops, q_opt) reuses the compiled program.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color, dct, dering, layout, quant, sample


class CompGeom(NamedTuple):
    """Per-component geometry (all Python ints; static under jit)."""
    h: int                  # sampling factors
    v: int
    w: int                  # real sample dims
    hgt: int
    bw: int                 # real block dims (ceil samples / 8)
    bh: int
    bw_pad: int             # MCU-padded block dims (interleaved layout)
    bh_pad: int


def geometry(width: int, height: int, samp: List[Tuple[int, int]]
             ) -> Tuple[int, int, List[CompGeom]]:
    """-> (mcus_x, mcus_y, [CompGeom]) for an interleaved frame."""
    max_h = max(h for h, _ in samp)
    max_v = max(v for _, v in samp)
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))
    comps = []
    for h, v in samp:
        cw = -(-width * h // max_h)
        ch = -(-height * v // max_v)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        comps.append(CompGeom(h, v, cw, ch, bw, bh, mcus_x * h, mcus_y * v))
    return mcus_x, mcus_y, comps


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _encode_planes_420(rgb, mcus_x: int, mcus_y: int, geom: tuple,
                       dering_on: bool = False, qluma=None, qchroma=None,
                       fp_one=None):
    """YCbCr 4:2:0-family pipeline. geom is the CompGeom tuple (static)."""
    gl, gcb, gcr = geom
    max_h, max_v = gl.h, gl.v
    h = rgb.shape[0]
    ph, pw = mcus_y * 8 * max_v, mcus_x * 8 * max_h
    # Vertical padding is two-stage like the reference (jcprepct.c:158-188):
    # input rows pad only to the row group (multiple of max_v); the
    # DOWNSAMPLED plane is then edge-replicated to iMCU height. Horizontal
    # padding happens at input level (jcsample.c expand_right_edge).
    h2 = -(-h // max_v) * max_v
    ycc = color.rgb_to_ycc(rgb)
    planes = [layout.pad_plane(ycc[..., i], ph, pw) for i in range(3)]
    out_q = []
    out_raw = []
    for ci, g in enumerate(geom):
        p = planes[ci]
        if max_h > 2 * g.h or max_v > 2 * g.v:
            raise NotImplementedError(
                "this pipeline handles factor-2 sampling ratios only "
                "(use the generic pipeline_t path)")
        if g.v < max_v:
            p = p[:h2]
        if g.h < max_h and g.v < max_v:
            p = sample.downsample_h2v2(p)
        elif g.h < max_h:
            p = sample.downsample_h2v1(p)
        elif g.v < max_v:
            p = sample.downsample_h1v2(p)
        p = layout.pad_plane(p, g.bh_pad * 8, g.bw_pad * 8)
        p = p[: g.bh_pad * 8, : g.bw_pad * 8]
        blocks = layout.blockify(p.astype(jnp.int32) - 128)
        qtbl = qluma if ci == 0 else qchroma
        if dering_on:
            szz = layout.to_zigzag(blocks).reshape(-1, 64)
            szz = dering.dering(szz, qtbl.reshape(64)[0], fp_one)
            blocks = layout.from_zigzag(
                szz.reshape(g.bh_pad, g.bw_pad, 64))
        coeffs = dct.fdct_islow(blocks)
        qz = quant.quantize_islow(coeffs, qtbl)
        if dering_on:  # post-quantize clamp (jcdctmgr.c:760-768)
            qz = jnp.clip(qz, -1023, 1023)
        zz = layout.to_zigzag(qz)
        zz = layout.add_dummy_blocks(zz.reshape(g.bh_pad, g.bw_pad, 64),
                                     g.bw, g.bh, g.h, g.v)
        raw = layout.to_zigzag(coeffs).reshape(g.bh_pad, g.bw_pad, 64)
        out_q.append(zz.astype(jnp.int16))
        out_raw.append(raw)
    return out_q, out_raw


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _encode_planes_gray(gray, mcus_x: int, mcus_y: int, geom: tuple,
                        dering_on: bool = False, qluma=None, fp_one=None):
    (g,) = geom
    ph, pw = mcus_y * 8, mcus_x * 8
    p = layout.pad_plane(gray, ph, pw)
    blocks = layout.blockify(p.astype(jnp.int32) - 128)
    if dering_on:
        szz = layout.to_zigzag(blocks).reshape(-1, 64)
        szz = dering.dering(szz, qluma.reshape(64)[0], fp_one)
        blocks = layout.from_zigzag(szz.reshape(g.bh_pad, g.bw_pad, 64))
    coeffs = dct.fdct_islow(blocks)
    qz = quant.quantize_islow(coeffs, qluma)
    if dering_on:
        qz = jnp.clip(qz, -1023, 1023)
    zz = layout.to_zigzag(qz).reshape(g.bh_pad, g.bw_pad, 64)
    raw = layout.to_zigzag(coeffs).reshape(g.bh_pad, g.bw_pad, 64)
    return [zz.astype(jnp.int16)], [raw]


def encode_planes(image: np.ndarray, samp: List[Tuple[int, int]],
                  qtables: List[np.ndarray], grayscale: bool = False,
                  dering_on: bool = False):
    """Run the device pipeline; returns (geometry, [np (bh,bw,64) int16],
    [np (bh,bw,64) int32 raw/unquantized])."""
    h, w = image.shape[:2]
    mcus_x, mcus_y, geom = geometry(w, h, samp)
    if grayscale:
        if image.ndim == 3:
            gray = np.asarray(
                color.rgb_to_gray(jnp.asarray(image)))
        else:
            gray = image
        q, raw = _encode_planes_gray(jnp.asarray(gray), mcus_x, mcus_y,
                                     tuple(geom), dering_on,
                                     qluma=jnp.asarray(qtables[0]),
                                     fp_one=jnp.float32(1.0))
    else:
        q, raw = _encode_planes_420(jnp.asarray(image), mcus_x, mcus_y,
                                    tuple(geom), dering_on,
                                    qluma=jnp.asarray(qtables[0]),
                                    qchroma=jnp.asarray(qtables[1]),
                                    fp_one=jnp.float32(1.0))
    q = [np.asarray(x) for x in q]
    raw = [np.asarray(x) for x in raw]
    return (mcus_x, mcus_y, geom), q, raw
