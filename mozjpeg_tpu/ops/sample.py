"""Chroma down/upsampling, exact integer semantics, batched over planes.

Downsample matches /root/reference/jcsample.c (h2v2_downsample bias 1,2,1,2;
h2v1_downsample bias 0,1,0,1). Fancy upsample matches /root/reference/jdsample.c
(triangle filter with the ordered-dither bias pattern).
"""
from __future__ import annotations

import jax.numpy as jnp


def downsample_h2v2(plane: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) uint8 -> (..., H/2, W/2); H, W must be even (pre-padded).

    out = (p00 + p01 + p10 + p11 + bias) >> 2 with bias = 1,2,1,2 along x.
    """
    x = plane.astype(jnp.int32)
    s = (x[..., 0::2, 0::2] + x[..., 0::2, 1::2] +
         x[..., 1::2, 0::2] + x[..., 1::2, 1::2])
    w = s.shape[-1]
    bias = jnp.where(jnp.arange(w) % 2 == 0, 1, 2).astype(jnp.int32)
    return ((s + bias) >> 2).astype(plane.dtype)


def downsample_h2v1(plane: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H, W/2); bias 0,1,0,1 along x (jcsample.c:247-250)."""
    x = plane.astype(jnp.int32)
    s = x[..., :, 0::2] + x[..., :, 1::2]
    w = s.shape[-1]
    bias = jnp.where(jnp.arange(w) % 2 == 0, 0, 1).astype(jnp.int32)
    return ((s + bias) >> 1).astype(plane.dtype)


def downsample_h1v2(plane: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H/2, W). jcsample.c has no special 1x2 kernel:
    this ratio routes through int_downsample with a CONSTANT +numpix/2
    bias (jcsample.c:152-199), not the h2v1 alternating bias."""
    x = plane.astype(jnp.int32)
    s = x[..., 0::2, :] + x[..., 1::2, :]
    return ((s + 1) >> 1).astype(plane.dtype)


def downsample_int(plane: jnp.ndarray, hexp: int, vexp: int) -> jnp.ndarray:
    """Generic integral-factor downsample (jcsample.c:152-199
    int_downsample): plain average with +numpix/2 rounding."""
    x = plane.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    numpix = hexp * vexp
    s = x.reshape(x.shape[:-2] + (h // vexp, vexp, w // hexp, hexp)) \
        .sum(axis=(-3, -1))
    return ((s + numpix // 2) // numpix).astype(plane.dtype)


def upsample_h2v1_fancy(plane: jnp.ndarray) -> jnp.ndarray:
    """Triangle-filter 2x horizontal upsample (jdsample.c:276-306).

    out[2i]   = (3*in[i] + in[i-1] + 1) >> 2   (first col: in[0])
    out[2i+1] = (3*in[i] + in[i+1] + 2) >> 2   (last col:  in[-1])
    """
    x = plane.astype(jnp.int32)
    left = jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    right = jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)
    even = (x * 3 + left + 1) >> 2
    odd = (x * 3 + right + 2) >> 2
    # interleave: the reference emits in[0] itself for output col 0 and
    # in[-1] itself for the final col
    out = jnp.stack([even, odd], axis=-1).reshape(*x.shape[:-1], x.shape[-1] * 2)
    out = out.at[..., :, 0].set(x[..., :, 0])
    out = out.at[..., :, -1].set(x[..., :, -1])
    return out.astype(plane.dtype)


def _h2v2_colsums(x: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """colsum = 3*this_row + other_row for every (outrow, col)."""
    return x * 3 + up


def upsample_h2v2_fancy(plane: jnp.ndarray) -> jnp.ndarray:
    """Triangle-filter 2x2 upsample, bit-exact vs jdsample.c h2v2_fancy_upsample.

    For each output row pair: colsum_v = 3*near_row + far_row (far = row above
    for even output rows, row below for odd), then horizontally:
      out[2j]   = (3*cs[j] + cs[j-1] + 8) >> 4  (first col: (cs*4+8)>>4)
      out[2j+1] = (3*cs[j] + cs[j+1] + 7) >> 4  (last col:  (cs*4+7)>>4)
    """
    x = plane.astype(jnp.int32)
    above = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    below = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    cs_even = x * 3 + above      # output rows 0, 2, 4, ...
    cs_odd = x * 3 + below       # output rows 1, 3, 5, ...
    h, w = x.shape[-2], x.shape[-1]
    cs = jnp.stack([cs_even, cs_odd], axis=-2).reshape(*x.shape[:-2], h * 2, w)

    left = jnp.concatenate([cs[..., :, :1], cs[..., :, :-1]], axis=-1)
    right = jnp.concatenate([cs[..., :, 1:], cs[..., :, -1:]], axis=-1)
    out_even = (cs * 3 + left + 8) >> 4
    out_odd = (cs * 3 + right + 7) >> 4
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(
        *cs.shape[:-1], w * 2)
    out = out.at[..., :, 0].set((cs[..., :, 0] * 4 + 8) >> 4)
    out = out.at[..., :, -1].set((cs[..., :, -1] * 4 + 7) >> 4)
    return out.astype(plane.dtype)


def upsample_h1v2_fancy(plane: jnp.ndarray) -> jnp.ndarray:
    """Vertical 1:2 triangle-filter upsample (jdsample.c:316-348
    h1v2_fancy_upsample): out[2r] = (3*in[r] + in[r-1] + 1) >> 2,
    out[2r+1] = (3*in[r] + in[r+1] + 2) >> 2; edges replicate."""
    x = plane.astype(jnp.int32)
    up = jnp.concatenate([x[:1], x[:-1]], axis=-2)
    dn = jnp.concatenate([x[1:], x[-1:]], axis=-2)
    e = (x * 3 + up + 1) >> 2
    o = (x * 3 + dn + 2) >> 2
    h, w = x.shape[-2], x.shape[-1]
    out = jnp.stack([e, o], axis=-2).reshape(x.shape[:-2] + (2 * h, w))
    return out.astype(plane.dtype)


def upsample_replicate(plane: jnp.ndarray, h: int, v: int) -> jnp.ndarray:
    """Plain pixel replication (jdsample.c h2v2_upsample / int_upsample)."""
    out = jnp.repeat(plane, v, axis=-2)
    return jnp.repeat(out, h, axis=-1)


def smooth_fullsize(plane: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Input smoothing for full-rate components (jcsample.c:395-455
    fullsize_smooth_downsample): out = (p*(1-8*SF) + neigh*SF) with
    SF = sf/1024, scaled by 2^16; edges replicate."""
    x = jnp.pad(plane.astype(jnp.int32), 1, mode="edge")
    member = x[1:-1, 1:-1]
    neigh = (x[:-2, :-2] + x[:-2, 1:-1] + x[:-2, 2:]
             + x[1:-1, :-2] + x[1:-1, 2:]
             + x[2:, :-2] + x[2:, 1:-1] + x[2:, 2:])
    out = (member * (65536 - sf * 512) + neigh * (sf * 64) + 32768) >> 16
    return out.astype(plane.dtype)


def downsample_h2v2_smooth(plane: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Smoothing 2x2 downsample (jcsample.c:307-392 h2v2_smooth_downsample):
    member*(16384-80*sf) + (2*edge_adjacent + corner)*(16*sf), +32768 >> 16."""
    h, w = plane.shape[-2], plane.shape[-1]
    x = jnp.pad(plane.astype(jnp.int32), 1, mode="edge")

    def s(dr, dc):
        return x[1 + dr:1 + dr + h, 1 + dc:1 + dc + w][0::2, 0::2]

    member = s(0, 0) + s(0, 1) + s(1, 0) + s(1, 1)
    edge = (s(-1, 0) + s(-1, 1) + s(2, 0) + s(2, 1)
            + s(0, -1) + s(1, -1) + s(0, 2) + s(1, 2))
    corner = s(-1, -1) + s(-1, 2) + s(2, -1) + s(2, 2)
    out = (member * (16384 - sf * 80) + (2 * edge + corner) * (sf * 16)
           + 32768) >> 16
    return out.astype(plane.dtype)
