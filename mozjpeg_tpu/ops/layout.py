"""Plane padding, blockification, zigzag, and MCU dummy-block fill.

The reference pads via expand_right_edge (/root/reference/jcsample.c:99) and
row duplication in the prep controller; dummy blocks at MCU edges get
DC-of-neighbor + zero AC (/root/reference/jccoefct.c:300-347, multi-pass
variant). Here every step is a whole-plane array op.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..consts import JPEG_ZIGZAG


def pad_plane(plane: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Edge-replicate (..., H, W) up to (..., ph, pw)."""
    h, w = plane.shape[-2], plane.shape[-1]
    if pw > w:
        plane = jnp.concatenate(
            [plane, jnp.repeat(plane[..., :, -1:], pw - w, axis=-1)], axis=-1)
    if ph > h:
        plane = jnp.concatenate(
            [plane, jnp.repeat(plane[..., -1:, :], ph - h, axis=-2)], axis=-2)
    return plane


def blockify(plane: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H//8, W//8, 8, 8)."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 8, 8, w // 8, 8)
    return jnp.moveaxis(x, -3, -2)


def unblockify(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., bh, bw, 8, 8) -> (..., bh*8, bw*8)."""
    *lead, bh, bw, _, _ = blocks.shape
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(*lead, bh * 8, bw * 8)


_ZZ_INV = np.argsort(JPEG_ZIGZAG)


def to_zigzag(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) natural order -> (..., 64) zigzag order.

    Static slices + stack instead of a gather: a 64-index gather from a
    computed producer makes XLA CPU's fusion recompute the producer per
    index (observed 80 s compiles); slicing compiles in constant time and
    lowers to a pure layout transpose on TPU.
    """
    flat = blocks.reshape(*blocks.shape[:-2], 64)
    return jnp.stack([flat[..., int(i)] for i in JPEG_ZIGZAG], axis=-1)


def from_zigzag(zz: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) zigzag -> (..., 8, 8) natural."""
    out = jnp.stack([zz[..., int(i)] for i in _ZZ_INV], axis=-1)
    return out.reshape(*zz.shape[:-1], 8, 8)


def add_dummy_blocks(zz: jnp.ndarray, real_bw: int, real_bh: int,
                     h_samp: int, v_samp: int) -> jnp.ndarray:
    """Fill MCU-padding dummy blocks with [prev DC, 0, ..., 0].

    zz: (bh_padded, bw_padded, 64) zigzag coeffs where blocks beyond
    (real_bh, real_bw) hold garbage. Matches compress_first_pass
    (/root/reference/jccoefct.c:300-347): right dummies copy the DC of the
    last real block in their row; bottom dummy rows copy, per MCU column,
    the DC of the row above's last in-MCU block.
    """
    bh, bw, _ = zz.shape
    if real_bw == bw and real_bh == bh:
        return zz
    # Pure concat/broadcast ops — scatters (.at[].set) fused with the large
    # DCT producer trigger pathological recompute-fusion in XLA CPU.
    zz = zz[:real_bh, :real_bw]
    if real_bw < bw:
        last_dc = zz[:, real_bw - 1:real_bw, 0:1]        # (bh, 1, 1)
        dummy = jnp.concatenate(
            [jnp.broadcast_to(last_dc, (real_bh, bw - real_bw, 1)),
             jnp.zeros((real_bh, bw - real_bw, 63), dtype=zz.dtype)], axis=-1)
        zz = jnp.concatenate([zz, dummy], axis=1)
    # Bottom dummy rows: DC per MCU column := DC of (row-1, last h-block of
    # the MCU); every dummy row below the first repeats it (the copy chain
    # through all-identical rows is a fixed point after the first row).
    if real_bh < bh:
        src = zz[real_bh - 1, :, 0].reshape(bw // h_samp, h_samp)[:, -1:]
        dcrow = jnp.broadcast_to(src, (bw // h_samp, h_samp)).reshape(bw)
        row = jnp.concatenate(
            [dcrow[:, None], jnp.zeros((bw, 63), dtype=zz.dtype)], axis=-1)
        # after the first dummy row, src becomes the dummy row's own DCs,
        # which equal dcrow again -> all dummy rows identical
        rows = jnp.broadcast_to(row[None], (bh - real_bh, bw, 64))
        zz = jnp.concatenate([zz, rows], axis=0)
    return zz


# ---------------------------------------------------------------------------
# Coefficient-major ("t") layout helpers: (64, N) with blocks in lanes.
# ---------------------------------------------------------------------------

def blockify_t(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (8, 8, N) with N = (H//8)*(W//8) raster block order."""
    h, w = plane.shape
    x = plane.reshape(h // 8, 8, w // 8, 8)
    return jnp.transpose(x, (1, 3, 0, 2)).reshape(8, 8, -1)


def unblockify_t(blocks: jnp.ndarray, bh: int, bw: int) -> jnp.ndarray:
    """(8, 8, N) -> (bh*8, bw*8)."""
    x = blocks.reshape(8, 8, bh, bw)
    return jnp.transpose(x, (2, 0, 3, 1)).reshape(bh * 8, bw * 8)


def to_zigzag_t(blocks: jnp.ndarray) -> jnp.ndarray:
    """(8, 8, N) natural -> (64, N) zigzag."""
    flat = blocks.reshape(64, -1)
    return jnp.stack([flat[int(i)] for i in JPEG_ZIGZAG], axis=0)


def from_zigzag_t(zz: jnp.ndarray) -> jnp.ndarray:
    """(64, N) zigzag -> (8, 8, N) natural."""
    out = jnp.stack([zz[int(i)] for i in _ZZ_INV], axis=0)
    return out.reshape(8, 8, -1)


def add_dummy_blocks_t(zz: jnp.ndarray, real_bw: int, real_bh: int,
                       bw: int, bh: int, h_samp: int, v_samp: int
                       ) -> jnp.ndarray:
    """(64, real_bh*real_bw) zigzag planes -> (64, bh*bw) with MCU dummy
    blocks appended (DC copy, zero AC).

    Same semantics as add_dummy_blocks (jccoefct.c:300-347) in t layout.
    """
    z = zz.reshape(64, real_bh, real_bw)
    if real_bw == bw and real_bh == bh:
        return z.reshape(64, bh * bw)
    if real_bw < bw:
        last_dc = z[0:1, :, real_bw - 1:real_bw]       # (1, bh, 1)
        dummy = jnp.concatenate(
            [jnp.broadcast_to(last_dc, (1, real_bh, bw - real_bw)),
             jnp.zeros((63, real_bh, bw - real_bw), dtype=z.dtype)], axis=0)
        z = jnp.concatenate([z, dummy], axis=2)
    if real_bh < bh:
        src = z[0, real_bh - 1, :].reshape(bw // h_samp, h_samp)[:, -1:]
        dcrow = jnp.broadcast_to(src, (bw // h_samp, h_samp)).reshape(bw)
        row = jnp.concatenate(
            [dcrow[None, :], jnp.zeros((63, bw), dtype=z.dtype)], axis=0)
        rows = jnp.broadcast_to(row[:, None, :], (64, bh - real_bh, bw))
        z = jnp.concatenate([z, rows], axis=1)
    return z.reshape(64, bh * bw)
