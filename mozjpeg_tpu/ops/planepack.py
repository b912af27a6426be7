"""Device half of the sample-plane pack (native/planepack.cpp format).

Lossless 1-D left-predicted delta coding of uint8 sample streams with
per-16-sample-subtile exact bit widths (0..8): natural images move
~0.6-1.0 B/px instead of 1.5 over the tunnel, in BOTH directions:

  encode: host packs prepped YCbCr planes (C++), device EXPANDS here
          before the batched p1 (pipeline_t);
  decode: device PACKS rendered planes here, host expands (C++).

TPU shape notes: the only gather/scatter is per WORD (≈ total/5
elements); sample extraction/insertion is 8 static per-width dense
variants selected by the width lane (all shifts/masks are Python-loop
constants, so XLA sees pure elementwise code). The mod-256 prefix sum
that undoes the prediction is an int32 cumsum masked to 8 bits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

T = 16
WPS = np.array([0, 1, 1, 2, 2, 3, 3, 4, 4], np.int32)  # words/subtile


def widths_to_words_host(widths: np.ndarray) -> np.ndarray:
    """Nibble-pack per-subtile widths into u32 words (wire layout:
    8 widths per word, subtile 8j+k in bits [4k, 4k+4) from the MSB)."""
    nst = widths.shape[-1]
    nw = -(-nst // 8)
    w = np.zeros(widths.shape[:-1] + (nw * 8,), np.uint32)
    w[..., :nst] = widths
    w = w.reshape(widths.shape[:-1] + (nw, 8))
    out = np.zeros(widths.shape[:-1] + (nw,), np.uint32)
    for k in range(8):
        out |= w[..., k] << np.uint32(28 - 4 * k)
    return out


def _widths_from_words(wwords, nst: int):
    """(nw,) u32 -> (nst,) int32 widths (inverse of the host pack)."""
    cols = [(wwords >> (28 - 4 * k)) & 15 for k in range(8)]
    return jnp.stack(cols, axis=-1).reshape(-1)[:nst].astype(jnp.int32)


def _unzigzag(z):
    z = z.astype(jnp.int32)
    return (z >> 1) ^ -(z & 1)


def _extract_w(tw, w: int):
    """(nst, 4) u32 subtile words -> (nst, 16) int32 fields at width w
    (static shift/mask pattern; w >= 1)."""
    twi = tw.astype(jnp.int32)
    cols = []
    mask = (1 << w) - 1
    for k in range(T):
        bo = k * w
        i0, sh = bo >> 5, bo & 31
        if sh + w <= 32:
            v = (twi[:, i0] >> (32 - sh - w)) & mask
        else:
            w2 = w - (32 - sh)
            v = ((twi[:, i0] << w2) | ((twi[:, i0 + 1] >> (32 - w2))
                                       & ((1 << w2) - 1))) & mask
        cols.append(v)
    return jnp.stack(cols, axis=1)


def _insert_w(z, w: int):
    """(nst, 16) int32 fields -> (nst, 4) int32 subtile words at width
    w (the exact inverse of _extract_w)."""
    nst = z.shape[0]
    mask = (1 << w) - 1
    words = [jnp.zeros((nst,), jnp.int32) for _ in range(4)]
    for k in range(T):
        v = z[:, k] & mask
        bo = k * w
        i0, sh = bo >> 5, bo & 31
        if sh + w <= 32:
            words[i0] = words[i0] | (v << (32 - sh - w))
        else:
            w2 = w - (32 - sh)
            words[i0] = words[i0] | ((v >> w2) & ((1 << (w - w2)) - 1))
            words[i0 + 1] = words[i0 + 1] | (v << (32 - w2))
    return jnp.stack(words, axis=1)


def expand_stream(words, widths, total: int, base=None):
    """(capw,) u32 payload + (nst,) int32 widths -> (total,) uint8.

    base: optional scalar word offset of this image's payload inside a
    shared flat buffer (the batched upload concatenates images' payloads
    with no per-image padding)."""
    nst = widths.shape[0]
    capw = words.shape[0]
    # WPS is COPIED per trace: converting the same numpy object in
    # several traces makes jax hoist one shared device constant, whose
    # executables then lose their lifted-constant binding when program
    # sets interleave (codec/trellis.py _ltbl_lookup has the history)
    wps = jnp.asarray(WPS.copy())[widths]
    off = jnp.cumsum(wps) - wps
    if base is not None:
        off = off + base
    idx = jnp.clip(off[:, None] + jnp.arange(4)[None, :], 0, capw - 1)
    tw = words[idx]                                       # (nst, 4)

    z = jnp.zeros((nst, T), jnp.int32)
    for w in range(1, 9):
        z = jnp.where((widths == w)[:, None], _extract_w(tw, w), z)
    d8 = (_unzigzag(z) & 255).reshape(-1)[:total]
    s = (jnp.int32(128) + jnp.cumsum(d8)) & 255
    return s.astype(jnp.uint8)


def pack_stream(samples, nst: int, capw: int):
    """(total,) uint8 -> (words (capw,) u32, widths (nst,) i32,
    nwords ()). Bit-identical to native mj_plane_pack."""
    total = samples.shape[0]
    s = samples.astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), 128, jnp.int32), s[:-1]])
    d8 = (s - prev) & 255
    ds = ((d8 + 128) & 255) - 128
    z = ((ds << 1) ^ (ds >> 31)) & 255
    pad = nst * T - total
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad,), jnp.int32)])
    zt = z.reshape(nst, T)
    mx = jnp.max(zt, axis=1)
    widths = jnp.where(mx > 0, 32 - jax.lax.clz(jnp.maximum(mx, 1)), 0)
    wps = jnp.asarray(WPS.copy())[widths]   # see expand_stream note
    off = jnp.cumsum(wps) - wps
    nwords = off[-1] + wps[-1]

    w_all = jnp.zeros((nst, 4), jnp.int32)
    for w in range(1, 9):
        w_all = jnp.where((widths == w)[:, None], _insert_w(zt, w), w_all)
    slot = jnp.arange(4)[None, :]
    live = slot < wps[:, None]
    didx = jnp.where(live, off[:, None] + slot, capw)
    words = jnp.zeros((capw,), jnp.int32).at[didx.reshape(-1)].add(
        jnp.where(live, w_all, 0).reshape(-1), mode="drop")
    return jax.lax.bitcast_convert_type(words, jnp.uint32), widths, \
        nwords
