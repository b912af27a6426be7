"""Batched exact-integer 8x8 DCTs (JAX, int32).

These reproduce the reference's "islow" Loeffler-Ligtenberg-Moshovitz
fixed-point DCT bit-for-bit (CONST_BITS=13, PASS1_BITS=2, 32-bit arithmetic —
the reference's no-SIMD build uses `int` DCTELEMs, /root/reference/jdct.h:37),
but as array programs over an arbitrary batch of blocks: every butterfly line
is a VPU-wide vector op over all blocks at once instead of a scalar loop.

Parity references (semantics): /root/reference/jfdctint.c (forward),
/root/reference/jidctint.c (inverse), /root/reference/jdmaster.c
prepare_range_limit_table (sample wraparound clamp).

Shapes: (..., 8, 8) int32 in natural (row, col) order.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CONST_BITS = 13
PASS1_BITS = 2

FIX_0_298631336 = 2446
FIX_0_390180644 = 3196
FIX_0_541196100 = 4433
FIX_0_765366865 = 6270
FIX_0_899976223 = 7373
FIX_1_175875602 = 9633
FIX_1_501321110 = 12299
FIX_1_847759065 = 15137
FIX_1_961570560 = 16069
FIX_2_053119869 = 16819
FIX_2_562915447 = 20995
FIX_3_072711026 = 25172


def _descale(x, n: int):
    """(x + 2^(n-1)) >> n with arithmetic shift — exact C DESCALE."""
    return (x + (1 << (n - 1))) >> n


def _fdct_butterfly(d, shift_even: int, descale_n: int):
    """One 1-D LLM forward pass on 8 lanes d[0..7]; returns 8 lanes.

    shift_even: left shift applied to the even 0/4 outputs (pass 1) — when
    negative, descale by -shift_even instead (pass 2).
    """
    tmp0 = d[0] + d[7]
    tmp7 = d[0] - d[7]
    tmp1 = d[1] + d[6]
    tmp6 = d[1] - d[6]
    tmp2 = d[2] + d[5]
    tmp5 = d[2] - d[5]
    tmp3 = d[3] + d[4]
    tmp4 = d[3] - d[4]

    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    if shift_even >= 0:
        o0 = (tmp10 + tmp11) << shift_even
        o4 = (tmp10 - tmp11) << shift_even
    else:
        o0 = _descale(tmp10 + tmp11, -shift_even)
        o4 = _descale(tmp10 - tmp11, -shift_even)

    z1 = (tmp12 + tmp13) * FIX_0_541196100
    o2 = _descale(z1 + tmp13 * FIX_0_765366865, descale_n)
    o6 = _descale(z1 + tmp12 * (-FIX_1_847759065), descale_n)

    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * FIX_1_175875602

    tmp4 = tmp4 * FIX_0_298631336
    tmp5 = tmp5 * FIX_2_053119869
    tmp6 = tmp6 * FIX_3_072711026
    tmp7 = tmp7 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560)
    z4 = z4 * (-FIX_0_390180644)

    z3 = z3 + z5
    z4 = z4 + z5

    o7 = _descale(tmp4 + z1 + z3, descale_n)
    o5 = _descale(tmp5 + z2 + z4, descale_n)
    o3 = _descale(tmp6 + z2 + z3, descale_n)
    o1 = _descale(tmp7 + z1 + z4, descale_n)
    return o0, o1, o2, o3, o4, o5, o6, o7


def fdct_islow(blocks: jnp.ndarray) -> jnp.ndarray:
    """Exact islow forward DCT over (..., 8, 8) int32 centered samples.

    Input: samples - 128 (int32). Output: coefficients scaled ×8 (the caller
    divides by 8·quantval), identical to jpeg_fdct_islow.
    """
    x = blocks.astype(jnp.int32)
    # Pass 1: process rows (vector lanes = column index)
    d = [x[..., :, i] for i in range(8)]
    o = _fdct_butterfly(d, PASS1_BITS, CONST_BITS - PASS1_BITS)
    y = jnp.stack(o, axis=-1)
    # Pass 2: process columns
    d = [y[..., i, :] for i in range(8)]
    o = _fdct_butterfly(d, -PASS1_BITS, CONST_BITS + PASS1_BITS)
    return jnp.stack(o, axis=-2)


def _idct_butterfly(d, descale_n: int):
    """One 1-D LLM inverse pass; d[0..7] are the 8 frequency lanes."""
    z2 = d[2]
    z3 = d[6]
    z1 = (z2 + z3) * FIX_0_541196100
    tmp2 = z1 + z3 * (-FIX_1_847759065)
    tmp3 = z1 + z2 * FIX_0_765366865

    z2 = d[0]
    z3 = d[4]
    tmp0 = (z2 + z3) << CONST_BITS
    tmp1 = (z2 - z3) << CONST_BITS

    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    t0, t1, t2, t3 = d[7], d[5], d[3], d[1]
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * FIX_1_175875602

    t0 = t0 * FIX_0_298631336
    t1 = t1 * FIX_2_053119869
    t2 = t2 * FIX_3_072711026
    t3 = t3 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560)
    z4 = z4 * (-FIX_0_390180644)

    z3 = z3 + z5
    z4 = z4 + z5

    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    o0 = _descale(tmp10 + t3, descale_n)
    o7 = _descale(tmp10 - t3, descale_n)
    o1 = _descale(tmp11 + t2, descale_n)
    o6 = _descale(tmp11 - t2, descale_n)
    o2 = _descale(tmp12 + t1, descale_n)
    o5 = _descale(tmp12 - t1, descale_n)
    o3 = _descale(tmp13 + t0, descale_n)
    o4 = _descale(tmp13 - t0, descale_n)
    return o0, o1, o2, o3, o4, o5, o6, o7


# range_limit contents as a closed form over idx = value & RANGE_MASK
# (post-IDCT wraparound table, /root/reference/jdmaster.c prepare_range_limit_table)
def _range_limit(v: jnp.ndarray, precision: int = 8) -> jnp.ndarray:
    m = (1 << precision) - 1          # MAXJSAMPLE
    ctr = 1 << (precision - 1)
    mask = 4 * (m + 1) - 1
    idx = v & mask
    out = jnp.where(idx < ctr, idx + ctr,
                    jnp.where(idx < 2 * (m + 1), m,
                              jnp.where(idx < 4 * (m + 1) - ctr, 0,
                                        idx - (4 * (m + 1) - ctr))))
    return out.astype(jnp.uint8 if precision <= 8 else jnp.uint16)


def idct_islow(coeffs: jnp.ndarray, qtbl: jnp.ndarray,
               pass1_bits: int = PASS1_BITS,
               precision: int = 8) -> jnp.ndarray:
    """Exact islow dequantize+IDCT: (..., 8, 8) int coeffs × (8, 8) or
    broadcastable quant table → (..., 8, 8) samples (centered, wraparound
    range-limited exactly like the reference)."""
    x = coeffs.astype(jnp.int32) * qtbl.astype(jnp.int32)
    # Pass 1: columns (lanes = row index along dim -2)
    d = [x[..., i, :] for i in range(8)]
    o = _idct_butterfly(d, CONST_BITS - pass1_bits)
    y = jnp.stack(o, axis=-2)
    # Pass 2: rows, final descale + range limit
    d = [y[..., :, i] for i in range(8)]
    o = _idct_butterfly(d, CONST_BITS + pass1_bits + 3)
    return _range_limit(jnp.stack(o, axis=-1), precision)


# ---------------------------------------------------------------------------
# numpy reference twins (used by tests and the host fallback path)
# ---------------------------------------------------------------------------

def fdct_islow_np(blocks: np.ndarray) -> np.ndarray:
    return np.asarray(fdct_islow(jnp.asarray(blocks, dtype=jnp.int32)))


def idct_islow_np(coeffs: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    return np.asarray(idct_islow(jnp.asarray(coeffs, dtype=jnp.int32),
                                 jnp.asarray(qtbl, dtype=jnp.int32)))


# ---------------------------------------------------------------------------
# Coefficient-major ("t") layout: blocks as (8, 8, N) / (64, N) with the
# block index in the TPU lane dimension. The (..., 8, 8) layout leaves 120 of
# 128 lanes idle; with N in lanes every butterfly line runs at full VPU width.
# ---------------------------------------------------------------------------

def fdct_islow_t(x: jnp.ndarray, pass1_bits: int = PASS1_BITS
                 ) -> jnp.ndarray:
    """Exact islow forward DCT on (8, 8, N) int32 centered samples.

    pass1_bits is 2 for 8-bit samples, 1 for 12-bit (jfdctint.c:81-85)."""
    d = [x[:, c, :] for c in range(8)]                 # pass 1 over rows
    o = _fdct_butterfly(d, pass1_bits, CONST_BITS - pass1_bits)
    y = jnp.stack(o, axis=1)                           # (8, 8, N)
    d = [y[r, :, :] for r in range(8)]                 # pass 2 over columns
    o = _fdct_butterfly(d, -pass1_bits, CONST_BITS + pass1_bits)
    return jnp.stack(o, axis=0)


def idct_islow_t(coeffs: jnp.ndarray, qtbl81: jnp.ndarray,
                 pass1_bits: int = PASS1_BITS,
                 precision: int = 8) -> jnp.ndarray:
    """Exact islow dequant+IDCT on (8, 8, N) int coeffs; qtbl81 (8, 8, 1)."""
    x = coeffs.astype(jnp.int32) * qtbl81.astype(jnp.int32)
    d = [x[r, :, :] for r in range(8)]                 # pass 1: columns
    o = _idct_butterfly(d, CONST_BITS - pass1_bits)
    y = jnp.stack(o, axis=0)
    d = [y[:, c, :] for c in range(8)]                 # pass 2: rows
    o = _idct_butterfly(d, CONST_BITS + pass1_bits + 3)
    return _range_limit(jnp.stack(o, axis=1), precision)
