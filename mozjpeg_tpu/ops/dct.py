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

import jax
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


# ---------------------------------------------------------------------------
# AAN "ifast" DCT (jfdctfst.c / jidctfst.c, plain-C build: DCTELEM = int,
# CONST_BITS = 8, MULTIPLY rounds, final IDESCALE is a plain shift).
# ---------------------------------------------------------------------------

AANSCALES = np.asarray([
    16384, 22725, 21407, 19266, 16384, 12873, 8867, 4520,
    22725, 31521, 29692, 26722, 22725, 17855, 12299, 6270,
    21407, 29692, 27969, 25172, 21407, 16819, 11585, 5906,
    19266, 26722, 25172, 22654, 19266, 15137, 10426, 5315,
    16384, 22725, 21407, 19266, 16384, 12873, 8867, 4520,
    12873, 17855, 16819, 15137, 12873, 10114, 6967, 3552,
    8867, 12299, 11585, 10426, 8867, 6967, 4799, 2446,
    4520, 6270, 5906, 5315, 4520, 3552, 2446, 1247,
], dtype=jnp.int32).reshape(8, 8)

_F_0_382 = 98     # FIX(0.382683433) at CONST_BITS=8
_F_0_541 = 139
_F_0_707 = 181
_F_1_306 = 334
_F_1_082 = 277    # idct consts
_F_1_414 = 362
_F_1_847 = 473
_F_2_613 = 669


def _mul8(v, c):
    """ifast MULTIPLY: plain arithmetic shift, NO rounding (jfdctfst.c:101
    and jidctfst.c:114 redefine DESCALE as RIGHT_SHIFT)."""
    return (v * c) >> 8


def _fdct_ifast_1d(d):
    t0 = d[0] + d[7]
    t7 = d[0] - d[7]
    t1 = d[1] + d[6]
    t6 = d[1] - d[6]
    t2 = d[2] + d[5]
    t5 = d[2] - d[5]
    t3 = d[3] + d[4]
    t4 = d[3] - d[4]
    t10 = t0 + t3
    t13 = t0 - t3
    t11 = t1 + t2
    t12 = t1 - t2
    o0 = t10 + t11
    o4 = t10 - t11
    z1 = _mul8(t12 + t13, _F_0_707)
    o2 = t13 + z1
    o6 = t13 - z1
    t10 = t4 + t5
    t11 = t5 + t6
    t12 = t6 + t7
    z5 = _mul8(t10 - t12, _F_0_382)
    z2 = _mul8(t10, _F_0_541) + z5
    z4 = _mul8(t12, _F_1_306) + z5
    z3 = _mul8(t11, _F_0_707)
    z11 = t7 + z3
    z13 = t7 - z3
    o5 = z13 + z2
    o3 = z13 - z2
    o1 = z11 + z4
    o7 = z11 - z4
    return [o0, o1, o2, o3, o4, o5, o6, o7]


def fdct_ifast_t(x: jnp.ndarray) -> jnp.ndarray:
    """AAN forward DCT on (8, 8, N) int32 centered samples; output carries
    the AAN scale factors (divisors absorb them)."""
    d = [x[:, c, :] for c in range(8)]                 # rows first
    o = _fdct_ifast_1d(d)
    y = jnp.stack(o, axis=1)
    d = [y[r, :, :] for r in range(8)]                 # then columns
    o = _fdct_ifast_1d(d)
    return jnp.stack(o, axis=0)


def ifast_divisors(qtbl: "object") -> "object":
    """Encoder divisors: DESCALE(quantval * aanscales, 14-3) with the
    rounding add (jcdctmgr.c:296-345 uses jdct.h's rounding DESCALE)."""
    import numpy as _np
    aan = _np.asarray(AANSCALES).astype(_np.int64)
    q = _np.asarray(qtbl).astype(_np.int64).reshape(8, 8)
    return ((q * aan + (1 << 10)) >> 11).astype(_np.int32)


def quantize_ifast_t(coeffs: jnp.ndarray, dtbl81: jnp.ndarray) -> jnp.ndarray:
    """Quantize by the scaled divisor: the reciprocal-multiply path of
    jcdctmgr quantize() evaluates to floor((|x| + d//2) / d) for every
    divisor parity (error analysis of compute_reciprocal's under/over
    approximation at 32+b bits)."""
    d = dtbl81.astype(jnp.int32)
    a = jnp.abs(coeffs)
    mag = (a + (d >> 1)) // d
    return jnp.where(coeffs < 0, -mag, mag).astype(jnp.int16)


def rescale_ifast_t(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Descale AAN output to nominal islow range for the trellis raw save
    (jcdctmgr.c:730-748): x*32768 +- s, truncating division by 2s."""
    s = AANSCALES.reshape(8, 8, 1)
    num = jnp.where(coeffs >= 0, coeffs * 32768 + s, coeffs * 32768 - s)
    return jax.lax.div(num, 2 * s)


def ifast_multipliers(qtbl: "object") -> "object":
    """Decoder multiplier table: DESCALE(quantval * aanscales, 14-2)
    (jddctmgr.c ifast branch)."""
    import numpy as _np
    aan = _np.asarray(AANSCALES).astype(_np.int64)
    q = _np.asarray(qtbl).astype(_np.int64).reshape(8, 8)
    return ((q * aan + (1 << 11)) >> 12).astype(_np.int32)


def _idct_ifast_1d(d):
    t10 = d[0] + d[4]
    t11 = d[0] - d[4]
    t13 = d[2] + d[6]
    t12 = _mul8(d[2] - d[6], _F_1_414) - t13
    t0 = t10 + t13
    t3 = t10 - t13
    t1 = t11 + t12
    t2 = t11 - t12
    z13 = d[5] + d[3]
    z10 = d[5] - d[3]
    z11 = d[1] + d[7]
    z12 = d[1] - d[7]
    t7 = z11 + z13
    t11 = _mul8(z11 - z13, _F_1_414)
    z5 = _mul8(z10 + z12, _F_1_847)
    t10 = _mul8(z12, _F_1_082) - z5
    t12 = _mul8(z10, -_F_2_613) + z5
    t6 = t12 - t7
    t5 = t11 - t6
    t4 = t10 + t5
    return [t0 + t7, t1 + t6, t2 + t5, t3 - t4, t3 + t4, t2 - t5,
            t1 - t6, t0 - t7]


def idct_ifast(coeffs: jnp.ndarray, ifmtbl: jnp.ndarray,
               precision: int = 8) -> jnp.ndarray:
    """AAN IDCT: (..., 8, 8) coeffs x multiplier table -> samples.
    Final descale is a PLAIN shift (IDESCALE without accurate rounding,
    jidctfst.c:162)."""
    x = coeffs.astype(jnp.int32) * ifmtbl.astype(jnp.int32)
    d = [x[..., i, :] for i in range(8)]               # columns
    o = _idct_ifast_1d(d)
    y = jnp.stack(o, axis=-2)
    d = [y[..., :, i] for i in range(8)]               # rows
    o = _idct_ifast_1d(d)
    out = jnp.stack(o, axis=-1) >> 5                   # PASS1_BITS + 3
    return _range_limit(out, precision)


# ---------------------------------------------------------------------------
# Float AAN DCT (jfdctflt.c / jidctflt.c): single-precision butterflies;
# divisors/multipliers computed in double, stored float.  minimum() guards
# stop XLA's FMA contraction so every f32 product rounds like C.
# ---------------------------------------------------------------------------

_NOFMA = np.float32(3.0e38)


def _g(x):
    return jnp.minimum(x, _NOFMA)


_AAN_F = (1.0, 1.387039845, 1.306562965, 1.175875602,
          1.0, 0.785694958, 0.541196100, 0.275899379)


def _fdct_float_1d(d):
    f = jnp.float32
    tmp0 = d[0] + d[7]
    tmp7 = d[0] - d[7]
    tmp1 = d[1] + d[6]
    tmp6 = d[1] - d[6]
    tmp2 = d[2] + d[5]
    tmp5 = d[2] - d[5]
    tmp3 = d[3] + d[4]
    tmp4 = d[3] - d[4]
    t10 = tmp0 + tmp3
    t13 = tmp0 - tmp3
    t11 = tmp1 + tmp2
    t12 = tmp1 - tmp2
    o0 = t10 + t11
    o4 = t10 - t11
    z1 = _g((t12 + t13) * f(0.707106781))
    o2 = t13 + z1
    o6 = t13 - z1
    t10 = tmp4 + tmp5
    t11 = tmp5 + tmp6
    t12 = tmp6 + tmp7
    z5 = _g((t10 - t12) * f(0.382683433))
    z2 = _g(f(0.541196100) * t10) + z5
    z4 = _g(f(1.306562965) * t12) + z5
    z3 = _g(t11 * f(0.707106781))
    z11 = tmp7 + z3
    z13 = tmp7 - z3
    return [o0, z11 + z4, o2, z13 - z2, o4, z13 + z2, o6, z11 - z4]


def fdct_float_t(x: jnp.ndarray) -> jnp.ndarray:
    """(8, 8, N) float32 centered samples -> AAN-scaled float coeffs."""
    d = [x[:, c, :] for c in range(8)]
    o = _fdct_float_1d(d)
    y = jnp.stack(o, axis=1)
    d = [y[r, :, :] for r in range(8)]
    o = _fdct_float_1d(d)
    return jnp.stack(o, axis=0)


def float_divisors(qtbl: "object") -> "object":
    """1 / (quantval * aan_r * aan_c * 8), double math, stored float
    (jcdctmgr.c JDCT_FLOAT divisor branch)."""
    import numpy as _np
    q = _np.asarray(qtbl, dtype=_np.float64).reshape(8, 8)
    aan = _np.asarray(_AAN_F, dtype=_np.float64)
    return (1.0 / (q * aan[:, None] * aan[None, :] * 8.0)) \
        .astype(_np.float32)


def quantize_float_t(coeffs: jnp.ndarray, div81: jnp.ndarray) -> jnp.ndarray:
    """(JCOEF)((int)(v * divisor + 16384.5) - 16384) — quantize_float."""
    temp = _g(coeffs * div81) + jnp.float32(16384.5)
    return (temp.astype(jnp.int32) - 16384).astype(jnp.int16)


def rescale_float_t(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Trellis raw save: two sequential double divisions by the AAN scale
    factors, round-half-away to int (jcdctmgr.c forward_DCT_float dst).

    f64 is unavailable under jit on TPU; a reciprocal multiply with one
    float-float Newton correction reproduces the double quotient to
    ~1e-10 relative, which survives the integer rounding."""
    import numpy as _np
    aan = _np.asarray(_AAN_F, dtype=_np.float64)
    a2 = (aan[:, None] * aan[None, :])
    r = jnp.asarray((1.0 / a2).astype(_np.float32).reshape(8, 8, 1))
    a_hi = jnp.asarray(a2.astype(_np.float32).reshape(8, 8, 1))
    a_lo = jnp.asarray((a2 - a2.astype(_np.float32).astype(_np.float64))
                       .astype(_np.float32).reshape(8, 8, 1))
    q1 = _g(coeffs * r)
    resid = (coeffs - _g(q1 * a_hi)) - _g(q1 * a_lo)
    q = q1 + _g(resid * r)
    half = jnp.where(q >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    return (q + half).astype(jnp.int32)


def float_multipliers(qtbl: "object") -> "object":
    """Decoder table: (float)(quantval * aan_r * aan_c)
    (jddctmgr.c JDCT_FLOAT branch)."""
    import numpy as _np
    q = _np.asarray(qtbl, dtype=_np.float64).reshape(8, 8)
    aan = _np.asarray(_AAN_F, dtype=_np.float64)
    return (q * aan[:, None] * aan[None, :]).astype(_np.float32)


def _idct_float_1d(d, second_pass, center=0.0):
    f = jnp.float32
    d0 = d[0] + f(center) if second_pass else d[0]
    t10 = d0 + d[4]
    t11 = d0 - d[4]
    t13 = d[2] + d[6]
    t12 = _g((d[2] - d[6]) * f(1.414213562)) - t13
    t0 = t10 + t13
    t3 = t10 - t13
    t1 = t11 + t12
    t2 = t11 - t12
    z13 = d[5] + d[3]
    z10 = d[5] - d[3]
    z11 = d[1] + d[7]
    z12 = d[1] - d[7]
    t7 = z11 + z13
    t11 = _g((z11 - z13) * f(1.414213562))
    z5 = _g((z10 + z12) * f(1.847759065))
    t10 = z5 - _g(z12 * f(1.082392200))
    t12 = z5 - _g(z10 * f(2.613125930))
    t6 = t12 - t7
    t5 = t11 - t6
    t4 = t10 - t5
    # note: rows 3/4 map +/- OPPOSITE to the ifast kernel (jidctflt.c
    # negates tmp10/tmp12 relative to jidctfst.c)
    return [t0 + t7, t1 + t6, t2 + t5, t3 + t4, t3 - t4, t2 - t5,
            t1 - t6, t0 - t7]


def idct_float(coeffs: jnp.ndarray, fmtbl: jnp.ndarray,
               precision: int = 8) -> jnp.ndarray:
    """Float AAN IDCT: dequantize by fmtbl * 0.125, two float passes,
    center+0.5 folded into the second pass DC, (int) truncation."""
    qm = _g(fmtbl.astype(jnp.float32) * jnp.float32(0.125))
    x = _g(coeffs.astype(jnp.float32) * qm)
    d = [x[..., i, :] for i in range(8)]
    o = _idct_float_1d(d, False)
    y = jnp.stack(o, axis=-2)
    center = (1 << (precision - 1)) + 0.5
    d = [y[..., :, i] for i in range(8)]
    o = _idct_float_1d(d, True, center)
    out = jnp.stack(o, axis=-1).astype(jnp.int32)   # (int) truncation
    # jidctflt.c:83 uses sample_range_limit WITHOUT the IDCT center
    # offset (the center is added in the float math): identity 0..255,
    # then 255, then 0 over the wrapped index
    m = (1 << precision) - 1
    mask = 4 * (m + 1) - 1
    idx = out & mask
    lim = jnp.where(idx <= m, idx,
                    jnp.where(idx < 2 * (m + 1) + (m + 1) // 2, m, 0))
    return lim.astype(jnp.uint8 if precision <= 8 else jnp.uint16)
