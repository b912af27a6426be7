"""Bit-exact software IEEE float emulation on integer ops.

The trellis lambda chain (codec/trellis.py lambda_from_norm, parity with
/root/reference/jcdctmgr.c:1033-1038) is host float math:

    norm32 = norm_sum / float32(63)                    # IEEE f32 divide
    lam    = float32( float64(2^s1) / (float64(2^s2) + float64(norm32)) )

TPU hardware f32 division is reciprocal-based (1 ulp off for some
operands — see trellis._recip2_np) and f64 does not exist on TPU at all,
so computing this on device with float ops breaks byte-exactness.  This
module reproduces the exact host results with pure uint32-pair integer
arithmetic (restoring division + round-to-nearest-even), so the lambda
computation can move INSIDE the jitted trellis program and the per-image
norms never need to cross to the host.

Everything here assumes positive, normal, finite operands — which the
lambda chain guarantees (norm_sum >= 0 and the constants are powers of
two scaled by finite host doubles).  Exactness is pinned by
tests/test_softfloat.py against numpy's IEEE float64/float32 on random
and adversarial inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_ZERO = np.uint32(0)


# ---------------------------------------------------------------------------
# uint64 as (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------

def _u64(hi, lo):
    return (jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def _u64_from_u32(x):
    return (jnp.zeros_like(x, U32), x.astype(U32))


def _u64_add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    return (a[0] + b[0] + carry, lo)


def _u64_sub(a, b):
    lo = a[1] - b[1]
    borrow = (a[1] < b[1]).astype(U32)
    return (a[0] - b[0] - borrow, lo)


def _u64_ge(a, b):
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] >= b[1]))


def _u64_shl1(a):
    return ((a[0] << 1) | (a[1] >> 31), a[1] << 1)


def _u64_shl_k(a, k: int):
    if k == 0:
        return a
    if k >= 32:
        return (a[1] << (k - 32) if k > 32 else a[1], jnp.zeros_like(a[1]))
    return ((a[0] << k) | (a[1] >> (32 - k)), a[1] << k)


def _u64_shr_k(a, k: int):
    if k == 0:
        return a
    if k >= 32:
        return (jnp.zeros_like(a[0]),
                a[0] >> (k - 32) if k > 32 else a[0])
    return (a[0] >> k, (a[1] >> k) | (a[0] << (32 - k)))


def _u64_shr_dyn_sticky(a, k):
    """Shift right by dynamic k (0..63, larger = all-sticky); returns
    (shifted, sticky_bool) where sticky = any bit shifted out."""
    hi, lo = a
    k = k.astype(jnp.int32)

    def shift_by(j):
        if j >= 64:
            return (jnp.zeros_like(hi), jnp.zeros_like(lo))
        return _u64_shr_k((hi, lo), j)

    # branchless: build from the 6 shift bits
    out = (hi, lo)
    sticky = jnp.zeros_like(hi, jnp.bool_)
    for bit in (32, 16, 8, 4, 2, 1):
        do = (k & bit) != 0
        lost_mask_hi, lost_mask_lo = _mask_low(bit)
        lost = ((out[0] & lost_mask_hi) | (out[1] & lost_mask_lo)) != 0
        sh = _u64_shr_k(out, bit)
        out = (jnp.where(do, sh[0], out[0]), jnp.where(do, sh[1], out[1]))
        sticky = sticky | (do & lost)
    # k >= 64: everything is sticky
    big = k >= 64
    allbits = (hi | lo) != 0
    sticky = jnp.where(big, allbits, sticky)
    out = (jnp.where(big, 0, out[0]), jnp.where(big, 0, out[1]))
    return out, sticky


def _mask_low(k: int):
    """(hi, lo) uint32 masks of the low k bits of a u64."""
    if k >= 64:
        return np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF)
    if k >= 32:
        return np.uint32((1 << (k - 32)) - 1), np.uint32(0xFFFFFFFF)
    return _ZERO, np.uint32((1 << k) - 1)


def _u64_bit(a, i: int):
    """Bit i (0-based from LSB) as uint32 0/1."""
    if i >= 32:
        return (a[0] >> (i - 32)) & 1
    return (a[1] >> i) & 1


def _u64_is_zero(a):
    return (a[0] | a[1]) == 0


# ---------------------------------------------------------------------------
# f32 decompose / compose (normal positive values only)
# ---------------------------------------------------------------------------

def _f32_decompose(x):
    """positive normal/zero f32 -> (mant24 uint32 with implicit bit,
    unbiased exp int32, is_zero bool). mant in [2^23, 2^24)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), U32)
    exp_f = ((bits >> 23) & 0xFF).astype(jnp.int32)
    frac = bits & np.uint32(0x7FFFFF)
    mant = frac | np.uint32(1 << 23)
    return mant, exp_f - 127, exp_f == 0      # treat subnormals as zero


def _f32_compose(mant24, exp, is_zero):
    """mant24 in [2^23, 2^24), unbiased exp -> positive f32."""
    bits = ((exp + 127).astype(U32) << 23) | \
        (mant24 & np.uint32(0x7FFFFF))
    bits = jnp.where(is_zero, np.uint32(0), bits)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


# ---------------------------------------------------------------------------
# IEEE f32 division by a positive constant (round to nearest even)
# ---------------------------------------------------------------------------

def f32_div_const(a, b_const: float):
    """IEEE-exact a / b_const for positive normal f32 a (a == 0 -> 0),
    matching numpy float32 division bit-for-bit."""
    mb, eb, _ = _f32_decompose(jnp.asarray(np.float32(b_const)))
    ma, ea, az = _f32_decompose(a)

    # normalize so ma' in [mb, 2*mb): quotient mantissa q in [2^24, 2^25)
    lt = ma < mb
    ma2 = jnp.where(lt, ma << 1, ma)
    eq = ea - eb - lt.astype(jnp.int32)

    # restoring division: q = ma2 * 2^24 / mb, 25 bits
    r = ma2 - mb
    q = jnp.ones_like(ma, U32)

    def body(i, carry):
        r, q = carry
        r = r << 1
        ge = r >= mb
        return jnp.where(ge, r - mb, r), (q << 1) | ge.astype(U32)

    r, q = jax.lax.fori_loop(0, 24, body, (r, q))
    # q has 25 bits; round to 24 (RNE with sticky from remainder)
    rnd = q & 1
    sticky = r != 0
    q = q >> 1
    up = (rnd == 1) & (sticky | ((q & 1) == 1))
    q = q + up.astype(U32)
    ovf = q == np.uint32(1 << 24)
    q = jnp.where(ovf, np.uint32(1 << 23), q)
    eq = eq + ovf.astype(jnp.int32)
    return _f32_compose(q, eq, az)


# ---------------------------------------------------------------------------
# the lambda chain: f32( f64(A) / (f64(C) + f64(norm32)) )
# ---------------------------------------------------------------------------

def _f64_const_parts(x: float):
    """host f64 -> (mant53 as u64 ints with implicit bit, unbiased exp)."""
    bits = np.float64(x).view(np.uint64)
    exp = int((bits >> 52) & 0x7FF) - 1023
    mant = int(bits & ((1 << 52) - 1)) | (1 << 52)
    return (np.uint32(mant >> 32), np.uint32(mant & 0xFFFFFFFF)), exp


@functools.partial(jax.jit, static_argnames=("s1", "s2"))
def lambda_from_norm_t(norm_sum, s1: float, s2: float):
    """Device twin of codec.trellis.lambda_from_norm: bit-identical f32
    lambdas from the f32 norm sums, no host round trip.  s2 <= 0 is the
    constant-lambda branch."""
    if s2 <= 0:
        c = np.float32(np.float64(2.0) ** (np.float64(s1) - 12.0))
        return jnp.full(norm_sum.shape, c, jnp.float32)

    norm32 = f32_div_const(norm_sum, 63.0)

    # widen norm32 to f64 parts (exact)
    mn24, en, nz = _f32_decompose(norm32)
    # f64 mantissa: 24 bits -> 53 bits (shift left 29)
    mN = _u64_shl_k(_u64_from_u32(mn24), 29)
    eN = en

    (mC, eC) = _f64_const_parts(float(np.float64(2.0) ** np.float64(s2)))
    (mA, eA) = _f64_const_parts(float(np.float64(2.0) ** np.float64(s1)))
    mC = _u64(jnp.full_like(mn24, mC[0]), jnp.full_like(mn24, mC[1]))
    mA_hi, mA_lo = mA

    # ---- f64 add: denom = C + norm (both positive normal; norm may be 0)
    # operate on mantissas pre-shifted left 3 (guard/round/sticky room)
    eC_a = jnp.full_like(eN, eC)
    swap = eN > eC_a
    e_big = jnp.where(swap, eN, eC_a)
    m_big = (jnp.where(swap, mN[0], mC[0]), jnp.where(swap, mN[1], mC[1]))
    m_small = (jnp.where(swap, mC[0], mN[0]), jnp.where(swap, mC[1], mN[1]))
    e_small = jnp.where(swap, eC_a, eN)
    # norm == 0: small contributes nothing (set mantissa 0)
    small_zero = nz & ~swap                 # norm is the small one and zero
    m_small = (jnp.where(small_zero, 0, m_small[0]),
               jnp.where(small_zero, 0, m_small[1]))

    big3 = _u64_shl_k(m_big, 3)             # 56 bits
    small3 = _u64_shl_k(m_small, 3)
    d = (e_big - e_small).astype(jnp.int32)
    small_sh, st = _u64_shr_dyn_sticky(small3, d)
    s = _u64_add(big3, small_sh)            # <= 57 bits
    carry = _u64_bit(s, 56) == 1
    s_shift, st2 = _u64_shr_dyn_sticky(s, carry.astype(jnp.int32))
    s = s_shift
    sticky = st | st2
    e_sum = e_big + carry.astype(jnp.int32)
    # s: [2^55, 2^56): 53-bit mantissa + 3 low bits (G at bit 2)
    g = _u64_bit(s, 2)
    rbit = _u64_bit(s, 1)
    sbit = _u64_bit(s, 0)
    sticky_all = (rbit | sbit) == 1
    sticky_all = sticky_all | sticky
    mD = _u64_shr_k(s, 3)                   # 53 bits [2^52, 2^53)
    lsb = _u64_bit(mD, 0)
    up = (g == 1) & (sticky_all | (lsb == 1))
    mD = _u64_add(mD, (jnp.zeros_like(mn24), up.astype(U32)))
    ovf = _u64_bit(mD, 53) == 1
    mD_shift = _u64_shr_k(mD, 1)
    mD = (jnp.where(ovf, mD_shift[0], mD[0]),
          jnp.where(ovf, mD_shift[1], mD[1]))
    eD = e_sum + ovf.astype(jnp.int32)

    # ---- f64 divide: q = A / denom, round to f64 (53 bits) then f32
    mA64 = _u64(jnp.full_like(mn24, mA_hi), jnp.full_like(mn24, mA_lo))
    lt = ~_u64_ge(mA64, mD)
    mA2 = _u64_shl1(mA64)
    mA2 = (jnp.where(lt, mA2[0], mA64[0]), jnp.where(lt, mA2[1], mA64[1]))
    eQ = jnp.full_like(eN, eA) - eD - lt.astype(jnp.int32)

    r = _u64_sub(mA2, mD)
    qh = jnp.zeros_like(mn24)
    ql = jnp.ones_like(mn24)

    def body(i, carry):
        rh, rl, qh, ql = carry
        r = _u64_shl1((rh, rl))
        ge = _u64_ge(r, mD)
        r2 = _u64_sub(r, mD)
        rh2 = jnp.where(ge, r2[0], r[0])
        rl2 = jnp.where(ge, r2[1], r[1])
        q2 = _u64_shl1((qh, ql))
        return rh2, rl2, q2[0], q2[1] | ge.astype(U32)

    rh, rl, qh, ql = jax.lax.fori_loop(0, 53, body, (r[0], r[1], qh, ql))
    q = (qh, ql)                            # 54 bits [2^53, 2^54)
    rem_sticky = ~_u64_is_zero((rh, rl))
    # round f64 RNE: 54 -> 53 bits
    rnd = _u64_bit(q, 0)
    q53 = _u64_shr_k(q, 1)
    lsb = _u64_bit(q53, 0)
    up = (rnd == 1) & (rem_sticky | (lsb == 1))
    q53 = _u64_add(q53, (jnp.zeros_like(mn24), up.astype(U32)))
    ovf = _u64_bit(q53, 53) == 1
    q53s = _u64_shr_k(q53, 1)
    q53 = (jnp.where(ovf, q53s[0], q53[0]), jnp.where(ovf, q53s[1], q53[1]))
    eQ = eQ + ovf.astype(jnp.int32)

    # round f64 -> f32 RNE: 53 -> 24 bits (sticky of the f64 value only —
    # the host double-rounds, so the division remainder is NOT consulted)
    low_hi, low_lo = _mask_low(28)
    sticky32 = ((q53[0] & low_hi) | (q53[1] & low_lo)) != 0
    rnd32 = _u64_bit(q53, 28)
    m24 = _u64_shr_k(q53, 29)[1]            # fits in uint32 (24 bits)
    lsb32 = m24 & 1
    up32 = (rnd32 == 1) & (sticky32 | (lsb32 == 1))
    m24 = m24 + up32.astype(U32)
    ovf32 = m24 == np.uint32(1 << 24)
    m24 = jnp.where(ovf32, np.uint32(1 << 23), m24)
    eQ = eQ + ovf32.astype(jnp.int32)
    return _f32_compose(m24, eQ, jnp.zeros_like(nz))
