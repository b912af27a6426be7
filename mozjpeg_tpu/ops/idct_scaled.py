"""Scaled exact integer IDCTs (djpeg -scale M/8, M = 1..16).

Bit-exact reimplementations of /root/reference/jidctred.c (4x4, 2x2, 1x1)
and /root/reference/jidctint.c (3x3..16x16) as batched array programs; the
all-zero-AC shortcuts in the reference are value-identical to the general
path, so only the general path is implemented.

Inputs: (..., 8, 8) int coeffs (natural order), qtbl broadcastable.
Outputs: (..., S, S) uint8 samples.

The NxN kernels fold the descale rounding into the DC term exactly like
the C code (fudge added once, plain arithmetic shifts afterwards).
"""
from __future__ import annotations

import jax.numpy as jnp

from .dct import _descale, _range_limit

CONST_BITS = 13
PASS1_BITS = 2

F_0_211164243 = 1730
F_0_509795579 = 4176
F_0_601344887 = 4926
F_0_720959822 = 5906
F_0_765366865 = 6270
F_0_850430095 = 6967
F_0_899976223 = 7373
F_1_061594337 = 8697
F_1_272758580 = 10426
F_1_451774981 = 11893
F_1_847759065 = 15137
F_2_172734803 = 17799
F_2_562915447 = 20995
F_3_624509785 = 29692


def _pass_4(d0, d1, d2, d3, d5, d6, d7, descale_n):
    """One 1-D 4-point reduced pass (jidctred.c 4x4); term 4 unused."""
    tmp0 = d0 << (CONST_BITS + 1)
    tmp2 = d2 * F_1_847759065 + d6 * (-F_0_765366865)
    tmp10 = tmp0 + tmp2
    tmp12 = tmp0 - tmp2

    t0 = (d7 * (-F_0_211164243) + d5 * F_1_451774981
          + d3 * (-F_2_172734803) + d1 * F_1_061594337)
    t2 = (d7 * (-F_0_509795579) + d5 * (-F_0_601344887)
          + d3 * F_0_899976223 + d1 * F_2_562915447)
    o0 = _descale(tmp10 + t2, descale_n)
    o3 = _descale(tmp10 - t2, descale_n)
    o1 = _descale(tmp12 + t0, descale_n)
    o2 = _descale(tmp12 - t0, descale_n)
    return o0, o1, o2, o3


def idct_4x4(coeffs: jnp.ndarray, qtbl: jnp.ndarray) -> jnp.ndarray:
    x = coeffs.astype(jnp.int32) * qtbl.astype(jnp.int32)
    # pass 1: columns (skip column 4)
    d = [x[..., i, :] for i in range(8)]
    o = _pass_4(d[0], d[1], d[2], d[3], d[5], d[6], d[7],
                CONST_BITS - PASS1_BITS + 1)
    y = jnp.stack(o, axis=-2)                          # (..., 4, 8)
    d = [y[..., :, i] for i in range(8)]
    o = _pass_4(d[0], d[1], d[2], d[3], d[5], d[6], d[7],
                CONST_BITS + PASS1_BITS + 3 + 1)
    return _range_limit(jnp.stack(o, axis=-1))         # (..., 4, 4)


def _pass_2(d0, d1, d3, d5, d7, descale_n):
    tmp10 = d0 << (CONST_BITS + 2)
    tmp0 = (d7 * (-F_0_720959822) + d5 * F_0_850430095
            + d3 * (-F_1_272758580) + d1 * F_3_624509785)
    o0 = _descale(tmp10 + tmp0, descale_n)
    o1 = _descale(tmp10 - tmp0, descale_n)
    return o0, o1


def idct_2x2(coeffs: jnp.ndarray, qtbl: jnp.ndarray) -> jnp.ndarray:
    x = coeffs.astype(jnp.int32) * qtbl.astype(jnp.int32)
    d = [x[..., i, :] for i in range(8)]
    o = _pass_2(d[0], d[1], d[3], d[5], d[7], CONST_BITS - PASS1_BITS + 2)
    y = jnp.stack(o, axis=-2)                          # (..., 2, 8)
    d = [y[..., :, i] for i in range(8)]
    o = _pass_2(d[0], d[1], d[3], d[5], d[7], CONST_BITS + PASS1_BITS + 3 + 2)
    return _range_limit(jnp.stack(o, axis=-1))         # (..., 2, 2)


def idct_1x1(coeffs: jnp.ndarray, qtbl: jnp.ndarray) -> jnp.ndarray:
    dc = coeffs[..., 0, 0].astype(jnp.int32) * qtbl.astype(jnp.int32)[..., 0, 0]
    return _range_limit(_descale(dc, 3))[..., None, None]


def _fix(x: float) -> int:
    return int(x * (1 << CONST_BITS) + 0.5)


def _sh(x, n):
    return x >> n              # plain arithmetic shift (fudge pre-added)


def _dc_in(d0, pass1):
    """DC term with the pass's descale fudge folded in (jidctint.c)."""
    if pass1:
        return (d0 << CONST_BITS) + (1 << (CONST_BITS - PASS1_BITS - 1))
    return (d0 + (1 << (PASS1_BITS + 2))) << CONST_BITS


def _finish(outs, pass1):
    n1 = CONST_BITS - PASS1_BITS
    n2 = CONST_BITS + PASS1_BITS + 3
    return [_sh(o, n1 if pass1 else n2) for o in outs]


def _p3(d, pass1):
    tmp0 = _dc_in(d[0], pass1)
    tmp12 = d[2] * _fix(0.707106781)
    tmp10 = tmp0 + tmp12
    tmp2 = tmp0 - tmp12 - tmp12
    t0 = d[1] * _fix(1.224744871)
    return _finish([tmp10 + t0, tmp2, tmp10 - t0], pass1)


def _p5(d, pass1):
    tmp12 = _dc_in(d[0], pass1)
    z1 = (d[2] + d[4]) * _fix(0.790569415)
    z2 = (d[2] - d[4]) * _fix(0.353553391)
    z3 = tmp12 + z2
    tmp10 = z3 + z1
    tmp11 = z3 - z1
    tmp12 = tmp12 - (z2 << 2)
    z1 = (d[1] + d[3]) * _fix(0.831253876)
    t0 = z1 + d[1] * _fix(0.513743148)
    t1 = z1 - d[3] * _fix(2.176250899)
    return _finish([tmp10 + t0, tmp11 + t1, tmp12, tmp11 - t1,
                    tmp10 - t0], pass1)


def _p6(d, pass1):
    tmp0 = _dc_in(d[0], pass1)
    t = d[4] * _fix(0.707106781)
    tmp1 = tmp0 + t
    tmp11 = tmp0 - t - t
    t2 = d[2] * _fix(1.224744871)
    tmp10 = tmp1 + t2
    tmp12 = tmp1 - t2
    z1, z2, z3 = d[1], d[3], d[5]
    o1 = (z1 + z3) * _fix(0.366025404)
    odd0 = o1 + ((z1 + z2) << CONST_BITS)
    odd2 = o1 + ((z3 - z2) << CONST_BITS)
    n1 = CONST_BITS - PASS1_BITS
    n2 = CONST_BITS + PASS1_BITS + 3
    if pass1:
        # rows 1/4 are finished early in pass 1 (jidctint.c:627-629)
        o14a = _sh(tmp11, n1)
        o14b = (z1 - z2 - z3) << PASS1_BITS
        return [_sh(tmp10 + odd0, n1), o14a + o14b,
                _sh(tmp12 + odd2, n1), _sh(tmp12 - odd2, n1),
                o14a - o14b, _sh(tmp10 - odd0, n1)]
    odd1 = (z1 - z2 - z3) << CONST_BITS
    return [_sh(tmp10 + odd0, n2), _sh(tmp11 + odd1, n2),
            _sh(tmp12 + odd2, n2), _sh(tmp12 - odd2, n2),
            _sh(tmp11 - odd1, n2), _sh(tmp10 - odd0, n2)]


def _p7(d, pass1):
    tmp13 = _dc_in(d[0], pass1)
    z1, z2, z3 = d[2], d[4], d[6]
    tmp10 = (z2 - z3) * _fix(0.881747734)
    tmp12 = (z1 - z2) * _fix(0.314692123)
    tmp11 = tmp10 + tmp12 + tmp13 - z2 * _fix(1.841218003)
    t0 = z1 + z3
    z2 = z2 - t0
    t0 = t0 * _fix(1.274162392) + tmp13
    tmp10 = tmp10 + t0 - z3 * _fix(0.077722536)
    tmp12 = tmp12 + t0 - z1 * _fix(2.470602249)
    tmp13 = tmp13 + z2 * _fix(1.414213562)
    z1, z2, z3 = d[1], d[3], d[5]
    t1 = (z1 + z2) * _fix(0.935414347)
    t2 = (z1 - z2) * _fix(0.170262339)
    t0 = t1 - t2
    t1 = t1 + t2
    t2 = (z2 + z3) * (-_fix(1.378756276))
    t1 = t1 + t2
    zz = (z1 + z3) * _fix(0.613604268)
    t0 = t0 + zz
    t2 = t2 + zz + z3 * _fix(1.870828693)
    return _finish([tmp10 + t0, tmp11 + t1, tmp12 + t2, tmp13,
                    tmp12 - t2, tmp11 - t1, tmp10 - t0], pass1)


_REDUCED = {3: _p3, 5: _p5, 6: _p6, 7: _p7}


def idct_reduced(coeffs: jnp.ndarray, qtbl: jnp.ndarray,
                 size: int) -> jnp.ndarray:
    """NxN reduced IDCT for N in 3/5/6/7: pass 1 over the first N columns
    using the upper-left NxN coefficients, pass 2 over the N rows."""
    p = _REDUCED[size]
    x = coeffs.astype(jnp.int32) * qtbl.astype(jnp.int32)
    cols = [x[..., k, :size] for k in range(size)]     # (..., size) each
    rows = p(cols, True)                               # size x (..., size)
    y = jnp.stack(rows, axis=-2)                       # (..., size, size)
    ins = [y[..., :, k] for k in range(size)]
    outs = p(ins, False)
    return _range_limit(jnp.stack(outs, axis=-1))
