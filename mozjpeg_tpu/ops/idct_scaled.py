"""Reduced-size exact integer IDCTs (scaled decoding).

Bit-exact ports of /root/reference/jidctred.c (4x4, 2x2, 1x1 islow variants)
as batched array programs; the all-zero-AC shortcuts in the reference are
value-identical to the general path (the rounding terms vanish for
DC-only columns), so only the general path is implemented.

Inputs: (..., 8, 8) int coeffs (natural order), qtbl broadcastable.
Outputs: (..., S, S) uint8 samples.
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
