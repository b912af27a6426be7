"""Exact fixed-point color conversions (JAX, batched over whole planes).

Forward (encode) reproduces the reference's table-driven RGB→YCbCr
(/root/reference/jccolor.c:214-241 table construction; the tables are linear
in the sample value, so we inline the multiplies — identical integer results).
Inverse (decode) reproduces jdcolor.c's build_ycc_rgb_table semantics.

All math in int32. SCALEBITS=16.
"""
from __future__ import annotations

import jax.numpy as jnp

SCALEBITS = 16
ONE_HALF = 1 << (SCALEBITS - 1)
CENTER = 128
CBCR_OFFSET = CENTER << SCALEBITS


def _fix(x: float) -> int:
    return int(x * (1 << SCALEBITS) + 0.5)


# encode-side constants (jccolor.c:227-241)
FIX_0_29900 = _fix(0.29900)
FIX_0_58700 = _fix(0.58700)
FIX_0_11400 = _fix(0.11400)
FIX_0_16874 = _fix(0.16874)
FIX_0_33126 = _fix(0.33126)
FIX_0_50000 = _fix(0.50000)
FIX_0_41869 = _fix(0.41869)
FIX_0_08131 = _fix(0.08131)


def rgb_to_ycc(rgb: jnp.ndarray, precision: int = 8) -> jnp.ndarray:
    """(..., 3) RGB -> (..., 3) YCbCr, bit-exact vs the reference.

    The Cb/Cr rounding fudge is ONE_HALF-1 (+center offset), matching
    rgb_ycc_start's 0.5-epsilon trick so max inputs round to max not max+1.
    """
    ctr_off = (1 << (precision - 1)) << SCALEBITS
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)

    y = (FIX_0_29900 * r + FIX_0_58700 * g + FIX_0_11400 * b + ONE_HALF) >> SCALEBITS
    cb = ((-FIX_0_16874) * r + (-FIX_0_33126) * g + FIX_0_50000 * b
          + ctr_off + ONE_HALF - 1) >> SCALEBITS
    cr = (FIX_0_50000 * r + (-FIX_0_41869) * g + (-FIX_0_08131) * b
          + ctr_off + ONE_HALF - 1) >> SCALEBITS
    dt = jnp.uint8 if precision <= 8 else jnp.uint16
    return jnp.stack([y, cb, cr], axis=-1).astype(dt)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = (FIX_0_29900 * r + FIX_0_58700 * g + FIX_0_11400 * b + ONE_HALF) >> SCALEBITS
    return y.astype(jnp.uint8)


# decode-side constants (jdcolor.c build_ycc_rgb_table):
#   Cr=>R: FIX(1.40200)*x + ONE_HALF, x = cr-128, result >> SCALEBITS
#   Cb=>B: FIX(1.77200)*x + ONE_HALF
#   Cr=>G: -FIX(0.71414)*x   (no rounding; summed with Cb term then descaled)
#   Cb=>G: -FIX(0.34414)*x + ONE_HALF  (rounding folded into the Cb term)
FIX_1_40200 = _fix(1.40200)
FIX_1_77200 = _fix(1.77200)
FIX_0_71414 = _fix(0.71414)
FIX_0_34414 = _fix(0.34414)


def ycc_to_rgb(ycc: jnp.ndarray, precision: int = 8) -> jnp.ndarray:
    """(..., 3) YCbCr -> (..., 3) RGB, bit-exact vs jdcolor.c.

    The reference clamps with the simple range_limit table (plain clamp,
    not the wraparound post-IDCT table) — jdcolor.c ycc_rgb_convert.
    """
    ctr = 1 << (precision - 1)
    maxv = (1 << precision) - 1
    y = ycc[..., 0].astype(jnp.int32)
    cb = ycc[..., 1].astype(jnp.int32) - ctr
    cr = ycc[..., 2].astype(jnp.int32) - ctr

    r = y + ((FIX_1_40200 * cr + ONE_HALF) >> SCALEBITS)
    b = y + ((FIX_1_77200 * cb + ONE_HALF) >> SCALEBITS)
    g = y + (((-FIX_0_34414) * cb + (-FIX_0_71414) * cr + ONE_HALF) >> SCALEBITS)

    rgb = jnp.stack([r, g, b], axis=-1)
    dt = jnp.uint8 if precision <= 8 else jnp.uint16
    return jnp.clip(rgb, 0, maxv).astype(dt)


def cmyk_to_ycck(cmyk: jnp.ndarray, precision: int = 8) -> jnp.ndarray:
    """(..., 4) CMYK -> (..., 4) YCCK (jccolor.c:396-437 cmyk_ycck_convert):
    CMY inverts to RGB, runs the standard YCC transform; K passes through."""
    maxv = (1 << precision) - 1
    ctr_off = (1 << (precision - 1)) << SCALEBITS
    r = maxv - cmyk[..., 0].astype(jnp.int32)
    g = maxv - cmyk[..., 1].astype(jnp.int32)
    b = maxv - cmyk[..., 2].astype(jnp.int32)
    y = (FIX_0_29900 * r + FIX_0_58700 * g + FIX_0_11400 * b
         + ONE_HALF) >> SCALEBITS
    cb = ((-FIX_0_16874) * r + (-FIX_0_33126) * g + FIX_0_50000 * b
          + ctr_off + ONE_HALF - 1) >> SCALEBITS
    cr = (FIX_0_50000 * r + (-FIX_0_41869) * g + (-FIX_0_08131) * b
          + ctr_off + ONE_HALF - 1) >> SCALEBITS
    k = cmyk[..., 3].astype(jnp.int32)
    dt = jnp.uint8 if precision <= 8 else jnp.uint16
    return jnp.stack([y, cb, cr, k], axis=-1).astype(dt)


def ycck_to_cmyk(ycck: jnp.ndarray, precision: int = 8) -> jnp.ndarray:
    """(..., 4) YCCK -> (..., 4) CMYK (jdcolor.c ycck_cmyk_convert):
    YCC -> RGB (clamped), inverted back to CMY; K passes through."""
    maxv = (1 << precision) - 1
    rgb = ycc_to_rgb(ycck[..., :3], precision).astype(jnp.int32)
    cmy = maxv - rgb
    k = ycck[..., 3].astype(jnp.int32)
    dt = jnp.uint8 if precision <= 8 else jnp.uint16
    return jnp.concatenate([cmy, k[..., None]], axis=-1).astype(dt)
