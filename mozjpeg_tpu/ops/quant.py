"""Quantization with the reference's exact rounding.

The reference's reciprocal-multiply path (/root/reference/jcdctmgr.c:181-230)
is an exact implementation of round-half-away-from-zero division by (8*q) for
islow DCT output; we implement the division directly (cheaper on TPU than
emulating the 16-bit reciprocal trick, and bit-identical by construction).
"""
from __future__ import annotations

import jax.numpy as jnp


def quantize_islow(coeffs: jnp.ndarray, qtbl: jnp.ndarray) -> jnp.ndarray:
    """coeffs (..., 8, 8) int32 islow-DCT output (×8 scale), qtbl (8, 8) uint16.

    result = sign(c) * ((|c| + 4q) // (8q))  — exact jcdctmgr quantize().
    """
    q = qtbl.astype(jnp.int32) << 3
    a = jnp.abs(coeffs)
    mag = (a + (q >> 1)) // q
    return jnp.where(coeffs < 0, -mag, mag).astype(jnp.int16)


def dequantize(coeffs: jnp.ndarray, qtbl: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) int16 × (8, 8) -> int32 (decode side; fused into IDCT)."""
    return coeffs.astype(jnp.int32) * qtbl.astype(jnp.int32)


def quantize_islow_t(coeffs: jnp.ndarray, qtbl81: jnp.ndarray) -> jnp.ndarray:
    """(8, 8, N) int32 islow output x qtbl81 (8, 8, 1) -> (8, 8, N) int16."""
    q = qtbl81.astype(jnp.int32) << 3
    a = jnp.abs(coeffs)
    mag = (a + (q >> 1)) // q
    return jnp.where(coeffs < 0, -mag, mag).astype(jnp.int16)
