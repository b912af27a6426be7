"""Overshoot deringing — batched over all blocks.

Reproduces preprocess_deringing (/root/reference/jcdctmgr.c:416-498): runs of
clipped-white samples along the zigzag traversal are replaced by a Catmull-Rom
overshoot curve capped by min(31, 2*q0, headroom). The reference's sequential
run-finding becomes per-position run-boundary computation (prefix max/min of
masked indices) + one 64-step scan for the exact float `position += step`
accumulation; everything is batched over N blocks.

Input/output: (N, 64) int32 centered samples in ZIGZAG order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAXS = 127  # 255 - CENTERJSAMPLE

# IEEE f32 1/n for n in [0, 65]: TPU f32 division is reciprocal-based and
# can be 1 ulp off IEEE (codec/trellis.py _recip2_np), while C computes
# step = 1/(length+1) as an IEEE f32 divide. length+1 is in [2, 65]
# inside a run; entries 0/1 are only read at masked non-run positions,
# so they hold 0 instead of inf (a gathered inf and a contracted 0 are
# equally discarded, and 0 keeps the one-hot contraction NaN-free).
with np.errstate(divide="ignore"):
    _STEP_LUT = np.float32(1.0) / np.arange(66, dtype=np.float32)
_STEP_LUT[:2] = 0.0


def _step_of(length):
    """LUT lookup as a one-hot contraction: a 66-entry gather at (64, N)
    indices costs ~9 ns per element (≈25 ms per 8-image group — it was
    2/3 of the whole dering cost); the contraction streams at HBM rate.
    Exact: one hot term per row selects the IEEE f32 table value."""
    idx = jnp.clip(length + 1, 0, 65)
    oh = (idx[..., None] ==
          np.arange(66, dtype=np.int32)).astype(jnp.float32)
    return jnp.einsum("...s,s->...", oh, _STEP_LUT,
                      preferred_element_type=jnp.float32)


def _hold_op(a, b):
    va, ka = a
    vb, kb = b
    return jnp.where(kb, vb, va), ka | kb


def _hold(values, valid, axis: int, reverse: bool, seed):
    """Last-valid-value propagation along `axis` (first-valid when
    reverse), seeded at the edge so out-of-range reads clamp like the
    reference's `at(maximum(idx, 0))` indexing. Replaces take_along_axis
    gathers (which cost ~8 ns/element on TPU) with a log-depth
    associative scan of selects."""
    n = values.shape[axis]
    edge = n - 1 if reverse else 0
    idx = jnp.arange(n)
    shape = [1] * values.ndim
    shape[axis] = n
    at_edge = (idx == edge).reshape(shape)
    v = jnp.where(at_edge, seed, values)
    k = valid | at_edge
    out, _ = jax.lax.associative_scan(_hold_op, (v, k), axis=axis,
                                      reverse=reverse)
    return out


@functools.partial(jax.jit, static_argnums=())
def dering(zz: jnp.ndarray, q0: jnp.ndarray, one=None) -> jnp.ndarray:
    del one  # retained for call compatibility; no longer needed
    N = zz.shape[0]
    pos = jnp.arange(64)
    m = zz >= MAXS                                     # (N, 64) in a run?

    total = jnp.sum(zz, axis=1)
    cnt = jnp.sum(m.astype(jnp.int32), axis=1)
    active = (cnt > 0) & (cnt < 64)

    # headroom cap: maxsample + min(31, 2*q0, (127*64 - sum)/cnt).
    # C's int division truncates toward zero; at >8-bit precision the
    # numerator goes negative (maxsample stays the 8-bit literal 127,
    # jcdctmgr.c:419) so floor-division would differ.
    headroom = jax.lax.div(MAXS * 64 - total, jnp.maximum(cnt, 1))
    maxovershoot = MAXS + jnp.minimum(
        jnp.minimum(31, 2 * q0.astype(jnp.int32)), headroom)  # (N,)

    # run boundaries per position: start = 1 + last non-run index before i,
    # end = first non-run index after i (64 if none)
    notm_idx = jnp.where(~m, pos[None, :], -1)
    last_notm = jax.lax.cummax(notm_idx, axis=1)       # (N, 64)
    start = last_notm + 1                              # valid where m
    notm_idx_f = jnp.where(~m, pos[None, :], 64)
    end = jnp.flip(jax.lax.cummin(jnp.flip(notm_idx_f, 1), axis=1), 1)

    # edge samples around the run via hold-scans (no gathers); seeding
    # the edges reproduces C's clamped `zz[max(start-2, 0)]` indexing
    zdn = jnp.concatenate([zz[:, :1], zz[:, :-1]], axis=1)   # zz[i-1]
    zup = jnp.concatenate([zz[:, 1:], zz[:, -1:]], axis=1)   # zz[i+1]
    f1 = _hold(zz, ~m, 1, False, zz[:, :1])
    f2 = _hold(zdn, ~m, 1, False, zz[:, :1])
    l1 = _hold(zz, ~m, 1, True, zz[:, -1:])
    l2 = _hold(zup, ~m, 1, True, zz[:, -1:])

    fslope = jnp.maximum(f1 - f2, MAXS - f1)
    lslope = jnp.maximum(l1 - l2, MAXS - l1)
    fslope_ = jnp.where(start == 0, lslope, fslope)
    lslope_ = jnp.where(end == 64, fslope, lslope)
    # note: C applies the start==0 substitution first, so lslope at end==64
    # uses the ORIGINAL fslope; both can't trigger in one run unless the
    # whole line is a run (cnt==64, inactive) — order is safe.

    length = end - start                               # (N, 64) per position
    step = _step_of(length)

    # exact position accumulation: position starts at `step` for the first
    # run element and += step per element (sequential f32 adds)
    run_first = m & ~jnp.concatenate(
        [jnp.zeros((N, 1), bool), m[:, :-1]], axis=1)

    def pos_step(carry, i):
        t = jnp.where(run_first[:, i], step[:, i],
                      carry + step[:, i])
        return t, t

    _, t_hist = jax.lax.scan(pos_step, jnp.zeros((N,), jnp.float32),
                             jnp.arange(64))
    t = jnp.moveaxis(t_hist, 0, 1)                     # (N, 64)

    # Catmull-Rom with C's exact expression structure:
    # (v1,v2,v3,v4) = (127-fslope, 127, 127, 127-lslope).
    # C rounds every f32 product before the adds; XLA's LLVM backend
    # contracts mul+add into FMA (skipping that rounding) and neither
    # optimization_barrier nor reduce_precision stops it. Routing each
    # product through minimum(x, 3e38) — a semantic no-op for our value
    # range (|products| < 1e5) — breaks the mul-feeds-add pattern, forcing
    # the product to round exactly like C's float arithmetic.

    _NOCONTRACT = np.float32(3.0e38)

    def frnd(x):
        return jnp.minimum(x, _NOCONTRACT)

    tan1 = fslope_ * length                            # (v3 - v1) * length
    tan2 = -lslope_ * length                           # (v4 - v2) * length
    t2 = frnd(t * t)
    t3 = frnd(t2 * t)
    cf1 = (frnd(2.0 * t3) - frnd(3.0 * t2)) + 1.0
    cf2 = frnd(-2.0 * t3) + frnd(3.0 * t2)
    cf3 = (t3 - frnd(2.0 * t2)) + t
    cf4 = t3 - t2
    val = ((frnd(jnp.float32(MAXS) * cf1)
            + frnd(tan1.astype(jnp.float32) * cf3))
           + frnd(np.float32(MAXS) * cf2)) \
        + frnd(tan2.astype(jnp.float32) * cf4)
    new = jnp.minimum(jnp.ceil(val).astype(jnp.int32),
                      maxovershoot[:, None])

    return jnp.where(m & active[:, None], new, zz)


@functools.partial(jax.jit, static_argnums=())
def dering_t(zz: jnp.ndarray, q0: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-major variant: (64, N) int32 centered zigzag samples.

    Identical semantics to dering(); axis 0 is the zigzag position so every
    elementwise op runs with the N blocks in the TPU lane dimension.
    """
    N = zz.shape[1]
    pos = jnp.arange(64)[:, None]                      # (64, 1)
    m = zz >= MAXS

    total = jnp.sum(zz, axis=0)
    cnt = jnp.sum(m.astype(jnp.int32), axis=0)
    active = (cnt > 0) & (cnt < 64)
    headroom = jax.lax.div(MAXS * 64 - total, jnp.maximum(cnt, 1))
    maxovershoot = MAXS + jnp.minimum(
        jnp.minimum(31, 2 * q0.astype(jnp.int32)), headroom)  # (N,)

    notm_idx = jnp.where(~m, pos, -1)
    start = jax.lax.cummax(notm_idx, axis=0) + 1
    notm_idx_f = jnp.where(~m, pos, 64)
    end = jnp.flip(jax.lax.cummin(jnp.flip(notm_idx_f, 0), axis=0), 0)

    zdn = jnp.concatenate([zz[:1], zz[:-1]], axis=0)         # zz[i-1]
    zup = jnp.concatenate([zz[1:], zz[-1:]], axis=0)          # zz[i+1]
    f1 = _hold(zz, ~m, 0, False, zz[:1])
    f2 = _hold(zdn, ~m, 0, False, zz[:1])
    l1 = _hold(zz, ~m, 0, True, zz[-1:])
    l2 = _hold(zup, ~m, 0, True, zz[-1:])

    fslope = jnp.maximum(f1 - f2, MAXS - f1)
    lslope = jnp.maximum(l1 - l2, MAXS - l1)
    fslope_ = jnp.where(start == 0, lslope, fslope)
    lslope_ = jnp.where(end == 64, fslope, lslope)

    length = end - start
    step = _step_of(length)
    run_first = m & ~jnp.concatenate(
        [jnp.zeros((1, N), bool), m[:-1]], axis=0)

    def pos_step(carry, i):
        t = jnp.where(run_first[i], step[i], carry + step[i])
        return t, t

    _, t = jax.lax.scan(pos_step, jnp.zeros((N,), jnp.float32),
                        jnp.arange(64))     # (64, N)

    _NOCONTRACT = np.float32(3.0e38)

    def frnd(x):  # forbid FMA contraction (see dering())
        return jnp.minimum(x, _NOCONTRACT)

    tan1 = fslope_ * length
    tan2 = -lslope_ * length
    t2 = frnd(t * t)
    t3 = frnd(t2 * t)
    cf1 = (frnd(2.0 * t3) - frnd(3.0 * t2)) + 1.0
    cf2 = frnd(-2.0 * t3) + frnd(3.0 * t2)
    cf3 = (t3 - frnd(2.0 * t2)) + t
    cf4 = t3 - t2
    val = ((frnd(jnp.float32(MAXS) * cf1)
            + frnd(tan1.astype(jnp.float32) * cf3))
           + frnd(np.float32(MAXS) * cf2)) \
        + frnd(tan2.astype(jnp.float32) * cf4)
    new = jnp.minimum(jnp.ceil(val).astype(jnp.int32), maxovershoot[None, :])
    return jnp.where(m & active[None, :], new, zz)


@functools.partial(jax.jit, static_argnums=())
def dering_float_t(zz: jnp.ndarray, q0: jnp.ndarray) -> jnp.ndarray:
    """Float-DCT deringing (jcdctmgr.c:503-570 float_preprocess_deringing):
    (64, N) float32 centered zigzag samples.  Differences from the int
    variant: the headroom cap divides in float, and the replacement value
    is NOT ceil'd (floats flow straight into the float DCT)."""
    N = zz.shape[1]
    pos = jnp.arange(64)[:, None]
    fmax = jnp.float32(MAXS)
    m = zz >= fmax

    total = jnp.sum(zz, axis=0)                        # f32 (exact: ints)
    cnt = jnp.sum(m.astype(jnp.int32), axis=0)
    active = (cnt > 0) & (cnt < 64)
    # NOTE: true f32 division kept here (operands are data-dependent, not
    # LUT-able). TPU's divide can be 1 ulp off IEEE; the quotient only
    # CAPS the replacement value (no further arithmetic), so a flip needs
    # val to land exactly between two adjacent f32 caps — and this runs
    # only under -dct float + overshoot, off the default profile.
    head = (fmax * 64 - total) / jnp.maximum(cnt, 1).astype(jnp.float32)
    cap = jnp.minimum(31, 2 * q0.astype(jnp.int32)).astype(jnp.float32)
    maxovershoot = fmax + jnp.minimum(cap, head)       # (N,)

    notm_idx = jnp.where(~m, pos, -1)
    start = jax.lax.cummax(notm_idx, axis=0) + 1
    notm_idx_f = jnp.where(~m, pos, 64)
    end = jnp.flip(jax.lax.cummin(jnp.flip(notm_idx_f, 0), axis=0), 0)

    zdn = jnp.concatenate([zz[:1], zz[:-1]], axis=0)         # zz[i-1]
    zup = jnp.concatenate([zz[1:], zz[-1:]], axis=0)          # zz[i+1]
    f1 = _hold(zz, ~m, 0, False, zz[:1])
    f2 = _hold(zdn, ~m, 0, False, zz[:1])
    l1 = _hold(zz, ~m, 0, True, zz[-1:])
    l2 = _hold(zup, ~m, 0, True, zz[-1:])

    fslope = jnp.maximum(f1 - f2, fmax - f1)
    lslope = jnp.maximum(l1 - l2, fmax - l1)
    fslope_ = jnp.where(start == 0, lslope, fslope)
    lslope_ = jnp.where(end == 64, fslope, lslope)

    length = end - start
    step = _step_of(length)
    run_first = m & ~jnp.concatenate(
        [jnp.zeros((1, N), bool), m[:-1]], axis=0)

    def pos_step(carry, i):
        t = jnp.where(run_first[i], step[i], carry + step[i])
        return t, t

    _, t = jax.lax.scan(pos_step, jnp.zeros((N,), jnp.float32),
                        jnp.arange(64))

    _NOCONTRACT = np.float32(3.0e38)

    def frnd(x):
        return jnp.minimum(x, _NOCONTRACT)

    tan1 = fslope_ * length
    tan2 = -lslope_ * length
    t2 = frnd(t * t)
    t3 = frnd(t2 * t)
    cf1 = (frnd(2.0 * t3) - frnd(3.0 * t2)) + 1.0
    cf2 = frnd(-2.0 * t3) + frnd(3.0 * t2)
    cf3 = (t3 - frnd(2.0 * t2)) + t
    cf4 = t3 - t2
    val = ((frnd(fmax * cf1) + frnd(tan1.astype(jnp.float32) * cf3))
           + frnd(fmax * cf2)) + frnd(tan2.astype(jnp.float32) * cf4)
    new = jnp.minimum(val, maxovershoot[None, :])       # no ceil
    return jnp.where(m & active[None, :], new, zz)
