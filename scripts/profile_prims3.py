#!/usr/bin/env python
"""Validate the matmul-pack primitives: one-hot batched matmuls, axis
gathers, cummax, full symbolize, raw scatter_bits."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp
from mozjpeg_tpu.ops import scanopt_kernels as sk
from mozjpeg_tpu.ops import bitpack

print("backend:", jax.default_backend(), file=sys.stderr)
rng = np.random.default_rng(0)

def _force(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)).reshape(1))

def bench(label, fn, *args, reps=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(reps)]
    _force(rs[-1])
    dt = time.perf_counter() - t0
    t1 = time.perf_counter(); _force(rs[-1]); sync = time.perf_counter() - t1
    print("%-46s %8.2f ms" % (label, (dt - sync)/reps*1e3), file=sys.stderr)

n = 6144
# one-hot compaction matmul: (n, CAP, 63) onehot @ (n, 63) -> (n, CAP)
CAP = 40
ranks = jnp.asarray(rng.integers(0, CAP, (n, 63)).astype(np.int32))
vals16 = jnp.asarray(rng.integers(0, 65536, (n, 63)).astype(np.float32))
def compact(r, v):
    oh = (r[:, None, :] == jnp.arange(CAP)[None, :, None]).astype(jnp.float32)
    return jnp.einsum("bck,bk->bc", oh, v)
bench("compaction one-hot (6144,40,63) einsum", jax.jit(compact), ranks, vals16)

# superblock local pack: (S, L, W) onehot @ (S, L) -> (S, W), S=384 L=560 W=66
S, L, W = 384, 560, 66
tw = jnp.asarray(rng.integers(0, W, (S, L)).astype(np.int32))
cv = jnp.asarray(rng.integers(0, 65536, (S, L)).astype(np.float32))
def sbpack(t, c):
    oh = (t[:, None, :] == jnp.arange(W)[None, :, None]).astype(jnp.float32)
    return jnp.einsum("swl,sl->sw", oh, c)
bench("superblock one-hot (384,66,560) einsum", jax.jit(sbpack), tw, cv)
def sbpack4(t, c):
    oh = (t[:, None, :] == jnp.arange(W)[None, :, None]).astype(jnp.float32)
    return tuple(jnp.einsum("swl,sl->sw", oh, c + i) for i in range(8))
bench("superblock one-hot x8 reuse", jax.jit(sbpack4), tw, cv)

# axis-1 take_along_axis on (6144, 63)
src = jnp.asarray(rng.integers(0, 1000, (n, 64)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, 64, (n, 63)).astype(np.int32))
bench("take_along_axis (6144,63)", jax.jit(
    lambda s, i: jnp.take_along_axis(s, i, axis=1)), src, idx)

# cummax along axis 1
bench("cummax (6144,63)", jax.jit(
    lambda s: jax.lax.cummax(s[:, :63], axis=1)), src)

# full current symbolize with real sync
plane = np.zeros((64, n), np.int16)
for b in range(n):
    k = rng.integers(2, 10)
    pos = rng.choice(np.arange(1, 64), k, replace=False)
    plane[pos, b] = rng.integers(-60, 60, k)
plane_d = jnp.asarray(plane)
bench("ac_first_symbolize_rt (6144)", jax.jit(
    lambda p: sk.ac_first_symbolize_rt(
        p, jnp.int32(1), jnp.int32(63), jnp.int32(0))), plane_d)

# raw _scatter_bits at several lane counts
for Lc in (60_000, 240_000, 1_560_000):
    vals = jnp.asarray(rng.integers(0, 1 << 31, (1, Lc)).astype(np.uint32))
    lens = jnp.asarray((rng.integers(1, 8, (1, Lc))).astype(np.int32))
    nw = Lc // 4 + 8
    bench("_scatter_pack %dK lanes" % (Lc // 1000), jax.jit(
        lambda v, l: bitpack._scatter_pack(v, l, nw)), vals, lens)

# vmapped einsum over B images at once: (B, n, CAP, 63)... via reshape
B = 4
ranksB = jnp.asarray(rng.integers(0, CAP, (B * n, 63)).astype(np.int32))
valsB = jnp.asarray(rng.integers(0, 65536, (B * n, 63)).astype(np.float32))
bench("compaction einsum B=4 fused", jax.jit(compact), ranksB, valsB)
