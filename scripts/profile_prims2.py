#!/usr/bin/env python
"""Scatter scaling, sorted/unique flags, gathers, sorts, layout padding."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), file=sys.stderr)
rng = np.random.default_rng(0)

def _force(r):
    # block_until_ready lies over the axon tunnel; a tiny D2H is the only
    # real sync. Reduce to one scalar first.
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)).reshape(1))

def bench(label, fn, *args, reps=20):
    _force(fn(*args))
    # measure sync overhead once
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(reps)]
    _force(rs[-1])
    dt = time.perf_counter() - t0
    t1 = time.perf_counter(); _force(rs[-1]); sync = time.perf_counter() - t1
    print("%-44s %8.2f ms  (sync %.0f ms)" % (label, (dt - sync)/reps*1e3,
          sync*1e3), file=sys.stderr)

NW = 330000
for L in (100_000, 400_000, 1_560_000):
    idx = np.sort(rng.integers(0, NW - 2, L)).astype(np.int32)
    c = rng.integers(0, 1 << 31, L).astype(np.uint32)
    idx_d, c_d = jnp.asarray(idx), jnp.asarray(c)
    f = jax.jit(lambda i, v: jnp.zeros(NW, jnp.uint32).at[i].add(v))
    bench("scatter-add %dK (plain)" % (L // 1000), f, idx_d, c_d)
    f2 = jax.jit(lambda i, v: jnp.zeros(NW, jnp.uint32).at[i].add(
        v, indices_are_sorted=True))
    bench("scatter-add %dK (sorted)" % (L // 1000), f2, idx_d, c_d)

# unique sorted scatter (compaction pattern)
L = 1_560_000
K = 120_000
uidx = np.sort(rng.choice(NW, K, replace=False)).astype(np.int32)
f3 = jax.jit(lambda i, v: jnp.zeros(NW, jnp.uint32).at[i].add(
    v, indices_are_sorted=True, unique_indices=True))
bench("scatter-add 120K unique+sorted", f3, jnp.asarray(uidx),
      jnp.asarray(rng.integers(0, 1 << 31, K).astype(np.uint32)))
# set variant
f4 = jax.jit(lambda i, v: jnp.zeros(NW, jnp.uint32).at[i].set(
    v, indices_are_sorted=True, unique_indices=True))
bench("scatter-set 120K unique+sorted", f4, jnp.asarray(uidx),
      jnp.asarray(rng.integers(0, 1 << 31, K).astype(np.uint32)))

# gather
gidx = rng.integers(0, L, L).astype(np.int32)
src = jnp.asarray(rng.integers(0, 1 << 31, L).astype(np.uint32))
g = jax.jit(lambda s, i: s[i])
bench("gather 1.56M random", g, src, jnp.asarray(gidx))
gs = np.sort(gidx).astype(np.int32)
bench("gather 1.56M sorted", g, src, jnp.asarray(gs))

# sort with payload
keys = jnp.asarray(rng.integers(0, 1 << 30, L).astype(np.int32))
p1 = jnp.asarray(rng.integers(0, 1 << 30, L).astype(np.int32))
srt = jax.jit(lambda k, a: jax.lax.sort((k, a), num_keys=1))
bench("lax.sort 1.56M + 1 payload", srt, keys, p1)

# cumsum
big = jnp.asarray(rng.integers(0, 8, L).astype(np.int32))
bench("cumsum 1.56M", jax.jit(jnp.cumsum), big)

# layout: (n,63,4) stack+reshape vs 1D
a = jnp.asarray(rng.integers(0, 100, (6144, 63)).astype(np.int32))
f5 = jax.jit(lambda x: jnp.stack([x, x + 1, x + 2, x + 3], axis=2)
             .reshape(6144, 63 * 4).sum())
bench("(6144,63,4) stack+reshape", f5, a)
f6 = jax.jit(lambda x: (x.reshape(-1) + (x + 1).reshape(-1)
                        + (x + 2).reshape(-1) + (x + 3).reshape(-1)).sum())
bench("1D equivalent", f6, a)

# elementwise throughput reference on 5.3M i32
z = jnp.asarray(rng.integers(0, 255, 5_300_000).astype(np.int32))
f7 = jax.jit(lambda x: jnp.sum((x == 0xFF).astype(jnp.int32)))
bench("1D compare+sum 5.3M", f7, z)

# while_loop step cost (tablegen shape)
T = 564
fw0 = jnp.asarray(rng.integers(1, 1000, (T, 257)).astype(jnp.int32))
def body(c):
    fw, it = c
    v1 = jnp.min(fw, axis=1, keepdims=True)
    c1 = jnp.argmax((fw == v1) * jnp.arange(257), axis=1)[:, None]
    fw = jnp.where(jnp.arange(257) == c1, fw + v1, fw)
    return fw, it + 1
f8 = jax.jit(lambda fw: jax.lax.while_loop(
    lambda c: c[1] < 256, body, (fw, jnp.int32(0)))[0])
bench("256-iter masked while (564,257)", f8, fw0)
