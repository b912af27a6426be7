#!/usr/bin/env python
"""Microbenchmark the device primitives used by the scan search on TPU."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp
from mozjpeg_tpu.ops import scanopt_kernels as sk, tablegen, bitpack

print("backend:", jax.default_backend(), file=sys.stderr)

def bench(label, fn, *args, reps=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    print("%-38s %8.1f ms" % (label, (time.perf_counter()-t0)/reps*1e3),
          file=sys.stderr)
    return r

rng = np.random.default_rng(0)
n = 6144
plane = np.zeros((64, n), np.int16)
nzs = rng.integers(2, 10, n)
for b in range(n):
    pos = rng.choice(np.arange(1, 64), nzs[b], replace=False)
    plane[pos, b] = rng.integers(-60, 60, nzs[b])
plane_d = jnp.asarray(plane)

sym = jax.jit(lambda p: sk.ac_first_symbolize_rt(p, jnp.int32(1), jnp.int32(63), jnp.int32(0)))
s = bench("ac_first_symbolize (6144 blocks)", sym, plane_d)

co = jnp.asarray(rng.integers(0, 1 << 16, 256).astype(np.uint32))
si = jnp.asarray(rng.integers(2, 16, 256).astype(np.int32))
nwords = -(-(n * 1716 + 64) // 32) + 2
packf = jax.jit(lambda p: sk.ac_first_pack_from_syms(
    sk.ac_first_symbolize_rt(p, jnp.int32(1), jnp.int32(63), jnp.int32(0)), co, si, nwords))
w, bits = bench("symbolize+pack (6144 blocks)", packf, plane_d)

sz = jax.jit(lambda w, b: sk.stuffed_size(w, b))
bench("stuffed_size (%dK words)" % (nwords // 1000), sz, w, bits)

# raw scatter cost
L = n * 254
vals = jnp.asarray(rng.integers(0, 1 << 31, L).astype(np.uint32))
lens = jnp.asarray((rng.integers(0, 8, L) * (rng.random(L) < 0.1)).astype(np.int32))
scat = jax.jit(lambda v, l: bitpack._scatter_pack(v[None], l[None], nwords))
bench("_scatter_pack 1.56M lanes", scat, vals, lens)

# tablegen
freqs = jnp.asarray(rng.integers(0, 1000, (564, 257)).astype(np.int32))
bench("gen_optimal_tables_t (564 tables)", tablegen.gen_optimal_tables_t, freqs)
freqs2 = jnp.asarray(rng.integers(0, 1000, (8, 257)).astype(np.int32))
bench("gen_optimal_tables_t (8 tables)", tablegen.gen_optimal_tables_t, freqs2)

# refine schedule scan
e = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
br = jnp.asarray((rng.integers(0, 5, n) * np.asarray(e)).astype(np.int32))
ev = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
sched = jax.jit(sk.ac_refine_schedule_dev)
bench("refine schedule scan (6144)", sched, e, br, ev)
