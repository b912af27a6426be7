#!/usr/bin/env python
"""Test per-element vs per-byte transfer cost across dtypes."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

MB = 16
nbytes = MB * 1024 * 1024
raw = np.random.randint(0, 255, (nbytes,), np.uint8)

print("--- H2D %d MB as various dtypes ---" % MB, file=sys.stderr)
for dt in (np.uint8, np.int16, np.int32, np.int64, np.float64, np.complex128):
    a = raw.view(dt)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_put(a).block_until_ready()
    d = (time.perf_counter()-t0)/3
    print("H2D %-11s %9d elems: %7.1f ms  %6.1f MB/s" %
          (np.dtype(dt).name, a.size, d*1e3, MB/d), file=sys.stderr)

print("--- D2H %d MB ---" % MB, file=sys.stderr)
f = jax.jit(lambda a, i: a + i)
for dt in (np.uint8, np.int16, np.int32, np.float32, np.int64, np.float64, np.complex128):
    base = jax.device_put(raw.view(dt) if np.dtype(dt) != np.complex128 else raw.view(np.complex128))
    base.block_until_ready()
    arrs = [f(base, (i+1)) for i in range(3)]
    jax.block_until_ready(arrs)
    t0 = time.perf_counter()
    for a in arrs:
        np.asarray(a)
    d = (time.perf_counter()-t0)/3
    print("D2H %-11s %9d elems: %7.1f ms  %6.1f MB/s" %
          (np.dtype(dt).name, base.size, d*1e3, MB/d), file=sys.stderr)

# on-device bitcast cost: uint8 -> int64 roundtrip program
x8 = jax.device_put(raw)
bc = jax.jit(lambda a: jax.lax.bitcast_convert_type(a.reshape(-1, 8), jnp.int64).reshape(-1))
y = bc(x8); y.block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    bc(x8).block_until_ready()
print("device bitcast u8->i64 16MB: %.1f ms" % ((time.perf_counter()-t0)/5*1e3), file=sys.stderr)
ub = jax.jit(lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1))
z = ub(y); z.block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    ub(y).block_until_ready()
print("device bitcast i64->u8 16MB: %.1f ms" % ((time.perf_counter()-t0)/5*1e3), file=sys.stderr)
print("roundtrip equal:", bool((np.asarray(z) == raw).all()), file=sys.stderr)
