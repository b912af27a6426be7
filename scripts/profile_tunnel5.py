#!/usr/bin/env python
"""Does async D2H avoid poisoning H2D? Plus realistic pipeline loop."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

def h2d(tag, mb=16, reps=3):
    a = np.random.randint(0, 255, (mb*1024*1024,), np.uint8)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(a).block_until_ready()
    d = (time.perf_counter()-t0)/reps
    print("H2D 16MB [%-22s]: %7.1f ms  %6.1f MB/s" % (tag, d*1e3, mb/d), file=sys.stderr)

f = jax.jit(lambda a, i: a + i)
base = jax.device_put(np.zeros((8*1024*1024,), np.uint8)); base.block_until_ready()

h2d("fresh")
# async D2H: start copy, wait via compute, then read
x = f(base, 1); x.block_until_ready()
x.copy_to_host_async()
time.sleep(1.0)        # let it drain
_ = np.asarray(x)      # should be a no-op read
h2d("after async D2H 8MB")

x = f(base, 2); x.block_until_ready()
t0 = time.perf_counter(); _ = np.asarray(x)
print("sync D2H 8MB: %.0f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)
h2d("after sync D2H 8MB")

# realistic pipeline loop: H2D 4.7MB + compute + async D2H 64KB
imgs = np.random.randint(0, 255, (4, 512, 768, 3), np.uint8)
g = jax.jit(lambda a: (a.astype(jnp.int32).sum(axis=(1, 2, 3)),
                       (a.astype(jnp.int32) * 3 // 2).astype(jnp.uint8)))
sums, big = g(jax.device_put(imgs)); jax.block_until_ready((sums, big))
print("--- pipeline loop: H2D 4.7MB -> compute -> D2H tiny ---", file=sys.stderr)
for it in range(6):
    t0 = time.perf_counter()
    d = jax.device_put(imgs)
    t1 = time.perf_counter()
    sums, big = g(d)
    sums.copy_to_host_async()
    s = np.asarray(sums)
    t2 = time.perf_counter()
    print("iter %d: H2D %6.1f ms, compute+tiny D2H %6.1f ms" %
          (it, (t1-t0)*1e3, (t2-t1)*1e3), file=sys.stderr)

# same loop but with a 1MB D2H each iter
h = jax.jit(lambda a: a.astype(jnp.int16).reshape(4, -1)[:, :131072])
hb = h(jax.device_put(imgs)); hb.block_until_ready()
print("--- pipeline loop with 1MB D2H ---", file=sys.stderr)
for it in range(6):
    t0 = time.perf_counter()
    d = jax.device_put(imgs)
    t1 = time.perf_counter()
    r = h(d)
    r.copy_to_host_async()
    _ = np.asarray(r)
    t2 = time.perf_counter()
    print("iter %d: H2D %6.1f ms, compute+1MB D2H %6.1f ms" %
          (it, (t1-t0)*1e3, (t2-t1)*1e3), file=sys.stderr)
