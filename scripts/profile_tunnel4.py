#!/usr/bin/env python
"""Bisect what degrades H2D: D2H? jit? small syncs?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

def h2d(tag, mb=16, reps=3):
    a = np.random.randint(0, 255, (mb*1024*1024,), np.uint8)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(a).block_until_ready()
    d = (time.perf_counter()-t0)/reps
    print("H2D 16MB [%s]: %7.1f ms  %6.1f MB/s" % (tag, d*1e3, mb/d), file=sys.stderr)

def d2h(mb=8):
    f = jax.jit(lambda a, i: a + i)
    base = jax.device_put(np.zeros((mb*1024*1024,), np.uint8)); base.block_until_ready()
    x = f(base, 1); x.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(x)
    print("D2H %dMB: %.1f ms" % (mb, (time.perf_counter()-t0)*1e3), file=sys.stderr)

h2d("fresh")
g = jax.jit(lambda a: a * 2 + 1)
y = g(jax.device_put(np.zeros((1024, 1024), np.float32))); y.block_until_ready()
h2d("after jit exec")
_ = np.asarray(y[:8, :8])   # small D2H
h2d("after small D2H")
d2h(8)
h2d("after 8MB D2H")
h2d("again1")
time.sleep(5)
h2d("after 5s sleep")
d2h(1)
h2d("after 1MB D2H")
