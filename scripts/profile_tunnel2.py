#!/usr/bin/env python
"""Deeper axon tunnel characterization: real D2H, big/parallel H2D, overlap."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)

f_inc = jax.jit(lambda a, i: a + i)

# --- real D2H: force fresh device arrays each rep ---
for mb in (0.0625, 0.25, 1, 4, 16):
    n = int(mb * 1024 * 1024)
    base = jax.device_put(np.zeros((n,), np.uint8)); base.block_until_ready()
    arrs = [f_inc(base, i) for i in range(4)]
    jax.block_until_ready(arrs)
    t0 = time.perf_counter()
    for a in arrs:
        np.asarray(a)
    dt = (time.perf_counter() - t0) / 4
    print("D2H %7.2f MB: %7.1f ms  %.1f MB/s" % (mb, dt*1e3, mb/dt), file=sys.stderr)

# --- H2D big ---
for mb in (16, 64):
    a = np.random.randint(0, 255, (mb*1024*1024,), np.uint8)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_put(a).block_until_ready()
    dt = (time.perf_counter()-t0)/3
    print("H2D %3d MB: %7.1f ms  %.1f MB/s" % (mb, dt*1e3, mb/dt), file=sys.stderr)

# --- H2D small latency ---
for kb in (4, 64, 256):
    a = np.random.randint(0, 255, (kb*1024,), np.uint8)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_put(a).block_until_ready()
    dt = (time.perf_counter()-t0)/10
    print("H2D %4d KB: %7.2f ms" % (kb, dt*1e3), file=sys.stderr)

# --- parallel H2D (2 and 4 threads, distinct arrays) ---
from concurrent.futures import ThreadPoolExecutor
for nt in (2, 4):
    arrs = [np.random.randint(0, 255, (8*1024*1024,), np.uint8) for _ in range(nt)]
    for a in arrs: jax.device_put(a).block_until_ready()
    with ThreadPoolExecutor(nt) as ex:
        t0 = time.perf_counter()
        futs = [ex.submit(lambda x: jax.device_put(x).block_until_ready(), a) for a in arrs]
        for f in futs: f.result()
        dt = time.perf_counter()-t0
    print("H2D %dx8MB in %d threads: %6.1f ms  agg %.1f MB/s" % (nt, nt, dt*1e3, nt*8/dt), file=sys.stderr)

# --- overlap H2D (worker thread) with device compute (main thread dispatch) ---
m = jax.device_put(np.random.randn(4096, 4096).astype(np.float32))
mm = jax.jit(lambda a: (a @ a) @ a)
mm(m).block_until_ready()
t0=time.perf_counter(); mm(m).block_until_ready(); tc=time.perf_counter()-t0
up = np.random.randint(0, 255, (8*1024*1024,), np.uint8)
jax.device_put(up).block_until_ready()
t0=time.perf_counter(); jax.device_put(up).block_until_ready(); tx=time.perf_counter()-t0
with ThreadPoolExecutor(1) as ex:
    t0 = time.perf_counter()
    r = mm(m)   # async dispatch first
    fut = ex.submit(lambda: jax.device_put(up).block_until_ready())
    fut.result(); r.block_until_ready()
    to = time.perf_counter()-t0
print("compute %.0f ms, upload %.0f ms, thread-overlap %.0f ms -> %s" %
      (tc*1e3, tx*1e3, to*1e3, "overlaps" if to < 0.8*(tc+tx) else "serializes"), file=sys.stderr)

# --- overlap D2H with compute ---
big = f_inc(jax.device_put(np.zeros((8*1024*1024,), np.uint8)), 1)
big.block_until_ready()
t0=time.perf_counter(); np.asarray(big); td=time.perf_counter()-t0
big2 = f_inc(jax.device_put(np.zeros((8*1024*1024,), np.uint8)), 2); big2.block_until_ready()
with ThreadPoolExecutor(1) as ex:
    t0 = time.perf_counter()
    r = mm(m)
    fut = ex.submit(lambda: np.asarray(big2))
    fut.result(); r.block_until_ready()
    to = time.perf_counter()-t0
print("compute %.0f ms, D2H 8MB %.0f ms, thread-overlap %.0f ms -> %s" %
      (tc*1e3, td*1e3, to*1e3, "overlaps" if to < 0.8*(tc+td) else "serializes"), file=sys.stderr)

# --- copy_to_host_async then read later ---
big3 = f_inc(jax.device_put(np.zeros((8*1024*1024,), np.uint8)), 3); big3.block_until_ready()
t0 = time.perf_counter()
big3.copy_to_host_async()
t1 = time.perf_counter()
r = mm(m); r.block_until_ready()
t2 = time.perf_counter()
h = np.asarray(big3)
t3 = time.perf_counter()
print("copy_to_host_async: %.1f ms; compute %.0f ms; final asarray %.0f ms" %
      ((t1-t0)*1e3, (t2-t1)*1e3, (t3-t2)*1e3), file=sys.stderr)

# --- int16 vs uint8 D2H ---
big4 = jax.jit(lambda a: a + 1)(jax.device_put(np.zeros((4*1024*1024,), np.int16)))
big4.block_until_ready()
t0 = time.perf_counter(); np.asarray(big4); dt = time.perf_counter()-t0
print("D2H 8MB int16: %.1f ms  %.1f MB/s" % (dt*1e3, 8/dt), file=sys.stderr)
