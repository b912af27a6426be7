#!/usr/bin/env python
"""Characterize the axon tunnel: latency, H2D/D2H bandwidth, duplex, overlap."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)

# latency: tiny dispatch roundtrip
x = jnp.zeros((8, 128), jnp.float32)
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    f(x).block_until_ready()
print("tiny dispatch rtt: %.2f ms" % ((time.perf_counter()-t0)/20*1e3), file=sys.stderr)

# D2H tiny
y = f(x)
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(f(x))
print("tiny dispatch+D2H rtt: %.2f ms" % ((time.perf_counter()-t0)/20*1e3), file=sys.stderr)

# H2D bandwidth various sizes
for mb in (1, 4, 16):
    a = np.random.randint(0, 255, (mb*1024*1024,), np.uint8)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(a).block_until_ready()
    dt = (time.perf_counter()-t0)/5
    print("H2D %2d MB: %6.1f ms  %.1f MB/s" % (mb, dt*1e3, mb/dt), file=sys.stderr)

# D2H bandwidth
for mb in (1, 4, 16):
    a = jax.device_put(np.random.randint(0, 255, (mb*1024*1024,), np.uint8))
    a.block_until_ready()
    np.asarray(a)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(a)
    dt = (time.perf_counter()-t0)/5
    print("D2H %2d MB: %6.1f ms  %.1f MB/s" % (mb, dt*1e3, mb/dt), file=sys.stderr)

# duplex: concurrent H2D + D2H from two threads
from concurrent.futures import ThreadPoolExecutor
up = np.random.randint(0, 255, (8*1024*1024,), np.uint8)
down = jax.device_put(np.random.randint(0, 255, (8*1024*1024,), np.uint8)); down.block_until_ready()
def do_up():
    t0=time.perf_counter(); jax.device_put(up).block_until_ready(); return time.perf_counter()-t0
def do_down():
    t0=time.perf_counter(); np.asarray(down); return time.perf_counter()-t0
do_up(); do_down()
with ThreadPoolExecutor(2) as ex:
    t0 = time.perf_counter()
    fu, fd = ex.submit(do_up), ex.submit(do_down)
    tu, td = fu.result(), fd.result()
    tt = time.perf_counter()-t0
print("concurrent 8MB up (%.0f ms) + 8MB down (%.0f ms), wall %.0f ms -> %s" %
      (tu*1e3, td*1e3, tt*1e3,
       "full-duplex" if tt < 0.75*(tu+td) else "half-duplex"), file=sys.stderr)

# overlap transfer with compute: big matmul while uploading
m = jax.device_put(np.random.randn(4096, 4096).astype(np.float32))
mm = jax.jit(lambda a: (a @ a) @ a)
mm(m).block_until_ready()
t0=time.perf_counter(); mm(m).block_until_ready(); tc = time.perf_counter()-t0
t0=time.perf_counter(); jax.device_put(up).block_until_ready(); tx = time.perf_counter()-t0
t0=time.perf_counter()
r = mm(m)  # async dispatch
jax.device_put(up).block_until_ready()
r.block_until_ready()
to = time.perf_counter()-t0
print("compute %.0f ms, upload %.0f ms, overlapped %.0f ms -> %s" %
      (tc*1e3, tx*1e3, to*1e3,
       "overlaps" if to < 0.8*(tc+tx) else "serializes"), file=sys.stderr)

# dispatch pipelining: N async dispatches then single wait
t0 = time.perf_counter()
rs = [f(x) for _ in range(50)]
jax.block_until_ready(rs)
print("50 async tiny dispatches: %.1f ms total" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)
