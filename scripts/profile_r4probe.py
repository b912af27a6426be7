#!/usr/bin/env python
"""Round-4 design probe: primitive costs that decide the device entropy
pack architecture (run once on the chip, one process).

    python scripts/profile_r4probe.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    log("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    def bench(label, fn, *args, reps=10):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        log("%-44s %8.3f ms" % (label, dt))
        return dt

    # --- scatter-add at several scales (sorted indices, mild collisions)
    for L in (100_000, 400_000, 1_600_000, 6_400_000):
        NW = max(1000, L // 5)
        idx = np.sort(rng.integers(0, NW - 2, L)).astype(np.int32)
        c = rng.integers(0, 1 << 31, L).astype(np.uint32)
        bench("scatter-add sorted L=%d" % L,
              jax.jit(lambda i, v, _n=NW:
                      jnp.zeros(_n, jnp.uint32).at[i].add(v, mode="drop")),
              jnp.asarray(idx), jnp.asarray(c))

    # --- gather at scales
    for L in (400_000, 1_600_000):
        src = jnp.asarray(rng.integers(0, 1 << 31, L).astype(np.uint32))
        gidx = jnp.asarray(np.sort(rng.integers(0, L, L)).astype(np.int32))
        bench("gather sorted L=%d" % L, jax.jit(lambda s, i: s[i]),
              src, gidx)

    # --- cumsum over flat u32 (modular) and (8, 300k)
    a = jnp.asarray(rng.integers(0, 1 << 31, 2_400_000).astype(np.uint32))
    bench("cumsum u32 2.4M flat", jax.jit(jnp.cumsum), a)
    a2 = jnp.asarray(rng.integers(0, 27, (8, 300_000)).astype(np.int32))
    bench("cumsum i32 (8,300k) axis1",
          jax.jit(lambda x: jnp.cumsum(x, axis=1)), a2)

    # --- associative_scan with 4-field struct over (8, 300k)
    def comb(x, y):
        nx, lx, tx, ax = x
        ny, ly, ty, ay = y
        n = nx + ny
        lead = jnp.where(ax > 0, nx + ly, lx)
        trail = jnp.where(ay > 0, ny + tx, ty)
        al = ax * ay
        return (n, lead, trail, al)

    n0 = jnp.asarray(rng.integers(0, 27, (8, 300_000)).astype(np.int32))
    l0 = jnp.minimum(n0, 3)
    t0_ = jnp.minimum(n0, 2)
    a0 = (n0 == 0).astype(jnp.int32)

    bench("assoc_scan struct4 (8,300k)",
          jax.jit(lambda n, l, t, al: jax.lax.associative_scan(
              comb, (n, l, t, al), axis=1)[2]), n0, l0, t0_, a0)

    # --- argsort minor-64 and minor-256 per-block compaction
    keys = jnp.asarray(rng.integers(0, 1 << 16, (74000, 64)).astype(
        np.int32))
    bench("argsort (74000,64) stable",
          jax.jit(lambda k: jnp.argsort(k, axis=1, stable=True)), keys)
    keys2 = jnp.asarray(rng.integers(0, 1 << 16, (19000, 256)).astype(
        np.int32))
    bench("argsort (19000,256) stable",
          jax.jit(lambda k: jnp.argsort(k, axis=1, stable=True)), keys2)

    # --- take_along_axis minor 64
    src64 = jnp.asarray(rng.integers(0, 1 << 15, (74000, 64)).astype(
        np.int32))
    i64 = jnp.asarray(rng.integers(0, 64, (74000, 64)).astype(np.int32))
    bench("take_along_axis (74000,64)",
          jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1)),
          src64, i64)

    # --- one-hot windowed matmul pack: 64-lane groups -> 64-word windows
    Lp = 524_288
    G = Lp // 64
    d0 = jnp.asarray(rng.integers(0, 64, (G, 64)).astype(np.int32))
    clo = jnp.asarray(rng.integers(0, 1 << 16, (G, 64)).astype(np.float32))

    def oh_pack(d, v):
        oh = (d[:, :, None] ==
              jnp.arange(64, dtype=jnp.int32)[None, None, :]).astype(
                  jnp.float32)
        return jnp.einsum("glw,gl->gw", oh, v,
                          preferred_element_type=jnp.float32)

    bench("one-hot win pack 512k lanes (4x f32)",
          jax.jit(lambda d, v: (oh_pack(d, v), oh_pack(d, v + 1),
                                oh_pack(d, v + 2), oh_pack(d, v + 3))),
          d0, clo)

    # --- searchsorted 24k queries in 300k sorted
    srt = jnp.asarray(np.sort(rng.integers(0, 1 << 30, 300_000))
                      .astype(np.int32))
    q = jnp.asarray(np.sort(rng.integers(0, 1 << 30, 24_576))
                    .astype(np.int32))
    bench("searchsorted 24k in 300k",
          jax.jit(lambda s, x: jnp.searchsorted(s, x)), srt, q)

    # --- select-tree shift: (8,300k) funnel by 0..5 arms
    v6 = jnp.asarray(rng.integers(0, 1 << 30, (8, 300_000))
                     .astype(np.int32))
    sh6 = jnp.asarray(rng.integers(0, 6, (8, 300_000)).astype(np.int32))

    def seltree(v, s):
        out = jnp.zeros_like(v)
        for d in range(6):
            shifted = jnp.roll(v, d, axis=1)
            out = jnp.where(s == d, shifted, out)
        return out

    bench("select-tree 6-arm (8,300k)", jax.jit(seltree), v6, sh6)


if __name__ == "__main__":
    main()
