#!/usr/bin/env python
"""Unified profiling harness for the attached backend.

    python scripts/profile.py tunnel     # latency / H2D / D2H bandwidth
    python scripts/profile.py prims      # scatter/gather/sort/cumsum costs
    python scripts/profile.py stages     # per-stage times of one encode group
    python scripts/profile.py pipeline   # pipelined encode_many throughput
    python scripts/profile.py trellis    # the fused trellis program alone
    python scripts/profile.py decode     # decode_many throughput

Replaces the 14 exploratory profile_*.py scripts from rounds 1-2; their
durable findings live in docs/perf_notes.md. Run each mode in a FRESH
process: on the remote-attached TPU runtime, switching between program
sets inside one process can wedge the TPU worker (see perf_notes).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _corpus(n=32):
    from mozjpeg_tpu.utils import ppm
    base = [ppm.read(os.path.join(REPO, "corpus",
                                  "kodak_like_768x512_%d.ppm" % (i + 1)))
            for i in range(4)]
    return [np.roll(base[i % 4], (i * 37) % 512, axis=1).copy()
            for i in range(n)]


def _sync(x):
    import jax.numpy as jnp
    np.asarray(jnp.reshape(x, (-1,))[:1])


def mode_tunnel():
    import jax
    import jax.numpy as jnp
    log("backend:", jax.default_backend(), jax.devices())
    t0 = time.perf_counter()
    _sync(jnp.zeros(8))
    log("round-trip latency (tiny sync): %.1f ms"
        % ((time.perf_counter() - t0) * 1e3))
    for mb in (1, 8, 32):
        a = np.zeros(mb << 20, np.uint8)
        t0 = time.perf_counter()
        d = jnp.asarray(a)
        _sync(d)
        up = mb / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(d)
        down = mb / (time.perf_counter() - t0)
        log("%3d MB: H2D %.1f MB/s, D2H %.1f MB/s" % (mb, up, down))


def mode_prims():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    NW, L = 330000, 1_560_000

    def bench(label, fn, *args, reps=10):
        _sync(fn(*args))
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(reps)]
        _sync(rs[-1])
        log("%-36s %7.2f ms" % (label,
                                (time.perf_counter() - t0) / reps * 1e3))

    idx = np.sort(rng.integers(0, NW - 2, L)).astype(np.int32)
    c = rng.integers(0, 1 << 31, L).astype(np.uint32)
    bench("scatter-add 1.56M",
          jax.jit(lambda i, v: jnp.zeros(NW, jnp.uint32).at[i].add(v)),
          jnp.asarray(idx), jnp.asarray(c))
    src = jnp.asarray(rng.integers(0, 1 << 31, L).astype(np.uint32))
    gidx = jnp.asarray(rng.integers(0, L, L).astype(np.int32))
    bench("gather 1.56M", jax.jit(lambda s, i: s[i]), src, gidx)
    bench("cumsum 1.56M", jax.jit(jnp.cumsum),
          jnp.asarray(rng.integers(0, 8, L).astype(np.int32)))
    keys = jnp.asarray(rng.integers(0, 1 << 16, (24000, 64)).astype(
        np.int32))
    bench("argsort (24000, 64) stable",
          jax.jit(lambda k: jnp.argsort(k, axis=1, stable=True)), keys)


def mode_stages():
    from mozjpeg_tpu import EncoderConfig, encode_many
    from mozjpeg_tpu.codec import encoder as E
    from mozjpeg_tpu.codec.encoder import _resolve
    g = int(os.environ.get("MJ_BATCH_GROUP", "8"))
    corpus = _corpus(g)
    cfg_o = EncoderConfig(quality=75)
    encode_many(corpus, cfg_o)
    _, cfgr, cs, ncomps, samp, qt = _resolve(corpus[0], cfg_o, {})
    for rep in range(3):
        t0 = time.perf_counter()
        p1 = E._batch_p1(corpus, cfgr, samp, qt)
        t1 = time.perf_counter()
        st = E._batch_rest(corpus, p1, cfg_o, cfgr, cs, ncomps, samp,
                           qt)
        t2 = time.perf_counter()
        planes = E._batch_fetch(st, cfgr)
        t3 = time.perf_counter()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, g)) as ex:
            outs = list(ex.map(
                lambda ip: E._phase_entropy(
                    ip[0].shape[1], ip[0].shape[0], st["geom"], ip[1], qt,
                    cfg_o, cfgr, ncomps, st["restart"], parallel=False),
                zip(corpus, planes)))
        t4 = time.perf_counter()
        log("rep %d: p1 %.3f | trellis+pack dispatch %.3f | fetch %.3f | "
            "entropy %.3f | total %.3f s (bytes[0]=%d)"
            % (rep, t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0,
               len(outs[0])))


def mode_pipeline():
    from mozjpeg_tpu import EncoderConfig, encode_many
    import jax
    n = int(os.environ.get("N", "32"))
    corpus = _corpus(n)
    mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
    log("backend:", jax.default_backend(), "N =", n,
        "group =", os.environ.get("MJ_BATCH_GROUP", "8"))
    cfg = EncoderConfig(quality=75)
    t0 = time.perf_counter()
    out = encode_many(corpus, cfg)
    log("cold: %.1f s" % (time.perf_counter() - t0))
    for _ in range(4):
        t0 = time.perf_counter()
        out = encode_many(corpus, cfg)
        dt = time.perf_counter() - t0
        log("warm: %.2f s -> %.2f MP/s (bytes[0]=%d)"
            % (dt, mp / dt, len(out[0])))


def mode_trellis():
    import jax.numpy as jnp
    from mozjpeg_tpu import EncoderConfig, consts
    from mozjpeg_tpu.codec import encoder as E, trellis
    from mozjpeg_tpu.codec.encoder import (_resolve, STD_TABLES,
                                           _trellis_comps)
    from mozjpeg_tpu.entropy.huffman import derive_codes
    g = int(os.environ.get("MJ_BATCH_GROUP", "8"))
    corpus = _corpus(g)
    cfg_o = EncoderConfig(quality=75)
    _, cfgr, cs, ncomps, samp, qt = _resolve(corpus[0], cfg_o, {})
    p1 = E._batch_p1(corpus, cfgr, samp, qt)
    geom, merged, smalls = p1
    comps = geom[2]
    tcomps = _trellis_comps(cfgr, "ycbcr", comps)
    dc_sis, qtblzz, ncands = [], [], []
    for ci in range(3):
        slot = 0 if ci == 0 else 1
        dc_sis.append(derive_codes(STD_TABLES[(0, slot)])[1]
                      .astype(np.int32))
        qz = np.asarray(qt[0] if ci == 0 else qt[1]).reshape(64)[
            consts.JPEG_ZIGZAG].astype(np.int32)
        qtblzz.append(qz)
        ncands.append(trellis.get_num_dc_candidates(int(qz[0])))
    packed = jnp.asarray(trellis.pack_trellis_inputs([], [], dc_sis,
                                                     qtblzz))
    upal, uint = trellis.ac_impl_flags(8)
    run = trellis.make_trellis_all_t(
        tuple(tcomps), None, ((1, 63),), True, tuple(ncands), batch=g,
        precision=8, eob_opt=True,
        delta_w=float(cfgr.trellis_delta_dc_weight),
        use_pallas=upal, interpret=uint,
        dev_first=(float(cfgr.lambda_log_scale1),
                   float(cfgr.lambda_log_scale2)))
    raws_b = tuple(m[1] for m in merged)
    qs = tuple(m[0] for m in merged)
    _sync(run(raws_b, qs, packed, smalls)[0])
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(run(raws_b, qs, packed, smalls)[0])
        log("trellis program (%d imgs): %.3f s" % (g,
                                                   time.perf_counter() - t0))


def mode_decode():
    from mozjpeg_tpu import EncoderConfig, encode_many, decode_many
    n = int(os.environ.get("N", "32"))
    corpus = _corpus(n)
    mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
    datas = encode_many(corpus, EncoderConfig(quality=75))
    decode_many(datas)
    for _ in range(4):
        t0 = time.perf_counter()
        decode_many(datas)
        log("decode_many: %.2f MP/s" % (mp / (time.perf_counter() - t0)))


if __name__ == "__main__":
    modes = {k[5:]: v for k, v in list(globals().items())
             if k.startswith("mode_")}
    which = sys.argv[1] if len(sys.argv) > 1 else "pipeline"
    if which not in modes:
        raise SystemExit("modes: " + " ".join(sorted(modes)))
    modes[which]()
