#!/usr/bin/env python
"""Profile decode_many on the attached backend: host entropy vs device
render vs download, and serial decode() for contrast."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mozjpeg_tpu._jaxcache import ensure_backend
    ensure_backend(probe_timeout=90)
    import jax
    from mozjpeg_tpu.utils import ppm
    from mozjpeg_tpu import encode, EncoderConfig, decode
    from mozjpeg_tpu.codec import decoder, marker

    log("backend:", jax.default_backend(), jax.devices())
    names = ["kodak_like_768x512_%d.ppm" % i for i in (1, 2, 3, 4)]
    base = [ppm.read(os.path.join(REPO, "corpus", n)) for n in names]
    n = int(os.environ.get("N", "32"))
    corpus = [np.roll(base[i % 4], (i * 37) % 512, axis=1).copy()
              for i in range(n)]
    cfg = EncoderConfig(quality=75)
    cache = os.path.join(REPO, "corpus", ".dec_profile_%d.bin" % n)
    if os.path.exists(cache):
        import pickle
        datas = pickle.load(open(cache, "rb"))
    else:
        from mozjpeg_tpu import encode_many
        datas = encode_many(corpus, cfg)
        import pickle
        pickle.dump(datas, open(cache, "wb"))
    mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
    log("corpus: %d imgs, %.1f MP" % (len(datas), mp))

    # warm
    decode(datas[0])
    res = decoder.decode_many(datas[:2])

    # serial decode()
    t0 = time.perf_counter()
    for d in datas[:8]:
        decode(d)
    dt = time.perf_counter() - t0
    log("serial decode():      %.2fs for 8 -> %.2f MP/s"
        % (dt, 8 * 0.393216 / dt))

    # decode_many as-is
    for _ in range(2):
        t0 = time.perf_counter()
        out = decoder.decode_many(datas)
        dt = time.perf_counter() - t0
        log("decode_many:          %.2fs -> %.2f MP/s" % (dt, mp / dt))

    # breakdown: parse
    t0 = time.perf_counter()
    jps = [marker.parse(d) for d in datas]
    t_parse = time.perf_counter() - t0
    log("  marker.parse all:   %.2fs" % t_parse)

    # host entropy (threaded, as decode_many does)
    from concurrent.futures import ThreadPoolExecutor
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        planes_list = list(ex.map(
            lambda i: decoder.decode_coefficients(jps[i], datas[i]),
            range(len(datas))))
    t_ent = time.perf_counter() - t0
    log("  host entropy (8t):  %.2fs" % t_ent)
    t0 = time.perf_counter()
    decoder.decode_coefficients(jps[0], datas[0])
    log("  host entropy (1 img, 1t): %.3fs" % (time.perf_counter() - t0))

    # device render: upload+dispatch vs sync
    import jax.numpy as jnp
    jp = jps[0]
    # group as decode_many would
    t0 = time.perf_counter()
    outs = decoder.decode_many(datas)
    log("  (repeat decode_many: %.2fs)" % (time.perf_counter() - t0))

    # pixels volume
    nbytes = sum(o.nbytes for o in outs)
    log("  pixel volume: %.1f MB -> tunnel-limited floor @30MB/s = %.2fs"
        % (nbytes / 1e6, nbytes / 30e6))
    coef_bytes = sum(sum(p.nbytes for p in pl) for pl in planes_list)
    log("  coeff upload volume: %.1f MB" % (coef_bytes / 1e6))


if __name__ == "__main__":
    main()
