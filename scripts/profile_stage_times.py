#!/usr/bin/env python
"""Per-stage wall times of one pipelined group (prep/upload, smalls sync,
trellis+scanpack dispatch, coeff fetch, host entropy) to find the
throughput bottleneck on the current attachment."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np  # noqa: E402

from mozjpeg_tpu.utils import ppm  # noqa: E402
from mozjpeg_tpu import EncoderConfig, encode_many  # noqa: E402
from mozjpeg_tpu.codec import encoder as E  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    g = int(os.environ.get("MJ_BATCH_GROUP", "16"))
    base = [ppm.read(os.path.join(REPO, "corpus",
                                  "kodak_like_768x512_%d.ppm" % (i + 1)))
            for i in range(4)]
    corpus = [np.roll(base[i % 4], (i * 37) % 512, axis=1).copy()
              for i in range(g)]
    cfg_o = EncoderConfig(quality=75)
    encode_many(corpus, cfg_o)        # warm all programs

    import jax
    log("backend:", jax.default_backend())
    cfg = cfg_o.resolved()
    from mozjpeg_tpu.codec.encoder import _resolve
    _, cfgr, cs, ncomps, samp, qt = _resolve(corpus[0], cfg_o, {})

    for rep in range(3):
        t0 = time.perf_counter()
        p1 = E._batch_p1(corpus, cfgr, samp, qt)
        t1 = time.perf_counter()
        st = E._batch_rest(corpus, p1, cfg_o, cfgr, ncomps, samp, qt)
        t2 = time.perf_counter()
        if isinstance(st, list):
            log("device scanopt path returned bytes")
            continue
        planes = E._batch_fetch(st, cfgr)
        t3 = time.perf_counter()
        outs = E._batch_host.__wrapped__(corpus, st, cfg_o, cfgr, ncomps,
                                         qt) \
            if hasattr(E._batch_host, "__wrapped__") else None
        if outs is None:
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=min(8, g))
            futs = [ex.submit(E._phase_entropy, img.shape[1], img.shape[0],
                              st["geom"], pl, qt, cfg_o, cfgr, ncomps,
                              st["restart"], parallel=False)
                    for img, pl in zip(corpus, planes)]
            outs = [f.result() for f in futs]
            ex.shutdown(wait=False)
        t4 = time.perf_counter()
        log("rep %d: p1 dispatch %.3f | rest(smalls sync+trellis) %.3f | "
            "fetch %.3f | host entropy %.3f | total %.3f s"
            % (rep, t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0))
        log("  bytes[0] = %d" % len(outs[0]))


if __name__ == "__main__":
    main()
