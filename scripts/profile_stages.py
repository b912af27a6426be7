#!/usr/bin/env python
"""Stage timing of the current batch path at B=8 on the live backend."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu import EncoderConfig
from mozjpeg_tpu.codec import encoder as E

B = int(os.environ.get("B", "8"))
base = [ppm.read(os.path.join(REPO, "corpus", "kodak_like_768x512_%d.ppm" % (i + 1)))
        for i in range(4)]
corpus = [np.roll(base[i % 4], (i * 37) % 512, axis=1).copy() for i in range(B)]
mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
print("backend:", jax.default_backend(), "B =", B, file=sys.stderr)

config = EncoderConfig(quality=75)
cfg_o, cfg, cs, ncomps, samp, qt = E._resolve(corpus[0], config, {})

# warm
E._encode_batch(corpus, cfg_o, cfg, ncomps, samp, qt)

from mozjpeg_tpu.codec import pipeline_t, trellis
from mozjpeg_tpu import consts
from mozjpeg_tpu.ops import sparsepack

for rep in range(3):
    t0 = time.perf_counter()
    stack = np.stack(corpus)
    t0b = time.perf_counter()
    geom, merged, smalls = pipeline_t.run_p1_batch(
        stack, samp, qt, cfg.overshoot_deringing, cfg.precision)
    sm = np.asarray(smalls)
    t1 = time.perf_counter()
    print("stack %.0f | p1+upload+smallsync: %.1f ms" %
          ((t0b-t0)*1e3, (t1-t0b)*1e3), file=sys.stderr)
    st = E._batch_device(corpus, cfg_o, cfg, ncomps, samp, qt)
    # force trellis+sparse dispatch complete via the sparse buf sync
    t2 = time.perf_counter()
    print("batch_device total (incl tablegen, dispatch): %.1f ms" %
          ((t2-t1)*1e3), file=sys.stderr)
    buf = np.asarray(st["sparse"][0])
    cap_sb = st["sparse"][3]
    t3 = time.perf_counter()
    print("trellis+sparse exec + buf sync (%.2f MB): %.1f ms" %
          (buf.nbytes/1e6, (t3-t2)*1e3), file=sys.stderr)
    planes = sparsepack.expand_to_planes(buf, st["sparse"][1],
                                         st["sparse"][2], B, geom[2], cap_sb)
    t4 = time.perf_counter()
    print("expand: %.1f ms (overflow=%s)" % ((t4-t3)*1e3, planes is None),
          file=sys.stderr)
    # isolated single-image host entropy (1 thread)
    t4b = time.perf_counter()
    E._phase_entropy(corpus[0].shape[1], corpus[0].shape[0], geom,
                     planes[0], qt, cfg_o, cfg, ncomps, 0)
    t4c = time.perf_counter()
    print("1-image host entropy serial: %.1f ms" % ((t4c-t4b)*1e3),
          file=sys.stderr)
    outs = E._batch_host(corpus, st, cfg_o, cfg, ncomps, qt)
    t5 = time.perf_counter()
    print("batch_host (fetch again + entropy): %.1f ms" % ((t5-t4c)*1e3),
          file=sys.stderr)
    print("total: %.0f ms -> %.2f MP/s" % ((t5-t0)*1e3, mp/(t5-t0)),
          file=sys.stderr)
