#!/usr/bin/env python
"""Throughput of the pipelined default path at various corpus sizes."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu import EncoderConfig, encode_many

N = int(os.environ.get("N", "32"))
base = [ppm.read(os.path.join(REPO, "corpus", "kodak_like_768x512_%d.ppm" % (i + 1)))
        for i in range(4)]
corpus = [np.roll(base[i % 4], (i * 37) % 512, axis=1).copy() for i in range(N)]
mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
print("backend:", jax.default_backend(), "N =", N,
      "group =", os.environ.get("MJ_BATCH_GROUP", "8"), file=sys.stderr)

cfg = EncoderConfig(quality=75)
t0 = time.perf_counter(); out = encode_many(corpus[:int(os.environ.get("MJ_BATCH_GROUP", "8"))], cfg)
print("cold (one group): %.1f s" % (time.perf_counter()-t0), file=sys.stderr)
for r in range(3):
    t0 = time.perf_counter(); out = encode_many(corpus, cfg)
    dt = time.perf_counter()-t0
    print("warm: %.2f s -> %.2f MP/s  (bytes[0]=%d)" % (dt, mp/dt, len(out[0])),
          file=sys.stderr)
