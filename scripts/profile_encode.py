#!/usr/bin/env python
"""Phase-level profile of the default encode path on the live backend."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu import EncoderConfig
from mozjpeg_tpu.codec import encoder as E
from mozjpeg_tpu.codec import pipeline_t

import jax
print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)

names = ["kodak_like_768x512_%d.ppm" % i for i in (1, 2, 3, 4)]
corpus = [ppm.read(os.path.join(REPO, "corpus", n)) for n in names]

config = EncoderConfig(quality=75)
cfg = config.resolved()
cfg_o, cfgr, cs, ncomps, samp, qt = E._resolve(corpus[0], config, {})

def t(label, fn, *a, **k):
    t0 = time.perf_counter()
    r = fn(*a, **k)
    jax.block_until_ready(r) if hasattr(r, "block_until_ready") or isinstance(r, tuple) else None
    dt = time.perf_counter() - t0
    print("%-28s %8.1f ms" % (label, dt*1e3), file=sys.stderr)
    return r

img = corpus[0]

# warm up everything once via full encode
t0 = time.perf_counter()
from mozjpeg_tpu import encode
data = encode(img, config)
print("cold encode: %.1f s, %d bytes" % (time.perf_counter()-t0, len(data)), file=sys.stderr)
t0 = time.perf_counter()
data = encode(img, config)
print("warm encode: %.2f s" % (time.perf_counter()-t0), file=sys.stderr)

# now phase by phase (warm)
for rep in range(2):
    print("--- rep", rep, file=sys.stderr)
    t0 = time.perf_counter()
    geom, comp_res, small = E._phase_p1(img, cfgr, samp, qt, cs)
    jax.block_until_ready(small)
    print("p1 dispatch+small sync: %.1f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)

    t0 = time.perf_counter()
    finals = E._phase_trellis(geom, comp_res, small, cfgr, qt, cs)
    jax.block_until_ready(finals)
    print("trellis: %.1f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)

    t0 = time.perf_counter()
    flat = E._phase_pack(geom, finals)
    jax.block_until_ready(flat)
    print("pack: %.1f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)

    t0 = time.perf_counter()
    flat_h = np.asarray(flat)
    print("download flat (%.1f MB): %.1f ms" % (flat_h.nbytes/1e6, (time.perf_counter()-t0)*1e3), file=sys.stderr)

    planes = E._split_flat(geom, flat_h, flat_dev=flat)
    mcus_x = geom[0]
    restart = E._restart_interval(cfgr, mcus_x)
    t0 = time.perf_counter()
    out = E._phase_entropy(img.shape[1], img.shape[0], geom, planes, qt,
                           cfg_o, cfgr, ncomps, restart, cs)
    print("entropy(scanopt): %.1f ms -> %d bytes" % ((time.perf_counter()-t0)*1e3, len(out)), file=sys.stderr)

# scanopt detail: time a single candidate scan result, host vs device
from mozjpeg_tpu.entropy import encode as entenc
from mozjpeg_tpu.codec import scans
script = scans.search_progression(3, cfgr.dc_scan_opt_mode)
dc_tbls = {0:0,1:1,2:1}; ac_tbls = dict(dc_tbls)
for lbl, dev in (("host", False), ("device", True)):
    t0 = time.perf_counter()
    for scan in script[:8]:
        sg = entenc.ScanGeometry(scan, geom, planes)
        E.encode_scan_optimal(sg, dc_tbls, ac_tbls, 0, device=dev, precision=8)
    print("8 candidates, %s emit: %.1f ms" % (lbl, (time.perf_counter()-t0)*1e3), file=sys.stderr)

# gather-only cost
t0 = time.perf_counter()
for scan in script[:8]:
    sg = entenc.ScanGeometry(scan, geom, planes)
    entenc.encode_scan(sg, dc_tbls, ac_tbls, {}, {}, 0, gather=True)
print("8 candidates, gather only: %.1f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)
