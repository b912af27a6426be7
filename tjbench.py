#!/usr/bin/env python
"""tjbench equivalent: compress/decompress throughput via the TurboJPEG
API (reference: /root/reference/tjbench.c).

Usage: python tjbench.py image.ppm quality [-subsamp 444|422|420|gray]
       [-progressive] [-optimize] [-arithmetic] [-scale N/D] [-reps N]
       [-warmup N] [-json]
Prints per-operation throughput in MP/s like tjbench.
"""
from __future__ import annotations

import os as _os
import sys as _sys
try:
    import numpy as _np  # noqa: F401
except ImportError:  # bare system python: re-exec into the jax venv
    _cand = "/opt/venv/bin/python"
    if _os.path.exists(_cand) and _os.path.realpath(_cand) != \
            _os.path.realpath(_sys.executable):
        _os.execv(_cand, [_cand] + _sys.argv)
    raise

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="tjbench")
    p.add_argument("image")
    p.add_argument("quality", type=int, nargs="?", default=95)
    p.add_argument("-subsamp", default="420",
                   choices=["444", "422", "420", "gray"])
    p.add_argument("-progressive", action="store_true")
    p.add_argument("-optimize", action="store_true")
    p.add_argument("-arithmetic", action="store_true")
    p.add_argument("-scale", default=None)
    p.add_argument("-reps", type=int, default=8)
    p.add_argument("-warmup", type=int, default=2)
    p.add_argument("-tile", action="store_true",
                   help="decompose into tiles at 8x8..128x128 granularity "
                        "via lossless crop transforms and decode each "
                        "(tjbench.c decompTest tile modes)")
    p.add_argument("-json", action="store_true", dest="as_json")
    a = p.parse_args(argv)

    from mozjpeg_tpu._jaxcache import ensure_backend
    ensure_backend()
    from mozjpeg_tpu import turbojpeg as tj
    from mozjpeg_tpu.utils import ppm
    import numpy as np

    img = ppm.read(a.image)
    h, w = img.shape[:2]
    mp = w * h / 1e6
    t = tj.TJ()
    t.set(tj.TJPARAM_QUALITY, a.quality)
    t.set(tj.TJPARAM_SUBSAMP, {"444": tj.TJSAMP_444, "422": tj.TJSAMP_422,
                               "420": tj.TJSAMP_420,
                               "gray": tj.TJSAMP_GRAY}[a.subsamp])
    t.set(tj.TJPARAM_PROGRESSIVE, int(a.progressive))
    t.set(tj.TJPARAM_OPTIMIZE, int(a.optimize))
    t.set(tj.TJPARAM_ARITHMETIC, int(a.arithmetic))

    def bench(fn):
        for _ in range(a.warmup):
            fn()
        t0 = time.perf_counter()
        for _ in range(a.reps):
            fn()
        return a.reps * mp / (time.perf_counter() - t0)

    data = t.compress(img)
    comp_mps = bench(lambda: t.compress(img))
    if a.scale:
        num, den = (int(v) for v in a.scale.split("/"))
        t.set_scaling_factor(num, den)
    dec = t.decompress(data)
    dec_mps = bench(lambda: t.decompress(data))

    res = {
        "image": a.image, "width": w, "height": h,
        "quality": a.quality, "subsamp": a.subsamp,
        "jpeg_bytes": len(data),
        "ratio": w * h * (1 if img.ndim == 2 else 3) / len(data),
        "compress_mps": round(comp_mps, 3),
        "decompress_mps": round(dec_mps, 3),
    }
    if a.tile:
        full = t.decompress(data)
        tiles = []
        imw = 16 if a.subsamp in ("420", "422") else 8
        imh = 16 if a.subsamp == "420" else 8
        sizes = []
        for tw in (8, 16, 32, 64, 128):
            mw, mh = max(tw, imw), max(tw, imh)
            if (mw, mh) not in sizes:
                sizes.append((mw, mh))
        # note: 420/422 tiles are not pixel-identical to the full decode at
        # tile boundaries (chroma upsampling loses its neighbor context,
        # same as reference tiled decompression); 444/gray tiles are exact.
        for mw, mh in sizes:
            t0 = time.perf_counter()
            out = np.zeros_like(full)
            ntiles = 0
            for y in range(0, h, mh):
                for x in range(0, w, mw):
                    cw = min(mw, w - x)
                    ch2 = min(mh, h - y)
                    piece = t.transform(data, crop=(x, y, cw, ch2))
                    out[y:y + ch2, x:x + cw] = t.decompress(piece)
                    ntiles += 1
            dt = time.perf_counter() - t0
            ok = bool((out == full).all())
            res["tile_%dx%d" % (mw, mh)] = {
                "tiles": ntiles, "mps": round(mp / dt, 3), "exact": ok}
            if not a.as_json:
                print("Tile %3dx%-3d --> %8.3f MP/s   (%d tiles%s)"
                      % (mw, mh, mp / dt, ntiles,
                         "" if ok else ", PIXEL MISMATCH"))

    if a.as_json:
        print(json.dumps(res))
    else:
        print(">>>>>  %dx%d  quality %d  %s  <<<<<"
              % (w, h, a.quality, a.subsamp))
        print("Compress    --> %8.3f MP/s   (%d bytes, ratio %.2f:1)"
              % (comp_mps, len(data), res["ratio"]))
        print("Decompress  --> %8.3f MP/s   (output %s)"
              % (dec_mps, "x".join(map(str, dec.shape))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
