#!/usr/bin/env python
"""tjbench equivalent: compress/decompress throughput via the TurboJPEG
API (reference: /root/reference/tjbench.c).

Usage: python tjbench.py image.ppm quality [-subsamp 444|422|420|gray]
       [-progressive] [-optimize] [-arithmetic] [-scale N/D] [-reps N]
       [-warmup N] [-json]
Prints per-operation throughput in MP/s like tjbench.
"""
from __future__ import annotations

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
    p.add_argument("-json", action="store_true", dest="as_json")
    a = p.parse_args(argv)

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
