#!/usr/bin/env python
"""Measure reference mozjpeg (built at .refbuild/) on the corpus.

Configs mirror BASELINE.json:
  - baseline: cjpeg -revert -baseline (libjpeg-turbo-style sequential)
  - progressive-noopt: -revert -progressive (default turbo scan script, optimized huffman)
  - mozjpeg-default: full mozjpeg path (progressive + trellis + optimize_scans)
  - mozjpeg-notrellis / mozjpeg-noscanopt variants for attribution

Outputs JSON to baseline_results.json and a markdown table to stdout.
Note: reference built WITHOUT SIMD (no nasm in image) — recorded as such.
"""
import json
import os
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, ".refbuild")
CJPEG = os.path.join(BUILD, "cjpeg")
DJPEG = os.path.join(BUILD, "djpeg")
CORPUS = os.path.join(REPO, "corpus")
OUT = os.path.join(REPO, ".bench")
os.makedirs(OUT, exist_ok=True)


def read_ppm(path):
    with open(path, "rb") as f:
        data = f.read()
    parts = data.split(maxsplit=4)
    w, h = int(parts[1]), int(parts[2])
    return np.frombuffer(parts[4][: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(d * d)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


CONFIGS = {
    "baseline_seq": ["-revert", "-baseline"],
    "progressive_opt": ["-revert", "-progressive", "-optimize"],
    "moz_notrellis_noscan": ["-notrellis", "-notrellis-dc", "-noovershoot", "-fastcrush"],
    "moz_trellis_only": ["-fastcrush"],
    "moz_default_full": [],  # progressive + trellis + optimize_scans + deringing
}


def run_one(img_path, quality, args, reps):
    name = os.path.basename(img_path)
    jpg = os.path.join(OUT, "ref_%s_q%d_%s.jpg" % (name, quality, "_".join(a.strip('-') for a in args) or "full"))
    cmd = [CJPEG, "-quality", str(quality)] + args + ["-outfile", jpg, img_path]
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(cmd, check=True)
    enc_t = (time.perf_counter() - t0) / reps
    size = os.path.getsize(jpg)
    # decode timing
    dec_ppm = jpg + ".ppm"
    dcmd = [DJPEG, "-outfile", dec_ppm, jpg]
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(dcmd, check=True)
    dec_t = (time.perf_counter() - t0) / reps
    src = read_ppm(img_path)
    dec = read_ppm(dec_ppm)
    p = psnr(src, dec)
    mp = src.shape[0] * src.shape[1] / 1e6
    return {
        "image": name, "mp": mp, "quality": quality, "bytes": size,
        "bpp": size * 8.0 / (src.shape[0] * src.shape[1]),
        "psnr": round(p, 3),
        "encode_s": enc_t, "encode_mps": mp / enc_t,
        "decode_s": dec_t, "decode_mps": mp / dec_t,
    }


def main():
    images = [
        "testorig.ppm",
        "kodak_like_768x512_1.ppm", "kodak_like_768x512_2.ppm",
        "kodak_like_768x512_3.ppm", "kodak_like_768x512_4.ppm",
        "hd_1920x1080.ppm", "mp4_2048x1536.ppm", "uhd_3840x2160.ppm",
    ]
    results = []
    for cfg, args in CONFIGS.items():
        for img in images:
            path = os.path.join(CORPUS, img)
            mp = os.path.getsize(path) / 3e6
            reps = 3 if mp < 2 else 1
            qualities = [75] if "768x512" not in img else [60, 75, 90]
            for q in qualities:
                r = run_one(path, q, args, reps)
                r["config"] = cfg
                results.append(r)
                print("%-22s %-26s q%-3d %8dB %6.3fbpp PSNR %6.2f enc %7.2f MP/s dec %7.2f MP/s"
                      % (cfg, img, q, r["bytes"], r["bpp"], r["psnr"], r["encode_mps"], r["decode_mps"]))
    with open(os.path.join(REPO, "baseline_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
