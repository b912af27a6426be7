#!/usr/bin/env python
"""Deterministic benchmark corpus generator.

The reference repo bundles only tiny images (testorig.ppm is 227x149,
/root/reference/testimages/). For meaningful MP/s numbers we synthesize a
deterministic corpus from the bundled photo: mirror-tiled mosaics at several
sizes plus mild deterministic photometric variation, so content stays
photographic (DCT statistics realistic) while sizes reach multi-megapixel.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


def read_ppm(path):
    with open(path, "rb") as f:
        data = f.read()
    # P6 maxval 255 only
    parts = data.split(maxsplit=4)
    assert parts[0] == b"P6"
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    assert maxval == 255
    raw = parts[4]
    img = np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    return img


def write_ppm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.astype(np.uint8).tobytes())


def mosaic(img, out_h, out_w, seed):
    """Mirror-tile `img` to (out_h, out_w) with deterministic per-tile tweaks."""
    h, w, _ = img.shape
    # mirror-extend to 2h x 2w then tile
    big = np.concatenate([img, img[::-1]], axis=0)
    big = np.concatenate([big, big[:, ::-1]], axis=1)
    reps_y = -(-out_h // big.shape[0])
    reps_x = -(-out_w // big.shape[1])
    tiled = np.tile(big, (reps_y, reps_x, 1))[:out_h, :out_w].astype(np.int16)
    # deterministic smooth luminance ramp + small noise so tiles aren't exact repeats
    rng = np.random.RandomState(seed)
    yy = np.linspace(-12, 12, out_h, dtype=np.float32)[:, None]
    xx = np.linspace(-12, 12, out_w, dtype=np.float32)[None, :]
    ramp = (yy + xx)[..., None]
    noise = rng.randint(-2, 3, size=(out_h, out_w, 1)).astype(np.int16)
    out = np.clip(tiled + ramp.astype(np.int16) + noise, 0, 255)
    return out.astype(np.uint8)


def main():
    src = read_ppm("/root/reference/testimages/testorig.ppm")
    os.makedirs(CORPUS, exist_ok=True)
    write_ppm(os.path.join(CORPUS, "testorig.ppm"), src)
    specs = [
        ("kodak_like_768x512_%d.ppm", 512, 768, [1, 2, 3, 4]),  # kodak-size
        ("hd_1920x1080.ppm", 1080, 1920, [10]),
        ("mp4_2048x1536.ppm", 1536, 2048, [20]),
        ("uhd_3840x2160.ppm", 2160, 3840, [30]),  # 4K, DIV2K-like scale
    ]
    for name, h, w, seeds in specs:
        for s in seeds:
            fname = name % s if "%d" in name else name
            path = os.path.join(CORPUS, fname)
            if not os.path.exists(path):
                write_ppm(path, mosaic(src, h, w, s))
            print(fname, h, w)


if __name__ == "__main__":
    main()
