"""jpegtran-compatible CLI (flag surface of /root/reference/jpegtran.c).

Lossless transforms + jpegrescan re-optimization (mozjpeg default).
Usage: python -m mozjpeg_tpu.cli.jpegtran [switches] [inputfile]
"""
from __future__ import annotations

import argparse
import sys

from ..codec.config import EncoderConfig, Profile


def build_parser():
    p = argparse.ArgumentParser(prog="jpegtran",
                                description="TPU-native lossless transformer")
    p.add_argument("-flip", choices=["horizontal", "vertical"], default=None)
    p.add_argument("-rotate", type=int, choices=[90, 180, 270], default=None)
    p.add_argument("-transpose", action="store_true")
    p.add_argument("-transverse", action="store_true")
    p.add_argument("-crop", type=str, default=None, help="WxH+X+Y")
    p.add_argument("-wipe", type=str, default=None, help="WxH+X+Y")
    p.add_argument("-optimize", "-optimise", action="store_true",
                   dest="optimize", default=None)
    p.add_argument("-progressive", action="store_true", default=None)
    p.add_argument("-fastcrush", action="store_true")
    p.add_argument("-revert", action="store_true")
    p.add_argument("-arithmetic", action="store_true")
    p.add_argument("-copy", choices=["none", "comments", "icc", "all",
                                     "all_except_icc"], default="comments")
    p.add_argument("-perfect", action="store_true")
    p.add_argument("-trim", action="store_true",
                   help="trim partial MCUs (this implementation always "
                        "trims; flag accepted for compatibility)")
    p.add_argument("-maxscans", type=int, default=None)
    p.add_argument("-outfile", type=str, default=None)
    p.add_argument("input", nargs="?", default=None)
    return p


def main(argv=None):
    a = build_parser().parse_args(argv)
    from ..codec import transcode
    data = (open(a.input, "rb").read() if a.input
            else sys.stdin.buffer.read())
    img = transcode.read_coefficients(data)
    if a.maxscans is not None and len(img.jp.scans) > a.maxscans:
        sys.stderr.write("jpegtran: scan count exceeds -maxscans\n")
        return 2
    if a.perfect:
        ops = []
        if a.flip == "horizontal": ops.append("flip_h")
        if a.flip == "vertical": ops.append("flip_v")
        if a.transpose: ops.append("transpose")
        if a.transverse: ops.append("transverse")
        if a.rotate: ops.append("rot%d" % a.rotate)
        for op in ops:
            if not transcode.perfect_possible(img.jp, op):
                sys.stderr.write("jpegtran: transformation is not "
                                 "perfect\n")
                return 1
    if a.flip == "horizontal":
        img = transcode.flip_h(img)
    elif a.flip == "vertical":
        img = transcode.flip_v(img)
    if a.transpose:
        img = transcode.transpose(img)
    if a.transverse:
        img = transcode.transverse(img)
    if a.rotate == 90:
        img = transcode.rot90(img)
    elif a.rotate == 180:
        img = transcode.rot180(img)
    elif a.rotate == 270:
        img = transcode.rot270(img)
    if a.crop:
        wh, x, y = a.crop.split("+")
        w, h = (int(v) for v in wh.split("x"))
        img = transcode.crop(img, int(x), int(y), w, h)
    if a.wipe:
        wh, x, y = a.wipe.split("+")
        w, h = (int(v) for v in wh.split("x"))
        img = transcode.wipe(img, int(x), int(y), w, h)

    profile = Profile.FASTEST if a.revert else Profile.MAX_COMPRESSION
    cfg = EncoderConfig(
        profile=profile,
        progressive=a.progressive,
        optimize_coding=a.optimize,
        optimize_scans=False if (a.fastcrush or a.revert) else None,
        trellis_quant=False,   # jpegtran never requantizes
        overshoot_deringing=False,
        arithmetic=a.arithmetic,
    )
    out = transcode.write_coefficients(img, cfg, a.copy)
    if a.outfile:
        with open(a.outfile, "wb") as f:
            f.write(out)
    else:
        sys.stdout.buffer.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
