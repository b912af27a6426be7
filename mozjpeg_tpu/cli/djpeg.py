"""djpeg-compatible CLI (flag surface of /root/reference/djpeg.c).

Usage: python -m mozjpeg_tpu.cli.djpeg [switches] [inputfile]
"""
from __future__ import annotations

import argparse
import sys

from ..utils import ppm


def build_parser():
    p = argparse.ArgumentParser(prog="djpeg",
                                description="TPU-native JPEG decoder")
    p.add_argument("-grayscale", "-greyscale", action="store_true",
                   dest="grayscale")
    p.add_argument("-scale", type=str, default=None,
                   help="M/N scaling (1/8..2/1 in 1/8 steps)")
    p.add_argument("-colors", "-quantize", type=int, default=None,
                   dest="colors", help="quantize to N colors")
    p.add_argument("-onepass", action="store_true",
                   help="one-pass (fixed palette) quantization")
    p.add_argument("-dither", default="fs",
                   choices=["fs", "ordered", "none"])
    p.add_argument("-nosmooth", action="store_true",
                   help="box-filter upsampling (merged upsample path)")
    p.add_argument("-dct", default="int", choices=["int", "fast", "float"])
    p.add_argument("-outfile", type=str, default=None)
    p.add_argument("-pnm", "-ppm", action="store_true", default=True)
    p.add_argument("-crop", type=str, default=None,
                   help="WxH+X+Y partial decode")
    p.add_argument("input", nargs="?", default=None)
    return p


def main(argv=None):
    a = build_parser().parse_args(argv)
    from ..codec.decoder import decode, decode_scaled
    data = (open(a.input, "rb").read() if a.input
            else sys.stdin.buffer.read())
    from ..codec import marker as _marker
    maxval = (1 << _marker.parse(data).precision) - 1
    if a.scale:
        num, den = (int(v) for v in a.scale.split("/"))
        # -nosmooth only suppresses fancy upsampling (djpeg.c:366-368);
        # block smoothing stays on (jdapimin.c:221)
        img = decode_scaled(data, num, den,
                            fancy_upsample=not a.nosmooth)
    else:
        img = decode(data, fancy_upsample=not a.nosmooth,
                     dct_method={"int": "islow", "fast": "ifast",
                                 "float": "float"}[a.dct])
    if a.grayscale and img.ndim == 3:
        import numpy as np
        from ..ops import color
        import jax.numpy as jnp
        # decoder-side RGB->gray not yet wired; approximate via luma plane
        img = np.asarray(color.rgb_to_gray(jnp.asarray(img)))
    if a.crop:
        wh, x, y = a.crop.split("+")
        w, h = (int(v) for v in wh.split("x"))
        img = img[int(y):int(y) + h, int(x):int(x) + w]
    if a.colors:
        from ..codec.decoder import quantize_colors
        idx, cmap = quantize_colors(img, a.colors, a.dither,
                                    two_pass=not a.onepass)
        img = cmap[idx]          # PPM output maps through the colormap
    if a.outfile:
        ppm.write(a.outfile, img, maxval=maxval)
    else:
        import io
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".ppm") as f:
            ppm.write(f.name, img, maxval=maxval)
            sys.stdout.buffer.write(open(f.name, "rb").read())
    return 0


if __name__ == "__main__":
    sys.exit(main())
