"""Native (C++) whole-search scan optimization vs the Python machinery."""
import os

import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode
from mozjpeg_tpu.utils import ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _img(i=1):
    return ppm.read(os.path.join(REPO, "corpus",
                                 "kodak_like_768x512_%d.ppm" % i))


def _parity(img, **kw):
    os.environ["MJ_NATIVE_SCANSEARCH"] = "1"
    try:
        a = encode(img, EncoderConfig(**kw))
        os.environ["MJ_NATIVE_SCANSEARCH"] = "0"
        b = encode(img, EncoderConfig(**kw))
    finally:
        os.environ.pop("MJ_NATIVE_SCANSEARCH", None)
    assert a == b, "native search differs (%d vs %d bytes)" % (len(a),
                                                               len(b))


def test_default():
    _parity(_img(1), quality=75)
    _parity(_img(2), quality=50)


def test_quality_444():
    _parity(_img(3), quality=92)


def test_dc_modes():
    _parity(_img(1), quality=75, dc_scan_opt_mode=1)
    _parity(_img(2), quality=75, dc_scan_opt_mode=2)


def test_grayscale():
    _parity(np.ascontiguousarray(_img(1)[..., 0]), quality=75)


def test_restart_intervals():
    _parity(_img(1), quality=75, restart_interval=32)
    _parity(_img(2), quality=75, restart_in_rows=2)


def test_no_trellis_and_edges():
    _parity(_img(4), quality=75, trellis_quant=False)
    flat = np.full((64, 80, 3), 250, np.uint8)
    _parity(flat, quality=75)
    tiny = _img(1)[:17, :31].copy()
    _parity(tiny, quality=75)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
