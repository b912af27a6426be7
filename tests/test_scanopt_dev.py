"""Device scan search vs the host search: byte-identical output."""
import os

import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode, encode_many
from mozjpeg_tpu.utils import ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(n=2):
    return [ppm.read(os.path.join(
        REPO, "corpus", "kodak_like_768x512_%d.ppm" % (i + 1)))
        for i in range(n)]


def _check(images, **cfg_kw):
    dev = encode_many(images, EncoderConfig(device_scanopt=True, **cfg_kw))
    host = [encode(img, EncoderConfig(device_scanopt=False, **cfg_kw))
            for img in images]
    for i, (d, h) in enumerate(zip(dev, host)):
        assert d == h, "image %d: device scanopt differs (%d vs %d bytes)" \
            % (i, len(d), len(h))


def test_default_profile_batch():
    _check(_corpus(2), quality=75)


def test_quality_sweep():
    imgs = _corpus(2)
    _check(imgs, quality=50)
    _check(imgs, quality=92)        # 4:4:4 subsampling


def test_dc_scan_opt_modes():
    imgs = _corpus(2)
    _check(imgs, quality=75, dc_scan_opt_mode=1)
    _check(imgs, quality=75, dc_scan_opt_mode=2)


def test_no_trellis():
    _check(_corpus(2), quality=75, trellis_quant=False)


def test_flat_image_edge():
    """Constant image: nearly-empty histograms, long EOB runs."""
    flat = np.full((128, 256, 3), 128, np.uint8)
    grad = np.tile(np.arange(256, dtype=np.uint8)[None, :, None],
                   (128, 1, 3))
    _check([flat, grad], quality=75)


def test_batch_of_one():
    _check(_corpus(1), quality=75)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
