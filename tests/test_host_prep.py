"""Host C++ color+downsample prep vs the device path: byte-identical."""
import os

import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode_many
from mozjpeg_tpu.utils import ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _imgs():
    return [ppm.read(os.path.join(
        REPO, "corpus", "kodak_like_768x512_%d.ppm" % i)) for i in (1, 2)]


@pytest.mark.parametrize("quality", [75, 85, 92])
def test_subsampling_modes(quality):
    imgs = _imgs()
    a = encode_many(imgs, EncoderConfig(quality=quality, host_prep=True))
    b = encode_many(imgs, EncoderConfig(quality=quality, host_prep=False))
    assert a == b


def test_odd_dimensions():
    """Edge replication across padding: odd sizes in both axes."""
    base = _imgs()[0]
    for hw in ((509, 765), (497, 753)):
        crop = np.ascontiguousarray(base[:hw[0], :hw[1]])
        pair = [crop, np.ascontiguousarray(crop[::-1].copy())]
        a = encode_many(pair, EncoderConfig(quality=75, host_prep=True))
        b = encode_many(pair, EncoderConfig(quality=75, host_prep=False))
        assert a == b, hw


def test_extreme_values():
    """Saturated colors drive the Cb/Cr rounding fudge + dering."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (128, 256, 3)).astype(np.uint8)
    img[:64] = 255
    img[64:96, :128] = 0
    pair = [img, np.roll(img, 7, axis=1)]
    a = encode_many(pair, EncoderConfig(quality=75, host_prep=True))
    b = encode_many(pair, EncoderConfig(quality=75, host_prep=False))
    assert a == b


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
