"""decode_many(output="yuv"): batched raw-plane decode equals the serial
jpeg_read_raw_data path (tj3DecompressToYUV8 dims)."""
import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode
from mozjpeg_tpu.codec.decoder import decode_many, decode_raw_planes


@pytest.mark.parametrize("cfgkw,dims", [
    (dict(quality=75), (120, 168)),                     # 4:2:0 default
    (dict(quality=75), (119, 167)),                     # odd dims
    (dict(quality=92), (64, 80)),                       # 4:4:4
    (dict(quality=75, grayscale=True), (56, 72)),       # gray
    (dict(quality=75, progressive=False, optimize_scans=False,
          trellis_quant=False), (48, 64)),              # baseline seq
])
def test_batched_yuv_matches_serial(testorig, cfgkw, dims):
    h, w = dims
    img = np.ascontiguousarray(testorig[:h, :w])
    datas = [encode(img, EncoderConfig(**cfgkw)),
             encode(np.ascontiguousarray(img[::-1]).copy(),
                    EncoderConfig(**cfgkw))]
    got = decode_many(datas, output="yuv")
    for d, planes in zip(datas, got):
        ref, _, _, _ = decode_raw_planes(d)
        assert len(planes) == len(ref)
        for a, b in zip(planes, ref):
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)


def test_yuv_group_path(testorig):
    """Enough same-shape images to hit the batched chunk path."""
    img = np.ascontiguousarray(testorig[:96, :128])
    datas = [encode(np.roll(img, i * 7, axis=1).copy(),
                    EncoderConfig(quality=75)) for i in range(6)]
    got = decode_many(datas, output="yuv")
    for d, planes in zip(datas, got):
        ref, _, _, _ = decode_raw_planes(d)
        for a, b in zip(planes, ref):
            np.testing.assert_array_equal(a, b)


def test_rgb565_output(testorig):
    from mozjpeg_tpu.codec.decoder import decode_rgb565
    img = np.ascontiguousarray(testorig[:40, :56])
    d = encode(img, EncoderConfig(quality=75))
    got = decode_many([d], output="rgb565")
    np.testing.assert_array_equal(got[0], decode_rgb565(d))
