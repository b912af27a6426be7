"""TurboJPEG API tests: byte-exact vs the reference libturbojpeg.so
(tj3* entry points) plus roundtrips for the parts the reference tj
doesn't implement (arithmetic, lossless >8-bit)."""
import ctypes
import os

import numpy as np
import pytest

from conftest import CORPUS
from mozjpeg_tpu import turbojpeg as tj
from mozjpeg_tpu.utils import ppm

REF_TJ = "/root/repo/.refbuild/libturbojpeg.so"


@pytest.fixture(scope="module")
def img():
    p = os.path.join(CORPUS, "testorig.ppm")
    if not os.path.exists(p):
        pytest.skip("corpus missing")
    return ppm.read(p)


@pytest.fixture(scope="module")
def reflib():
    if not os.path.exists(REF_TJ):
        pytest.skip("reference libturbojpeg missing")
    lib = ctypes.CDLL(REF_TJ)
    lib.tj3Init.restype = ctypes.c_void_p
    lib.tj3Compress8.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_size_t)]
    return lib


def ref_compress(lib, img, quality, subsamp, **params):
    h, w = img.shape[:2]
    hnd = lib.tj3Init(0)
    lib.tj3Set(ctypes.c_void_p(hnd), tj.TJPARAM_QUALITY, quality)
    lib.tj3Set(ctypes.c_void_p(hnd), tj.TJPARAM_SUBSAMP, subsamp)
    for k, v in params.items():
        lib.tj3Set(ctypes.c_void_p(hnd), getattr(tj, "TJPARAM_" + k), v)
    buf = ctypes.c_void_p(None)
    sz = ctypes.c_size_t(0)
    r = lib.tj3Compress8(ctypes.c_void_p(hnd), img.tobytes(), w, 0, h,
                         tj.TJPF_RGB, ctypes.byref(buf), ctypes.byref(sz))
    assert r == 0
    out = ctypes.string_at(buf, sz.value)
    lib.tj3Free(buf)
    lib.tj3Destroy(ctypes.c_void_p(hnd))
    return out


class TestCompress:
    @pytest.mark.parametrize("q,ss,params", [
        (80, tj.TJSAMP_420, {}),
        (80, tj.TJSAMP_422, {"OPTIMIZE": 1}),
        (75, tj.TJSAMP_444, {"PROGRESSIVE": 1}),
        (90, tj.TJSAMP_GRAY, {}),
    ])
    def test_byte_exact_vs_reference(self, reflib, img, q, ss, params):
        golden = ref_compress(reflib, img, q, ss, **params)
        t = tj.TJ()
        t.set(tj.TJPARAM_QUALITY, q)
        t.set(tj.TJPARAM_SUBSAMP, ss)
        for k, v in params.items():
            t.set(getattr(tj, "TJPARAM_" + k), v)
        assert t.compress(img) == golden

    def test_pixel_formats(self, img):
        t = tj.TJ()
        rgb = t.compress(img, tj.TJPF_RGB)
        assert t.compress(img[:, :, ::-1], tj.TJPF_BGR) == rgb
        rgbx = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        assert t.compress(rgbx, tj.TJPF_RGBX) == rgb

    def test_bottomup(self, img):
        t = tj.TJ()
        t.set(tj.TJPARAM_BOTTOMUP, 1)
        flipped = t.compress(img[::-1])
        t.set(tj.TJPARAM_BOTTOMUP, 0)
        assert flipped == t.compress(img)


class TestDecompress:
    def test_header_and_roundtrip(self, img):
        t = tj.TJ()
        t.set(tj.TJPARAM_QUALITY, 85)
        data = t.compress(img)
        hdr = t.decompress_header(data)
        assert (hdr["width"], hdr["height"]) == (img.shape[1], img.shape[0])
        assert hdr["subsamp"] == tj.TJSAMP_420
        dec = t.decompress(data)
        assert dec.shape == img.shape

    def test_scaled(self, img):
        t = tj.TJ()
        data = t.compress(img)
        t.set_scaling_factor(1, 2)
        half = t.decompress(data)
        assert half.shape[0] == -(-img.shape[0] // 2)
        with pytest.raises(tj.TJError):
            t.set_scaling_factor(3, 7)

    def test_crop_region(self, img):
        t = tj.TJ()
        data = t.compress(img)
        t.set_cropping_region(16, 8, 64, 32)
        assert t.decompress(data).shape == (32, 64, 3)


class TestTransformYUV:
    def test_transform_rot90(self, img):
        t = tj.TJ()
        data = t.compress(img)
        out = t.transform(data, tj.TJXOP_ROT90,
                          tj.TJXOPT_TRIM | tj.TJXOPT_OPTIMIZE)
        hdr = t.decompress_header(out)
        assert hdr["width"] < hdr["height"]

    def test_yuv_roundtrip(self, img):
        t = tj.TJ()
        h, w = img.shape[:2]
        yuv = t.encode_yuv(img, align=4)
        assert len(yuv) == tj.yuv_buf_size(w, 4, h, tj.TJSAMP_420)
        rec = t.decode_yuv(yuv, w, h, align=4)
        assert np.abs(rec.astype(int) - img.astype(int)).max() < 32
        assert len(t.compress_from_yuv(yuv, w, h, align=4)) > 1000
        assert len(t.decompress_to_yuv(t.compress(img), align=4)) \
            == len(yuv)

    def test_arithmetic_superset(self, img):
        # the reference tj errors with "arithmetic not implemented";
        # ours encodes and decodes it
        t = tj.TJ()
        t.set(tj.TJPARAM_ARITHMETIC, 1)
        data = t.compress(img)
        hdr = t.decompress_header(data)
        assert hdr["width"] == img.shape[1]
        assert t.decompress(data).shape == img.shape

    def test_lossless(self, img):
        t = tj.TJ()
        t.set(tj.TJPARAM_LOSSLESS, 1)
        t.set(tj.TJPARAM_LOSSLESSPSV, 4)
        data = t.compress(img)
        t2 = tj.TJ()
        np.testing.assert_array_equal(t2.decompress(data), img)


class TestRawFastDCT:
    def test_compress_from_yuv_fastdct(self, ref_tools):
        """TJPARAM_FASTDCT maps to the ifast DCT on the raw-plane encode
        path, byte-exact vs tj3CompressFromYUV8."""
        import ctypes
        import os as _os
        so = _os.path.join(_os.path.dirname(ref_tools["cjpeg"]),
                           "libturbojpeg.so")
        if not _os.path.exists(so):
            pytest.skip("libturbojpeg.so not built")
        lib = ctypes.CDLL(so)
        lib.tj3Init.restype = ctypes.c_void_p
        lib.tj3Set.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        ubp = ctypes.POINTER(ctypes.c_ubyte)
        lib.tj3CompressFromYUV8.restype = ctypes.c_int
        lib.tj3CompressFromYUV8.argtypes = [
            ctypes.c_void_p, ubp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        from mozjpeg_tpu import turbojpeg as tj
        from mozjpeg_tpu.utils import ppm as _ppm
        img = np.ascontiguousarray(
            _ppm.read(CORPUS + "/testorig.ppm")[:48, :64])
        h, w = img.shape[:2]
        t = tj.TJ()
        t.set(tj.TJPARAM_SUBSAMP, tj.TJSAMP_420)
        yuv = np.frombuffer(t.encode_yuv(img, align=4), np.uint8).copy()
        for fast in (0, 1):
            handle = lib.tj3Init(0)
            lib.tj3Set(handle, 4, tj.TJSAMP_420)
            lib.tj3Set(handle, 3, 80)
            lib.tj3Set(handle, 10, fast)
            buf = ctypes.c_void_p()
            sz = ctypes.c_size_t(0)
            assert lib.tj3CompressFromYUV8(
                handle, yuv.ctypes.data_as(ubp), w, 4, h,
                ctypes.byref(buf), ctypes.byref(sz)) == 0
            ref = ctypes.string_at(buf, sz.value)
            t2 = tj.TJ()
            t2.set(tj.TJPARAM_SUBSAMP, tj.TJSAMP_420)
            t2.set(tj.TJPARAM_QUALITY, 80)
            t2.set(tj.TJPARAM_FASTDCT, fast)
            assert t2.compress_from_yuv(bytes(yuv), w, h, align=4) == ref


class TestYuv440:
    def test_encode_yuv_440(self, ref_tools):
        """1x2 downsampling uses int_downsample's constant bias."""
        import ctypes
        import os as _os
        so = _os.path.join(_os.path.dirname(ref_tools["cjpeg"]),
                           "libturbojpeg.so")
        if not _os.path.exists(so):
            pytest.skip("libturbojpeg.so not built")
        lib = ctypes.CDLL(so)
        lib.tj3Init.restype = ctypes.c_void_p
        lib.tj3Set.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        ubp = ctypes.POINTER(ctypes.c_ubyte)
        lib.tj3EncodeYUV8.restype = ctypes.c_int
        lib.tj3EncodeYUV8.argtypes = [ctypes.c_void_p, ubp, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ubp, ctypes.c_int]
        from mozjpeg_tpu import turbojpeg as tj
        from mozjpeg_tpu.utils import ppm as _ppm
        img = np.ascontiguousarray(
            _ppm.read(CORPUS + "/testorig.ppm")[:48, :64])
        h, w = img.shape[:2]
        handle = lib.tj3Init(0)
        lib.tj3Set(handle, 4, tj.TJSAMP_440)
        ref = np.zeros(tj.yuv_buf_size(w, 1, h, tj.TJSAMP_440), np.uint8)
        assert lib.tj3EncodeYUV8(handle, img.ctypes.data_as(ubp), w, 0, h,
                                 0, ref.ctypes.data_as(ubp), 1) == 0
        t = tj.TJ()
        t.set(tj.TJPARAM_SUBSAMP, tj.TJSAMP_440)
        ours = np.frombuffer(t.encode_yuv(img, align=1), np.uint8)
        np.testing.assert_array_equal(ours, ref)
