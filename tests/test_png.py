"""PNG input (rdpng.c semantics): reader unit tests + cjpeg byte-exactness
vs the reference binary (built with libpng)."""
import os
import struct
import subprocess
import zlib

import numpy as np
import pytest

from conftest import CJPEG, have_reference

from mozjpeg_tpu.utils.png import read_png

# the shared-lib reference cjpeg omits rdpng.c (sharedlib/CMakeLists.txt:100
# never adds it); a static build with PNG compiled in is kept as cjpeg-png
CJPEG_PNG = CJPEG + "-png" if os.path.exists(CJPEG + "-png") else CJPEG


def _chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body +
            struct.pack(">I", zlib.crc32(tag + body)))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(cur, prev, ft, bpp):
    cur = cur.astype(np.int32)
    prevI = prev.astype(np.int32) if prev is not None else \
        np.zeros_like(cur)
    out = np.empty_like(cur)
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prevI[i]
        c = prevI[i - bpp] if i >= bpp else 0
        pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                4: _paeth(a, b, c)}[ft]
        out[i] = (cur[i] - pred) % 256
    return out.astype(np.uint8)


def write_png(samples, ctype, depth, palette=None, interlace=0,
              filters=None, icc=None):
    """Minimal PNG writer for tests. samples: (H, W, ch) raw sample values
    (uint8, or uint16 for depth 16); sub-byte depths packed here."""
    h, w = samples.shape[:2]
    ch = samples.shape[2] if samples.ndim == 3 else 1
    samples = samples.reshape(h, w, ch)

    def rowbytes_of(width):
        if depth < 8:
            return (width * depth + 7) // 8
        return width * ch * (2 if depth == 16 else 1)

    def pack_rows(sub):
        sh, sw = sub.shape[:2]
        rb = rowbytes_of(sw)
        rows = np.zeros((sh, rb), np.uint8)
        if depth == 16:
            be = sub.astype(">u2").view(np.uint8).reshape(sh, -1)
            rows[:, :] = be
        elif depth == 8:
            rows[:, :] = sub.astype(np.uint8).reshape(sh, -1)
        else:
            per = 8 // depth
            for y in range(sh):
                for x in range(sw):
                    v = int(sub[y, x, 0]) & ((1 << depth) - 1)
                    rows[y, x // per] |= v << ((per - 1 - x % per) * depth)
        return rows

    def filter_sub(sub):
        rows = pack_rows(sub)
        bpp = max(1, ch * (2 if depth == 16 else 1)) if depth >= 8 else 1
        out = bytearray()
        prev = None
        for y in range(rows.shape[0]):
            ft = filters[y % len(filters)] if filters else 0
            out.append(ft)
            out += _filter_row(rows[y], prev, ft, bpp).tobytes()
            prev = rows[y]
        return bytes(out)

    if interlace:
        adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = b"".join(filter_sub(samples[y0::dy, x0::dx])
                       for (x0, y0, dx, dy) in adam7
                       if samples[y0::dy, x0::dx].size)
    else:
        raw = filter_sub(samples)

    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                       0, 0, interlace))
    if icc is not None:
        out += _chunk(b"iCCP", b"icc\x00\x00" + zlib.compress(icc))
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return out


def _rand(shape, hi, seed):
    return np.random.RandomState(seed).randint(0, hi, shape)


def make_icc_profile(pad=0):
    """Minimal ICC profile passing libpng's png_icc_check_header: valid
    length field, 'mntr'/'RGB '/'XYZ ' classes, 'acsp' signature, D50
    illuminant, empty tag table (+ pad bytes of trailing payload)."""
    size = 132 + pad
    h = bytearray(128)
    struct.pack_into(">I", h, 0, size)
    h[8:12] = b"\x02\x10\x00\x00"            # version 2.1
    h[12:16] = b"mntr"
    h[16:20] = b"RGB "
    h[20:24] = b"XYZ "
    h[24:36] = struct.pack(">6H", 2026, 1, 1, 0, 0, 0)
    h[36:40] = b"acsp"
    struct.pack_into(">3I", h, 68, 0x0000F6D6, 0x00010000, 0x0000D32D)
    return bytes(h) + struct.pack(">I", 0) + bytes(
        (i * 7) % 256 for i in range(pad))


class TestReader:
    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                         [0, 1, 2, 3, 4]])
    def test_rgb8_filters(self, filters):
        img = _rand((23, 17, 3), 256, 1).astype(np.uint8)
        out, gray, icc, srgb = read_png(
            write_png(img, 2, 8, filters=filters))
        assert not gray and icc is None and not srgb
        np.testing.assert_array_equal(out, img)

    def test_rgba_strips_alpha(self):
        img = _rand((9, 11, 4), 256, 2).astype(np.uint8)
        out, gray, _, _ = read_png(write_png(img, 6, 8,
                                             filters=[4, 1, 3]))
        np.testing.assert_array_equal(out, img[:, :, :3])
        assert not gray

    def test_gray8_and_gray_alpha(self):
        g = _rand((12, 7), 256, 3).astype(np.uint8)
        out, gray, _, _ = read_png(write_png(g[:, :, None], 0, 8))
        assert gray
        np.testing.assert_array_equal(out, g)
        ga = np.dstack([g, _rand((12, 7), 256, 4)]).astype(np.uint8)
        out, gray, _, _ = read_png(write_png(ga, 4, 8, filters=[2]))
        assert gray
        np.testing.assert_array_equal(out, g)

    @pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
    def test_gray_lowdepth_expands(self, depth, scale):
        g = _rand((10, 13), 1 << depth, depth).astype(np.uint8)
        out, gray, _, _ = read_png(write_png(g[:, :, None], 0, depth))
        assert gray
        np.testing.assert_array_equal(out, (g * scale).astype(np.uint8))

    def test_gray16_strips_low_byte(self):
        g = _rand((6, 5), 65536, 5).astype(np.uint16)
        out, gray, _, _ = read_png(
            write_png(g[:, :, None], 0, 16, filters=[1, 4]))
        assert gray
        np.testing.assert_array_equal(out, (g >> 8).astype(np.uint8))

    def test_rgb16(self):
        img = _rand((8, 9, 3), 65536, 6).astype(np.uint16)
        out, gray, _, _ = read_png(write_png(img, 2, 16, filters=[3]))
        np.testing.assert_array_equal(out, (img >> 8).astype(np.uint8))

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette(self, depth):
        n = 1 << depth
        pal = _rand((n, 3), 256, 7).astype(np.uint8)
        idx = _rand((14, 10), n, 8).astype(np.uint8)
        out, gray, _, _ = read_png(
            write_png(idx[:, :, None], 3, depth, palette=pal))
        assert not gray
        np.testing.assert_array_equal(out, pal[idx])

    @pytest.mark.parametrize("shape", [(16, 16), (13, 11), (7, 5), (1, 9)])
    def test_adam7(self, shape):
        img = _rand(shape + (3,), 256, 9).astype(np.uint8)
        out, _, _, _ = read_png(write_png(img, 2, 8, interlace=1,
                                          filters=[0, 1, 2, 3, 4]))
        np.testing.assert_array_equal(out, img)

    def test_adam7_gray_lowdepth(self):
        g = _rand((11, 13), 2, 10).astype(np.uint8)
        out, gray, _, _ = read_png(
            write_png(g[:, :, None], 0, 1, interlace=1))
        assert gray
        np.testing.assert_array_equal(out, g * 255)

    def test_icc_roundtrip(self):
        img = _rand((4, 4, 3), 256, 11).astype(np.uint8)
        prof = make_icc_profile(pad=40)
        out, _, icc, _ = read_png(write_png(img, 2, 8, icc=prof))
        assert icc == prof
        # malformed profiles are dropped like libpng does
        out, _, icc, _ = read_png(
            write_png(img, 2, 8, icc=bytes(range(64)) * 4))
        assert icc is None

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            read_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
        with pytest.raises(ValueError):
            read_png(b"hello")


@pytest.mark.skipif(not have_reference(), reason="no reference build")
class TestCjpegPNG:
    def _ref_supports_png(self, tmp_path):
        img = np.zeros((8, 8, 3), np.uint8)
        p = tmp_path / "probe.png"
        p.write_bytes(write_png(img, 2, 8))
        r = subprocess.run([CJPEG_PNG, "-outfile", os.devnull, str(p)],
                           capture_output=True)
        return r.returncode == 0

    @pytest.mark.parametrize("ctype,depth", [(2, 8), (0, 8), (6, 8),
                                             (3, 8), (2, 16)])
    def test_byte_exact_vs_reference(self, tmp_path, ctype, depth):
        if not self._ref_supports_png(tmp_path):
            pytest.skip("reference cjpeg built without PNG")
        h, w = 37, 29
        if ctype == 3:
            pal = _rand((256, 3), 256, 20).astype(np.uint8)
            samples = _rand((h, w, 1), 256, 21).astype(np.uint8)
            data = write_png(samples, 3, 8, palette=pal,
                             filters=[0, 1, 2, 3, 4])
        else:
            ch = {0: 1, 2: 3, 6: 4}[ctype]
            hi = 65536 if depth == 16 else 256
            dt = np.uint16 if depth == 16 else np.uint8
            samples = _rand((h, w, ch), hi, 22 + ctype).astype(dt)
            data = write_png(samples, ctype, depth,
                             filters=[4, 2, 1, 3, 0])
        src = tmp_path / "in.png"
        src.write_bytes(data)
        ref_out = tmp_path / "ref.jpg"
        subprocess.run([CJPEG_PNG, "-quality", "80", "-fastcrush",
                        "-outfile", str(ref_out), str(src)], check=True)
        from mozjpeg_tpu.cli import cjpeg as cli
        ours = tmp_path / "ours.jpg"
        cli.main(["-quality", "80", "-fastcrush",
                  "-outfile", str(ours), str(src)])
        assert ours.read_bytes() == ref_out.read_bytes()

    def test_icc_embedded_matches_reference(self, tmp_path):
        if not self._ref_supports_png(tmp_path):
            pytest.skip("reference cjpeg built without PNG")
        img = _rand((16, 16, 3), 256, 30).astype(np.uint8)
        prof = make_icc_profile(pad=168)
        src = tmp_path / "icc.png"
        src.write_bytes(write_png(img, 2, 8, icc=prof))
        ref_out = tmp_path / "ref.jpg"
        subprocess.run([CJPEG_PNG, "-quality", "75", "-fastcrush",
                        "-outfile", str(ref_out), str(src)], check=True)
        from mozjpeg_tpu.cli import cjpeg as cli
        ours = tmp_path / "ours.jpg"
        cli.main(["-quality", "75", "-fastcrush",
                  "-outfile", str(ours), str(src)])
        assert ours.read_bytes() == ref_out.read_bytes()
