"""Deterministic mutation-fuzz regression suite.

The reference ships libFuzzer targets (fuzz/decompress.cc, transform.cc,
compress.cc, ...) as its memory-safety harness (SURVEY.md §4.5). The TPU
build's analog: seeded byte-level mutations of valid streams in every
entropy/scan flavor must never crash, hang, or corrupt memory — each
decode either succeeds, reports corrupt-data warnings, or raises
ValueError. Goldens are not compared here; only containment.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from mozjpeg_tpu.utils import ppm


def corpus(name):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "corpus", name)


@pytest.fixture(scope="module")
def seeds(ref_tools, tmp_path_factory):
    """Small valid JPEGs in each stream flavor, built by reference cjpeg."""
    td = tmp_path_factory.mktemp("fuzzseeds")
    src = ppm.read(corpus("testorig.ppm"))[:64, :80]
    sp = str(td / "s.ppm")
    ppm.write(sp, src)
    flavors = {
        "baseline": ["-revert", "-baseline", "-quality", "75"],
        "progressive": ["-revert", "-progressive", "-optimize"],
        "mozdefault": ["-quality", "75"],
        "restart": ["-revert", "-baseline", "-restart", "1"],
        "arith": ["-revert", "-arithmetic"],
        "gray": ["-revert", "-baseline", "-grayscale"],
    }
    out = {}
    for name, flags in flavors.items():
        p = str(td / (name + ".jpg"))
        subprocess.run([ref_tools["cjpeg"]] + flags + ["-outfile", p, sp],
                       check=True)
        out[name] = open(p, "rb").read()
    return out


def _contained_decode(data):
    """Decode must be contained: pixels, or ValueError. Anything else
    (segfault, hang, unbounded memory) fails the suite at the process
    level."""
    import mozjpeg_tpu as mj
    try:
        img = mj.decode(data)
        assert img.ndim in (2, 3) and img.dtype == np.uint8
        return "ok"
    except ValueError:
        return "rejected"


N_MUTATIONS = 40


class TestDecodeFuzz:
    @pytest.mark.parametrize("flavor", ["baseline", "progressive",
                                        "mozdefault", "restart", "arith",
                                        "gray"])
    def test_byte_flips(self, seeds, flavor):
        rng = np.random.default_rng(hash(flavor) % (2 ** 32))
        data = bytearray(seeds[flavor])
        outcomes = {"ok": 0, "rejected": 0}
        for _ in range(N_MUTATIONS):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(2, len(buf)))
                buf[pos] = int(rng.integers(0, 256))
            outcomes[_contained_decode(bytes(buf))] += 1
        assert sum(outcomes.values()) == N_MUTATIONS

    @pytest.mark.parametrize("flavor", ["baseline", "progressive",
                                        "mozdefault", "arith"])
    def test_truncations(self, seeds, flavor):
        data = seeds[flavor]
        # every truncation point in a coarse sweep + the last 32 bytes
        points = list(range(2, len(data), max(1, len(data) // 64)))
        points += list(range(max(2, len(data) - 32), len(data)))
        for n in points:
            _contained_decode(data[:n])

    def test_marker_surgery(self, seeds):
        """Corrupt marker structure specifically: lengths, table ids,
        dimensions, component counts."""
        rng = np.random.default_rng(1234)
        data = seeds["mozdefault"]
        # find marker offsets (0xFF followed by non-0/non-FF)
        offs = [i for i in range(len(data) - 1)
                if data[i] == 0xFF and data[i + 1] not in (0, 0xFF)]
        for _ in range(N_MUTATIONS):
            buf = bytearray(data)
            o = offs[int(rng.integers(0, len(offs)))]
            # clobber the marker byte or its length field
            tgt = o + int(rng.integers(1, 4))
            if tgt < len(buf):
                buf[tgt] = int(rng.integers(0, 256))
            _contained_decode(bytes(buf))

    def test_random_garbage(self):
        rng = np.random.default_rng(99)
        for _ in range(N_MUTATIONS):
            n = int(rng.integers(0, 2048))
            blob = rng.integers(0, 256, n).astype(np.uint8).tobytes()
            _contained_decode(b"\xff\xd8" + blob)
            _contained_decode(blob)

    def test_scaled_and_gray_apis(self, seeds):
        """decode_scaled / decode_grayscale on mutated input stay
        contained too (fuzz/decompress.cc exercises scaling)."""
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.decoder import decode_scaled, decode_grayscale
        rng = np.random.default_rng(5)
        data = bytearray(seeds["baseline"])
        for _ in range(10):
            buf = bytearray(data)
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
            for fn in (lambda b: decode_scaled(b, 1, 2),
                       lambda b: decode_scaled(b, 3, 8),
                       decode_grayscale):
                try:
                    fn(bytes(buf))
                except ValueError:
                    pass


class TestTransformFuzz:
    def test_transform_contained(self, seeds):
        """jpegtran-equivalent transforms on mutated streams
        (fuzz/transform.cc)."""
        from mozjpeg_tpu.codec import transcode
        rng = np.random.default_rng(7)
        data = seeds["baseline"]
        for _ in range(20):
            buf = bytearray(data)
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
            try:
                transcode.transform(bytes(buf), op="rot90")
            except (ValueError, KeyError, TypeError) as e:
                # structured rejection only
                assert isinstance(e, ValueError), e


class TestCompressFuzz:
    def test_extreme_configs(self):
        """fuzz/compress.cc analog: encode never crashes over the config
        lattice on tiny/degenerate inputs."""
        import mozjpeg_tpu as mj
        rng = np.random.default_rng(11)
        shapes = [(1, 1, 3), (8, 8, 3), (17, 31, 3), (16, 16, 3)]
        for q in (0, 1, 50, 100):
            for shape in shapes:
                img = rng.integers(0, 256, shape).astype(np.uint8)
                for prog in (False, True):
                    data = mj.encode(img, mj.EncoderConfig(
                        quality=float(q), progressive=prog))
                    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
