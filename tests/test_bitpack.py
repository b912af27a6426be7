"""On-device restart-parallel bit packing (ops/bitpack.py): must be
byte-identical to the serial host entropy engine (native/entropy.cpp),
which is itself byte-exact vs the reference (jchuff.c)."""
import numpy as np
import pytest

from conftest import CORPUS, run_cjpeg, run_djpeg

import os


def corpus(name):
    return os.path.join(CORPUS, name)


def _rand_planes(comps, rng, density=0.15):
    planes = []
    for g in comps:
        p = np.zeros((g.bh_pad, g.bw_pad, 64), np.int16)
        p[:, :, 0] = np.cumsum(
            rng.randint(-40, 41, (g.bh_pad, g.bw_pad)), axis=1)
        nz = rng.rand(g.bh_pad, g.bw_pad, 63) < density
        p[:, :, 1:] = np.where(
            nz, rng.randint(-255, 256, (g.bh_pad, g.bw_pad, 63)), 0)
        planes.append(p)
    return planes


class TestBitpackUnit:
    @pytest.mark.parametrize("restart", [0, 1, 3, 7, 50])
    def test_interleaved_420_vs_native(self, restart):
        from mozjpeg_tpu.codec import pipeline, scans
        from mozjpeg_tpu.entropy import encode as entenc
        from mozjpeg_tpu.entropy.huffman import derive_codes
        from mozjpeg_tpu.codec.encoder import STD_TABLES
        from mozjpeg_tpu.ops import bitpack
        rng = np.random.RandomState(7)
        mcus_x, mcus_y, comps = pipeline.geometry(
            168, 120, [(2, 2), (1, 1), (1, 1)])
        planes = _rand_planes(comps, rng)
        scan = scans.ScanInfo((0, 1, 2), 0, 63, 0, 0)
        sg = entenc.ScanGeometry(scan, (mcus_x, mcus_y, comps), planes)
        dct = {0: STD_TABLES[(0, 0)], 1: STD_TABLES[(0, 1)]}
        act = {0: STD_TABLES[(1, 0)], 1: STD_TABLES[(1, 1)]}
        ref, _, _ = entenc.encode_scan(sg, {0: 0, 1: 1, 2: 1},
                                       {0: 0, 1: 1, 2: 1}, dct, act,
                                       restart, gather=False)
        ours = bitpack.encode_scan_bitpar(
            planes, [(g.h, g.v) for g in comps], mcus_x, mcus_y, restart,
            [derive_codes(dct[0]), derive_codes(dct[1]),
             derive_codes(dct[1])],
            [derive_codes(act[0]), derive_codes(act[1]),
             derive_codes(act[1])])
        assert ref == ours

    def test_dense_extremes(self):
        """All-nonzero blocks (worst-case bits) and all-zero AC blocks."""
        from mozjpeg_tpu.codec import pipeline, scans
        from mozjpeg_tpu.entropy import encode as entenc
        from mozjpeg_tpu.entropy.huffman import derive_codes
        from mozjpeg_tpu.codec.encoder import STD_TABLES
        from mozjpeg_tpu.ops import bitpack
        rng = np.random.RandomState(3)
        mcus_x, mcus_y, comps = pipeline.geometry(32, 32, [(1, 1)])
        g = comps[0]
        p = rng.randint(-1023, 1024, (g.bh_pad, g.bw_pad, 64)) \
            .astype(np.int16)
        p[0, 0, 1:] = 0          # all-zero AC -> lone EOB
        p[1, 1, 1:] = 0
        p[1, 1, 63] = 5          # run of 62 zeros -> 3 ZRLs
        scan = scans.ScanInfo((0,), 0, 63, 0, 0)
        sg = entenc.ScanGeometry(scan, (mcus_x, mcus_y, comps), [p])
        dct = {0: STD_TABLES[(0, 0)]}
        act = {0: STD_TABLES[(1, 0)]}
        for restart in (0, 2):
            ref, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, dct, act,
                                           restart, gather=False)
            ours = bitpack.encode_scan_bitpar(
                [p], [(1, 1)], sg.mcus_x, sg.mcus_y, restart,
                [derive_codes(dct[0])], [derive_codes(act[0])])
            assert ref == ours


class TestBitpackIntegration:
    def test_device_entropy_byte_identical(self, testorig):
        from mozjpeg_tpu import encode, EncoderConfig
        from mozjpeg_tpu.codec.config import Profile
        for kw in (dict(), dict(optimize_coding=True),
                   dict(restart_interval=4),
                   dict(restart_in_rows=2, optimize_coding=True)):
            base = dict(quality=75, profile=Profile.FASTEST,
                        progressive=False)
            base.update(kw)
            a = encode(testorig, EncoderConfig(**base))
            b = encode(testorig, EncoderConfig(device_entropy=True, **base))
            assert a == b, kw

    def test_encode_batch_device_vs_host_and_djpeg(self, ref_tools,
                                                   tmp_path):
        """Multi-device batch path with per-segment device packing:
        byte-identical to the host emission, and decodable by the
        reference djpeg."""
        from mozjpeg_tpu.parallel import batch as pbatch
        from mozjpeg_tpu.utils import ppm
        rng = np.random.RandomState(5)
        base = ppm.read(corpus("testorig.ppm"))[:64, :96]
        imgs = np.stack([np.clip(base.astype(np.int32)
                                 + rng.randint(-20, 20, base.shape), 0, 255)
                         .astype(np.uint8) for _ in range(8)])
        host = pbatch.encode_batch(imgs, quality=75, restart_interval=3)
        dev = pbatch.encode_batch(imgs, quality=75, restart_interval=3,
                                  device_entropy=True)
        assert host == dev
        jp = tmp_path / "b0.jpg"
        jp.write_bytes(dev[0])
        out = run_djpeg(str(jp), str(tmp_path / "b0.ppm"))
        assert out.shape == imgs[0].shape
