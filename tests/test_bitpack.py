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


class TestProgressiveDevicePack:
    """Progressive device packers (DC first/refine, AC first/refine) must
    be byte-identical to the serial engine (jcphuff.c semantics), incl.
    the eobrun=0x7FFF and BE>937 forced flushes."""

    def _setup(self, h=120, w=168, density=0.15, seed=7):
        from mozjpeg_tpu.codec import pipeline
        rng = np.random.RandomState(seed)
        mcus_x, mcus_y, comps = pipeline.geometry(
            w, h, [(2, 2), (1, 1), (1, 1)])
        return mcus_x, mcus_y, comps, _rand_planes(comps, rng, density)

    def _host(self, scan, geom, planes, r):
        from mozjpeg_tpu.entropy import encode as entenc
        dc_tbls = {ci: (0 if ci == 0 else 1) for ci in range(3)}
        sg = entenc.ScanGeometry(scan, geom, planes)
        _, dcc, acc = entenc.encode_scan(sg, dc_tbls, dc_tbls, {}, {},
                                         r, gather=True)
        dct, act = {}, {}
        for t in (0, 1):
            if dcc[t].any():
                dct[t] = entenc.gen_optimal_table(dcc[t])
            if acc[t].any():
                act[t] = entenc.gen_optimal_table(acc[t])
        data, _, _ = entenc.encode_scan(sg, dc_tbls, dc_tbls, dct, act,
                                        r, gather=False)
        return data, dct, act, dc_tbls

    @pytest.mark.parametrize("spec,r", [
        ((tuple(range(3)), 0, 0, 0, 1), 0),      # DC first Al=1
        ((tuple(range(3)), 0, 0, 0, 1), 5),
        ((tuple(range(3)), 0, 0, 1, 0), 0),      # DC refine
        ((tuple(range(3)), 0, 0, 2, 1), 9),
        (((0,), 1, 8, 0, 2), 0),                 # AC first
        (((0,), 9, 63, 0, 2), 21),
        (((1,), 1, 63, 0, 1), 0),
        (((0,), 1, 8, 1, 0), 0),                 # AC refine
        (((0,), 9, 63, 2, 1), 21),
        (((2,), 1, 63, 1, 0), 4),
    ])
    def test_byte_exact_vs_host(self, spec, r):
        from mozjpeg_tpu.codec import scans
        from mozjpeg_tpu.entropy.huffman import derive_codes
        from mozjpeg_tpu.ops import bitpack
        mcus_x, mcus_y, comps, planes = self._setup()
        scan = scans.ScanInfo(*spec)
        data, dct, act, dc_tbls = self._host(
            scan, (mcus_x, mcus_y, comps), planes, r)
        if scan.Ss == 0:
            pl = [planes[ci] for ci in scan.comps]
            gs = [(comps[ci].h, comps[ci].v) for ci in scan.comps]
            dc_codes = ([derive_codes(dct[dc_tbls[ci]])
                         for ci in scan.comps] if dct else None)
            dev = bitpack.encode_scan_progressive_device(
                pl, gs, mcus_x, mcus_y, scan.Ss, scan.Se, scan.Ah,
                scan.Al, r, dc_tables=dc_codes)
        else:
            ci = scan.comps[0]
            g = comps[ci]
            dev = bitpack.encode_scan_progressive_device(
                [planes[ci]], [(1, 1)], g.bw, g.bh, scan.Ss, scan.Se,
                scan.Ah, scan.Al, r,
                ac_tables=[derive_codes(act[dc_tbls[ci]])])
        assert dev == data

    def test_eobrun_and_be_forced_flushes(self):
        """eobrun hits 0x7FFF (AC first) and BE exceeds 937 (AC refine)."""
        from mozjpeg_tpu.codec.scans import ScanInfo
        from mozjpeg_tpu.codec.pipeline import CompGeom
        from mozjpeg_tpu.entropy import encode as entenc
        from mozjpeg_tpu.entropy.huffman import derive_codes
        from mozjpeg_tpu.ops import bitpack
        rng = np.random.RandomState(3)

        # AC first: 40000 nearly-all-zero blocks -> eobrun crosses 0x7FFF
        bh = bw = 200
        pl = np.zeros((bh, bw, 64), np.int16)
        pl[0, 0, 9] = 5
        pl[199, 150, 20] = -3
        geom = [CompGeom(1, 1, bw * 8, bh * 8, bw, bh, bw, bh)]
        scan = ScanInfo((0,), 9, 63, 0, 0)
        sg = entenc.ScanGeometry(scan, (bw, bh, geom), [pl])
        _, _, acc = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, {}, 0,
                                       gather=True)
        act = {0: entenc.gen_optimal_table(acc[0])}
        data, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, act, 0,
                                        gather=False)
        dev = bitpack.encode_scan_progressive_device(
            [pl], [(1, 1)], bw, bh, 9, 63, 0, 0, 0,
            ac_tables=[derive_codes(act[0])])
        assert dev == data

        # AC refine: blocks with only previously-nonzero coeffs -> BE > 937
        bh, bw = 30, 40
        pl = np.zeros((bh, bw, 64), np.int16)
        for b in range(bh * bw):
            y, x = divmod(b, bw)
            ks = rng.choice(np.arange(9, 63), size=rng.randint(2, 5),
                            replace=False)
            pl[y, x, ks] = rng.choice([-5, -4, 4, 5, 6, 7], size=len(ks))
            if b % 97 == 0:
                pl[y, x, rng.randint(9, 63)] = rng.choice([-3, 3])
        geom = [CompGeom(1, 1, bw * 8, bh * 8, bw, bh, bw, bh)]
        for r in (0, 11):
            scan = ScanInfo((0,), 9, 63, 2, 1)
            sg = entenc.ScanGeometry(scan, (bw, bh, geom), [pl])
            _, _, acc = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, {}, r,
                                           gather=True)
            act = {0: entenc.gen_optimal_table(acc[0])}
            data, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, act,
                                            r, gather=False)
            dev = bitpack.encode_scan_progressive_device(
                [pl], [(1, 1)], bw, bh, 9, 63, 2, 1, r,
                ac_tables=[derive_codes(act[0])])
            assert dev == data

    def test_full_default_path_device_entropy(self, ref_tools, testorig):
        """The complete mozjpeg default (progressive + trellis + scan
        search) emits byte-identically with device_entropy on."""
        import mozjpeg_tpu as mj
        a = mj.encode(testorig, mj.EncoderConfig(quality=75,
                                                 device_entropy=False))
        b = mj.encode(testorig, mj.EncoderConfig(quality=75,
                                                 device_entropy=True))
        assert a == b
        g = run_cjpeg(["-quality", "75"], corpus("testorig.ppm"),
                      "/tmp/_dp_ref.jpg")
        assert b == g

    def test_12bit_device_entropy(self, testorig):
        """Device packers at 12-bit data precision (wider DC/AC magnitude
        lanes, T.81 tables F.1/F.2)."""
        import mozjpeg_tpu as mj
        img12 = ((testorig.astype(np.uint16) << 4)
                 | (testorig >> 4)).astype(np.uint16)
        for prog in (True, False):
            a = mj.encode(img12, mj.EncoderConfig(
                quality=75, precision=12, progressive=prog,
                device_entropy=False))
            b = mj.encode(img12, mj.EncoderConfig(
                quality=75, precision=12, progressive=prog,
                device_entropy=True))
            assert a == b

    def test_forced_flush_at_symbol_block(self):
        """Regression: a symbol-bearing block whose own EOB contribution
        makes the since-flush count a multiple of 32767 must NOT emit a
        spurious forced EOBn (the flush just reset the counter)."""
        from mozjpeg_tpu.codec.scans import ScanInfo
        from mozjpeg_tpu.codec.pipeline import CompGeom
        from mozjpeg_tpu.entropy import encode as entenc
        from mozjpeg_tpu.entropy.huffman import derive_codes
        from mozjpeg_tpu.ops import bitpack
        bw, bh = 181, 182
        pl = np.zeros((bh, bw, 64), np.int16)
        pl[0, 0, 9] = 5
        y, x = divmod(32766, bw)     # since == 32767 exactly at this block
        pl[y, x, 9] = -4
        geom = [CompGeom(1, 1, bw * 8, bh * 8, bw, bh, bw, bh)]
        scan = ScanInfo((0,), 9, 63, 0, 0)
        sg = entenc.ScanGeometry(scan, (bw, bh, geom), [pl])
        _, _, acc = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, {}, 0,
                                       gather=True)
        act = {0: entenc.gen_optimal_table(acc[0])}
        data, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, act, 0,
                                        gather=False)
        dev = bitpack.encode_scan_progressive_device(
            [pl], [(1, 1)], bw, bh, 9, 63, 0, 0, 0,
            ac_tables=[derive_codes(act[0])])
        assert dev == data
