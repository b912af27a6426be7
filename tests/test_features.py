"""Feature tests: arithmetic coding, lossless, transforms, scaled decode,
CLIs, ICC."""
import os
import subprocess

import numpy as np
import pytest

from conftest import (CORPUS, CJPEG, DJPEG, JPEGTRAN, run_cjpeg, run_djpeg)
from mozjpeg_tpu import encode, decode, EncoderConfig, Profile
from mozjpeg_tpu.utils import ppm


def corpus(name):
    p = os.path.join(CORPUS, name)
    if not os.path.exists(p):
        pytest.skip("corpus missing")
    return p


class TestArithmetic:
    def test_decode_bundled_arith(self, ref_tools, tmp_path):
        jp = "/root/reference/testimages/testimgari.jpg"
        ref = run_djpeg(jp, str(tmp_path / "a.ppm"))
        ours = decode(open(jp, "rb").read())
        np.testing.assert_array_equal(ours, ref)

    def test_encode_seq_byte_exact(self, ref_tools, tmp_path, testorig):
        golden = run_cjpeg(["-quality", "75", "-revert", "-baseline",
                            "-arithmetic"], corpus("testorig.ppm"),
                           str(tmp_path / "a.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, profile=Profile.FASTEST, progressive=False,
            arithmetic=True, force_baseline=True, optimize_coding=False,
            optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden

    def test_encode_progressive_byte_exact(self, ref_tools, tmp_path,
                                           testorig):
        golden = run_cjpeg(["-quality", "75", "-arithmetic", "-notrellis",
                            "-notrellis-dc", "-noovershoot", "-fastcrush"],
                           corpus("testorig.ppm"), str(tmp_path / "a.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, arithmetic=True, optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False))
        assert ours == golden


class TestLossless:
    @pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
    def test_roundtrip(self, testorig, pred):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        data = encode_lossless(testorig, predictor=pred)
        rec = decode(data)
        np.testing.assert_array_equal(rec, testorig)

    def test_djpeg_decodes_ours(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        data = encode_lossless(testorig, predictor=4)
        p = tmp_path / "ll.jpg"
        p.write_bytes(data)
        ref = run_djpeg(str(p), str(tmp_path / "ll.ppm"))
        np.testing.assert_array_equal(ref, testorig)

    def test_point_transform(self, testorig):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        data = encode_lossless(testorig, predictor=1, point_transform=2)
        rec = decode(data)
        assert np.abs(rec.astype(int) - testorig.astype(int)).max() <= 3

    @pytest.mark.parametrize("pred", [1, 4, 7])
    def test_byte_exact(self, ref_tools, tmp_path, testorig, pred):
        """Byte-identical to cjpeg -revert -lossless N -optimize (shared
        DC slot 0 per jpeg_set_colorspace, Adobe APP14 for RGB)."""
        from mozjpeg_tpu.codec.lossless import encode_lossless
        golden = run_cjpeg(["-revert", "-lossless", str(pred),
                            "-optimize"], corpus("testorig.ppm"),
                           str(tmp_path / "llb.jpg"))
        assert encode_lossless(testorig, predictor=pred) == golden

    @pytest.mark.parametrize("pred,rows", [(1, 4), (4, 4), (7, 16), (4, 1)])
    def test_restart_byte_exact(self, ref_tools, tmp_path, testorig,
                                pred, rows):
        """-lossless with -restart N (rows): byte-identical to cjpeg
        (jclhuff.c:333-337 marker emission, jclossls.c:73-77 predictor
        row counters)."""
        from mozjpeg_tpu.codec.lossless import encode_lossless
        golden = run_cjpeg(["-revert", "-lossless", str(pred), "-optimize",
                            "-restart", str(rows)],
                           corpus("testorig.ppm"),
                           str(tmp_path / "llr.jpg"))
        ours = encode_lossless(testorig, predictor=pred,
                               restart_in_rows=rows)
        assert ours == golden

    @pytest.mark.parametrize("rows", [2, 8])
    def test_restart_roundtrip_and_djpeg(self, ref_tools, tmp_path,
                                         testorig, rows):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        data = encode_lossless(testorig, predictor=5, restart_in_rows=rows)
        np.testing.assert_array_equal(decode(data), testorig)
        p = tmp_path / "llr2.jpg"
        p.write_bytes(data)
        ref = run_djpeg(str(p), str(tmp_path / "llr2.ppm"))
        np.testing.assert_array_equal(ref, testorig)

    def test_restart_decodes_cjpeg_stream(self, ref_tools, tmp_path,
                                          testorig):
        golden = run_cjpeg(["-revert", "-lossless", "2,1", "-optimize",
                            "-restart", "3"],
                           corpus("testorig.ppm"),
                           str(tmp_path / "llr3.jpg"))
        ours = decode(golden)
        ref = run_djpeg(str(tmp_path / "llr3.jpg"),
                        str(tmp_path / "llr3.ppm"))
        np.testing.assert_array_equal(ours, ref)


def _img12():
    rng = np.random.default_rng(7)
    h, w = 67, 101
    yy, xx = np.mgrid[0:h, 0:w]
    img = (np.stack([yy * 40 + xx * 13, xx * 31, (yy + xx) * 17], -1) % 4096)
    return (img * 0.7
            + rng.integers(0, 1200, (h, w, 3))).astype(np.uint16) % 4096


class TestPrecision12:
    """12-bit lossy: byte-exact vs cjpeg -precision 12 on every path the
    reference supports (it errors with trellis/optimize_scans at 12-bit)."""

    def _golden(self, ref_tools, tmp_path, args):
        src = tmp_path / "t12.ppm"
        ppm.write(str(src), _img12(), maxval=4095)
        out = tmp_path / "r12.jpg"
        subprocess.run([ref_tools["cjpeg"], "-precision", "12"] + args
                       + ["-outfile", str(out), str(src)], check=True)
        return out.read_bytes()

    def test_sequential_byte_exact(self, ref_tools, tmp_path):
        golden = self._golden(ref_tools, tmp_path,
                              ["-quality", "75", "-revert", "-baseline",
                               "-sample", "2x2"])
        ours = encode(_img12(), EncoderConfig(
            quality=75, precision=12, profile=Profile.FASTEST,
            progressive=False, force_baseline=True, subsampling=(2, 2),
            optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden

    def test_progressive_byte_exact(self, ref_tools, tmp_path):
        golden = self._golden(ref_tools, tmp_path,
                              ["-quality", "75", "-fastcrush", "-notrellis",
                               "-notrellis-dc", "-noovershoot"])
        ours = encode(_img12(), EncoderConfig(
            quality=75, precision=12, optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False))
        assert ours == golden

    def test_deringing_byte_exact(self, ref_tools, tmp_path):
        golden = self._golden(ref_tools, tmp_path,
                              ["-quality", "75", "-fastcrush", "-notrellis",
                               "-notrellis-dc"])
        ours = encode(_img12(), EncoderConfig(
            quality=75, precision=12, optimize_scans=False,
            trellis_quant=False))
        assert ours == golden

    def test_decode_bit_exact(self, ref_tools, tmp_path):
        data = self._golden(ref_tools, tmp_path,
                            ["-quality", "75", "-revert", "-baseline",
                             "-sample", "2x2"])
        p = tmp_path / "d12.jpg"
        p.write_bytes(data)
        ref = run_djpeg(str(p), str(tmp_path / "d12.ppm"))
        ours = decode(data)
        assert ours.dtype == np.uint16
        np.testing.assert_array_equal(ours, ref)

    def test_full_default_roundtrip(self, ref_tools, tmp_path):
        """Trellis + dering + optimize_scans at 12-bit: the reference
        cannot encode this (Bogus buffer control mode); ours can, and
        djpeg decodes it identically to our decoder."""
        img = _img12()
        data = encode(img, EncoderConfig(quality=75, precision=12))
        p = tmp_path / "f12.jpg"
        p.write_bytes(data)
        ref = run_djpeg(str(p), str(tmp_path / "f12.ppm"))
        np.testing.assert_array_equal(decode(data), ref)


def _cmyk_img():
    rng = np.random.default_rng(11)
    h, w = 59, 83
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                     ((yy + xx) * 4) % 256, (yy * 2) % 256], -1).astype(float)
    return np.clip(base * 0.8 + rng.integers(0, 90, (h, w, 4)),
                   0, 255).astype(np.uint8)


HARNESS = "/root/repo/.bench/colorspace_harness"
DEC_HARNESS = "/root/repo/.bench/decode_harness"


class TestColorspaces:
    """CMYK / YCCK / RGB: byte-exact vs the reference library API
    (cjpeg can't read CMYK input, so the oracle is a libjpeg harness)."""

    def _golden(self, cs, flags):
        if not os.path.exists(HARNESS):
            pytest.skip("colorspace harness not built")
        img = _cmyk_img()
        n = 3 if cs == "rgb" else 4
        p = subprocess.run([HARNESS, "83", "59", cs, "75"] + flags,
                           input=img[..., :n].tobytes(),
                           capture_output=True)
        assert p.returncode == 0, p.stderr
        return img[..., :n], p.stdout

    @pytest.mark.parametrize("cs", ["cmyk", "ycck"])
    def test_seq_byte_exact(self, cs):
        img, golden = self._golden(cs, ["baseline"])
        ours = encode(img, EncoderConfig(
            quality=75, colorspace=cs, profile=Profile.FASTEST,
            progressive=False, force_baseline=True, optimize_coding=False,
            optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden

    @pytest.mark.parametrize("cs,extra", [
        ("cmyk", []), ("ycck", []), ("rgb", ["reprogress"])])
    def test_full_trellis_byte_exact(self, cs, extra):
        img, golden = self._golden(cs, ["fastcrush"] + extra)
        ours = encode(img, EncoderConfig(
            quality=75, colorspace=cs, optimize_scans=False))
        assert ours == golden

    def test_rgb_progressive_byte_exact(self):
        img, golden = self._golden(
            "rgb", ["fastcrush", "notrellis", "notrellis-dc",
                    "noovershoot", "reprogress"])
        ours = encode(img, EncoderConfig(
            quality=75, colorspace="rgb", optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False))
        assert ours == golden

    @pytest.mark.parametrize("cs", ["cmyk", "ycck", "rgb"])
    def test_decode_bit_exact(self, cs):
        if not os.path.exists(DEC_HARNESS):
            pytest.skip("decode harness not built")
        img, data = self._golden(cs, ["fastcrush"]
                                 + (["reprogress"] if cs == "rgb" else []))
        p = subprocess.run([DEC_HARNESS], input=data, capture_output=True)
        w, h, c = map(int, p.stderr.split())
        ref = np.frombuffer(p.stdout, np.uint8).reshape(h, w, c)
        np.testing.assert_array_equal(decode(data), ref)


class TestSmoothing:
    """cjpeg -smooth N: fullsize + h2v2 smooth downsampling in context
    mode (input rows duplicated through the iMCU, jcprepct.c)."""

    @pytest.mark.parametrize("sm", [10, 100])
    def test_smooth_byte_exact(self, ref_tools, tmp_path, testorig, sm):
        golden = run_cjpeg(["-quality", "75", "-smooth", str(sm),
                            "-fastcrush", "-notrellis", "-notrellis-dc",
                            "-noovershoot"], corpus("testorig.ppm"),
                           str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, smoothing_factor=sm, optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False))
        assert ours == golden

    def test_smooth_full_default(self, ref_tools, tmp_path, testorig):
        golden = run_cjpeg(["-quality", "75", "-smooth", "30"],
                           corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(quality=75,
                                              smoothing_factor=30))
        assert ours == golden

    def test_smooth_422(self, ref_tools, tmp_path, testorig):
        golden = run_cjpeg(["-quality", "85", "-smooth", "40", "-sample",
                            "2x1", "-fastcrush", "-notrellis",
                            "-notrellis-dc", "-noovershoot"],
                           corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=85, smoothing_factor=40, subsampling=(2, 1),
            optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden


class TestRdswitch:
    """-quality lists, -qtables, -qslots, -scans (rdswitch.c)."""
    BASE = ["-fastcrush", "-notrellis", "-notrellis-dc", "-noovershoot"]
    QT = (" ".join(str(v) for v in range(16, 80)) + "\n"
          + " ".join(str((v % 50) + 17) for v in range(64)))

    def test_quality_list(self, ref_tools, tmp_path, testorig):
        golden = run_cjpeg(["-quality", "60,85"] + self.BASE,
                           corpus("testorig.ppm"), str(tmp_path / "q.jpg"))
        # cjpeg picks subsampling from the LAST rating (85 -> 2x1)
        ours = encode(testorig, EncoderConfig(
            quality=[60, 85], subsampling=(2, 1), optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False))
        assert ours == golden

    def test_qtables_file(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.cli import rdswitch
        p = tmp_path / "qt.txt"
        p.write_text(self.QT)
        golden = run_cjpeg(["-quality", "75", "-qtables", str(p)]
                           + self.BASE, corpus("testorig.ppm"),
                           str(tmp_path / "q.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False,
            base_quant_tables=rdswitch.read_quant_tables(self.QT)))
        assert ours == golden

    def test_qslots(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.cli import rdswitch
        p = tmp_path / "qt.txt"
        p.write_text(self.QT)
        golden = run_cjpeg(["-quality", "75", "-qtables", str(p),
                            "-qslots", "1,0,1"] + self.BASE,
                           corpus("testorig.ppm"), str(tmp_path / "q.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False, qslots=[1, 0, 1],
            base_quant_tables=rdswitch.read_quant_tables(self.QT)))
        assert ours == golden

    def test_scans_file_progressive(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.cli import rdswitch
        sc = ("0: 0 0 0 1;\n1 2: 0 0 0 1;\n0: 1 63 0 1;\n1: 1 63 0 1;\n"
              "2: 1 63 0 1;\n0 : 0 0 1 0;\n1 2: 0 0 1 0;\n0: 1 63 1 0;\n"
              "1: 1 63 1 0;\n2: 1 63 1 0;")
        p = tmp_path / "sc.txt"
        p.write_text(sc)
        golden = run_cjpeg(["-quality", "75", "-scans", str(p)] + self.BASE,
                           corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False,
            scan_script=rdswitch.read_scan_script(sc)))
        assert ours == golden

    def test_scans_file_sequential(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.cli import rdswitch
        sc = "0;\n1;\n2;"
        p = tmp_path / "sc.txt"
        p.write_text(sc)
        golden = run_cjpeg(["-quality", "75", "-scans", str(p)] + self.BASE,
                           corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=75, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False,
            scan_script=rdswitch.read_scan_script(sc)))
        assert ours == golden


class TestTrellisFlags:
    """trellis_eob_opt / trellis_q_opt / use_scans_in_trellis: API-only
    flags (no cjpeg switch), oracle is the reference-library harness."""

    def _golden(self, flags):
        if not os.path.exists(HARNESS):
            pytest.skip("colorspace harness not built")
        from mozjpeg_tpu.utils import ppm as _ppm
        img = _ppm.read(corpus("testorig.ppm"))
        h, w = img.shape[:2]
        p = subprocess.run([HARNESS, str(w), str(h), "ycbcr", "75",
                            "fastcrush"] + flags + ["reprogress"],
                           input=img.tobytes(), capture_output=True)
        assert p.returncode == 0, p.stderr
        return img, p.stdout

    def test_eob_opt(self, testorig):
        img, golden = self._golden(["eobopt"])
        ours = encode(img, EncoderConfig(quality=75, optimize_scans=False,
                                         trellis_eob_opt=True))
        assert ours == golden

    def test_q_opt(self, testorig):
        img, golden = self._golden(["qopt"])
        ours = encode(img, EncoderConfig(quality=75, optimize_scans=False,
                                         trellis_q_opt=True))
        assert ours == golden

    def test_scans_in_trellis(self, testorig):
        img, golden = self._golden(["bands"])
        ours = encode(img, EncoderConfig(quality=75, optimize_scans=False,
                                         use_scans_in_trellis=True))
        assert ours == golden

    def test_eob_opt_with_bands(self, testorig):
        img, golden = self._golden(["eobopt", "bands"])
        ours = encode(img, EncoderConfig(quality=75, optimize_scans=False,
                                         trellis_eob_opt=True,
                                         use_scans_in_trellis=True))
        assert ours == golden

    def test_arith_scan_search(self, ref_tools, tmp_path, testorig):
        """Full-default arithmetic: the optimize_scans search runs with the
        arithmetic coder (jcparam.c:739-742), selecting the same script."""
        golden = run_cjpeg(["-quality", "75", "-arithmetic"],
                           corpus("testorig.ppm"), str(tmp_path / "a.jpg"))
        ours = encode(testorig, EncoderConfig(quality=75, arithmetic=True))
        assert ours == golden

    @pytest.mark.parametrize("w,q", [(0.5, 75), (0.8, 50)])
    def test_delta_dc_weight(self, ref_tools, tmp_path, testorig, w, q):
        """-trellis-dc-ver-weight: vertical DC gradient distortion term
        (jcdctmgr.c:1069-1084); applies only within iMCU rows (2x2 luma)."""
        golden = run_cjpeg(["-quality", str(q), "-trellis-dc-ver-weight",
                            str(w), "-fastcrush"],
                           corpus("testorig.ppm"), str(tmp_path / "d.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=q, trellis_delta_dc_weight=w, optimize_scans=False))
        assert ours == golden
        # and the term must actually change the output
        base = encode(testorig, EncoderConfig(quality=q,
                                              optimize_scans=False))
        assert base != ours


class TestColorQuantization:
    """djpeg -colors N: two-pass median-cut (jquant2) and one-pass fixed
    palette (jquant1), all dither modes pixel-exact vs djpeg."""

    def _src(self, ref_tools, tmp_path):
        run_cjpeg(["-quality", "85", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "q.jpg"))
        return str(tmp_path / "q.jpg")

    @pytest.mark.parametrize("dither,args", [
        ("fs", []), ("none", ["-dither", "none"])])
    def test_two_pass(self, ref_tools, tmp_path, dither, args):
        from mozjpeg_tpu.codec.decoder import decode, quantize_colors
        jp = self._src(ref_tools, tmp_path)
        ref = run_djpeg(jp, str(tmp_path / "q.ppm"), ["-colors", "64"] + args)
        rgb = decode(open(jp, "rb").read())
        idx, cmap = quantize_colors(rgb, 64, dither)
        np.testing.assert_array_equal(cmap[idx], ref)

    @pytest.mark.parametrize("dither,args", [
        ("fs", []), ("ordered", ["-dither", "ordered"]),
        ("none", ["-dither", "none"])])
    def test_one_pass(self, ref_tools, tmp_path, dither, args):
        from mozjpeg_tpu.codec.decoder import decode, quantize_colors
        jp = self._src(ref_tools, tmp_path)
        ref = run_djpeg(jp, str(tmp_path / "q.ppm"),
                        ["-colors", "100", "-onepass"] + args)
        rgb = decode(open(jp, "rb").read())
        idx, cmap = quantize_colors(rgb, 100, dither, two_pass=False)
        np.testing.assert_array_equal(cmap[idx], ref)

    def test_cli(self, ref_tools, tmp_path):
        from mozjpeg_tpu.cli import djpeg as cli
        jp = self._src(ref_tools, tmp_path)
        ref = run_djpeg(jp, str(tmp_path / "r.ppm"), ["-colors", "32"])
        out = str(tmp_path / "o.ppm")
        cli.main(["-colors", "32", "-outfile", out, jp])
        np.testing.assert_array_equal(ppm.read(out), ref)


class TestNosmooth:
    @pytest.mark.parametrize("samp", ["2x2", "2x1"])
    def test_bit_exact(self, ref_tools, tmp_path, samp):
        run_cjpeg(["-quality", "85", "-sample", samp, "-revert",
                   "-baseline"], corpus("testorig.ppm"),
                  str(tmp_path / "n.jpg"))
        ref = run_djpeg(str(tmp_path / "n.jpg"), str(tmp_path / "n.ppm"),
                        ["-nosmooth"])
        ours = decode((tmp_path / "n.jpg").read_bytes(),
                      fancy_upsample=False)
        np.testing.assert_array_equal(ours, ref)


class TestArithmeticTrellis:
    """Arithmetic-coding trellis (quantize_trellis_arith): adaptive
    per-iMCU-row rate snapshots; the reference only ever quantizes
    component 0 (oracle: reference-library harness)."""

    def _golden(self, flags):
        if not os.path.exists(HARNESS):
            pytest.skip("colorspace harness not built")
        from mozjpeg_tpu.utils import ppm as _ppm
        img = _ppm.read(corpus("testorig.ppm"))
        h, w = img.shape[:2]
        p = subprocess.run([HARNESS, str(w), str(h), "ycbcr", "75",
                            "fastcrush", "arith"] + flags + ["reprogress"],
                           input=img.tobytes(), capture_output=True)
        assert p.returncode == 0, p.stderr
        return img, p.stdout

    def test_default(self, testorig):
        img, golden = self._golden([])
        ours = encode(img, EncoderConfig(quality=75, arithmetic=True,
                                         optimize_scans=False))
        assert ours == golden

    def test_bands(self, testorig):
        img, golden = self._golden(["bands"])
        ours = encode(img, EncoderConfig(quality=75, arithmetic=True,
                                         optimize_scans=False,
                                         use_scans_in_trellis=True))
        assert ours == golden


class TestDCTMethods:
    """-dct fast (AAN integer) and -dct float (AAN single-precision):
    byte-exact encode on every path combination, bit-exact decode."""

    def _golden(self, ref_tools, tmp_path, args):
        return run_cjpeg(args, corpus("testorig.ppm"),
                         str(tmp_path / "d.jpg"))

    @pytest.mark.parametrize("meth,flag", [("IFAST", "fast"),
                                           ("FLOAT", "float")])
    def test_sequential(self, ref_tools, tmp_path, testorig, meth, flag):
        from mozjpeg_tpu.codec.config import DCTMethod
        golden = self._golden(ref_tools, tmp_path,
                              ["-quality", "75", "-revert", "-baseline",
                               "-dct", flag])
        ours = encode(testorig, EncoderConfig(
            quality=75, dct_method=getattr(DCTMethod, meth),
            profile=Profile.FASTEST, progressive=False, force_baseline=True,
            optimize_coding=False, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden

    @pytest.mark.parametrize("meth,flag", [("IFAST", "fast"),
                                           ("FLOAT", "float")])
    def test_full_default(self, ref_tools, tmp_path, testorig, meth, flag):
        from mozjpeg_tpu.codec.config import DCTMethod
        golden = self._golden(ref_tools, tmp_path,
                              ["-quality", "75", "-dct", flag])
        ours = encode(testorig, EncoderConfig(
            quality=75, dct_method=getattr(DCTMethod, meth)))
        assert ours == golden

    @pytest.mark.parametrize("meth", ["ifast", "float"])
    def test_decode(self, ref_tools, tmp_path, testorig, meth):
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "d.jpg"))
        ref = run_djpeg(str(tmp_path / "d.jpg"), str(tmp_path / "d.ppm"),
                        ["-dct", "fast" if meth == "ifast" else "float"])
        ours = decode((tmp_path / "d.jpg").read_bytes(), dct_method=meth)
        np.testing.assert_array_equal(ours, ref)


class TestSamplingRatios:
    """Non-2x sampling (4:4:0, 4:1:1, 4:4:1, 4x2): generic int
    downsample on encode, fancy-h1v2/int upsample on decode."""

    @pytest.mark.parametrize("samp,name", [
        ((1, 2), "1x2"), ((4, 1), "4x1"), ((1, 4), "1x4"),
        ((4, 2), "4x2")])
    def test_roundtrip(self, ref_tools, tmp_path, testorig, samp, name):
        golden = run_cjpeg(["-quality", "85", "-sample", name, "-revert",
                            "-baseline"], corpus("testorig.ppm"),
                           str(tmp_path / "s.jpg"))
        ours = encode(testorig, EncoderConfig(
            quality=85, subsampling=samp, profile=Profile.FASTEST,
            progressive=False, force_baseline=True, optimize_coding=False,
            optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        assert ours == golden
        ref = run_djpeg(str(tmp_path / "s.jpg"), str(tmp_path / "s.ppm"))
        np.testing.assert_array_equal(decode(golden), ref)


class TestJpegtranMarkers:
    def _spliced(self, ref_tools, tmp_path):
        run_cjpeg(["-quality", "85", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "m.jpg"))
        d = (tmp_path / "m.jpg").read_bytes()
        com = b"\xff\xfe" + (13).to_bytes(2, "big") + b"hello world"
        app1 = b"\xff\xe1" + (10).to_bytes(2, "big") + b"Exif\x00\x00AB"
        p = tmp_path / "m2.jpg"
        p.write_bytes(d[:20] + com + app1 + d[20:])
        return p

    @pytest.mark.parametrize("copy", ["all", "none", "comments"])
    def test_copy_modes(self, ref_tools, tmp_path, copy):
        from mozjpeg_tpu.codec import transcode
        src = self._spliced(ref_tools, tmp_path)
        subprocess.run([ref_tools["jpegtran"], "-rotate", "180", "-trim",
                        "-copy", copy, "-revert", "-optimize", "-outfile",
                        str(tmp_path / "r.jpg"), str(src)], check=True)
        ours = transcode.transform(
            src.read_bytes(), "rot180",
            EncoderConfig(profile=Profile.FASTEST, progressive=False,
                          optimize_coding=True, optimize_scans=False,
                          trellis_quant=False, overshoot_deringing=False),
            copy_markers=copy)
        assert ours == (tmp_path / "r.jpg").read_bytes()

    def test_perfect_rejected(self, ref_tools, tmp_path):
        from mozjpeg_tpu.codec import transcode
        src = self._spliced(ref_tools, tmp_path)
        with pytest.raises(ValueError):
            transcode.transform(src.read_bytes(), "rot180", perfect=True)


class TestLossless16:
    def test_roundtrip_16(self):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        rng = np.random.default_rng(3)
        img = rng.integers(0, 65536, (45, 61, 3)).astype(np.uint16)
        data = encode_lossless(img, predictor=4, precision=16)
        np.testing.assert_array_equal(decode(data), img)

    def test_roundtrip_12(self):
        from mozjpeg_tpu.codec.lossless import encode_lossless
        rng = np.random.default_rng(4)
        img = rng.integers(0, 4096, (33, 47)).astype(np.uint16)
        data = encode_lossless(img, predictor=2, precision=12)
        np.testing.assert_array_equal(decode(data), img)


class TestTransforms:
    def _roundtrip(self, testorig, op, ref_args, tmp_path, ref_tools):
        from mozjpeg_tpu.codec import transcode
        src = run_cjpeg(["-quality", "85", "-revert", "-baseline"],
                        corpus("testorig.ppm"), str(tmp_path / "t.jpg"))
        ours = transcode.transform(
            src, op, EncoderConfig(profile=Profile.FASTEST,
                                   progressive=False, optimize_coding=True,
                                   trellis_quant=False,
                                   overshoot_deringing=False,
                                   optimize_scans=False))
        # reference jpegtran on the same input
        subprocess.run([ref_tools["jpegtran"]] + ref_args
                       + ["-trim", "-outfile", str(tmp_path / "r.jpg"),
                          str(tmp_path / "t.jpg")], check=True)
        ref_pix = run_djpeg(str(tmp_path / "r.jpg"),
                            str(tmp_path / "r.ppm"))
        p = tmp_path / "o.jpg"
        p.write_bytes(ours)
        our_pix = run_djpeg(str(p), str(tmp_path / "o.ppm"))
        np.testing.assert_array_equal(our_pix, ref_pix)

    def test_rot180(self, ref_tools, tmp_path, testorig):
        self._roundtrip(testorig, "rot180", ["-rotate", "180"],
                        tmp_path, ref_tools)

    def test_flip_h(self, ref_tools, tmp_path, testorig):
        self._roundtrip(testorig, "flip_h", ["-flip", "horizontal"],
                        tmp_path, ref_tools)

    def test_transpose(self, ref_tools, tmp_path, testorig):
        self._roundtrip(testorig, "transpose", ["-transpose"],
                        tmp_path, ref_tools)

    def test_rot90(self, ref_tools, tmp_path, testorig):
        self._roundtrip(testorig, "rot90", ["-rotate", "90"],
                        tmp_path, ref_tools)


class TestScaledDecode:
    @pytest.mark.parametrize("num,den", [(1, 2), (1, 4), (1, 8)])
    def test_bit_exact(self, ref_tools, tmp_path, num, den):
        from mozjpeg_tpu.codec.decoder import decode_scaled
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ref = run_djpeg(str(tmp_path / "s.jpg"), str(tmp_path / "s.ppm"),
                        ["-scale", "%d/%d" % (num, den)])
        ours = decode_scaled((tmp_path / "s.jpg").read_bytes(), num, den)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("m", [3, 5, 6, 7, 9, 10, 11, 12, 13, 14,
                                   15, 16])
    def test_all_factors(self, ref_tools, tmp_path, m):
        """Every jidctint.c scaled kernel (3x3..16x16), 4:2:0 input."""
        from mozjpeg_tpu.codec.decoder import decode_scaled
        run_cjpeg(["-quality", "85", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "s.jpg"))
        ref = run_djpeg(str(tmp_path / "s.jpg"), str(tmp_path / "s.ppm"),
                        ["-scale", "%d/8" % m])
        ours = decode_scaled((tmp_path / "s.jpg").read_bytes(), m, 8)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("samp,m", [("2x1", 1), ("2x1", 4),
                                        ("1x2", 2), ("1x2", 12)])
    def test_nonsquare_sampling(self, ref_tools, tmp_path, samp, m):
        """Per-component scaled sizes + h1v2/int upsampler selection."""
        from mozjpeg_tpu.codec.decoder import decode_scaled
        run_cjpeg(["-quality", "85", "-sample", samp, "-revert",
                   "-baseline"], corpus("testorig.ppm"),
                  str(tmp_path / "s.jpg"))
        ref = run_djpeg(str(tmp_path / "s.jpg"), str(tmp_path / "s.ppm"),
                        ["-scale", "%d/8" % m])
        ours = decode_scaled((tmp_path / "s.jpg").read_bytes(), m, 8)
        np.testing.assert_array_equal(ours, ref)


class TestCLI:
    def test_cjpeg_cli(self, ref_tools, tmp_path, testorig):
        from mozjpeg_tpu.cli import cjpeg as cli
        out = str(tmp_path / "c.jpg")
        cli.main(["-quality", "75", "-fastcrush", "-noovershoot",
                  "-notrellis", "-notrellis-dc",
                  "-outfile", out, corpus("testorig.ppm")])
        golden = run_cjpeg(["-quality", "75", "-fastcrush", "-noovershoot",
                            "-notrellis", "-notrellis-dc"],
                           corpus("testorig.ppm"), str(tmp_path / "g.jpg"))
        assert open(out, "rb").read() == golden

    def test_djpeg_cli(self, ref_tools, tmp_path):
        from mozjpeg_tpu.cli import djpeg as cli
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "d.jpg"))
        out = str(tmp_path / "d.ppm")
        cli.main(["-outfile", out, str(tmp_path / "d.jpg")])
        ref = run_djpeg(str(tmp_path / "d.jpg"), str(tmp_path / "r.ppm"))
        np.testing.assert_array_equal(ppm.read(out), ref)

    def test_jpegtran_cli(self, ref_tools, tmp_path):
        from mozjpeg_tpu.cli import jpegtran as cli
        run_cjpeg(["-quality", "85", "-revert", "-baseline"],
                  corpus("testorig.ppm"), str(tmp_path / "t.jpg"))
        out = str(tmp_path / "t180.jpg")
        cli.main(["-rotate", "180", "-revert", "-optimize",
                  "-outfile", out, str(tmp_path / "t.jpg")])
        subprocess.run([ref_tools["jpegtran"], "-rotate", "180",
                        "-revert", "-optimize",
                        "-outfile", str(tmp_path / "ref180.jpg"),
                        str(tmp_path / "t.jpg")], check=True)
        assert open(out, "rb").read() == \
            open(str(tmp_path / "ref180.jpg"), "rb").read()

    def test_cjpeg_nojfif_quant_baseline(self, ref_tools, tmp_path):
        """cjpeg -nojfif and -quant-baseline (cjpeg.c:589-591,709-710)."""
        from mozjpeg_tpu.cli import cjpeg as cli
        for flags in (["-nojfif"], ["-quant-baseline", "-quality", "25"]):
            out = str(tmp_path / "n.jpg")
            cli.main(["-revert", "-baseline", *flags,
                      "-outfile", out, corpus("testorig.ppm")])
            golden = run_cjpeg(["-revert", "-baseline", *flags],
                               corpus("testorig.ppm"), str(tmp_path / "g.jpg"))
            assert open(out, "rb").read() == golden

    def test_progress_and_scan_trace(self, ref_tools, tmp_path, testorig):
        """encode(progress=, trace=): the jpeg_progress_mgr / trace_level
        analog; SCAN lines must match the reference's -verbose output
        (jcmaster.c:747-754)."""
        from mozjpeg_tpu.codec.encoder import encode
        from mozjpeg_tpu.codec.config import EncoderConfig
        events, lines = [], []
        out = encode(testorig, EncoderConfig(quality=75),
                     progress=lambda c, t, d: events.append((c, t, d)),
                     trace=lines.append)
        golden = run_cjpeg(["-quality", "75"], corpus("testorig.ppm"),
                           str(tmp_path / "g.jpg"))
        assert out == golden          # hooks must not change the bytes
        assert events and events[0][2] == "main"
        assert all(c <= t for c, t, _ in events)
        ref = subprocess.run(
            [ref_tools["cjpeg"], "-verbose", "-verbose", "-quality", "75",
             "-outfile", str(tmp_path / "v.jpg"), corpus("testorig.ppm")],
            capture_output=True, text=True)
        ref_scans = [ln for ln in ref.stderr.splitlines()
                     if ln.startswith("SCAN")]
        assert [ln for ln in lines if ln.startswith("SCAN")] == ref_scans

    def test_jpegtran_grayscale_restart_scans(self, ref_tools, tmp_path):
        """jpegtran -grayscale, -restart N/Nb, -scans (jpegtran.c:187-400)."""
        from mozjpeg_tpu.cli import jpegtran as cli
        src = str(tmp_path / "t.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), src)
        cases = [["-grayscale"], ["-restart", "2"], ["-restart", "3b"],
                 ["-rotate", "90", "-grayscale"],
                 ["-scans", "/root/reference/testimages/test.scan"]]
        for extra in cases:
            out = str(tmp_path / "o.jpg")
            cli.main(["-revert", *extra, "-outfile", out, src])
            subprocess.run([ref_tools["jpegtran"], "-revert", *extra,
                            "-outfile", str(tmp_path / "r.jpg"), src],
                           check=True)
            assert open(out, "rb").read() == \
                open(str(tmp_path / "r.jpg"), "rb").read(), extra


class TestICC:
    def test_icc_roundtrip(self, testorig):
        from mozjpeg_tpu.codec import marker as mk
        from mozjpeg_tpu.codec.encoder import (_resolve, _phase_p1,
                                               _phase_pack, _split_flat,
                                               _phase_entropy)
        profile = open("/root/reference/testimages/test1.icc", "rb").read()
        # encode with ICC via assemble path
        data = encode(testorig, EncoderConfig(
            quality=75, profile=Profile.FASTEST, progressive=False,
            optimize_coding=False, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False))
        # splice ICC markers after APP0 using the writer helpers
        w = mk.MarkerWriter()
        mk.write_icc(w, profile)
        icc_bytes = w.bytes()
        spliced = data[:20] + icc_bytes + data[20:]
        jp = mk.parse(spliced)
        assert jp.icc_profile == profile


class TestRestart:
    """Restart intervals (-restart N rows / Nb MCUs) across entropy paths.

    Per-scan conversion of rows to MCUs follows per_scan_setup
    (jcmaster.c:595-600): non-interleaved scans use the component's
    width_in_blocks as MCUs_per_row (jcmaster.c:533)."""

    def _cli(self, tmp_path, args):
        from mozjpeg_tpu.cli import cjpeg as cli
        out = str(tmp_path / "our.jpg")
        cli.main(args + ["-outfile", out, corpus("testorig.ppm")])
        return open(out, "rb").read()

    @pytest.mark.parametrize("flags", [
        ["-quality", "75", "-revert", "-baseline", "-restart", "2"],
        ["-quality", "75", "-revert", "-baseline", "-restart", "7b"],
        ["-quality", "75", "-revert", "-progressive", "-restart", "2"],
        ["-quality", "75", "-revert", "-baseline", "-arithmetic",
         "-restart", "2"],
    ], ids=["baseline-rows", "baseline-mcus", "prog-rows", "arith-rows"])
    def test_revert_paths(self, ref_tools, tmp_path, flags):
        golden = run_cjpeg(flags, corpus("testorig.ppm"),
                           str(tmp_path / "ref.jpg"))
        assert self._cli(tmp_path, list(flags)) == golden

    @pytest.mark.parametrize("flags", [
        ["-quality", "75", "-restart", "2"],
        ["-quality", "75", "-restart", "4b"],
        ["-quality", "75", "-arithmetic", "-restart", "2"],
        ["-quality", "75", "-grayscale", "-restart", "3"],
    ], ids=["default-rows", "default-mcus", "arith-trellis", "gray"])
    def test_full_default_paths(self, ref_tools, tmp_path, flags):
        golden = run_cjpeg(flags, corpus("testorig.ppm"),
                           str(tmp_path / "ref.jpg"))
        assert self._cli(tmp_path, list(flags)) == golden


class TestNoQualityQuirk:
    """cjpeg without -quality keeps jpeg_set_defaults' Annex K tables
    (quant_tbl_master_idx is still 0 inside set_defaults, jcparam.c:411);
    the mozjpeg index-3 tables require set_quality_ratings (cjpeg.c:721)."""

    def test_no_quality_default(self, ref_tools, tmp_path):
        golden = run_cjpeg([], corpus("testorig.ppm"),
                           str(tmp_path / "ref.jpg"))
        from mozjpeg_tpu.cli import cjpeg as cli
        out = str(tmp_path / "our.jpg")
        cli.main(["-outfile", out, corpus("testorig.ppm")])
        assert open(out, "rb").read() == golden

    def test_quality_explicit_differs(self, ref_tools, tmp_path):
        a = run_cjpeg([], corpus("testorig.ppm"), str(tmp_path / "a.jpg"))
        b = run_cjpeg(["-quality", "75"], corpus("testorig.ppm"),
                      str(tmp_path / "b.jpg"))
        assert a != b  # Annex K vs ImageMagick tables


class TestTruncatedStreams:
    """Partial/corrupt streams decode pixel-exactly like djpeg: missing
    data leaves coefficients at their last decoded state
    (insufficient_data, jdhuff.c:362-374) and progressive previews are
    block-smoothed (decompress_smooth_data, jdcoefct.c:429-760)."""

    def _sweep(self, tmp_path, cjpeg_flags, djpeg_args=None, decode_kw=None,
               step=401):
        src = corpus("testorig.ppm")
        full = run_cjpeg(cjpeg_flags, src, str(tmp_path / "f.jpg"))
        trunc = str(tmp_path / "t.jpg")
        checked = 0
        for cut in range(400, len(full), step):
            with open(trunc, "wb") as f:
                f.write(full[:cut])
            r = subprocess.run([DJPEG, *(djpeg_args or []), "-outfile",
                                str(tmp_path / "r.ppm"), trunc],
                               capture_output=True)
            try:
                ref = ppm.read(str(tmp_path / "r.ppm"))
            except Exception:
                continue
            ours = decode(full[:cut], **(decode_kw or {}))
            np.testing.assert_array_equal(ours, ref,
                                          err_msg=f"cut={cut}")
            checked += 1
        assert checked > 0

    def test_progressive_smoothed(self, ref_tools, tmp_path):
        self._sweep(tmp_path, ["-quality", "75", "-revert", "-progressive"])

    def test_full_default(self, ref_tools, tmp_path):
        self._sweep(tmp_path, ["-quality", "75"])

    def test_baseline_gray_fill(self, ref_tools, tmp_path):
        self._sweep(tmp_path, ["-quality", "75", "-revert", "-baseline"])

    def test_progressive_restart(self, ref_tools, tmp_path):
        self._sweep(tmp_path, ["-quality", "75", "-revert", "-progressive",
                               "-restart", "2"])

    def test_arithmetic(self, ref_tools, tmp_path):
        self._sweep(tmp_path, ["-quality", "75", "-arithmetic"])

    def test_nosmooth_keeps_block_smoothing(self, ref_tools, tmp_path):
        # djpeg -nosmooth only disables fancy upsampling (djpeg.c:366);
        # block smoothing stays on (jdapimin.c:221)
        self._sweep(tmp_path, ["-quality", "75", "-revert", "-progressive"],
                    djpeg_args=["-nosmooth"],
                    decode_kw={"fancy_upsample": False})

    def test_corrupt_byte_restart_resync(self, ref_tools, tmp_path):
        src = corpus("testorig.ppm")
        full = bytearray(run_cjpeg(
            ["-quality", "75", "-revert", "-baseline", "-restart", "2"],
            src, str(tmp_path / "f.jpg")))
        trunc = str(tmp_path / "t.jpg")
        for pos in range(700, len(full) - 100, 531):
            bad = bytes(full[:pos]) + bytes([full[pos] ^ 0x55]) \
                + bytes(full[pos + 1:])
            with open(trunc, "wb") as f:
                f.write(bad)
            r = subprocess.run([DJPEG, "-outfile",
                                str(tmp_path / "r.ppm"), trunc],
                               capture_output=True)
            if r.returncode not in (0, 2):
                continue
            try:
                ref = ppm.read(str(tmp_path / "r.ppm"))
            except Exception:
                continue
            ours = decode(bad)
            np.testing.assert_array_equal(ours, ref, err_msg=f"pos={pos}")


class TestComCLIs:
    """rdjpgcom / wrjpgcom equivalents (byte-exact insertion, identical
    text output vs the reference utilities)."""

    def test_wrjpgcom_insert_and_replace(self, ref_tools, tmp_path):
        from mozjpeg_tpu.cli.wrjpgcom import insert_comment
        base = run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                         corpus("testorig.ppm"), str(tmp_path / "c.jpg"))
        wr = os.path.join(os.path.dirname(ref_tools["cjpeg"]), "wrjpgcom")
        ref1 = subprocess.run([wr, "-comment", "hello"],
                              input=base, capture_output=True).stdout
        assert insert_comment(base, b"hello", False) == ref1
        ref2 = subprocess.run([wr, "-replace", "-comment", "bye"],
                              input=ref1, capture_output=True).stdout
        assert insert_comment(ref1, b"bye", True) == ref2

    def test_rdjpgcom_output(self, ref_tools, tmp_path):
        import io
        from mozjpeg_tpu.cli import rdjpgcom
        from mozjpeg_tpu.cli.wrjpgcom import insert_comment
        base = run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                         corpus("testorig.ppm"), str(tmp_path / "c.jpg"))
        data = insert_comment(base, b"line1\r\nline2\\ \x01\x7f", False)
        p = str(tmp_path / "c2.jpg")
        open(p, "wb").write(data)
        rd = os.path.join(os.path.dirname(ref_tools["cjpeg"]), "rdjpgcom")
        ref = subprocess.run([rd, "-verbose", p],
                             capture_output=True).stdout.decode()
        buf = io.StringIO()
        rdjpgcom.scan(data, verbose=True, raw=False, out=buf)
        assert buf.getvalue() == ref


class TestImageIO:
    """BMP/GIF/Targa readers and writers, byte-exact vs the reference
    cjpeg input sniffing (cjpeg.c:86-126) and djpeg -bmp/-os2/-gif/-gif0/
    -targa writers."""

    @pytest.fixture(scope="class")
    def basejpg(self, ref_tools, tmp_path_factory):
        d = tmp_path_factory.mktemp("io")
        color = run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                          corpus("testorig.ppm"), str(d / "c.jpg"))
        gray = run_cjpeg(["-quality", "75", "-revert", "-baseline",
                          "-grayscale"], corpus("testorig.ppm"),
                         str(d / "g.jpg"))
        return d, str(d / "c.jpg"), str(d / "g.jpg")

    @pytest.mark.parametrize("fmt", ["bmp", "os2", "targa", "gif", "gif0"])
    def test_djpeg_writers(self, basejpg, fmt, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        d, cjpg, gjpg = basejpg
        for src in (cjpg, gjpg):
            ref = str(tmp_path / "ref.out")
            our = str(tmp_path / "our.out")
            subprocess.run([DJPEG, "-" + fmt, "-outfile", ref, src],
                           check=True)
            dj.main(["-" + fmt, "-outfile", our, src])
            assert open(our, "rb").read() == open(ref, "rb").read(), \
                (fmt, src)

    @pytest.mark.parametrize("fmt", ["bmp", "targa", "gif"])
    def test_djpeg_writers_quantized(self, basejpg, fmt, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        d, cjpg, _ = basejpg
        ref = str(tmp_path / "ref.out")
        our = str(tmp_path / "our.out")
        subprocess.run([DJPEG, "-" + fmt, "-colors", "100",
                        "-outfile", ref, cjpg], check=True)
        dj.main(["-" + fmt, "-colors", "100", "-outfile", our, cjpg])
        assert open(our, "rb").read() == open(ref, "rb").read()

    @pytest.mark.parametrize("fmt,extra", [
        ("bmp", []), ("os2", []), ("targa", ["-targa"]), ("gif", []),
    ])
    def test_cjpeg_readers(self, basejpg, fmt, extra, tmp_path):
        from mozjpeg_tpu.cli import cjpeg as cj
        d, cjpg, _ = basejpg
        src = str(tmp_path / ("in." + fmt))
        subprocess.run([DJPEG, "-" + fmt, "-outfile", src, cjpg],
                       check=True)
        ref = str(tmp_path / "ref.jpg")
        our = str(tmp_path / "our.jpg")
        subprocess.run([CJPEG, "-quality", "75", *extra, "-outfile", ref,
                        src], check=True)
        cj.main(["-quality", "75", *extra, "-outfile", our, src])
        assert open(our, "rb").read() == open(ref, "rb").read()

    def test_cjpeg_gray_gif_makes_gray_jpeg(self, basejpg, tmp_path):
        from mozjpeg_tpu.cli import cjpeg as cj
        from mozjpeg_tpu.codec import marker
        d, _, gjpg = basejpg
        src = str(tmp_path / "g.gif")
        subprocess.run([DJPEG, "-gif", "-outfile", src, gjpg], check=True)
        our = str(tmp_path / "our.jpg")
        cj.main(["-quality", "75", "-outfile", our, src])
        jp = marker.parse(open(our, "rb").read())
        assert len(jp.components) == 1
        ref = str(tmp_path / "ref.jpg")
        subprocess.run([CJPEG, "-quality", "75", "-outfile", ref, src],
                       check=True)
        assert open(our, "rb").read() == open(ref, "rb").read()


class TestJpegtranFull:
    """No-trim edge-block semantics, crop extension fills, wipe modes,
    and -drop, all byte-exact vs the reference jpegtran."""

    @pytest.fixture(scope="class")
    def basejpg(self, ref_tools, tmp_path_factory):
        d = tmp_path_factory.mktemp("tran")
        p = str(d / "c.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), p)
        return p

    def _both(self, src, args, tmp_path):
        from mozjpeg_tpu.cli import jpegtran as jt
        ref = str(tmp_path / "r.jpg")
        our = str(tmp_path / "o.jpg")
        subprocess.run([JPEGTRAN, "-revert", "-optimize", *args,
                        "-outfile", ref, src], check=True)
        jt.main(["-revert", "-optimize", *args, "-outfile", our, src])
        assert open(our, "rb").read() == open(ref, "rb").read(), args

    @pytest.mark.parametrize("args", [
        ["-flip", "horizontal"], ["-flip", "vertical"],
        ["-rotate", "90"], ["-rotate", "180"], ["-rotate", "270"],
        ["-transverse"],
        ["-flip", "horizontal", "-trim"], ["-rotate", "180", "-trim"],
    ], ids=["fliph", "flipv", "rot90", "rot180", "rot270", "transverse",
            "fliph-trim", "rot180-trim"])
    def test_transforms(self, basejpg, args, tmp_path):
        self._both(basejpg, args, tmp_path)

    @pytest.mark.parametrize("spec", [
        "100x80+30+20", "300x200+10+10", "300fx200+10+10",
        "300rx200+10+10", "100x80-20-10", "100fx80f+35+21",
    ], ids=["plain", "ext-zero", "ext-flat", "ext-reflect", "neg",
            "force"])
    def test_crop(self, basejpg, spec, tmp_path):
        self._both(basejpg, ["-crop", spec], tmp_path)

    @pytest.mark.parametrize("spec", [
        "64x48+32+32", "64fx48+32+32", "64rx149+0+0", "64rx149+163+0",
    ], ids=["zero", "flatten", "reflect-left", "reflect-right"])
    def test_wipe(self, basejpg, spec, tmp_path):
        self._both(basejpg, ["-wipe", spec], tmp_path)

    @pytest.mark.parametrize("dq,trim", [(75, False), (60, False),
                                         (60, True)],
                             ids=["same-q", "gcd", "requant"])
    def test_drop(self, basejpg, dq, trim, tmp_path, ref_tools):
        from mozjpeg_tpu.utils import ppm as _ppm
        sub = str(tmp_path / "sub.ppm")
        full = run_djpeg(basejpg, str(tmp_path / "full.ppm"))
        _ppm.write(sub, full[8:72, 16:112])
        dj = str(tmp_path / "d.jpg")
        run_cjpeg(["-quality", str(dq), "-revert", "-baseline"], sub, dj)
        args = ["-drop", "+40+24", dj] + (["-trim"] if trim else [])
        self._both(basejpg, args, tmp_path)


class TestDecodeOutputModes:
    """djpeg -grayscale / -map / -rgb565, byte-exact vs the reference."""

    @pytest.fixture(scope="class")
    def jpgs(self, ref_tools, tmp_path_factory):
        d = tmp_path_factory.mktemp("dom")
        c = str(d / "c.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), c)
        g = str(d / "g.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline",
                   "-grayscale"], corpus("testorig.ppm"), g)
        r = str(d / "r.jpg")
        run_cjpeg(["-quality", "75", "-rgb", "-revert", "-baseline"],
                  corpus("testorig.ppm"), r)
        return c, g, r

    def _both(self, src, args, tmp_path, ext="ppm"):
        from mozjpeg_tpu.cli import djpeg as dj
        ref = str(tmp_path / ("r." + ext))
        our = str(tmp_path / ("o." + ext))
        subprocess.run([DJPEG, *args, "-outfile", ref, src], check=True)
        dj.main([*args, "-outfile", our, src])
        assert open(our, "rb").read() == open(ref, "rb").read(), args

    def test_grayscale_of_color(self, jpgs, tmp_path):
        self._both(jpgs[0], ["-grayscale"], tmp_path)

    def test_grayscale_of_rgb(self, jpgs, tmp_path):
        self._both(jpgs[2], ["-grayscale"], tmp_path)

    def test_map_gif(self, jpgs, tmp_path):
        mp = str(tmp_path / "map.gif")
        subprocess.run([DJPEG, "-gif", "-colors", "216", "-outfile", mp,
                        jpgs[0]], check=True)
        self._both(jpgs[0], ["-map", mp], tmp_path)
        self._both(jpgs[0], ["-map", mp, "-dither", "none"], tmp_path)

    def test_rgb565_bmp(self, jpgs, tmp_path):
        self._both(jpgs[0], ["-rgb565", "-bmp"], tmp_path, "bmp")
        self._both(jpgs[1], ["-rgb565", "-bmp"], tmp_path, "bmp")
        self._both(jpgs[0], ["-rgb565", "-nosmooth", "-bmp"], tmp_path,
                   "bmp")


class TestBufferedImage:
    """Buffered-image mode (jpeg_start_output/jpeg_finish_output,
    jdapistd.c:37-108): render the picture as of each completed scan.
    The final pass must match the one-shot full decode, and truncating
    the stream after scan k must reproduce pass k exactly (that is the
    coefficient state an interactive viewer would have)."""

    @pytest.fixture(scope="class")
    def projpg(self, ref_tools, tmp_path_factory):
        d = tmp_path_factory.mktemp("bufim")
        p = str(d / "p.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-progressive"],
                  corpus("testorig.ppm"), p)
        return open(p, "rb").read()

    def test_final_pass_equals_full_decode(self, projpg):
        from mozjpeg_tpu.codec import decoder
        bi = decoder.BufferedImage(projpg)
        assert bi.progressive and bi.num_scans > 1
        full = decoder.decode(projpg)
        last = bi.render_pass(bi.num_scans)
        assert np.array_equal(last, full)

    def test_pass_matches_truncated_stream(self, projpg):
        from mozjpeg_tpu.codec import decoder, marker
        jp = marker.parse(projpg)
        bi = decoder.BufferedImage(projpg)
        k = max(1, bi.num_scans // 2)
        # cut the stream right after scan k's entropy data
        cut = projpg[:jp.scans[k - 1].data_end] + b"\xff\xd9"
        assert np.array_equal(bi.render_pass(k), decoder.decode(cut))

    def test_iter_yields_every_pass(self, projpg):
        from mozjpeg_tpu.codec import decoder
        bi = decoder.BufferedImage(projpg, block_smoothing=False)
        frames = list(bi)
        full = decoder.decode(projpg)
        assert {im.shape for im in frames} == {full.shape}
        # incremental iteration must equal the per-pass renders exactly
        for k, im in enumerate(frames, 1):
            np.testing.assert_array_equal(im, bi.render_pass(k))

    def test_iter_matches_render_pass_with_smoothing(self, projpg):
        from mozjpeg_tpu.codec import decoder
        bi = decoder.BufferedImage(projpg, block_smoothing=True)
        for k, im in enumerate(bi, 1):
            np.testing.assert_array_equal(im, bi.render_pass(k))

    def test_baseline_single_pass(self, ref_tools, tmp_path):
        from mozjpeg_tpu.codec import decoder
        p = str(tmp_path / "b.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), p)
        data = open(p, "rb").read()
        bi = decoder.BufferedImage(data)
        assert bi.num_scans == 1 and not bi.progressive
        assert np.array_equal(bi.render_pass(1), decoder.decode(data))


class TestDjpegAdvancedFlags:
    """djpeg -skip / -rgb / -maxscans / -strict / -icc / exit codes,
    byte-exact and exit-code-exact vs the reference binary."""

    @pytest.fixture(scope="class")
    def jpgs(self, ref_tools, tmp_path_factory):
        d = tmp_path_factory.mktemp("dflags")
        b = str(d / "b.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline"],
                  corpus("testorig.ppm"), b)
        g = str(d / "g.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-baseline", "-grayscale"],
                  corpus("testorig.ppm"), g)
        pr = str(d / "p.jpg")
        run_cjpeg(["-quality", "75", "-revert", "-progressive"],
                  corpus("testorig.ppm"), pr)
        return b, g, pr

    def _both(self, src, args, tmp_path, rc_ref=0):
        from mozjpeg_tpu.cli import djpeg as dj
        ref = str(tmp_path / "r.ppm")
        our = str(tmp_path / "o.ppm")
        rp = subprocess.run([DJPEG, *args, "-outfile", ref, src],
                            capture_output=True)
        rc = dj.main([*args, "-outfile", our, src])
        assert rp.returncode == rc_ref and rc == rc_ref, \
            (args, rp.returncode, rc)
        if rc_ref == 0:
            assert open(our, "rb").read() == open(ref, "rb").read(), args

    def test_skip(self, jpgs, tmp_path):
        self._both(jpgs[0], ["-skip", "30,68"], tmp_path)
        self._both(jpgs[2], ["-skip", "0,7"], tmp_path)
        self._both(jpgs[2], ["-skip", "140,148"], tmp_path)

    def test_skip_scaled(self, jpgs, tmp_path):
        self._both(jpgs[2], ["-scale", "3/8", "-skip", "10,20"], tmp_path)

    def test_skip_out_of_range(self, jpgs, tmp_path):
        self._both(jpgs[0], ["-skip", "30,1000"], tmp_path, rc_ref=1)

    def test_rgb_of_grayscale(self, jpgs, tmp_path):
        self._both(jpgs[1], ["-rgb"], tmp_path)
        self._both(jpgs[0], ["-rgb"], tmp_path)

    def test_maxscans(self, jpgs, tmp_path):
        self._both(jpgs[2], ["-maxscans", "3"], tmp_path, rc_ref=1)
        self._both(jpgs[2], ["-maxscans", "30"], tmp_path)

    def test_truncated_warning_exit_codes(self, jpgs, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        trunc = str(tmp_path / "t.jpg")
        open(trunc, "wb").write(open(jpgs[0], "rb").read()[:2500])
        ref = str(tmp_path / "r.ppm")
        our = str(tmp_path / "o.ppm")
        rp = subprocess.run([DJPEG, "-outfile", ref, trunc],
                            capture_output=True)
        rc = dj.main(["-outfile", our, trunc])
        assert rp.returncode == 2 and rc == 2
        assert open(our, "rb").read() == open(ref, "rb").read()
        # -strict turns the warning fatal
        rp = subprocess.run([DJPEG, "-strict", "-outfile", ref, trunc],
                            capture_output=True)
        rc = dj.main(["-strict", "-outfile", our, trunc])
        assert rp.returncode == 1 and rc == 1
        # clean file still exits 0 under -strict
        rc = dj.main(["-strict", "-outfile", our, jpgs[0]])
        assert rc == 0

    def test_icc_extract(self, jpgs, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        # NOTE: reference jpegtran silently drops ICC profiles once the
        # APP2 segment would exceed ~300 bytes (scan-buffer interaction in
        # the mozjpeg transcode path), so the oracle profile stays small.
        icc_src = str(tmp_path / "x.icc")
        open(icc_src, "wb").write(bytes(range(200)))
        wicc = str(tmp_path / "wicc.jpg")
        subprocess.run([JPEGTRAN, "-copy", "all", "-icc", icc_src,
                        "-outfile", wicc, jpgs[0]], check=True)
        ref = str(tmp_path / "r.icc")
        our = str(tmp_path / "o.icc")
        subprocess.run([DJPEG, "-icc", ref, "-outfile", os.devnull, wicc],
                       check=True)
        rc = dj.main(["-icc", our, "-outfile", os.devnull, wicc])
        assert rc == 0
        assert open(our, "rb").read() == open(ref, "rb").read()

    def test_icc_large_roundtrip_ours(self, jpgs, tmp_path):
        # our jpegtran embeds large profiles correctly (where the
        # reference drops them); reference djpeg must read ours back.
        from mozjpeg_tpu.cli import jpegtran as jt, djpeg as dj
        profile = bytes(range(256)) * 40              # 10240 B
        icc_src = str(tmp_path / "big.icc")
        open(icc_src, "wb").write(profile)
        wicc = str(tmp_path / "wbig.jpg")
        assert jt.main(["-copy", "all", "-icc", icc_src,
                        "-outfile", wicc, jpgs[0]]) == 0
        ref = str(tmp_path / "rbig.icc")
        subprocess.run([DJPEG, "-icc", ref, "-outfile", os.devnull, wicc],
                       check=True)
        assert open(ref, "rb").read() == profile
        our = str(tmp_path / "obig.icc")
        assert dj.main(["-icc", our, "-outfile", os.devnull, wicc]) == 0
        assert open(our, "rb").read() == profile

    def test_fast_profile(self, jpgs, tmp_path):
        self._both(jpgs[0], ["-fast"], tmp_path)


class TestYuvTools:
    """yuvjpeg/jpegyuv raw-I420 shims (yuvjpeg.c, jpegyuv.c) byte-exact vs
    the reference tools built from the same sources."""

    @pytest.fixture(scope="class")
    def yuv_tools(self, ref_tools):
        import shutil
        build = os.path.dirname(ref_tools["cjpeg"])
        tools = {}
        for name in ("yuvjpeg", "jpegyuv"):
            path = os.path.join(build, name)
            if not os.path.exists(path):
                rc = subprocess.run(
                    ["gcc", "-O2", "/root/reference/%s.c" % name,
                     "-I/root/reference", "-I" + build, "-o", path,
                     "-L" + build, "-ljpeg", "-Wl,-rpath,$ORIGIN"],
                    capture_output=True)
                if rc.returncode != 0 or not os.path.exists(path):
                    pytest.skip("cannot build reference %s" % name)
            tools[name] = path
        return tools

    @pytest.mark.parametrize("w,h", [(768, 512), (175, 101)])
    def test_roundtrip_parity(self, ref_tools, yuv_tools, tmp_path, w, h):
        from mozjpeg_tpu.cli import jpegyuv, yuvjpeg
        src = str(tmp_path / "s.jpg")
        big = ppm.read(corpus("kodak_like_768x512_1.ppm"))[:h, :w]
        ppm.write(str(tmp_path / "s.ppm"), big)
        run_cjpeg(["-quality", "75"], str(tmp_path / "s.ppm"), src)

        # jpegyuv: raw 4:2:0 planes out
        ref_yuv = str(tmp_path / "r.yuv")
        subprocess.run([yuv_tools["jpegyuv"], src, ref_yuv], check=True)
        ours_yuv = str(tmp_path / "o.yuv")
        assert jpegyuv.main([src, ours_yuv]) == 0
        assert open(ours_yuv, "rb").read() == open(ref_yuv, "rb").read()

        # yuvjpeg: full mozjpeg default encode from raw planes
        ref_jpg = str(tmp_path / "r.jpg")
        subprocess.run([yuv_tools["yuvjpeg"], "60", "%dx%d" % (w, h),
                        ref_yuv, ref_jpg], check=True)
        ours_jpg = str(tmp_path / "o.jpg")
        assert yuvjpeg.main(["60", "%dx%d" % (w, h), ref_yuv,
                             ours_jpg]) == 0
        assert open(ours_jpg, "rb").read() == open(ref_jpg, "rb").read()

    def test_bad_args(self, tmp_path):
        from mozjpeg_tpu.cli import jpegyuv, yuvjpeg
        assert yuvjpeg.main([]) == 1
        assert yuvjpeg.main(["101", "8x8", "x", "y"]) == 1
        assert yuvjpeg.main(["75", "8x", "x", "y"]) == 1
        assert jpegyuv.main([]) == 1
        bad = str(tmp_path / "bad.yuv")
        open(bad, "wb").write(b"12345")
        assert yuvjpeg.main(["75", "8x8", bad,
                             str(tmp_path / "o.jpg")]) == 1


class TestCorpusJobs:
    """Resumable corpus jobs (utils/jobs.py) — the checkpoint/resume and
    failure-isolation analog of the reference's suspension + setjmp
    recovery (SURVEY.md §5)."""

    def test_run_resume_and_quarantine(self, tmp_path):
        from mozjpeg_tpu.utils import jobs, ppm as _ppm
        rng = np.random.default_rng(0)
        ins = []
        for i in range(5):
            p = str(tmp_path / ("img%d.ppm" % i))
            im = (rng.integers(0, 256, (32, 40, 3))).astype(np.uint8)
            _ppm.write(p, im)
            ins.append(p)
        bad = str(tmp_path / "bad.ppm")
        open(bad, "wb").write(b"P6 notanimage")
        ins.append(bad)
        unk = str(tmp_path / "weird.xyz")
        open(unk, "wb").write(b"???")
        ins.append(unk)

        out = str(tmp_path / "out")
        recs = jobs.run_corpus_job(ins, out, batch_size=3)
        assert len(recs) == 7
        by = {r["input"]: r for r in recs}
        assert all(by[p]["status"] == "done" for p in ins[:5])
        assert by[bad]["status"] == "error"
        assert by[unk]["status"] == "error"
        for p in ins[:5]:
            assert os.path.getsize(by[p]["output"]) == by[p]["bytes"]

        # resume: done inputs skip (manifest grows by retried errors only)
        n0 = len(open(os.path.join(out, "manifest.jsonl")).readlines())
        recs2 = jobs.run_corpus_job(ins, out, batch_size=3)
        n1 = len(open(os.path.join(out, "manifest.jsonl")).readlines())
        assert n1 - n0 == 2            # the two error records retried
        assert [r["status"] for r in recs2] == [r["status"] for r in recs]

        # touched input re-encodes
        _ppm.write(ins[0], (rng.integers(0, 256, (32, 40, 3))).astype(np.uint8))
        os.utime(ins[0], (1, 1))
        jobs.run_corpus_job(ins, out, batch_size=3)
        n2 = len(open(os.path.join(out, "manifest.jsonl")).readlines())
        assert n2 - n1 == 3            # re-encoded img0 + 2 errors


class TestCropSweep:
    """croptest.in analog: djpeg -crop over every sampling layout must
    match the reference djpeg byte-for-byte, including unaligned offsets
    (the reference test only sweeps iMCU-aligned x; we include unaligned)."""

    @pytest.fixture(scope="class")
    def sources(self, ref_tools, tmp_path_factory):
        td = tmp_path_factory.mktemp("cropsrc")
        src = ppm.read(corpus("testorig.ppm"))[:77, :96]
        sp = str(td / "s.ppm")
        ppm.write(sp, src)
        out = {}
        for prog in ("", "-progressive"):
            for name, flags in {"GRAY": ["-grayscale"],
                                "420": ["-sample", "2x2"],
                                "422": ["-sample", "2x1"],
                                "440": ["-sample", "1x2"],
                                "444": ["-sample", "1x1"]}.items():
                p = str(td / ("%s%s.jpg" % (name, prog)))
                args = ["-revert"] + ([prog] if prog else []) + flags
                subprocess.run([ref_tools["cjpeg"]] + args
                               + ["-outfile", p, sp], check=True)
                out[(name, prog)] = p
        return out

    @pytest.mark.parametrize("spec", ["64x17+16+3", "49x8+21+0",
                                      "30x30+5+40"])
    @pytest.mark.parametrize("prog", ["", "-progressive"])
    def test_byte_exact_vs_reference(self, ref_tools, sources, tmp_path,
                                     spec, prog):
        from mozjpeg_tpu.cli import djpeg as cli
        for samp in ("GRAY", "420", "422", "440", "444"):
            jpg = sources[(samp, prog)]
            ref = str(tmp_path / "r.ppm")
            subprocess.run([ref_tools["djpeg"], "-crop", spec,
                            "-outfile", ref, jpg], check=True)
            ours = str(tmp_path / "o.ppm")
            assert cli.main(["-crop", spec, "-outfile", ours, jpg]) in (0,
                                                                        None)
            assert open(ours, "rb").read() == open(ref, "rb").read(), \
                "crop %s mismatch for %s%s" % (spec, samp, prog)


class TestApiOnlyKnobs:
    """Golden tests for knobs reachable only through the reference C API
    (no cjpeg flag): built via scripts/encode_harness.c."""

    @pytest.fixture(scope="class")
    def harness(self, ref_tools):
        import shutil
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(root, ".bench", "encode_harness")
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            build = os.path.dirname(ref_tools["cjpeg"])
            rc = subprocess.run(
                ["gcc", "-O2", "-I/root/reference", "-I" + build,
                 os.path.join(root, "scripts", "encode_harness.c"),
                 "-L" + build, "-ljpeg",
                 "-Wl,-rpath," + build, "-lm", "-o", path],
                capture_output=True)
            if rc.returncode != 0 or not os.path.exists(path):
                pytest.skip("cannot build encode_harness")
        return path

    B_OPT = 0x680C061E   # JBOOLEAN_OPTIMIZE_SCANS
    B_SIT = 0xFD841435   # JBOOLEAN_USE_SCANS_IN_TRELLIS
    I_NL = 0xB63EBF39    # JINT_TRELLIS_NUM_LOOPS

    @pytest.mark.parametrize("loops,scanopt,sit", [
        (2, False, False), (3, False, False),
        (2, True, False), (2, False, True),
    ])
    def test_trellis_num_loops(self, harness, tmp_path, loops, scanopt,
                               sit):
        """Each trellis loop regathers rate statistics from the previous
        loop's output (jcmaster.c pass structure)."""
        import mozjpeg_tpu as mj
        args = [harness, corpus("testorig.ppm"), "75",
                str(tmp_path / "h.jpg"), "INT:%d=%d" % (self.I_NL, loops)]
        kw = dict(quality=75, trellis_num_loops=loops)
        if not scanopt:
            args.append("BOOL:%d=0" % self.B_OPT)
            kw["optimize_scans"] = False
        if sit:
            args.append("BOOL:%d=1" % self.B_SIT)
            kw["use_scans_in_trellis"] = True
        subprocess.run(args, check=True)
        ref = open(str(tmp_path / "h.jpg"), "rb").read()
        ours = mj.encode(ppm.read(corpus("testorig.ppm")),
                         mj.EncoderConfig(**kw))
        assert ours == ref


def test_arith_custom_dac_conditioning(ref_tools, tmp_path):
    """Non-default DAC conditioning (L/U/Kx) must decode bit-exact vs
    djpeg: the decoder takes the transmitted values per scan
    (jdmarker get_dac + jdarith), not the libjpeg defaults."""
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.codec import arith
    img = ppm.read(corpus("testorig.ppm"))
    arith.DC_L[:] = [2, 1, 0, 0]
    arith.DC_U[:] = [8, 4, 1, 1]
    arith.AC_K[:] = [3, 7, 5, 5]
    try:
        data = mj.encode(img, mj.EncoderConfig(
            quality=75, arithmetic=True, optimize_scans=False,
            progressive=False, trellis_quant=False))
    finally:
        arith.DC_L[:] = 0
        arith.DC_U[:] = 1
        arith.AC_K[:] = 5
    p = tmp_path / "cond.jpg"
    p.write_bytes(data)
    ref = run_djpeg(str(p), str(tmp_path / "cond.ppm"))
    np.testing.assert_array_equal(mj.decode(data), ref)


def test_ppm_nonstandard_maxval(ref_tools, tmp_path):
    """rdppm.c rescale: samples scale to MAXJSAMPLE for maxval != 255."""
    from mozjpeg_tpu.cli import cjpeg as cli
    rng = np.random.default_rng(0)
    img = rng.integers(0, 101, (32, 40, 3)).astype(np.uint8)
    p = str(tmp_path / "mx.ppm")
    open(p, "wb").write(b"P6 40 32 100\n" + img.tobytes())
    ref = run_cjpeg(["-revert", "-baseline", "-quality", "80"], p,
                    str(tmp_path / "r.jpg"))
    out = str(tmp_path / "o.jpg")
    cli.main(["-revert", "-baseline", "-quality", "80", "-outfile", out, p])
    assert open(out, "rb").read() == ref


def test_tj_encode_yuv_411_441_vs_libturbojpeg(ref_tools):
    """4:1 ratios use plain-average int_downsample (jcsample.c), byte-exact
    vs tj3EncodeYUV8."""
    import ctypes
    so = os.path.join(os.path.dirname(ref_tools["cjpeg"]),
                      "libturbojpeg.so")
    if not os.path.exists(so):
        pytest.skip("libturbojpeg.so not built")
    lib = ctypes.CDLL(so)
    lib.tj3Init.restype = ctypes.c_void_p
    lib.tj3Set.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    ubp = ctypes.POINTER(ctypes.c_ubyte)
    lib.tj3EncodeYUV8.restype = ctypes.c_int
    lib.tj3EncodeYUV8.argtypes = [ctypes.c_void_p, ubp, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ubp, ctypes.c_int]
    from mozjpeg_tpu import turbojpeg as tj
    img = np.ascontiguousarray(ppm.read(corpus("testorig.ppm"))[:48, :64])
    h, w = img.shape[:2]
    for samp in (tj.TJSAMP_420, tj.TJSAMP_411, tj.TJSAMP_441):
        handle = lib.tj3Init(0)
        lib.tj3Set(handle, 4, samp)          # TJPARAM_SUBSAMP
        ref = np.zeros(tj.yuv_buf_size(w, 1, h, samp), np.uint8)
        assert lib.tj3EncodeYUV8(handle, img.ctypes.data_as(ubp), w, 0, h,
                                 0, ref.ctypes.data_as(ubp), 1) == 0
        t = tj.TJ()
        t.set(tj.TJPARAM_SUBSAMP, samp)
        ours = np.frombuffer(t.encode_yuv(img, align=1), np.uint8)
        np.testing.assert_array_equal(ours, ref)


class TestDjpegCombos:
    """CLI combination parity found in review: -crop with -grayscale,
    -scale with -grayscale, -fast ordering."""

    @pytest.fixture(scope="class")
    def srcjpg(self, ref_tools, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("combo") / "s.jpg")
        run_cjpeg(["-quality", "75", "-revert"], corpus("testorig.ppm"), p)
        return p

    def test_crop_grayscale(self, ref_tools, srcjpg, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        for spec in ("64x48+32+10", "49x30+5+0"):
            subprocess.run([ref_tools["djpeg"], "-grayscale", "-crop",
                            spec, "-outfile", str(tmp_path / "r.pgm"),
                            srcjpg], check=True)
            dj.main(["-grayscale", "-crop", spec,
                     "-outfile", str(tmp_path / "o.pgm"), srcjpg])
            assert open(str(tmp_path / "o.pgm"), "rb").read() == \
                open(str(tmp_path / "r.pgm"), "rb").read()

    def test_scale_grayscale(self, ref_tools, srcjpg, tmp_path):
        from mozjpeg_tpu.cli import djpeg as dj
        for sc in ("1/2", "3/8"):
            subprocess.run([ref_tools["djpeg"], "-scale", sc, "-grayscale",
                            "-outfile", str(tmp_path / "r.pgm"), srcjpg],
                           check=True)
            dj.main(["-scale", sc, "-grayscale",
                     "-outfile", str(tmp_path / "o.pgm"), srcjpg])
            assert open(str(tmp_path / "o.pgm"), "rb").read() == \
                open(str(tmp_path / "r.pgm"), "rb").read()

    def test_fast_then_dct_int(self, ref_tools, srcjpg, tmp_path):
        """Later switches win: -fast -dct int decodes with islow."""
        from mozjpeg_tpu.cli import djpeg as dj
        subprocess.run([ref_tools["djpeg"], "-fast", "-dct", "int",
                        "-outfile", str(tmp_path / "r.ppm"), srcjpg],
                       check=True)
        dj.main(["-fast", "-dct", "int",
                 "-outfile", str(tmp_path / "o.ppm"), srcjpg])
        assert open(str(tmp_path / "o.ppm"), "rb").read() == \
            open(str(tmp_path / "r.ppm"), "rb").read()

    def test_jpegtran_one_transform_only(self, srcjpg, tmp_path):
        from mozjpeg_tpu.cli import jpegtran as jt
        rc = jt.main(["-flip", "horizontal", "-rotate", "90",
                      "-outfile", str(tmp_path / "x.jpg"), srcjpg])
        assert rc == 1


def test_trellis_num_loops_batched_matches_serial():
    """The batched multi-loop trellis fuses Annex-K tablegen into the
    device program (make_trellis_all_t dev_tables); outputs must equal
    the serial per-image encoder exactly."""
    import numpy as np
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.codec.encoder import _fast_ctx
    # dummy-block-free crop: testorig itself is NOT batchable at 4:2:0
    # and silently turned this into a staged-vs-staged tautology (r4)
    img = np.ascontiguousarray(ppm.read(corpus("testorig.ppm"))[:128, :192])
    imgs = [np.roll(img, 13 * i, axis=1).copy() for i in range(3)]
    cfg = mj.EncoderConfig(quality=75, trellis_num_loops=2,
                           optimize_scans=False)
    assert _fast_ctx(img, cfg, {}) is not None
    batched = mj.encode_many(imgs, cfg)
    import os as _os
    _os.environ["MJ_BATCH_MAX_MP"] = "0"
    try:
        staged = [mj.encode_many([im], cfg)[0] for im in imgs]
    finally:
        del _os.environ["MJ_BATCH_MAX_MP"]
    for i in range(len(imgs)):
        assert batched[i] == staged[i], "image %d" % i
