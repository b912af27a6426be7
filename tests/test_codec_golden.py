"""Golden tests vs the reference binaries (byte-exact encode, bit-exact
decode) — the MD5-golden philosophy of the reference's CTest suite
(/root/reference/CMakeLists.txt:1234-1450) applied against live binaries."""
import os
import subprocess

import numpy as np
import pytest

from mozjpeg_tpu import encode, decode, EncoderConfig, Profile
from mozjpeg_tpu.utils import ppm

from conftest import CORPUS, run_cjpeg, run_djpeg


def corpus_path(name):
    p = os.path.join(CORPUS, name)
    if not os.path.exists(p):
        pytest.skip("corpus image %s missing (run scripts/make_corpus.py)"
                    % name)
    return p


@pytest.mark.parametrize("quality", [50, 75, 85, 92])
def test_baseline_byte_exact(ref_tools, tmp_path, quality):
    from mozjpeg_tpu.codec.config import quality_default_subsampling
    src = corpus_path("kodak_like_768x512_1.ppm")
    golden = run_cjpeg(["-quality", str(quality), "-revert", "-baseline"],
                       src, str(tmp_path / "g.jpg"))
    img = ppm.read(src)
    ours = encode(img, EncoderConfig(
        quality=quality, profile=Profile.FASTEST, progressive=False,
        subsampling=quality_default_subsampling(quality),
        force_baseline=True,
        optimize_coding=False, optimize_scans=False, trellis_quant=False,
        overshoot_deringing=False))
    assert ours == golden


def test_baseline_optimize_dummy_blocks(ref_tools, tmp_path, testorig):
    """227x149: exercises right-column and bottom-row dummy blocks."""
    src = corpus_path("testorig.ppm")
    golden = run_cjpeg(["-quality", "75", "-revert", "-baseline",
                        "-optimize"], src, str(tmp_path / "g.jpg"))
    ours = encode(testorig, EncoderConfig(
        quality=75, profile=Profile.FASTEST, progressive=False,
        force_baseline=True,
        optimize_coding=True, optimize_scans=False, trellis_quant=False,
        overshoot_deringing=False))
    assert ours == golden


def test_progressive_byte_exact(ref_tools, tmp_path, testorig):
    """mozjpeg default 9-scan script + per-scan optimal tables."""
    src = corpus_path("testorig.ppm")
    golden = run_cjpeg(["-quality", "75", "-notrellis", "-notrellis-dc",
                        "-noovershoot", "-fastcrush"],
                       src, str(tmp_path / "g.jpg"))
    ours = encode(testorig, EncoderConfig(
        quality=75, profile=Profile.MAX_COMPRESSION, optimize_scans=False,
        trellis_quant=False, overshoot_deringing=False))
    assert ours == golden


def test_grayscale_byte_exact(ref_tools, tmp_path, testorig):
    src = corpus_path("testorig.ppm")
    golden = run_cjpeg(["-quality", "75", "-revert", "-baseline",
                        "-grayscale"], src, str(tmp_path / "g.jpg"))
    ours = encode(testorig, EncoderConfig(
        quality=75, profile=Profile.FASTEST, progressive=False,
        force_baseline=True,
        grayscale=True, optimize_coding=False, optimize_scans=False,
        trellis_quant=False, overshoot_deringing=False))
    assert ours == golden


@pytest.mark.parametrize("args", [
    ["-quality", "80"],                      # q>=80 heuristic: SOF 2x1
    ["-quality", "92"],                      # q>=90 heuristic: SOF 1x1
    ["-quality", "60", "-sample", "1x2"],    # declared v>1: trellis lastDC
    ["-quality", "85", "-sample", "2x2"],    # chains across v block rows
    ["-quality", "75", "-fastcrush"],
])
def test_grayscale_declared_sampling(ref_tools, tmp_path, args):
    """cjpeg's set_sample_factors writes the -sample / q>=80 default into
    the gray component (rdswitch.c:610-642), changing the SOF factors and
    the trellis iMCU-row chaining granularity (jccoefct.c:417-419)."""
    from mozjpeg_tpu.cli import cjpeg as cli
    rng = np.random.RandomState(22)
    g = rng.randint(0, 256, (37, 29)).astype(np.uint8)
    src = str(tmp_path / "g.pgm")
    ppm.write(src, g)
    subprocess.run([ref_tools["cjpeg"]] + args
                   + ["-outfile", str(tmp_path / "r.jpg"), src], check=True)
    cli.main(args + ["-outfile", str(tmp_path / "o.jpg"), src])
    assert ((tmp_path / "o.jpg").read_bytes()
            == (tmp_path / "r.jpg").read_bytes())


@pytest.mark.parametrize("args", [
    ["-quality", "75", "-revert", "-baseline"],
    ["-quality", "75", "-revert", "-progressive", "-optimize"],
    ["-quality", "30", "-revert", "-baseline"],
    ["-quality", "75", "-revert", "-baseline", "-restart", "2"],
    ["-quality", "75", "-revert", "-baseline", "-grayscale"],
])
def test_decode_bit_exact(ref_tools, tmp_path, args):
    src = corpus_path("testorig.ppm")
    jpg_path = str(tmp_path / "g.jpg")
    run_cjpeg(args, src, jpg_path)
    ref_pixels = run_djpeg(jpg_path, str(tmp_path / "g.ppm"))
    with open(jpg_path, "rb") as f:
        ours = decode(f.read())
    np.testing.assert_array_equal(ours, ref_pixels)


def test_decode_bundled_testorig_jpg(ref_tools, tmp_path):
    """Decode the repo's canonical testorig.jpg bit-exactly."""
    jpg_path = "/root/reference/testimages/testorig.jpg"
    ref_pixels = run_djpeg(jpg_path, str(tmp_path / "g.ppm"))
    with open(jpg_path, "rb") as f:
        ours = decode(f.read())
    np.testing.assert_array_equal(ours, ref_pixels)


def test_decode_progressive_interleaved(ref_tools, tmp_path):
    """testimgint.jpg is a progressive file shipped with the reference."""
    jpg_path = "/root/reference/testimages/testimgint.jpg"
    ref_pixels = run_djpeg(jpg_path, str(tmp_path / "g.ppm"))
    with open(jpg_path, "rb") as f:
        ours = decode(f.read())
    np.testing.assert_array_equal(ours, ref_pixels)


def test_roundtrip_own_progressive(testorig):
    """Our decoder decodes our own progressive output."""
    data = encode(testorig, EncoderConfig(
        quality=75, profile=Profile.MAX_COMPRESSION, optimize_scans=False,
        trellis_quant=False, overshoot_deringing=False))
    rgb = decode(data)
    assert rgb.shape == testorig.shape
    err = np.abs(rgb.astype(int) - testorig.astype(int))
    assert err.mean() < 6.0  # q75 quality bound


def test_trellis_byte_exact(ref_tools, tmp_path, testorig):
    """Full trellis (AC+DC) + progressive + optimized tables vs cjpeg."""
    src = corpus_path("testorig.ppm")
    golden = run_cjpeg(["-quality", "75", "-fastcrush", "-noovershoot"],
                       src, str(tmp_path / "g.jpg"))
    ours = encode(testorig, EncoderConfig(
        quality=75, profile=Profile.MAX_COMPRESSION, optimize_scans=False,
        trellis_quant=True, overshoot_deringing=False))
    assert ours == golden


def test_trellis_byte_exact_kodak_q60(ref_tools, tmp_path):
    src = corpus_path("kodak_like_768x512_3.ppm")
    golden = run_cjpeg(["-quality", "60", "-fastcrush", "-noovershoot"],
                       src, str(tmp_path / "g.jpg"))
    img = ppm.read(src)
    ours = encode(img, EncoderConfig(
        quality=60, profile=Profile.MAX_COMPRESSION, optimize_scans=False,
        trellis_quant=True, overshoot_deringing=False))
    assert ours == golden


@pytest.mark.parametrize("name,quality", [
    ("testorig.ppm", 75),
    ("kodak_like_768x512_1.ppm", 75),
    ("kodak_like_768x512_2.ppm", 60),
    ("kodak_like_768x512_4.ppm", 90),
])
def test_full_mozjpeg_default_byte_exact(ref_tools, tmp_path, name, quality):
    """The complete mozjpeg default: progressive + trellis + overshoot
    deringing + optimize_scans (jpegrescan) + per-scan optimal tables."""
    from mozjpeg_tpu.codec.config import quality_default_subsampling
    src = corpus_path(name)
    golden = run_cjpeg(["-quality", str(quality)], src,
                       str(tmp_path / "g.jpg"))
    img = ppm.read(src)
    ours = encode(img, EncoderConfig(
        quality=quality,
        subsampling=quality_default_subsampling(quality)))
    assert ours == golden


def test_full_default_grayscale(ref_tools, tmp_path, testorig):
    src = corpus_path("testorig.ppm")
    golden = run_cjpeg(["-quality", "75", "-grayscale"], src,
                       str(tmp_path / "g.jpg"))
    ours = encode(testorig, EncoderConfig(quality=75, grayscale=True))
    assert ours == golden


def test_decode_own_full_output(ref_tools, tmp_path, testorig):
    """Our decoder handles our own scan-optimized output bit-exactly
    vs djpeg."""
    data = encode(testorig, EncoderConfig(quality=75))
    p = str(tmp_path / "o.jpg")
    with open(p, "wb") as f:
        f.write(data)
    ref_pixels = run_djpeg(p, str(tmp_path / "o.ppm"))
    ours = decode(data)
    np.testing.assert_array_equal(ours, ref_pixels)


def test_restart_parallel_decode_bit_exact(ref_tools, tmp_path):
    """Streams with RSTn markers decode via the multithreaded segment
    path (mj_decode_seq_par); output must be bit-exact vs djpeg and vs
    the serial decoder, including the corrupt-input fallback."""
    import mozjpeg_tpu as mj
    src = corpus_path("kodak_like_768x512_3.ppm")
    jpg = str(tmp_path / "r.jpg")
    for ri in ("1", "2", "7b"):
        run_cjpeg(["-quality", "80", "-revert", "-baseline",
                   "-restart", ri], src, jpg)
        data = open(jpg, "rb").read()
        ref = run_djpeg(jpg, str(tmp_path / "r.ppm"))
        np.testing.assert_array_equal(mj.decode(data), ref)
    # corrupt: parallel path must fall back and still match djpeg
    buf = bytearray(data)
    buf[len(buf) // 3] ^= 0xA5
    cj = str(tmp_path / "c.jpg")
    open(cj, "wb").write(bytes(buf))
    r = subprocess.run([ref_tools["djpeg"], "-outfile",
                        str(tmp_path / "c.ppm"), cj], capture_output=True)
    if r.returncode in (0, 2):
        from mozjpeg_tpu.utils import ppm as _ppm
        np.testing.assert_array_equal(mj.decode(bytes(buf)),
                                      _ppm.read(str(tmp_path / "c.ppm")))


def test_decode_many_matches_decode(ref_tools, tmp_path):
    """Batched decode_many must equal per-image decode across stream
    flavors (progressive, baseline, grayscale, arithmetic, restart)."""
    import mozjpeg_tpu as mj
    src = corpus_path("kodak_like_768x512_2.ppm")
    datas = []
    for flags in (["-quality", "75"],
                  ["-quality", "80", "-revert", "-baseline"],
                  ["-quality", "80", "-grayscale", "-revert"],
                  ["-revert", "-arithmetic"],
                  ["-revert", "-baseline", "-restart", "2"]):
        p = str(tmp_path / "dm.jpg")
        run_cjpeg(flags, src, p)
        datas.append(open(p, "rb").read())
    datas = datas * 2          # same-shape groups batch together
    outs = mj.decode_many(datas)
    for i, d in enumerate(datas):
        np.testing.assert_array_equal(outs[i], mj.decode(d))


def test_encode_many_mixed_shapes(ref_tools):
    """A mixed-size corpus must stream through the shape-grouped
    pipeline (each shape batched separately) and stay byte-identical to
    per-image encodes; singles and grayscale fall to the general path."""
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.utils import ppm as _ppm
    img = _ppm.read(corpus_path("kodak_like_768x512_1.ppm"))
    cfg = mj.EncoderConfig(quality=75)
    mix = ([img] * 3
           + [np.ascontiguousarray(img[:256, :384])] * 3
           + [np.ascontiguousarray(img[:120, :200])] * 2
           + [np.ascontiguousarray(img[:99, :77])]        # single
           + [np.ascontiguousarray(img[:128, :128, 0])])  # grayscale
    outs = mj.encode_many(mix, cfg)
    for i, im in enumerate(mix):
        assert outs[i] == mj.encode(im, cfg), "mismatch at %d" % i


def test_decode_many_distinct_chroma_qtables(ref_tools, tmp_path):
    """A legal JPEG whose Cr component uses a different quant table than
    Cb must not ride the batched fast path's shared-chroma-qtable
    assumption (jdinput.c latches per-component tables)."""
    import mozjpeg_tpu as mj
    qt = tmp_path / "qt3.txt"
    qt.write_text(
        " ".join(str(16 + v % 40) for v in range(64)) + "\n"
        + " ".join(str(20 + v % 50) for v in range(64)) + "\n"
        + " ".join(str(25 + (v * 3) % 60) for v in range(64)))
    p = str(tmp_path / "q3.jpg")
    run_cjpeg(["-quality", "75,75,75", "-qtables", str(qt),
               "-qslots", "0,1,2", "-revert", "-baseline"],
              corpus_path("kodak_like_768x512_1.ppm"), p)
    data = open(p, "rb").read()
    ref = mj.decode(data)
    outs = mj.decode_many([data] * 6)
    for o in outs:
        np.testing.assert_array_equal(o, ref)


def test_decode_many_pipelined_chunks(ref_tools, tmp_path, monkeypatch):
    """The sparse-upload pipelined decode path must stay byte-exact
    across chunk boundaries, remainders, mixed sampling (4:2:0/4:2:2/
    4:4:4), fancy-off replicate upsample, and odd image sizes."""
    import mozjpeg_tpu as mj
    monkeypatch.setenv("MJ_BATCH_GROUP", "3")   # force multiple chunks
    src = corpus_path("testorig.ppm")           # 227x149: odd dims
    datas = []
    for flags in (["-quality", "75"],
                  ["-quality", "75"],
                  ["-quality", "85", "-sample", "2x1"],
                  ["-quality", "85", "-sample", "1x1"],
                  ["-quality", "30", "-revert", "-baseline"]):
        p = str(tmp_path / "pc.jpg")
        run_cjpeg(flags, src, p)
        datas.append(open(p, "rb").read())
    datas = datas * 2                           # chunk of 3 + remainder
    for fancy in (True, False):
        outs = mj.decode_many(datas, fancy_upsample=fancy)
        for i, d in enumerate(datas):
            np.testing.assert_array_equal(
                outs[i], mj.decode(d, fancy_upsample=fancy))


def test_dqt_redefined_between_scans(ref_tools, tmp_path):
    """jdinput latch_quant_tables parity: a component first scanned AFTER
    a DQT redefinition must dequantize with the redefined table."""
    import mozjpeg_tpu as mj
    scans = str(tmp_path / "latch.scans")
    open(scans, "w").write(
        "0: 0 0 0 0;\n1 2: 0 0 0 0;\n0: 1 63 0 0;\n"
        "1: 1 63 0 0;\n2: 1 63 0 0;\n")
    jpg = str(tmp_path / "l.jpg")
    run_cjpeg(["-revert", "-quality", "75", "-scans", scans],
              corpus_path("testorig.ppm"), jpg)
    data = bytearray(open(jpg, "rb").read())
    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x01]) + bytes([16] * 64)
    sos = [i for i in range(len(data) - 1)
           if data[i] == 0xFF and data[i + 1] == 0xDA]
    patched = bytes(data[:sos[1]]) + dqt + bytes(data[sos[1]:])
    p2 = str(tmp_path / "l2.jpg")
    open(p2, "wb").write(patched)
    ref = run_djpeg(p2, str(tmp_path / "l2.ppm"))
    np.testing.assert_array_equal(mj.decode(patched), ref)
    # sensitivity: the redefinition must actually change pixels
    assert not np.array_equal(mj.decode(bytes(data)), ref)


def test_two_component_frame_rejected():
    """libjpeg has no color transform for 2-component frames; reject
    cleanly instead of crashing (JERR_CONVERSION_NOTIMPL analog)."""
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.codec import marker
    from mozjpeg_tpu.entropy.huffman import HuffTable
    w = marker.MarkerWriter()
    w.soi()
    w.dqt(0, np.full((8, 8), 16, np.uint16))
    w.sof(marker.SOF0, 8, 16, 16, [(1, 1, 1, 0), (2, 1, 1, 0)])
    from mozjpeg_tpu.codec.encoder import STD_TABLES
    w.dht(0, 0, STD_TABLES[(0, 0)])
    w.dht(1, 0, STD_TABLES[(1, 0)])
    w.sos([(1, 0, 0), (2, 0, 0)], 0, 63, 0, 0)
    w.raw(b"\x00" * 32)
    w.eoi()
    with pytest.raises(ValueError):
        mj.decode(w.bytes())
