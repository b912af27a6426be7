"""r5: arbitrary (non-iMCU-aligned) image dimensions ride the BATCHED
pipeline byte-identically to the reference `cjpeg`.

The r4 cliff: `batchable()` required dummy-block-free geometry, so the
reference's own 227x149 testorig — and any real photo — silently fell to
the ~2-3 MP/s staged path. r5 synthesizes the iMCU dummy blocks
(jccoefct.c:197-214,322-345 repeat-DC fill) on host after the coefficient
download and slices the batched trellis DC phases per image, so every
geometry batches. Routing is asserted (`_fast_ctx`), as in
test_batch_cliffs.py, so these are not staged-path tautologies.
"""
import os
import subprocess

import numpy as np
import pytest

from conftest import CJPEG, have_reference

from mozjpeg_tpu import EncoderConfig, encode_many
from mozjpeg_tpu.codec.config import DCTMethod, Profile
from mozjpeg_tpu.utils import ppm


def _assert_batched(img, cfg):
    from mozjpeg_tpu.codec.encoder import _fast_ctx
    assert _fast_ctx(img, cfg, {}) is not None, \
        "geometry unexpectedly fell off the batched path"


def _cjpeg(args, img, tmp_path, tag=""):
    src = str(tmp_path / ("src%s.ppm" % tag))
    dst = str(tmp_path / ("out%s.jpg" % tag))
    ppm.write(src, np.ascontiguousarray(img))
    subprocess.run([CJPEG] + args + ["-outfile", dst, src], check=True)
    with open(dst, "rb") as f:
        return f.read()


CFGS = [
    (dict(quality=75), []),                               # full default
    (dict(quality=75, restart_in_rows=1), ["-restart", "1"]),
    (dict(quality=75, restart_interval=3), ["-restart", "3b"]),
    # cjpeg -quality >=90 forces 1x1 sampling (rdswitch.c:562-570)
    (dict(quality=92, subsampling=(1, 1)), []),
    # q>=80 -> 2x1: chroma keeps dummy columns, Y keeps both
    (dict(quality=85, subsampling=(2, 1)), []),
    (dict(quality=75, optimize_scans=False),
     ["-dc-scan-opt", "0", "-fastcrush"]),
    (dict(quality=75, profile=Profile.FASTEST, force_baseline=True,
          trellis_quant=False, progressive=False,
          optimize_scans=False, optimize_coding=False,
          overshoot_deringing=False),
     ["-revert", "-baseline"]),
    (dict(quality=75, arithmetic=True, trellis_quant=False),
     ["-arithmetic", "-notrellis", "-notrellis-dc"]),
    (dict(quality=75, profile=Profile.FASTEST, force_baseline=True,
          dct_method=DCTMethod.IFAST, trellis_quant=False,
          progressive=False, optimize_scans=False, optimize_coding=False,
          overshoot_deringing=False),
     ["-revert", "-baseline", "-dct", "fast"]),
    (dict(quality=75, smoothing_factor=25), ["-smooth", "25"]),
]
IDS = ["default", "restart-rows", "restart3b", "q92-1x1", "q85-2x1",
       "fastcrush", "baseline-revert", "arith-notrellis",
       "ifast-revert", "smooth25"]


@pytest.mark.parametrize("kw,extra", CFGS, ids=IDS)
def test_unaligned_batched_byte_exact(testorig, tmp_path, kw, extra):
    if not have_reference():
        pytest.skip("no reference build")
    # 227x149: Y 29x19 blocks at 4:2:0 -> dummy col AND dummy row
    img = testorig
    assert img.shape[:2] == (149, 227)
    imgs = [img, np.roll(img, 13, axis=1).copy()]
    q = kw.get("quality", 75)
    cfg = EncoderConfig(**kw)
    _assert_batched(img, cfg)
    outs = encode_many(imgs, cfg)
    for i, im in enumerate(imgs):
        ref = _cjpeg(["-quality", str(q)] + extra, im, tmp_path, str(i))
        assert outs[i] == ref, IDS


def test_random_dims_corpus_batched(testorig, tmp_path):
    """A sweep of adversarial geometries: every combination of dummy-col /
    dummy-row / both, tiny images, 1-px edges — batched, byte-exact."""
    if not have_reference():
        pytest.skip("no reference build")
    rng = np.random.default_rng(5)
    dims = [(16, 16), (17, 16), (16, 17), (17, 17), (8, 24), (24, 9),
            (1, 37), (37, 1), (47, 61), (113, 97), (149, 227)]
    cfg = EncoderConfig(quality=75)
    imgs = []
    for (h, w) in dims:
        y0 = rng.integers(0, testorig.shape[0] - h + 1) if h <= 149 else 0
        x0 = rng.integers(0, testorig.shape[1] - w + 1) if w <= 227 else 0
        imgs.append(np.ascontiguousarray(
            testorig[y0:y0 + h, x0:x0 + w]))
    for im in imgs:
        _assert_batched(im, cfg)
    outs = encode_many(imgs, cfg)
    for i, im in enumerate(imgs):
        ref = _cjpeg(["-quality", "75"], im, tmp_path, str(i))
        assert outs[i] == ref, im.shape


def test_unaligned_grayscale_and_multichannel(testorig, tmp_path):
    if not have_reference():
        pytest.skip("no reference build")
    gray = np.ascontiguousarray(testorig[:51, :75, 1])
    rgb3 = np.repeat(gray[..., None], 3, axis=2)
    # cjpeg -quality 85 declares 2x1 factors for the lone gray component
    cfg = EncoderConfig(quality=85, grayscale=True, gray_sample=(2, 1))
    _assert_batched(gray, cfg)
    out = encode_many([gray, gray], cfg)
    ref = _cjpeg(["-quality", "85", "-grayscale"], rgb3, tmp_path)
    assert out[0] == ref and out[1] == ref
    # declared v=2 chains the trellis lastDC across iMCU row pairs
    # (jccoefct.c:417-447) — with bh=7 ODD, the per-image phase split of
    # the batched DC trellis is what keeps image boundaries straight
    cfg2 = EncoderConfig(quality=75, grayscale=True, gray_sample=(2, 2))
    _assert_batched(gray, cfg2)
    out2 = encode_many([gray, np.roll(gray, 9, axis=1).copy()], cfg2)
    for i, g2 in enumerate([gray, np.roll(gray, 9, axis=1)]):
        ref2 = _cjpeg(["-quality", "75", "-grayscale", "-sample", "2x2"],
                      np.repeat(np.ascontiguousarray(g2)[..., None], 3,
                                axis=2), tmp_path, "v%d" % i)
        assert out2[i] == ref2


def test_unaligned_scans_in_trellis_matches_staged(testorig):
    """use_scans_in_trellis has no cjpeg switch (oracle: the staged path,
    itself pinned vs the reference-library harness in TestTrellisFlags —
    which now ALSO runs testorig batched, covering the bands path)."""
    cfg = EncoderConfig(quality=75, use_scans_in_trellis=True)
    _assert_batched(testorig, cfg)
    batched = encode_many([testorig, testorig], cfg)
    old = os.environ.get("MJ_BATCH_MAX_MP")
    os.environ["MJ_BATCH_MAX_MP"] = "0"
    try:
        staged = encode_many([testorig], cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_BATCH_MAX_MP", None)
        else:
            os.environ["MJ_BATCH_MAX_MP"] = old
    assert batched[0] == staged[0]
    assert batched[1] == staged[0]


def test_unaligned_batched_matches_staged_12bit(testorig):
    """12-bit unaligned batches (sparse download path) match the staged
    per-image encoder byte-for-byte."""
    img12 = ((testorig[:45, :59].astype(np.uint16) << 4)
             | (testorig[:45, :59] >> 4))
    cfg = EncoderConfig(quality=75, precision=12, optimize_scans=False)
    _assert_batched(img12, cfg)
    batched = encode_many([img12, img12], cfg)
    old = os.environ.get("MJ_BATCH_MAX_MP")
    os.environ["MJ_BATCH_MAX_MP"] = "0"
    try:
        staged = encode_many([img12], cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_BATCH_MAX_MP", None)
        else:
            os.environ["MJ_BATCH_MAX_MP"] = old
    assert batched[0] == staged[0]
    assert batched[1] == staged[0]
