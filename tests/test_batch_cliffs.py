"""r4 fast-path cliff removal: restart intervals, ifast/float DCT and
input smoothing run through the BATCHED pipeline byte-identically to the
reference (`cjpeg`) and to the staged per-image path."""
import os
import subprocess

import numpy as np
import pytest

from mozjpeg_tpu.codec.config import DCTMethod  # noqa: E402

from conftest import CJPEG, have_reference

from mozjpeg_tpu import EncoderConfig, encode_many
from mozjpeg_tpu.utils import ppm


def _batchable(img):
    """Crop to dims with no dummy blocks at 4:2:0 (multiples of 16) so
    encode_many REALLY takes the batched pipeline — testorig's 227x149
    is NOT batchable and silently falls to the staged path, turning a
    batched-vs-staged comparison into a tautology."""
    h = img.shape[0] // 16 * 16
    w = img.shape[1] // 16 * 16
    return np.ascontiguousarray(img[:h, :w])


def _assert_batched(img, cfg):
    from mozjpeg_tpu.codec.encoder import _fast_ctx
    assert _fast_ctx(img, cfg, {}) is not None, \
        "config/geometry unexpectedly fell off the batched path"


def _cjpeg(args, img, tmp_path):
    src = str(tmp_path / "src.ppm")
    dst = str(tmp_path / "out.jpg")
    ppm.write(src, img)
    subprocess.run([CJPEG] + args + ["-outfile", dst, src], check=True)
    with open(dst, "rb") as f:
        return f.read()


CFGS = [
    (dict(quality=75, restart_interval=2), ["-quality", "75",
                                            "-restart", "2b"]),
    (dict(quality=75, restart_in_rows=1), ["-quality", "75",
                                           "-restart", "1"]),
    (dict(quality=75, dct_method=DCTMethod.IFAST),
     ["-quality", "75", "-dct", "fast"]),
    (dict(quality=75, smoothing_factor=30), ["-quality", "75",
                                             "-smooth", "30"]),
]


@pytest.mark.parametrize("kw,args", CFGS,
                         ids=["restart2", "restart-rows", "ifast-baseline",
                              "smooth30"])
def test_batched_cliff_configs_byte_exact(testorig, tmp_path, kw, args):
    if not have_reference():
        pytest.skip("no reference build")
    base = _batchable(testorig)
    imgs = [base, np.roll(base, 13, axis=1).copy(),
            np.roll(base, 29, axis=0).copy()]
    cfg = EncoderConfig(**kw)
    _assert_batched(base, cfg)
    outs = encode_many(imgs, cfg)
    for img, out in zip(imgs, outs):
        ref = _cjpeg(args, img, tmp_path)
        assert out == ref


def test_batched_float_dct_matches_staged(testorig):
    """float DCT: batched output equals the staged per-image path (the
    float path is not byte-pinned vs cjpeg — C float ops differ across
    compilers — but batched-vs-staged must be exact)."""
    base = _batchable(testorig)
    imgs = [base, np.roll(base, 7, axis=1).copy()]
    cfg = EncoderConfig(quality=75, dct_method=DCTMethod.FLOAT)
    _assert_batched(base, cfg)
    outs = encode_many(imgs, cfg)
    old = os.environ.get("MJ_BATCH_MAX_MP")
    os.environ["MJ_BATCH_MAX_MP"] = "0"      # force the staged path
    try:
        staged = encode_many(imgs, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_BATCH_MAX_MP", None)
        else:
            os.environ["MJ_BATCH_MAX_MP"] = old
    assert outs == staged


def test_oversize_single_routes_to_rows(testorig):
    """An over-cap restart_in_rows single routes through the row-sharded
    encoder (8-device CPU mesh) byte-identically to the staged path."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    img = np.ascontiguousarray(testorig[:144, :208])
    cfg = EncoderConfig(quality=75, restart_in_rows=1)
    old = os.environ.get("MJ_BATCH_MAX_MP")
    os.environ["MJ_BATCH_MAX_MP"] = "0.01"   # force the over-cap branch
    try:
        routed = encode_many([img], cfg)[0]
    finally:
        if old is None:
            os.environ.pop("MJ_BATCH_MAX_MP", None)
        else:
            os.environ["MJ_BATCH_MAX_MP"] = old
    staged = encode_many([img, img], cfg)[0]   # batched path, same bytes
    assert routed == staged


def test_batched_12bit_with_host_prep_env(testorig, tmp_path):
    """12-bit batches must not take the uint8 host-prep path even when
    MJ_HOST_PREP=1 (it reads uint8; a uint16 image would corrupt)."""
    import subprocess
    if not have_reference():
        pytest.skip("no reference build")
    img12 = ((testorig[:48, :64].astype(np.uint16) << 4)
             | (testorig[:48, :64] >> 4))
    src = str(tmp_path / "t12.ppm")
    ppm.write(src, img12, maxval=4095)
    dst = str(tmp_path / "r12.jpg")
    subprocess.run([CJPEG, "-precision", "12", "-quality", "75",
                    "-fastcrush", "-notrellis", "-notrellis-dc",
                    "-outfile", dst, src], check=True)
    old = os.environ.get("MJ_HOST_PREP")
    os.environ["MJ_HOST_PREP"] = "1"
    try:
        out = encode_many([img12], EncoderConfig(
            quality=75, precision=12, optimize_scans=False,
            trellis_quant=False))[0]
    finally:
        if old is None:
            os.environ.pop("MJ_HOST_PREP", None)
        else:
            os.environ["MJ_HOST_PREP"] = old
    with open(dst, "rb") as f:
        assert out == f.read()


def test_batched_arithmetic_byte_exact(testorig, tmp_path):
    """Arithmetic WITHOUT trellis rides the batched pipeline; the
    arithmetic TRELLIS (host-sequential adaptive rate snapshots) stays
    staged — both byte-identical to cjpeg for a multi-image batch."""
    if not have_reference():
        pytest.skip("no reference build")
    base = _batchable(testorig)
    imgs = [base, np.roll(base, 11, axis=1).copy(),
            np.roll(base, 23, axis=0).copy()]
    cfg = EncoderConfig(quality=75, arithmetic=True, trellis_quant=False)
    _assert_batched(base, cfg)
    outs = encode_many(imgs, cfg)
    for img, out in zip(imgs, outs):
        ref = _cjpeg(["-quality", "75", "-arithmetic", "-notrellis",
                      "-notrellis-dc"], img, tmp_path)
        assert out == ref
    # arith WITH trellis: correctly routed to the staged path, exact
    full = encode_many(imgs[:1], EncoderConfig(quality=75,
                                               arithmetic=True))[0]
    assert full == _cjpeg(["-quality", "75", "-arithmetic"], imgs[0],
                          tmp_path)


def test_batched_colorspaces_match_staged(testorig):
    """grayscale / rgb / cmyk / ycck ride the batched pipeline (r4)
    byte-identically to the staged path (whose colorspace outputs are
    pinned vs the reference-library harness in test_features.py)."""
    rng = np.random.default_rng(11)
    h, w = 59, 83
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                     ((yy + xx) * 4) % 256, (yy * 2) % 256],
                    -1).astype(float)
    cmyk = np.clip(base * 0.8 + rng.integers(0, 90, (h, w, 4)),
                   0, 255).astype(np.uint8)
    cases = [
        (dict(quality=75, grayscale=True), testorig[:56, :72].copy()),
        (dict(quality=75, colorspace="rgb", optimize_scans=False),
         cmyk[..., :3].copy()),
        (dict(quality=75, colorspace="cmyk", optimize_scans=False), cmyk),
        (dict(quality=75, colorspace="ycck", optimize_scans=False), cmyk),
    ]
    for kw, im in cases:
        cfg = EncoderConfig(**kw)
        batched = encode_many([im, im], cfg)
        old = os.environ.get("MJ_BATCH_MAX_MP")
        os.environ["MJ_BATCH_MAX_MP"] = "0"
        try:
            staged = encode_many([im], cfg)
        finally:
            if old is None:
                os.environ.pop("MJ_BATCH_MAX_MP", None)
            else:
                os.environ["MJ_BATCH_MAX_MP"] = old
        assert batched[0] == staged[0], kw
        assert batched[1] == staged[0], kw


def test_batched_scans_in_trellis_matches_staged(testorig):
    """use_scans_in_trellis rides the batched pipeline (r4): per-band
    stats regather sequentially like _phase_trellis; staged output is
    pinned vs the reference-library harness (TestTrellisFlags)."""
    base = _batchable(testorig)
    imgs = [base, np.roll(base, 5, axis=1).copy()]
    cfg = EncoderConfig(quality=75, use_scans_in_trellis=True)
    _assert_batched(base, cfg)
    batched = encode_many(imgs, cfg)
    old = os.environ.get("MJ_BATCH_MAX_MP")
    os.environ["MJ_BATCH_MAX_MP"] = "0"
    try:
        staged = encode_many(imgs, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_BATCH_MAX_MP", None)
        else:
            os.environ["MJ_BATCH_MAX_MP"] = old
    assert batched == staged
