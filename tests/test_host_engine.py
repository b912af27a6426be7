"""Host CPU engine (codec/host_engine + native/hostenc.cpp): the serial
low-latency path must be byte-identical to the device pipeline across the
mozjpeg config matrix.

`encode()` routes single images through the host engine when supported
(its FDCT/dering/trellis are scalar C++ twins of ops/dct.py,
ops/dering.py, codec/trellis.py). These tests diff it against the DEVICE
paths (MJ_HOST_ENGINE=0) — both are independently pinned against the
reference binaries elsewhere, so a pass here means three-way agreement.
"""
import os

import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode
from mozjpeg_tpu.codec import host_engine


def _routed(img, cfg):
    """The config must actually be in the host engine's matrix."""
    from mozjpeg_tpu.codec.encoder import (_CS_INFO, _qt_slots, _resolve)
    cfg_o, rcfg, cs, ncomps, samp, qt = _resolve(img, cfg, {})
    assert host_engine.supported(rcfg, cs), "config fell off host engine"
    assert _qt_slots(rcfg, cs, ncomps) == _CS_INFO[cs][0][:ncomps]


def _device(img, cfg):
    old = os.environ.get("MJ_HOST_ENGINE")
    os.environ["MJ_HOST_ENGINE"] = "0"
    try:
        return encode(img, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_HOST_ENGINE", None)
        else:
            os.environ["MJ_HOST_ENGINE"] = old


CFGS = [
    dict(quality=75),                                   # full default
    dict(quality=75, restart_in_rows=2),
    dict(quality=75, restart_interval=5),
    dict(quality=95, subsampling=(1, 1)),               # heavy dering
    dict(quality=75, subsampling=(2, 1)),
    dict(quality=75, optimize_scans=False),
    dict(quality=75, progressive=False, optimize_scans=False),
    dict(quality=75, trellis_quant=False),
    dict(quality=75, trellis_quant_dc=False),
    dict(quality=75, overshoot_deringing=False),
    dict(quality=75, optimize_coding=False, optimize_scans=False,
         progressive=False, trellis_quant=False),
    dict(quality=75, trellis_eob_opt=True, optimize_scans=False),
    dict(quality=75, use_scans_in_trellis=True, optimize_scans=False),
    dict(quality=75, trellis_num_loops=3, optimize_scans=False),
    dict(quality=75, trellis_q_opt=True, optimize_scans=False),
    dict(quality=75, trellis_delta_dc_weight=0.5, optimize_scans=False),
    dict(quality=75, quant_tbl_idx=0, lambda_log_scale1=9.0,
         lambda_log_scale2=0.0),                        # tune-psnr
    dict(quality=75, quant_tbl_idx=8, lambda_log_scale1=11.5,
         lambda_log_scale2=12.75),                      # tune-ms-ssim
    dict(quality=30),
    dict(quality=[75, 60]),                             # per-table quality
    dict(quality=75, trellis_eob_opt=True, use_scans_in_trellis=True,
         trellis_num_loops=2, optimize_scans=False),
]
IDS = ["default", "restart-rows", "restart5b", "q95-1x1", "2x1",
       "fastcrush", "seq-opt", "notrellis", "notrellis-dc", "noovershoot",
       "baseline-std", "eobopt", "bands", "loops3", "qopt", "dcweight",
       "tune-psnr", "tune-ms-ssim", "q30", "dual-quality",
       "eobopt-bands-loops2"]


@pytest.mark.parametrize("kw", CFGS, ids=IDS)
def test_host_engine_matches_device(testorig, kw):
    cfg = EncoderConfig(**kw)
    _routed(testorig, cfg)
    host = encode(testorig, cfg)
    dev = _device(testorig, cfg)
    assert host == dev, kw


def test_host_engine_grayscale(testorig):
    g2d = np.ascontiguousarray(testorig[:77, :101, 1])
    for kw in (dict(quality=75, grayscale=True),
               dict(quality=75, grayscale=True, gray_sample=(2, 2)),
               dict(quality=85, grayscale=True, gray_sample=(2, 1))):
        cfg = EncoderConfig(**kw)
        _routed(g2d, cfg)
        assert encode(g2d, cfg) == _device(g2d, cfg), kw
    # 3-channel input with grayscale=True (native Y conversion)
    rgb = np.ascontiguousarray(testorig[:61, :89])
    cfg = EncoderConfig(quality=75, grayscale=True)
    _routed(rgb, cfg)
    assert encode(rgb, cfg) == _device(rgb, cfg)


def test_host_engine_unsupported_falls_through(testorig):
    """Out-of-matrix configs silently take the device path (same bytes)."""
    from mozjpeg_tpu.codec.config import DCTMethod
    for kw in (dict(quality=75, dct_method=DCTMethod.IFAST),
               dict(quality=75, smoothing_factor=20)):
        cfg = EncoderConfig(**kw)
        from mozjpeg_tpu.codec.encoder import _resolve
        _, rcfg, cs, _, _, _ = _resolve(testorig, cfg, {})
        assert not host_engine.supported(rcfg, cs)
        assert encode(testorig, cfg) == _device(testorig, cfg), kw


def test_host_engine_sizes_sweep(testorig):
    """Dims sweep incl. 1-px edges through the host engine."""
    cfg = EncoderConfig(quality=75)
    for (h, w) in [(1, 1), (1, 64), (64, 1), (8, 8), (17, 31), (149, 227)]:
        img = np.ascontiguousarray(testorig[:h, :w])
        _routed(img, cfg)
        assert encode(img, cfg) == _device(img, cfg), (h, w)


ARITH_CFGS = [
    dict(quality=75, arithmetic=True, optimize_scans=False),
    dict(quality=75, arithmetic=True, restart_interval=4,
         optimize_scans=False),
    dict(quality=75, arithmetic=True, restart_in_rows=1,
         optimize_scans=False),
    dict(quality=75, arithmetic=True, use_scans_in_trellis=True,
         optimize_scans=False),
    dict(quality=75, arithmetic=True, trellis_num_loops=2,
         optimize_scans=False),
    dict(quality=75, arithmetic=True, progressive=False,
         optimize_scans=False),
    dict(quality=75, arithmetic=True, trellis_quant_dc=False,
         optimize_scans=False),
    dict(quality=92, subsampling=(1, 1), arithmetic=True,
         optimize_scans=False),
    dict(quality=75, arithmetic=True),          # full default (scan search)
]
ARITH_IDS = ["arith", "arith-rst4", "arith-rst-rows", "arith-bands",
             "arith-loops2", "arith-seq", "arith-nodc", "arith-q92",
             "arith-scansearch"]


@pytest.mark.parametrize("kw", ARITH_CFGS, ids=ARITH_IDS)
def test_host_engine_arith_trellis(testorig, kw):
    """r5: the arithmetic-coding trellis runs natively on host (the
    adaptive rate feedback is irreducibly row-serial — the coder trains
    on row k before row k+1's rates are snapshotted — so the device
    formulation paid one tunnel round trip per block row). Byte-exact
    vs the staged device path, which is itself pinned vs cjpeg."""
    cfg = EncoderConfig(**kw)
    _routed(testorig, cfg)
    assert encode(testorig, cfg) == _device(testorig, cfg), kw


def test_encode_many_routes_arith_trellis_to_host(testorig):
    """encode_many sends arith+trellis images (off the batched fast
    path) through the host engine on a thread pool, byte-exact."""
    import mozjpeg_tpu.codec.host_engine as he
    import mozjpeg_tpu as mj
    imgs = [testorig, np.roll(testorig, 7, axis=1).copy()]
    cfg = EncoderConfig(quality=75, arithmetic=True, optimize_scans=False)
    calls = []
    orig = he.encode_host

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    he.encode_host = spy
    try:
        batch = mj.encode_many(imgs, cfg)
    finally:
        he.encode_host = orig
    assert len(calls) == 2, "arith batch did not route to the host engine"
    old = os.environ.get("MJ_HOST_ENGINE")
    os.environ["MJ_HOST_ENGINE"] = "0"
    try:
        staged = mj.encode_many(imgs, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_HOST_ENGINE", None)
        else:
            os.environ["MJ_HOST_ENGINE"] = old
    assert batch == staged


def test_host_render_decode_matches_device(testorig, tmp_path):
    """r5 serial decode: the host render (native dequant+IDCT+post) is
    pixel-identical to the device render across the matrix; both are
    pinned bit-exact vs djpeg elsewhere."""
    import subprocess
    from conftest import CJPEG, have_reference
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.utils import ppm
    if not have_reference():
        pytest.skip("no reference build")
    src = str(tmp_path / "s.ppm")
    ppm.write(src, testorig)
    for args, kw in [ (["-quality", "75"], {}),
                      (["-quality", "92"], {}),
                      (["-quality", "85"], {}),
                      (["-quality", "75", "-grayscale"], {}),
                      (["-quality", "75"], dict(fancy_upsample=False)),
                      (["-revert", "-baseline", "-quality", "75"], {}),
                      (["-quality", "75", "-restart", "2",
                        "-fastcrush"], {}) ]:
        dst = str(tmp_path / "o.jpg")
        subprocess.run([CJPEG] + args + ["-outfile", dst, src],
                       check=True)
        data = open(dst, "rb").read()
        host = mj.decode(data, **kw)
        old = os.environ.get("MJ_HOST_ENGINE")
        os.environ["MJ_HOST_ENGINE"] = "0"
        try:
            dev = mj.decode(data, **kw)
        finally:
            if old is None:
                os.environ.pop("MJ_HOST_ENGINE", None)
            else:
                os.environ["MJ_HOST_ENGINE"] = old
        assert np.array_equal(host, dev), (args, kw)
