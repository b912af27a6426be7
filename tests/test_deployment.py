"""Attachment-aware engine selection (r5, VERDICT r4 weak #1).

The device search/emission engines are no longer permanently-off: the
`deployment` knob (auto|local|remote) resolves them through the
attachment probe (utils/attachment.py), `deployment="local"` turns them
on outright, and scripts/engine_tradeoff.py measures their win condition
(host cores saturated).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from mozjpeg_tpu import EncoderConfig, encode_many


def test_deployment_resolution():
    r_local = EncoderConfig(quality=75, deployment="local").resolved()
    assert r_local.device_scanopt and r_local.device_entropy
    r_remote = EncoderConfig(quality=75, deployment="remote").resolved()
    assert not r_remote.device_scanopt and not r_remote.device_entropy
    # auto on the CPU test backend: no TPU attached -> remote-class
    r_auto = EncoderConfig(quality=75).resolved()
    assert not r_auto.device_scanopt and not r_auto.device_entropy


def test_deployment_env_override():
    old = os.environ.get("MJ_DEPLOYMENT")
    os.environ["MJ_DEPLOYMENT"] = "local"
    try:
        from mozjpeg_tpu.utils import attachment
        attachment.is_local_tpu.cache_clear()
        r = EncoderConfig(quality=75).resolved()
        assert r.device_scanopt and r.device_entropy
    finally:
        if old is None:
            os.environ.pop("MJ_DEPLOYMENT", None)
        else:
            os.environ["MJ_DEPLOYMENT"] = old
        from mozjpeg_tpu.utils import attachment
        attachment.is_local_tpu.cache_clear()


def test_local_routes_to_device_search(testorig):
    """deployment="local" actually takes the scanopt_dev batch path and
    the bytes match the host search."""
    import mozjpeg_tpu.codec.scanopt_dev as sd
    crop = np.ascontiguousarray(testorig[:96, :160])
    imgs = [crop, np.roll(crop, 9, axis=1).copy()]
    calls = []
    orig = sd.encode_batch_scans

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    sd.encode_batch_scans = spy
    try:
        dev = encode_many(imgs, EncoderConfig(quality=75,
                                              deployment="local"))
    finally:
        sd.encode_batch_scans = orig
    assert calls, "deployment='local' did not route to the device search"
    host = encode_many(imgs, EncoderConfig(quality=75,
                                           deployment="remote"))
    assert dev == host


@pytest.mark.skipif(os.environ.get("MJ_ENGINE_TRADEOFF") != "1",
                    reason="perf demonstration; needs a LOCALLY-attached "
                           "accelerator + MJ_ENGINE_TRADEOFF=1")
def test_engine_tradeoff_win_condition():
    """With host cores pinned busy, the device engines must win — on a
    LOCALLY-attached accelerator. Measured LOSE everywhere reachable
    from this environment (docs/perf_notes.md r5): CPU backend 15x (the
    "device" shares the saturated cores and does ~130 candidates of
    work vs the host's early-exit greedy), remote-tunnel TPU 10x (the
    per-scan transfer latency the engines were built to avoid on local
    attach). The auto-switch therefore only enables them when the
    attachment probe reports local (<2 ms sync)."""
    from mozjpeg_tpu.utils import attachment
    if not attachment.is_local_tpu():
        pytest.skip("no locally-attached accelerator (sync latency "
                    "%.1f ms)" % attachment.sync_latency_ms())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "engine_tradeoff.py")],
        capture_output=True, text=True)
    sys.stderr.write(r.stdout + r.stderr)
    assert r.returncode == 0, "device engines lost under saturated cores"


def test_local_decode_merged_upsample_on_device(testorig):
    """deployment local: decode_many renders merged upsample+color on
    device (the jdmerge analog, _render_ycc_batch) and downloads RGB
    directly — pixel-identical to the remote packed-planes + host-post
    path."""
    import mozjpeg_tpu as mj
    import mozjpeg_tpu.codec.decoder as D
    from mozjpeg_tpu.utils import attachment
    datas = mj.encode_many([testorig, np.roll(testorig, 5, axis=1).copy()],
                           EncoderConfig(quality=75))
    remote = mj.decode_many(datas)
    calls = []
    orig = D._render_ycc_batch

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    old = os.environ.get("MJ_DEPLOYMENT")
    os.environ["MJ_DEPLOYMENT"] = "local"
    attachment.is_local_tpu.cache_clear()
    D._render_ycc_batch = spy
    try:
        local = mj.decode_many(datas)
    finally:
        D._render_ycc_batch = orig
        if old is None:
            os.environ.pop("MJ_DEPLOYMENT", None)
        else:
            os.environ["MJ_DEPLOYMENT"] = old
        attachment.is_local_tpu.cache_clear()
    assert calls, "local deployment did not use the device merged render"
    for a, b in zip(remote, local):
        assert np.array_equal(a, b)
