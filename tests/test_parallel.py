"""Multi-device sharded encoding tests (8 virtual CPU devices)."""
import os
import subprocess

import numpy as np
import jax
import pytest

from conftest import CORPUS, DJPEG, have_reference
from mozjpeg_tpu.parallel import batch as pbatch
from mozjpeg_tpu.utils import ppm


def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (32, 32, 64)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_batch_encode_sharded(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    # structured gradient content (noise compresses badly at q75)
    yy, xx = np.mgrid[0:64, 0:96]
    imgs = np.stack([((yy * 2 + xx + 7 * i) % 256).astype(np.uint8)
                     for i in range(8)])
    imgs = np.repeat(imgs[..., None], 3, axis=-1)
    outs = pbatch.encode_batch(imgs, quality=75)
    assert len(outs) == 8
    # shared tables: every file decodes correctly via the reference djpeg
    if have_reference():
        for i, data in enumerate(outs):
            p = tmp_path / ("b%d.jpg" % i)
            p.write_bytes(data)
            out = tmp_path / ("b%d.ppm" % i)
            r = subprocess.run([DJPEG, "-outfile", str(out), str(p)],
                               capture_output=True)
            assert r.returncode == 0, r.stderr
            dec = ppm.read(str(out))
            assert dec.shape == (64, 96, 3)
            err = np.abs(dec.astype(int) - imgs[i].astype(int)).mean()
            assert err < 12.0
    # determinism: same batch encodes identically
    outs2 = pbatch.encode_batch(imgs, quality=75)
    assert outs == outs2


class TestRowSharded:
    """iMCU-row sharding of one image over the mesh (parallel/rows.py):
    byte-exact vs the single-device encoder with the same restart config."""

    def _single(self, im, q, rr):
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig, Profile
        return mj.encode(im, EncoderConfig(
            quality=q, profile=Profile.FASTEST, progressive=False,
            optimize_coding=True, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False, restart_in_rows=rr))

    @pytest.mark.parametrize("h,w,q,rr", [
        (256, 256, 75, 1),      # 16 iMCU rows over 8 devices
        (250, 200, 85, 1),      # odd height: dummy rows + chroma row fix
        (256, 100, 75, 2),      # restart every 2 rows, dummy columns
        (244, 333, 60, 1),      # even-but-unaligned height (chroma pad)
    ])
    def test_byte_exact(self, h, w, q, rr):
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from mozjpeg_tpu.parallel import rows
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:h, 0:w]
        im = np.stack([(yy * 3 + xx) % 256, (yy + xx * 2) % 256,
                       (yy * 2 + xx * 5) % 256], axis=-1).astype(np.uint8)
        im = np.clip(im.astype(int)
                     + rng.integers(-8, 8, im.shape), 0, 255).astype(np.uint8)
        out = rows.encode_row_sharded(im, quality=q, restart_rows=rr)
        assert out == self._single(im, q, rr)

    def test_djpeg_decodes(self, tmp_path):
        if not have_reference():
            pytest.skip("reference not built")
        from mozjpeg_tpu.parallel import rows
        yy, xx = np.mgrid[0:128, 0:160]
        im = np.repeat((((yy + xx) // 2) % 256).astype(np.uint8)[..., None],
                       3, axis=-1)
        data = rows.encode_row_sharded(im, quality=90)
        p = tmp_path / "r.jpg"
        p.write_bytes(data)
        o = tmp_path / "r.ppm"
        r = subprocess.run([DJPEG, "-outfile", str(o), str(p)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        dec = ppm.read(str(o))
        assert np.abs(dec.astype(int) - im.astype(int)).mean() < 6.0


class TestRowShardedTrellis:
    """Full mozjpeg-quality trellis encode sharded over iMCU rows
    (parallel/rows.py encode_row_sharded_trellis): AC+DC trellis with
    psum'd rate statistics, byte-exact vs the single-device encoder."""

    def _single(self, im, q, rr):
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig
        return mj.encode(im, EncoderConfig(
            quality=q, progressive=False, optimize_scans=False,
            trellis_quant=True, overshoot_deringing=True,
            optimize_coding=True, restart_in_rows=rr))

    @pytest.mark.parametrize("h,w,q,rr", [
        (256, 256, 75, 1),
        (250, 201, 85, 1),      # odd dims: dummy rows/cols + stat masking
        (128, 160, 60, 2),
    ])
    def test_byte_exact(self, h, w, q, rr):
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from mozjpeg_tpu.parallel import rows
        rng = np.random.default_rng(5)
        yy, xx = np.mgrid[0:h, 0:w]
        im = np.stack([(yy * 2 + xx) % 256, (yy + xx * 3) % 256,
                       (yy * 5 + xx * 2) % 256], axis=-1).astype(np.uint8)
        im = np.clip(im.astype(int) + rng.integers(-6, 7, im.shape),
                     0, 255).astype(np.uint8)
        out = rows.encode_row_sharded_trellis(im, quality=q,
                                              restart_rows=rr)
        assert out == self._single(im, q, rr)

    @pytest.mark.parametrize("h,w,q,rr", [(256, 224, 75, 1),
                                          (250, 201, 85, 1)])
    def test_progressive_byte_exact(self, h, w, q, rr):
        """Progressive 9-scan script + trellis, row-sharded: per-scan
        stats psum (AC-refine EOBn bins via the host flush schedule) and
        per-scan segment packing, byte-exact vs single-device."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig
        from mozjpeg_tpu.parallel import rows
        rng = np.random.default_rng(11)
        yy, xx = np.mgrid[0:h, 0:w]
        im = np.stack([(yy + xx * 2) % 256, (yy * 3 + xx) % 256,
                       (yy * 2 + xx * 7) % 256], axis=-1).astype(np.uint8)
        im = np.clip(im.astype(int) + rng.integers(-5, 6, im.shape),
                     0, 255).astype(np.uint8)
        out = rows.encode_row_sharded_progressive(im, quality=q,
                                                  restart_rows=rr)
        ref = mj.encode(im, EncoderConfig(
            quality=q, progressive=True, optimize_scans=False,
            trellis_quant=True, overshoot_deringing=True,
            optimize_coding=True, restart_in_rows=rr))
        assert out == ref

    @pytest.mark.parametrize("h,w,q,rr", [(256, 224, 75, 1),
                                          (250, 201, 80, 2)])
    def test_scanopt_full_default_byte_exact(self, h, w, q, rr):
        """THE FLAGSHIP CONFIG row-sharded: progressive + AC/DC trellis +
        deringing + jpegrescan optimize_scans; candidate sizes sum over
        shards, the greedy selection replays identically, winners stitch
        from shard parts — byte-exact vs the single-device full-default
        encoder (= cjpeg default with -restart N)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig
        from mozjpeg_tpu.parallel import rows
        rng = np.random.default_rng(13)
        yy, xx = np.mgrid[0:h, 0:w]
        im = np.stack([(yy * 2 + xx * 3) % 256, (yy + xx) % 256,
                       (yy * 4 + xx * 5) % 256], axis=-1).astype(np.uint8)
        im = np.clip(im.astype(int) + rng.integers(-5, 6, im.shape),
                     0, 255).astype(np.uint8)
        out = rows.encode_row_sharded_scanopt(im, quality=q,
                                              restart_rows=rr)
        ref = mj.encode(im, EncoderConfig(quality=q, restart_in_rows=rr))
        assert out == ref

    @pytest.mark.parametrize("mode,samp", [
        ("baseline", (2, 1)), ("baseline", (1, 1)), ("baseline", "gray"),
        ("trellis", (2, 1)), ("trellis", "gray"),
        ("progressive", (1, 1)), ("progressive", "gray"),
    ])
    def test_samplings(self, mode, samp):
        """Row-sharded encoders across 4:2:2 / 4:4:4 / grayscale."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig, Profile
        from mozjpeg_tpu.parallel import rows
        yy, xx = np.mgrid[0:200, 0:173]
        im = np.stack([(yy + xx) % 256, (yy * 2 + xx) % 256,
                       (yy + xx * 3) % 256], axis=-1).astype(np.uint8)
        sp = (2, 2) if samp == "gray" else samp
        if samp == "gray":
            im = im[..., 0]
        kw = dict(quality=78, restart_rows=1, subsampling=sp)
        base = dict(quality=78, restart_in_rows=1, subsampling=sp,
                    optimize_scans=False, optimize_coding=True)
        if mode == "baseline":
            out = rows.encode_row_sharded(im, **kw)
            ref = mj.encode(im, EncoderConfig(
                profile=Profile.FASTEST, progressive=False,
                trellis_quant=False, overshoot_deringing=False, **base))
        elif mode == "trellis":
            out = rows.encode_row_sharded_trellis(im, **kw)
            ref = mj.encode(im, EncoderConfig(
                progressive=False, trellis_quant=True,
                overshoot_deringing=True, **base))
        else:
            out = rows.encode_row_sharded_progressive(im, **kw)
            ref = mj.encode(im, EncoderConfig(
                progressive=True, trellis_quant=True,
                overshoot_deringing=True, **base))
        assert out == ref

    def test_unaligned_restart_and_stats_segments(self):
        """Regressions from review: restart_rows not dividing mcus_y falls
        back to a single shard instead of crashing; dummy rows sharing a
        stats segment with real rows (rr=2, odd real bh) stay byte-exact;
        unsupported sampling factors raise."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig, Profile
        from mozjpeg_tpu.parallel import rows
        yy, xx = np.mgrid[0:248, 0:160]
        im = np.stack([(yy + xx) % 256] * 3, axis=-1).astype(np.uint8)
        out = rows.encode_row_sharded_trellis(im, quality=75,
                                              restart_rows=2)
        ref = mj.encode(im, EncoderConfig(
            quality=75, progressive=False, optimize_scans=False,
            trellis_quant=True, overshoot_deringing=True,
            optimize_coding=True, restart_in_rows=2))
        assert out == ref
        out = rows.encode_row_sharded(im[:256], quality=75, restart_rows=3)
        ref = mj.encode(im[:256], EncoderConfig(
            quality=75, profile=Profile.FASTEST, progressive=False,
            optimize_coding=True, optimize_scans=False,
            trellis_quant=False, overshoot_deringing=False,
            restart_in_rows=3))
        assert out == ref
        with pytest.raises(NotImplementedError):
            rows.encode_row_sharded(im, subsampling=(1, 2))


class TestRowShardedRealSizes:
    """Row sharding at production sizes (VERDICT: replace toy widths):
    Kodak 768x512 through the full trellis/progressive paths and HD
    1920x1080 baseline, with remainder rows (1080 = 67.5 iMCU rows) and
    restart seams, byte-exact vs the single-device encoders."""

    def _kodak(self):
        from mozjpeg_tpu.utils import ppm as _ppm
        return _ppm.read(os.path.join(CORPUS, "kodak_like_768x512_1.ppm"))

    def test_kodak_baseline_byte_exact(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig, Profile
        from mozjpeg_tpu.parallel import rows
        im = self._kodak()          # 512 rows = 32 iMCU rows / 8 devices
        out = rows.encode_row_sharded(im, quality=75, restart_rows=1)
        ref = mj.encode(im, EncoderConfig(
            quality=75, profile=Profile.FASTEST, progressive=False,
            optimize_coding=True, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False, restart_in_rows=1))
        assert out == ref

    def test_kodak_trellis_progressive_byte_exact(self):
        """The flagship mozjpeg path (progressive 9-scan + AC/DC trellis
        + dering) row-sharded at Kodak size."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig
        from mozjpeg_tpu.parallel import rows
        im = self._kodak()
        out = rows.encode_row_sharded_progressive(im, quality=75,
                                                  restart_rows=1)
        ref = mj.encode(im, EncoderConfig(
            quality=75, progressive=True, optimize_scans=False,
            trellis_quant=True, overshoot_deringing=True,
            optimize_coding=True, restart_in_rows=1))
        assert out == ref

    def test_hd_remainder_rows_byte_exact(self):
        """1920x1080: 67.5 iMCU rows -> 68 with a replicated bottom band;
        68 % 8 != 0 so the mesh shrinks to 4 shards of 17 rows each —
        remainder handling at realistic scale."""
        if len(jax.devices()) < 4:
            pytest.skip("needs multiple devices")
        import mozjpeg_tpu as mj
        from mozjpeg_tpu.codec.config import EncoderConfig, Profile
        from mozjpeg_tpu.parallel import rows
        from mozjpeg_tpu.utils import ppm as _ppm
        im = _ppm.read(os.path.join(CORPUS, "hd_1920x1080.ppm"))
        out = rows.encode_row_sharded(im, quality=80, restart_rows=1)
        ref = mj.encode(im, EncoderConfig(
            quality=80, profile=Profile.FASTEST, progressive=False,
            optimize_coding=True, optimize_scans=False, trellis_quant=False,
            overshoot_deringing=False, restart_in_rows=1))
        assert out == ref
