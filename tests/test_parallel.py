"""Multi-device sharded encoding tests (8 virtual CPU devices)."""
import subprocess

import numpy as np
import jax
import pytest

from conftest import DJPEG, have_reference
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
