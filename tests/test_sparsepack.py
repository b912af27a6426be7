"""Sparse coefficient download: pack/expand round trip + encoder parity."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mozjpeg_tpu import EncoderConfig, encode, encode_many
from mozjpeg_tpu.ops import sparsepack
from mozjpeg_tpu.utils import ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roundtrip_random():
    rng = np.random.default_rng(5)
    from mozjpeg_tpu.codec.pipeline import CompGeom
    b = 3
    comps = [CompGeom(2, 2, 128, 64, 16, 8, 16, 8),
             CompGeom(1, 1, 64, 32, 8, 4, 8, 4),
             CompGeom(1, 1, 64, 32, 8, 4, 8, 4)]
    finals = []
    refs = []
    for g in comps:
        n = g.bh * g.bw
        a = np.zeros((b, n, 64), np.int16)
        for i in range(b):
            for blk in range(n):
                k = rng.integers(0, 20)
                pos = rng.choice(64, k, replace=False)
                a[i, blk, pos] = rng.integers(-1024, 1024, k)
        refs.append(a)
        finals.append(jnp.asarray(
            a.transpose(2, 0, 1).reshape(64, b * n)))
    buf_dev, nt, n_tot, cap = sparsepack.pack_planes(tuple(finals), comps, b)
    images = sparsepack.expand_to_planes(np.asarray(buf_dev), nt, n_tot,
                                         b, comps, cap)
    assert images is not None
    for i in range(b):
        for ci, g in enumerate(comps):
            got = images[i][ci].reshape(-1, 64)
            want = refs[ci][i]
            assert np.array_equal(got, want), (i, ci)


def test_overflow_flags():
    from mozjpeg_tpu.codec.pipeline import CompGeom
    comps = [CompGeom(1, 1, 64, 64, 8, 8, 8, 8)]
    n = 64
    a = np.ones((1, n, 64), np.int16) * 7        # 64 nonzeros per block
    finals = (jnp.asarray(a.transpose(2, 0, 1).reshape(64, n)),)
    buf_dev, nt, n_tot, cap = sparsepack.pack_planes(finals, comps, 1, 128)
    assert sparsepack.expand_to_planes(np.asarray(buf_dev), nt, n_tot,
                                       1, comps, 128) is None


def test_encoder_parity_sparse_vs_dense():
    imgs = [ppm.read(os.path.join(
        REPO, "corpus", "kodak_like_768x512_%d.ppm" % i)) for i in (1, 2)]
    a = encode_many(imgs, EncoderConfig(quality=75, sparse_download=True,
                                        device_scanopt=False))
    b = [encode(img, EncoderConfig(quality=75, sparse_download=False,
                                   device_scanopt=False)) for img in imgs]
    assert a == b


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
