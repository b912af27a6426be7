"""Sparse coefficient download: exact pack/expand round trip + parity."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mozjpeg_tpu import EncoderConfig, encode, encode_many
from mozjpeg_tpu.ops import sparsepack
from mozjpeg_tpu.utils import ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _random_finals(rng, comps, b, max_nz=20):
    """JPEG-shaped coefficients: mostly small AC values with a sprinkle
    of escape-range magnitudes (DC terms), incl. the int8 edge values
    -127/-128-adjacent and the escape marker boundary."""
    finals, refs = [], []
    for g in comps:
        n = g.bh * g.bw
        a = np.zeros((b, n, 64), np.int16)
        for i in range(b):
            for blk in range(n):
                k = rng.integers(0, max_nz)
                pos = rng.choice(64, k, replace=False)
                small = rng.integers(-127, 128, k)
                big = rng.integers(-1024, 1024, k)
                vals = np.where(rng.random(k) < 0.85, small, big)
                vals[vals == 0] = 1
                a[i, blk, pos] = vals
            # edge cases: exactly -127, -128, 127, 128
            a[i, blk, :4] = [-127, -128, 127, 128]
        refs.append(a)
        finals.append(jnp.asarray(
            a.transpose(2, 0, 1).reshape(64, b * n)))
    return tuple(finals), refs


def test_exact_roundtrip_random():
    """pack_planes_exact -> header+trimmed values -> host expand must
    reproduce every plane, with empty blocks, empty trailing blocks and
    dense blocks mixed in."""
    rng = np.random.default_rng(5)
    from mozjpeg_tpu.codec.pipeline import CompGeom
    b = 3
    comps = [CompGeom(2, 2, 128, 64, 16, 8, 16, 8),
             CompGeom(1, 1, 64, 32, 8, 4, 8, 4),
             CompGeom(1, 1, 64, 32, 8, 4, 8, 4)]
    finals, refs = _random_finals(rng, comps, b)
    header_dev, words_dev, nt, n_tot = sparsepack.pack_planes_exact(
        finals, comps, b)
    fetched = sparsepack.fetch_exact(header_dev, words_dev, nt)
    assert fetched is not None
    masks, lo, esc, total = fetched
    assert total == sum(int((r != 0).sum()) for r in refs)
    images = sparsepack.expand_flat_to_planes(masks, lo, esc, nt, n_tot,
                                              b, comps)
    assert images is not None
    for i in range(b):
        for ci, g in enumerate(comps):
            got = images[i][ci].reshape(-1, 64)
            assert np.array_equal(got, refs[ci][i]), (i, ci)


def test_exact_trim_sizes():
    """The value download is sized by the actual nonzero count: a nearly
    empty corpus must trim to the smallest bucket."""
    from mozjpeg_tpu.codec.pipeline import CompGeom
    comps = [CompGeom(1, 1, 512, 64, 64, 8, 64, 8)]
    n = 512
    a = np.zeros((1, n, 64), np.int16)
    a[0, 0, 5] = 7
    finals = (jnp.asarray(a.transpose(2, 0, 1).reshape(64, n)),)
    header_dev, words_dev, nt, n_tot = sparsepack.pack_planes_exact(
        finals, comps, 1)
    masks, lo, esc, total = sparsepack.fetch_exact(header_dev, words_dev,
                                                   nt)
    assert total == 1
    assert len(lo) <= 4 * sparsepack.TRIM_WORDS_STEP
    out = sparsepack.expand_flat_to_planes(masks, lo, esc, nt, n_tot, 1,
                                           comps)
    assert out[0][0][0, 0, 5] == 7 and int(np.abs(out[0][0]).sum()) == 7


def test_exact_overflow_flags():
    """A block denser than CAP_BLOCK flags overflow -> dense fallback."""
    from mozjpeg_tpu.codec.pipeline import CompGeom
    comps = [CompGeom(1, 1, 64, 64, 8, 8, 8, 8)]
    n = 64
    a = np.ones((1, n, 64), np.int16) * 7        # 64 nonzeros per block
    finals = (jnp.asarray(a.transpose(2, 0, 1).reshape(64, n)),)
    header_dev, words_dev, nt, n_tot = sparsepack.pack_planes_exact(
        finals, comps, 1)
    assert sparsepack.fetch_exact(header_dev, words_dev, nt) is None


def test_encoder_parity_sparse_vs_dense():
    imgs = [ppm.read(os.path.join(
        REPO, "corpus", "kodak_like_768x512_%d.ppm" % i)) for i in (1, 2)]
    a = encode_many(imgs, EncoderConfig(quality=75, sparse_download=True,
                                        device_scanopt=False))
    b = [encode(img, EncoderConfig(quality=75, sparse_download=False,
                                   device_scanopt=False)) for img in imgs]
    assert a == b


def test_decode_upload_roundtrip():
    """Decode-side host pack -> device expand (pack_host/expand_dev)."""
    rng = np.random.default_rng(9)
    n = 128
    a = np.zeros((n, 64), np.int16)
    for blk in range(n):
        k = rng.integers(0, 18)
        pos = rng.choice(64, k, replace=False)
        a[blk, pos] = rng.integers(-1024, 1024, k)
    packed = sparsepack.pack_host(a)
    assert packed is not None
    masks, vals, nt, cap_sb = packed
    dense = np.asarray(sparsepack.expand_dev(
        jnp.asarray(masks), jnp.asarray(vals), nt, cap_sb))
    assert np.array_equal(dense[:, :n].T, a)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
