"""Device coefficient transport (ops/transport.py + mj_transport_decode):
the entropy-coded D2H replacing the sparse coefficient download."""
import numpy as np
import pytest

import jax.numpy as jnp

from mozjpeg_tpu.ops import transport


class G:
    def __init__(self, bh, bw):
        self.bh = bh
        self.bw = bw


def _roundtrip(planes_per_img, comps):
    """planes_per_img: per image list of per-comp (bh, bw, 64) int16."""
    b = len(planes_per_img)
    finals = []
    for ci, g in enumerate(comps):
        per_img = [p[ci].reshape(-1, 64).T for p in planes_per_img]
        finals.append(jnp.asarray(np.concatenate(per_img, axis=1)
                                  .reshape(64, -1)))
    # finals layout: (64, B*n_c) image-major per comp
    packed = transport.pack_batch(tuple(finals), comps, b)
    fetched = transport.fetch(packed)
    if fetched is None:
        return None
    words, bits = fetched
    return transport.decode_to_planes(words, bits, b, comps)


def _rand_planes(rng, comps, density=0.12, amp=40):
    out = []
    for g in comps:
        p = np.zeros((g.bh, g.bw, 64), np.int16)
        mask = rng.random((g.bh, g.bw, 64)) < density
        vals = rng.integers(-amp, amp + 1, (g.bh, g.bw, 64))
        p[mask] = vals[mask].astype(np.int16)
        p[:, :, 0] = rng.integers(-200, 200, (g.bh, g.bw))
        return_zero = rng.random((g.bh, g.bw)) < 0.1
        p[return_zero] = 0
        out.append(p)
    return out


@pytest.mark.parametrize("b", [1, 3])
def test_roundtrip_random(b):
    rng = np.random.default_rng(42 + b)
    comps = [G(8, 12), G(4, 6), G(4, 6)]
    imgs = [_rand_planes(rng, comps) for _ in range(b)]
    dec = _roundtrip(imgs, comps)
    assert dec is not None
    for i in range(b):
        for ci in range(3):
            np.testing.assert_array_equal(dec[i][ci], imgs[i][ci])


def test_roundtrip_extreme_values():
    """Magnitudes at the 8-bit limits (|v| = 1023), long zero runs
    needing 3 ZRLs, all-zero blocks, dense blocks near CAPR."""
    rng = np.random.default_rng(7)
    comps = [G(6, 6)]
    p = np.zeros((6, 6, 64), np.int16)
    p[0, 0, 0] = 1023
    p[0, 0, 63] = -1023                      # run of 62 -> 3 ZRLs
    p[0, 1] = 0                              # all-zero block
    p[0, 2, 0] = -1024
    p[0, 2, 1] = 1
    p[0, 2, 63] = -1
    p[1, 0, :48] = rng.integers(1, 1024, 48)   # dense: exactly CAPR nz
    p[1, 1, 0] = -1023
    p[2, 0, 16] = 5                          # run 15 exact (no ZRL)
    p[2, 1, 17] = 5                          # run 16 -> one ZRL, run 0
    p[2, 2, 33] = 5                          # run 32 -> two ZRLs
    dec = _roundtrip([[p]], comps)
    assert dec is not None
    np.testing.assert_array_equal(dec[0][0], p)


def test_overflow_dense_block():
    """A block with > CAPR nonzeros must flag overflow, not corrupt."""
    comps = [G(2, 2)]
    p = np.zeros((2, 2, 64), np.int16)
    p[0, 0, :] = 3                           # 63 AC nonzeros > CAPR
    b = len([p])
    finals = (jnp.asarray(p.reshape(-1, 64).T.reshape(64, -1)),)
    packed = transport.pack_batch(finals, comps, b)
    assert transport.fetch(packed) is None


def test_encode_many_transport_matches(ref_tools, testorig):
    """encode_many with the transport download is byte-identical to the
    sparse-download path (full mozjpeg default config)."""
    import os
    from mozjpeg_tpu import EncoderConfig, encode_many
    from mozjpeg_tpu.codec.encoder import _fast_ctx
    # crop to dummy-block-free dims: testorig's 227x149 is NOT batchable
    # and would silently test the staged path twice
    base = np.ascontiguousarray(testorig[:144, :224])
    imgs = [base, np.roll(base, 17, axis=1).copy()]
    cfg = EncoderConfig(quality=75)
    assert _fast_ctx(base, cfg, {}) is not None
    old = os.environ.get("MJ_COEF_TRANSPORT")
    try:
        os.environ["MJ_COEF_TRANSPORT"] = "0"
        ref = encode_many(imgs, cfg)
        os.environ["MJ_COEF_TRANSPORT"] = "1"
        got = encode_many(imgs, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_COEF_TRANSPORT", None)
        else:
            os.environ["MJ_COEF_TRANSPORT"] = old
    assert [len(x) for x in got] == [len(x) for x in ref]
    assert got == ref


def test_scap_retry_dense_batch(ref_tools, testorig):
    """A batch denser than the default per-block symbol bucket must
    repack at the big bucket (not fall to sparse) and stay
    byte-identical: q95 4:4:4-ish content exceeds SCAP=12 easily."""
    import os
    from mozjpeg_tpu import EncoderConfig, encode_many
    rng = np.random.default_rng(3)
    noisy = (testorig.astype(np.int32)
             + rng.integers(-28, 28, testorig.shape)).clip(0, 255) \
        .astype(np.uint8)
    cfg = EncoderConfig(quality=95)
    old = os.environ.get("MJ_COEF_TRANSPORT")
    try:
        os.environ["MJ_COEF_TRANSPORT"] = "0"
        ref = encode_many([noisy], cfg)
        os.environ["MJ_COEF_TRANSPORT"] = "1"
        got = encode_many([noisy], cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_COEF_TRANSPORT", None)
        else:
            os.environ["MJ_COEF_TRANSPORT"] = old
    assert got == ref


def test_fetch_speculative_undershoot():
    """When the running estimate guesses too small (stream larger than
    one TRIM_STEP bucket), the second exact transfer must return
    correct words (forced via the estimate cache)."""
    rng = np.random.default_rng(5)
    comps = [G(64, 96)]                      # big enough for >8192 words
    imgs = [_rand_planes(rng, comps, density=0.14, amp=50)]
    n_tot = comps[0].bh * comps[0].bw
    transport._EST_WORDS[n_tot] = 1          # force a one-bucket guess
    try:
        dec = _roundtrip(imgs, comps)
        # the run must actually have outgrown the first bucket
        assert transport._EST_WORDS[n_tot] > transport.TRIM_STEP
    finally:
        transport._EST_WORDS.pop(n_tot, None)
    assert dec is not None
    np.testing.assert_array_equal(dec[0][0], imgs[0][0])


def test_transport_12bit_roundtrip(testorig):
    """12-bit transport (r5): the extended-table pack/decode round-trips
    batched 12-bit coefficients exactly — encode_many with transport on
    equals the sparse-download path byte-for-byte (progressive+dering,
    unaligned dims)."""
    import os
    from mozjpeg_tpu import EncoderConfig, encode_many
    from mozjpeg_tpu.codec.encoder import _fast_ctx
    img12 = ((testorig[:51, :69].astype(np.uint16) << 4)
             | (testorig[:51, :69] >> 4))
    imgs = [img12, np.roll(img12, 7, axis=1).copy()]
    cfg = EncoderConfig(quality=75, precision=12, optimize_scans=False)
    assert _fast_ctx(img12, cfg, {}) is not None
    old = os.environ.get("MJ_COEF_TRANSPORT")
    try:
        os.environ["MJ_COEF_TRANSPORT"] = "0"
        ref = encode_many(imgs, cfg)
        os.environ["MJ_COEF_TRANSPORT"] = "1"
        got = encode_many(imgs, cfg)
    finally:
        if old is None:
            os.environ.pop("MJ_COEF_TRANSPORT", None)
        else:
            os.environ["MJ_COEF_TRANSPORT"] = old
    assert got == ref


def test_transport_12bit_pack_decode_direct():
    """Direct device-pack -> host-decode round trip at 12-bit magnitudes
    (values through +-16383, DC deltas through +-32766) — beyond the
    8-bit tables' symbol range."""
    import jax.numpy as jnp
    from mozjpeg_tpu.codec.pipeline import CompGeom
    rng = np.random.default_rng(7)
    bw, bh, b = 6, 4, 2
    n = bw * bh
    vals = np.zeros((b * n, 64), np.int16)
    # sparse-ish blocks with extreme magnitudes
    for blk in range(b * n):
        idx = rng.choice(63, size=8, replace=False) + 1
        vals[blk, idx] = rng.integers(-16383, 16384, size=8)
    vals[:, 0] = rng.integers(-16383, 16384, size=b * n)
    g = CompGeom(h=1, v=1, bw=bw, bh=bh, bw_pad=bw, bh_pad=bh,
                 w=bw * 8, hgt=bh * 8)
    comps = [g]
    finals = (jnp.asarray(
        vals.reshape(b, n, 64).transpose(2, 0, 1).reshape(64, b * n)),)
    from mozjpeg_tpu.ops import transport
    packed = transport.pack_batch(finals, comps, b, scap=32, precision=12)
    fetched = transport.fetch(packed)
    assert fetched is not None, "12-bit pack overflowed unexpectedly"
    words, bits = fetched
    images = transport.decode_to_planes(words, bits, b, comps,
                                        precision=12)
    assert images is not None
    for i in range(b):
        got = images[i][0].reshape(n, 64)
        assert np.array_equal(got, vals[i * n:(i + 1) * n]), i
