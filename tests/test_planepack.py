"""Sample-plane pack (ops/planepack.py + native/planepack.cpp): the
lossless per-16-sample-subtile width codec that moves prepped planes at
~0.6-1.0 B/px over the tunnel instead of 1.5 (r5, VERDICT r4 ask #3).

Four directions must agree bit-for-bit: host pack / host expand (C++),
device expand (encode upload), device pack (decode download)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mozjpeg_tpu.native import lib, u8p, u32p
from mozjpeg_tpu.ops import planepack


def _host_pack(s, nthreads=2):
    total = s.size
    nst = -(-total // planepack.T)
    widths = np.empty(nst, np.uint8)
    words = np.empty(nst * 4 + 4, np.uint32)
    nw = lib.mj_plane_pack(s.ctypes.data_as(u8p), total,
                           widths.ctypes.data_as(u8p),
                           words.ctypes.data_as(u32p), nthreads)
    return widths, words, int(nw), nst


def _host_expand(widths, words, nst, total):
    out = np.empty(total, np.uint8)
    rc = lib.mj_plane_expand(widths.ctypes.data_as(u8p),
                             np.ascontiguousarray(words)
                             .ctypes.data_as(u32p), nst, total,
                             out.ctypes.data_as(u8p))
    assert rc == 0
    return out


STREAMS = [
    ("noise", lambda rng: rng.integers(0, 256, 100000).astype(np.uint8)),
    ("flat", lambda rng: np.full(77777, 200, np.uint8)),
    ("ramp", lambda rng: (np.arange(55555) % 256).astype(np.uint8)),
    ("tiny", lambda rng: np.array([7], np.uint8)),
    ("edges", lambda rng: np.array([0, 255] * 333, np.uint8)),
    ("smooth", lambda rng: (128 + 60 * np.sin(
        np.arange(200000) / 97.0)).astype(np.uint8)),
    ("mixed", lambda rng: np.concatenate(
        [np.full(5000, 9, np.uint8),
         rng.integers(0, 256, 5000).astype(np.uint8),
         (np.arange(5000) // 7 % 256).astype(np.uint8)])),
]


@pytest.mark.parametrize("name,gen", STREAMS,
                         ids=[n for n, _ in STREAMS])
def test_four_way_roundtrip(name, gen):
    rng = np.random.default_rng(3)
    s = np.ascontiguousarray(gen(rng))
    total = s.size
    widths, words, nw, nst = _host_pack(s)
    # host -> host
    assert np.array_equal(_host_expand(widths, words, nst, total), s)
    # host pack -> device expand
    capw = max(nw, 1)
    dev = np.asarray(planepack.expand_stream(
        jnp.asarray(words[:capw]), jnp.asarray(widths.astype(np.int32)),
        total))
    assert np.array_equal(dev, s)
    # device pack == host pack, bit for bit
    wd, cd, nwd = planepack.pack_stream(jnp.asarray(s), nst, nst * 4 + 4)
    assert int(nwd) == nw
    assert np.array_equal(np.asarray(cd).astype(np.uint8), widths)
    assert np.array_equal(np.asarray(wd)[:nw], words[:nw])
    # device pack -> host expand
    assert np.array_equal(
        _host_expand(widths, np.asarray(wd)[:max(nw, 1)], nst, total), s)


def test_flat_buffer_base_offsets():
    """expand_stream with a base offset reads an image's payload out of
    a shared flat buffer (the batched upload layout)."""
    rng = np.random.default_rng(9)
    streams = [rng.integers(0, 256, 4096).astype(np.uint8)
               for _ in range(3)]
    packs = [_host_pack(np.ascontiguousarray(s)) for s in streams]
    flat = np.concatenate([w[:nw] for _, w, nw, _ in packs])
    base = 0
    for s, (widths, _, nw, nst) in zip(streams, packs):
        got = np.asarray(planepack.expand_stream(
            jnp.asarray(flat), jnp.asarray(widths.astype(np.int32)),
            s.size, base=jnp.int32(base)))
        assert np.array_equal(got, s)
        base += nw


def test_width_nibble_wire_layout():
    w = np.arange(19, dtype=np.uint8) % 9
    ww = planepack.widths_to_words_host(w)
    back = np.asarray(planepack._widths_from_words(jnp.asarray(ww), 19))
    assert np.array_equal(back, w)


def test_encode_upload_packed_byte_exact(testorig):
    """encode_many with the packed upload == plain host-prep upload."""
    from mozjpeg_tpu import EncoderConfig, encode_many
    imgs = [testorig, np.roll(testorig, 13, axis=1).copy()]
    olds = {k: os.environ.get(k) for k in ("MJ_HOST_PREP",
                                           "MJ_PLANEPACK")}
    try:
        os.environ["MJ_HOST_PREP"] = "1"
        os.environ["MJ_PLANEPACK"] = "0"
        a = encode_many(imgs, EncoderConfig(quality=75))
        os.environ["MJ_PLANEPACK"] = "1"
        b = encode_many(imgs, EncoderConfig(quality=75))
    finally:
        for k, v in olds.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert a == b


def test_decode_download_packed_exact(testorig):
    """decode_many with the packed download == raw-stack download, for
    rgb and yuv outputs."""
    from mozjpeg_tpu import EncoderConfig, decode_many, encode_many
    datas = encode_many([testorig, np.roll(testorig, 9, axis=1).copy()],
                        EncoderConfig(quality=75))
    old = os.environ.get("MJ_PLANEPACK")
    try:
        for output in ("rgb", "yuv"):
            os.environ["MJ_PLANEPACK"] = "0"
            a = decode_many(datas, output=output)
            os.environ["MJ_PLANEPACK"] = "1"
            b = decode_many(datas, output=output)
            for i in range(len(datas)):
                if output == "yuv":
                    assert all(np.array_equal(x, y)
                               for x, y in zip(a[i], b[i])), i
                else:
                    assert np.array_equal(a[i], b[i]), i
    finally:
        if old is None:
            os.environ.pop("MJ_PLANEPACK", None)
        else:
            os.environ["MJ_PLANEPACK"] = old
