"""Runtime-band device scan kernels vs the host entropy engine."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mozjpeg_tpu.codec.scans import ScanInfo
from mozjpeg_tpu.entropy import encode as entenc
from mozjpeg_tpu.entropy.huffman import derive_codes
from mozjpeg_tpu.ops import scanopt_kernels as sk
from mozjpeg_tpu.ops import bitpack, tablegen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _real_planes():
    from mozjpeg_tpu.utils import ppm
    from mozjpeg_tpu.codec import encoder as E, pipeline_t
    from mozjpeg_tpu import EncoderConfig
    img = ppm.read(os.path.join(REPO, "corpus", "kodak_like_768x512_1.ppm"))
    cfg_o, cfg, cs, ncomps, samp, qt = E._resolve(img, EncoderConfig(), {})
    geom, comp_res, small = E._phase_p1(img, cfg, samp, qt, cs)
    finals = E._phase_trellis(geom, comp_res, small, cfg, qt, cs)
    flat = E._phase_pack(geom, finals)
    planes = E._split_flat(geom, np.asarray(flat))
    return geom, planes


GEOM, PLANES = None, None


def _get_planes():
    global GEOM, PLANES
    if PLANES is None:
        GEOM, PLANES = _real_planes()
    return GEOM, PLANES


def _host_scan(scan, geom, planes):
    """Host gather + optimal table + emission for one single-comp scan."""
    sg = entenc.ScanGeometry(scan, geom, planes)
    _, dcc, acc = entenc.encode_scan(sg, {0: 0, 1: 1, 2: 1},
                                     {0: 0, 1: 1, 2: 1}, {}, {}, 0,
                                     gather=True)
    t = 0 if scan.comps[0] == 0 else 1
    tbl = entenc.gen_optimal_table(acc[t].copy())
    data, _, _ = entenc.encode_scan(sg, {0: 0, 1: 1, 2: 1},
                                    {0: 0, 1: 1, 2: 1}, {}, {t: tbl}, 0)
    return acc[t][:256], tbl, data


def _plane_t(planes, ci, geom):
    """(bh, bw, 64) host plane -> (64, n) device layout, real blocks."""
    g = geom[2][ci]
    p = planes[ci][:g.bh, :g.bw].reshape(g.bh * g.bw, 64)
    return jnp.asarray(p.T.astype(np.int16))


AC_FIRST_CASES = [(0, 1, 8, 0), (0, 9, 63, 0), (0, 1, 63, 2), (0, 1, 2, 1),
                  (0, 19, 63, 3), (1, 1, 8, 1), (2, 9, 63, 0), (1, 1, 63, 0),
                  (2, 1, 18, 2)]


@pytest.mark.parametrize("ci,Ss,Se,Al", AC_FIRST_CASES)
def test_ac_first_matches_host(ci, Ss, Se, Al):
    geom, planes = _get_planes()
    scan = ScanInfo((ci,), Ss, Se, 0, Al)
    acc, tbl, host_bytes = _host_scan(scan, geom, planes)

    pt = _plane_t(planes, ci, geom)
    syms = sk.ac_first_symbolize_rt(pt, jnp.int32(Ss), jnp.int32(Se),
                                    jnp.int32(Al))
    hist_d = np.asarray(syms.hist)
    assert np.array_equal(hist_d, acc.astype(np.int64)), \
        "gather histogram mismatch"

    # device tablegen must equal host optimal table
    f = np.zeros((1, 257), np.int32)
    f[0, :256] = hist_d
    bits_d, vals_d, ok = tablegen.gen_optimal_tables_t(jnp.asarray(f))
    co_d, si_d = tablegen.derive_codes_t(bits_d, vals_d)
    co_h, si_h = derive_codes(tbl)
    assert np.array_equal(np.asarray(co_d)[0], co_h)
    assert np.array_equal(np.asarray(si_d)[0], si_h.astype(np.int32))

    n = pt.shape[1]
    nwords = -(-(n * (30 + 63 * 26 + 48) + 64) // 32) + 2
    words, bits = sk.ac_first_pack_from_syms(syms, co_d[0], si_d[0], nwords)
    got = bitpack._finish_segments(np.asarray(words)[None],
                                   np.asarray(bits)[None], False)
    assert got == host_bytes, "packed bytes mismatch"
    # exact stuffed size
    sz = int(np.asarray(sk.stuffed_size(words, bits)))
    assert sz == len(host_bytes)


AC_REFINE_CASES = [(0, 1, 63, 1), (0, 1, 63, 2), (1, 1, 63, 0),
                   (2, 1, 63, 1), (0, 1, 8, 1), (0, 9, 63, 2)]


@pytest.mark.parametrize("ci,Ss,Se,Al", AC_REFINE_CASES)
def test_ac_refine_matches_host(ci, Ss, Se, Al):
    geom, planes = _get_planes()
    scan = ScanInfo((ci,), Ss, Se, Al + 1, Al)
    sg = entenc.ScanGeometry(scan, geom, planes)
    _, _, acc = entenc.encode_scan(sg, {0: 0, 1: 1, 2: 1},
                                   {0: 0, 1: 1, 2: 1}, {}, {}, 0,
                                   gather=True)
    t = 0 if ci == 0 else 1
    tbl = entenc.gen_optimal_table(acc[t].copy())
    host_bytes, _, _ = entenc.encode_scan(sg, {0: 0, 1: 1, 2: 1},
                                          {0: 0, 1: 1, 2: 1}, {}, {t: tbl},
                                          0)

    pt = _plane_t(planes, ci, geom)
    syms = sk.ac_refine_symbolize_rt(pt, jnp.int32(Ss), jnp.int32(Se),
                                     jnp.int32(Al))
    sched = sk.ac_refine_schedule_dev(syms.e, syms.br, syms.ev)
    hist_d = np.asarray(sk.ac_refine_hist_rt(syms, sched))
    assert np.array_equal(hist_d, acc[t][:256].astype(np.int64)), \
        "refine gather histogram mismatch"

    co_h, si_h = derive_codes(tbl)
    n = pt.shape[1]
    nwords = -(-(n * (30 + 1001 + 63 * 26 + 48 + 30)) // 32) + 34
    words, bits = sk.ac_refine_pack_from_syms(
        syms, sched, jnp.asarray(co_h.astype(np.uint32)),
        jnp.asarray(si_h.astype(np.int32)), nwords)
    got = bitpack._finish_segments(np.asarray(words)[None],
                                   np.asarray(bits)[None], False)
    assert got == host_bytes, "refine packed bytes mismatch"


def test_ac_refine_be_forced_flush():
    """Synthetic plane driving the BE > 937 forced flush (long EOB run of
    blocks whose history coefficients keep buffering correction bits)."""
    rng = np.random.default_rng(11)
    n = 120
    plane = np.zeros((64, n), np.int16)
    # every block: many |coef| > 1 (prevnz under Al=1), no newly-nonzero
    for b in range(n):
        k = rng.integers(30, 60)
        pos = rng.choice(np.arange(1, 64), k, replace=False)
        plane[pos, b] = rng.choice([2, 3, -2, -3, 4, 5], k)
    # a few symbol-bearing blocks to create flushes
    for b in (0, 57, n - 1):
        plane[5, b] = 1 if b != 57 else -1   # |coef|>>0 == 1 -> newly at Al=0
    _refine_vs_host(plane, Ss=1, Se=63, Al=0)


def test_ac_refine_eobrun_edges():
    """All-zero tails, empty band, single-block scans."""
    plane = np.zeros((64, 40), np.int16)
    plane[3, 0] = 1
    plane[63, 39] = -1
    _refine_vs_host(plane, 1, 63, 0)
    _refine_vs_host(np.zeros((64, 17), np.int16), 1, 63, 0)
    first = np.zeros((64, 17), np.int16)
    first[1, 0] = 7
    first[63, 16] = -255
    _first_vs_host(first, 1, 63, 0)
    _first_vs_host(np.zeros((64, 9), np.int16), 5, 12, 1)


def _fake_geom(n):
    from mozjpeg_tpu.codec.pipeline import CompGeom
    g = CompGeom(h=1, v=1, w=n * 8, hgt=8, bw=n, bh=1, bw_pad=n, bh_pad=1)
    return (n, 1, [g])


def _refine_vs_host(plane, Ss, Se, Al):
    n = plane.shape[1]
    geom = _fake_geom(n)
    planes = [plane.T.reshape(1, n, 64).astype(np.int16)]
    scan = ScanInfo((0,), Ss, Se, Al + 1, Al)
    sg = entenc.ScanGeometry(scan, geom, planes)
    _, _, acc = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, {}, 0,
                                   gather=True)
    if acc[0].any():
        tbl = entenc.gen_optimal_table(acc[0].copy())
        tables = {0: tbl}
        co_h, si_h = derive_codes(tbl)
    else:
        pytest.skip("no symbols in synthetic refine scan")
    host_bytes, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, tables, 0)

    pt = jnp.asarray(plane)
    syms = sk.ac_refine_symbolize_rt(pt, jnp.int32(Ss), jnp.int32(Se),
                                     jnp.int32(Al))
    sched = sk.ac_refine_schedule_dev(syms.e, syms.br, syms.ev)
    hist_d = np.asarray(sk.ac_refine_hist_rt(syms, sched))
    assert np.array_equal(hist_d, acc[0][:256].astype(np.int64))
    nwords = -(-(n * (30 + 1001 + 63 * 26 + 48 + 30)) // 32) + 34
    words, bits = sk.ac_refine_pack_from_syms(
        syms, sched, jnp.asarray(co_h.astype(np.uint32)),
        jnp.asarray(si_h.astype(np.int32)), nwords)
    got = bitpack._finish_segments(np.asarray(words)[None],
                                   np.asarray(bits)[None], False)
    assert got == host_bytes


def _first_vs_host(plane, Ss, Se, Al):
    n = plane.shape[1]
    geom = _fake_geom(n)
    planes = [plane.T.reshape(1, n, 64).astype(np.int16)]
    scan = ScanInfo((0,), Ss, Se, 0, Al)
    sg = entenc.ScanGeometry(scan, geom, planes)
    _, _, acc = entenc.encode_scan(sg, {0: 0}, {0: 0}, {}, {}, 0,
                                   gather=True)
    tbl = entenc.gen_optimal_table(acc[0].copy())
    co_h, si_h = derive_codes(tbl)
    host_bytes, _, _ = entenc.encode_scan(sg, {0: 0}, {0: 0}, {},
                                          {0: tbl}, 0)
    syms = sk.ac_first_symbolize_rt(jnp.asarray(plane), jnp.int32(Ss),
                                    jnp.int32(Se), jnp.int32(Al))
    assert np.array_equal(np.asarray(syms.hist), acc[0][:256])
    nwords = -(-(n * (30 + 63 * 26 + 48) + 64) // 32) + 2
    words, bits = sk.ac_first_pack_from_syms(
        syms, jnp.asarray(co_h.astype(np.uint32)),
        jnp.asarray(si_h.astype(np.int32)), nwords)
    got = bitpack._finish_segments(np.asarray(words)[None],
                                   np.asarray(bits)[None], False)
    assert got == host_bytes


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
