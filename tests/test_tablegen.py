"""Device Annex-K table generation vs the host (reference-exact) engine."""
import numpy as np
import pytest

from mozjpeg_tpu.entropy import encode as entenc
from mozjpeg_tpu.entropy.huffman import derive_codes
from mozjpeg_tpu.ops import tablegen


def _host(freq257):
    f = freq257.astype(np.int64).copy()
    tbl = entenc.gen_optimal_table(f)
    co, si = derive_codes(tbl)
    return tbl, co, si


def _cases():
    rng = np.random.default_rng(7)
    cases = []
    # dense random
    for _ in range(8):
        f = rng.integers(0, 1000, 257).astype(np.int32)
        f[256] = 0
        cases.append(f)
    # sparse
    for n in (2, 3, 5, 17):
        f = np.zeros(257, np.int32)
        pos = rng.choice(256, n, replace=False)
        f[pos] = rng.integers(1, 50, n)
        cases.append(f)
    # heavy ties (tie-breaking is where implementations diverge)
    f = np.zeros(257, np.int32)
    f[:100] = 7
    cases.append(f.copy())
    f = np.zeros(257, np.int32)
    f[::2] = 1
    cases.append(f.copy())
    # single real symbol
    f = np.zeros(257, np.int32)
    f[42] = 10
    cases.append(f.copy())
    # skewed: forces deep trees + length limiting
    f = np.zeros(257, np.int32)
    f[:40] = np.array([2 ** min(i, 25) for i in range(40)], np.int32)
    cases.append(f.copy())
    # fibonacci-ish (worst case depth)
    f = np.zeros(257, np.int32)
    a, b = 1, 1
    for i in range(30):
        f[i] = a
        a, b = b, min(a + b, 1 << 29)
    cases.append(f.copy())
    # large counts near int32 limits of sums
    f = np.zeros(257, np.int32)
    f[:8] = (1 << 26)
    cases.append(f.copy())
    return cases


def test_gen_optimal_matches_host():
    cases = _cases()
    freqs = np.stack(cases)
    bits, vals, ok = tablegen.gen_optimal_tables_t(freqs)
    bits = np.asarray(bits)
    vals = np.asarray(vals)
    ok = np.asarray(ok)
    co_d, si_d = (np.asarray(a)
                  for a in tablegen.derive_codes_t(bits, vals))
    for i, f in enumerate(cases):
        tbl, co_h, si_h = _host(f)
        assert ok[i], "case %d flagged not-ok" % i
        assert np.array_equal(bits[i][1:], tbl.bits[1:]), \
            "bits mismatch case %d" % i
        n = int(tbl.bits.sum())
        assert np.array_equal(vals[i][:n], tbl.vals.astype(np.int32)), \
            "vals mismatch case %d" % i
        assert np.array_equal(co_d[i], co_h), "codes mismatch case %d" % i
        assert np.array_equal(si_d[i], si_h.astype(np.int32)), \
            "sizes mismatch case %d" % i


def test_empty_histogram_flagged():
    f = np.zeros((1, 257), np.int32)
    _, _, ok = tablegen.gen_optimal_tables_t(f)
    assert not bool(np.asarray(ok)[0])


def test_trellis_rate_tables_match():
    from mozjpeg_tpu.codec import trellis
    rng = np.random.default_rng(3)
    hists = rng.integers(0, 5000, (4, 256)).astype(np.int32)
    hists[1, :] = 0
    hists[1, 5] = 33            # nearly-empty histogram still gets primed
    dev = np.asarray(tablegen.trellis_rate_tables_t(hists))
    for i in range(hists.shape[0]):
        ac_si, _ = trellis.trellis_tables_from_hist(hists[i], 0, True)
        assert np.array_equal(dev[i], ac_si), "trellis table mismatch %d" % i


def test_real_encode_histograms():
    """Histograms from an actual encode (realistic shape/tie structure)."""
    from mozjpeg_tpu.utils import ppm
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = ppm.read(os.path.join(repo, "corpus", "kodak_like_768x512_1.ppm"))
    from mozjpeg_tpu.codec import encoder as E
    from mozjpeg_tpu import EncoderConfig
    cfg_o, cfg, cs, ncomps, samp, qt = E._resolve(img, EncoderConfig(), {})
    geom, comp_res, small = E._phase_p1(img, cfg, samp, qt, cs)
    from mozjpeg_tpu.codec import pipeline_t
    _, hists = pipeline_t.unpack_small(geom, small)
    freqs = np.zeros((len(hists), 257), np.int32)
    for i, h in enumerate(hists):
        freqs[i, :256] = h
    bits, vals, ok = (np.asarray(a)
                      for a in tablegen.gen_optimal_tables_t(freqs))
    for i in range(len(hists)):
        f = np.zeros(257, np.int64)
        f[:256] = hists[i]
        tbl = entenc.gen_optimal_table(f)
        assert np.array_equal(bits[i][1:], tbl.bits[1:])
        n = int(tbl.bits.sum())
        assert np.array_equal(vals[i][:n], tbl.vals.astype(np.int32))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
