#!/usr/bin/env python
"""TPU-backend byte-exactness smoke (VERDICT r1 item 4).

The pytest suite pins the CPU backend (tests/conftest.py); this script
runs the same byte-exactness contract on whatever the DEFAULT backend is
— on the bench machine that is the real TPU chip — so a TPU-only
numerics divergence (shifts, int16 packing, lax.clz, ...) fails loudly
instead of shipping invisibly.

Covers encode configs: baseline sequential, progressive+optimize,
trellis (no scan-opt), full mozjpeg default (prog+trellis+scan-opt),
grayscale, 4:4:4 — each byte-compared against the reference cjpeg
binary — plus decode (baseline + progressive + restart) bit-compared
against djpeg, and the batched/pipelined paths vs serial.

Run: python scripts/tpu_smoke.py   (exit 0 = pass)
Wrapped by tests/test_tpu_smoke.py when MJ_TPU_SMOKE=1.
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CJPEG = os.path.join(REPO, ".refbuild", "cjpeg")
DJPEG = os.path.join(REPO, ".refbuild", "djpeg")


def cjpeg(img, *args):
    from mozjpeg_tpu.utils import ppm
    ppm.write("/tmp/_smoke_in.ppm", img)
    return subprocess.run([CJPEG, *args, "/tmp/_smoke_in.ppm"],
                          capture_output=True, check=True).stdout


def djpeg(data, *args):
    from mozjpeg_tpu.utils import ppm
    with open("/tmp/_smoke.jpg", "wb") as f:
        f.write(data)
    subprocess.run([DJPEG, *args, "-outfile", "/tmp/_smoke_out.ppm",
                    "/tmp/_smoke.jpg"], check=True)
    return ppm.read("/tmp/_smoke_out.ppm")


def main():
    # this smoke exists to prove the DEVICE paths byte-exact on the real
    # chip — the host CPU engine must not shadow them (r5 serial routing)
    os.environ["MJ_HOST_ENGINE"] = "0"
    from mozjpeg_tpu._jaxcache import ensure_backend
    ensure_backend(probe_timeout=float(os.environ.get("SMOKE_PROBE_S",
                                                      "90")))
    import jax
    import mozjpeg_tpu as mj
    from mozjpeg_tpu.utils import ppm

    backend = jax.default_backend()
    print("backend:", backend, jax.devices(), file=sys.stderr)

    img = ppm.read(os.path.join(REPO, "corpus",
                                "kodak_like_768x512_2.ppm"))
    testorig = os.path.join(REPO, ".refbuild", "testorig.ppm")
    if not os.path.exists(testorig):
        testorig = "/root/reference/testimages/testorig.ppm"
    small = ppm.read(testorig) if os.path.exists(testorig) else img[:150,
                                                                    :227]

    cases = [
        ("baseline seq", dict(quality=75, profile="fastest"),
         ["-quality", "75", "-baseline", "-revert", "-notrellis",
          "-noovershoot", "-fastcrush", "-optimize"]),
        ("progressive+opt", dict(quality=75, profile="fastest",
                                 progressive=True, trellis_quant=False,
                                 overshoot_deringing=False,
                                 optimize_scans=False,
                                 optimize_coding=True),
         ["-quality", "75", "-progressive", "-optimize", "-revert"]),
        ("trellis no scanopt", dict(quality=75, optimize_scans=False),
         ["-quality", "75", "-fastcrush"]),
        ("full default", dict(quality=75), ["-quality", "75"]),
    ]
    from mozjpeg_tpu.codec.config import Profile
    for name, kw, flags in cases:
        if kw.get("profile") == "fastest":
            kw = dict(kw)
            kw["profile"] = Profile.FASTEST
            kw.setdefault("progressive", False)
            kw.update(optimize_coding=True, optimize_scans=False,
                      trellis_quant=False, overshoot_deringing=False)
        for label, im in (("kodak", img), ("testorig", small)):
            ref = cjpeg(im, *flags)
            ours = mj.encode(im, mj.EncoderConfig(**kw))
            assert ours == ref, "%s/%s: %d vs %d bytes" % (
                name, label, len(ours), len(ref))
        print("OK encode %s byte-identical (%s)" % (name, backend),
              file=sys.stderr)

    # grayscale + 4:4:4 on the device path
    g = img[..., 0].copy()
    assert mj.encode(g, mj.EncoderConfig(quality=75)) == \
        cjpeg(g, "-quality", "75", "-grayscale")
    assert mj.encode(img, mj.EncoderConfig(quality=92,
                                           subsampling=(1, 1))) == \
        cjpeg(img, "-quality", "92")
    print("OK grayscale + 4:4:4 byte-identical", file=sys.stderr)

    # arithmetic full default (arith trellis + arith scan search on device)
    assert mj.encode(small, mj.EncoderConfig(quality=75,
                                             arithmetic=True)) == \
        cjpeg(small, "-quality", "75", "-arithmetic")
    print("OK arithmetic full default byte-identical", file=sys.stderr)

    # 12-bit with overshoot deringing (12-bit DCT + dering device paths;
    # the reference cannot run trellis/scan-opt at 12-bit)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:67, 0:101]
    im12 = (np.stack([yy * 40 + xx * 13, xx * 31, (yy + xx) * 17],
                     -1) % 4096)
    im12 = (im12 * 0.7
            + rng.integers(0, 1200, (67, 101, 3))).astype(np.uint16) % 4096
    from mozjpeg_tpu.utils import ppm as _ppm
    _ppm.write("/tmp/_smoke12.ppm", im12, maxval=4095)
    ref12 = subprocess.run(
        [CJPEG, "-precision", "12", "-quality", "75", "-fastcrush",
         "-notrellis", "-notrellis-dc", "/tmp/_smoke12.ppm"],
        capture_output=True, check=True).stdout
    ours12 = mj.encode(im12, mj.EncoderConfig(
        quality=75, precision=12, optimize_scans=False,
        trellis_quant=False))
    assert ours12 == ref12, "12-bit dering"
    print("OK 12-bit progressive+dering byte-identical", file=sys.stderr)

    # batched/pipelined vs serial (12 imgs -> multiple groups)
    corpus = [np.roll(img, 31 * i, axis=1).copy() for i in range(12)]
    outs = mj.encode_many(corpus, mj.EncoderConfig(quality=75))
    for i in (0, 5, 11):
        assert outs[i] == mj.encode(corpus[i], mj.EncoderConfig(quality=75))
    print("OK pipelined == serial on device backend", file=sys.stderr)

    # transport overflow-retry ON CHIP (VERDICT r4 weak #5), both legs,
    # amplitudes calibrated so the paths actually trigger (verified by
    # spying transport.fetch/pack_batch on the CPU backend):
    #  - q92 moderate noise: default bucket overflows, the scap=32
    #    retry SUCCEEDS (pack0 -> None -> pack32 -> ok)
    #  - q98 full noise: both buckets overflow (blocks > 48 nonzeros),
    #    falling through to the sparse/dense download
    rng = np.random.RandomState(7)
    mild = [(rng.randint(0, 256, (128, 128, 3)) * 0.2 + 110)
            .astype(np.uint8) for _ in range(2)]
    outs = mj.encode_many(mild, mj.EncoderConfig(quality=92,
                                                 subsampling=(1, 1)))
    for im, d in zip(mild, outs):
        assert d == cjpeg(im, "-quality", "92"), "scap-retry mismatch"
    noisy = [rng.randint(0, 256, (128, 128, 3)).astype(np.uint8)
             for _ in range(2)]
    dense = mj.encode_many(noisy, mj.EncoderConfig(quality=98,
                                                   subsampling=(1, 1)))
    for im, d in zip(noisy, dense):
        assert d == cjpeg(im, "-quality", "98"), "dense fallback mismatch"
    print("OK transport overflow-retry + dense fallback byte-identical",
          file=sys.stderr)

    # decode bit-exactness on this backend
    for name, flags, dflags in [
        ("baseline", ["-quality", "75", "-baseline", "-revert"], []),
        ("progressive", ["-quality", "75", "-progressive", "-revert"], []),
        ("restart", ["-quality", "75", "-restart", "2", "-revert"], []),
        ("full default", ["-quality", "75"], []),
    ]:
        data = cjpeg(img, *flags)
        ours = mj.decode(data)
        ref = djpeg(data, *dflags)
        assert np.array_equal(ours, ref), "decode %s differs" % name
    print("OK decode bit-exact vs djpeg (%s)" % backend, file=sys.stderr)

    print("TPU SMOKE PASS (backend=%s)" % backend)


if __name__ == "__main__":
    main()
