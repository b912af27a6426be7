"""Multi-host (2-process) encode, byte-exact vs single-host.

Spawns two real OS processes connected with jax.distributed (CPU backend,
4 virtual devices each = one 8-device global mesh) and checks that

  * a batch sharded across both hosts' devices (psum of the Huffman
    histograms crossing the process boundary - the DCN analog), and
  * ONE Kodak-size image with its iMCU rows sharded across both hosts,
    including an uneven bottom band (height 509: a partial iMCU row),

produce output byte-identical to the single-process encoders on the same
8-device mesh. This is the SURVEY.md SS2.6 cross-host row; the reference
has no analog (it is single-threaded)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import CORPUS, REPO

pytestmark = pytest.mark.skipif(
    os.environ.get("MJ_SKIP_MULTIHOST") == "1",
    reason="multihost spawn disabled")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode, arr, tmp_path, nprocs=2, local_devs=4):
    inpath = str(tmp_path / "in.npy")
    np.save(inpath, arr)
    outpref = str(tmp_path / "out")
    coord = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                        % local_devs)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("MJ_HOST_PREP", None)
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(nprocs), str(p), mode,
         inpath, outpref], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(nprocs)]
    outs = []
    for p, pr in enumerate(procs):
        try:
            so, se = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert pr.returncode == 0, \
            "worker %d failed:\n%s" % (p, se.decode()[-4000:])
    for p in range(nprocs):
        i = 0
        while os.path.exists("%s.%d.%d.jpg" % (outpref, p, i)):
            with open("%s.%d.%d.jpg" % (outpref, p, i), "rb") as f:
                outs.append(f.read())
            i += 1
    return outs


def _kodak(name="kodak_like_768x512_1.ppm"):
    from mozjpeg_tpu.utils import ppm
    return ppm.read(os.path.join(CORPUS, name))


def test_multihost_batch_byte_exact(tmp_path):
    """8 Kodak-size images, 4 per host, 1 per device; psum over DCN."""
    img = _kodak()
    batch = np.stack([np.roll(img, 61 * i, axis=1) for i in range(8)])

    outs = _run_workers("batch", batch, tmp_path)
    assert len(outs) == 8

    from mozjpeg_tpu.parallel import batch as B
    ref = B.encode_batch(batch, quality=75.0)
    for i in range(8):
        assert outs[i] == ref[i], "image %d differs across hosts" % i


def test_multihost_rows_byte_exact_uneven(tmp_path):
    """One 768x509 image (partial bottom iMCU row) row-sharded over both
    hosts; every host must emit the identical complete JPEG."""
    img = _kodak()[:509]  # 509 = 31.8 iMCU rows -> uneven bottom band

    outs = _run_workers("rows", img, tmp_path)
    assert len(outs) == 2
    assert outs[0] == outs[1], "hosts disagree on the stitched stream"

    from mozjpeg_tpu.parallel import rows as R
    ref = R.encode_row_sharded(img, quality=75.0, restart_rows=1)
    assert outs[0] == ref

    # and the stream itself must be a decodable, reference-exact JPEG
    from conftest import have_reference, DJPEG
    if have_reference():
        p = tmp_path / "mh.jpg"
        p.write_bytes(outs[0])
        r = subprocess.run([DJPEG, "-outfile", os.devnull, str(p)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()


def test_multihost_scanopt_full_default_byte_exact(tmp_path):
    """THE FLAGSHIP CONFIG across hosts: one Kodak-size image encoded
    with the full mozjpeg default (progressive + AC/DC trellis +
    deringing + jpegrescan optimize_scans), iMCU rows sharded over both
    hosts' devices. Both hosts must emit the identical stream, and it
    must equal the single-device encoder (= cjpeg default -restart 1)."""
    img = _kodak("kodak_like_768x512_2.ppm")

    outs = _run_workers("scanopt", img, tmp_path)
    assert len(outs) == 2
    assert outs[0] == outs[1], "hosts disagree on the stitched stream"

    from mozjpeg_tpu import encode, EncoderConfig
    ref = encode(img, EncoderConfig(quality=75, restart_in_rows=1))
    assert outs[0] == ref


def test_multihost_batch_default_byte_exact(tmp_path):
    """Corpus sharded over hosts, each encoding its shard with the FULL
    mozjpeg default via the local pipelined path: bytes must equal the
    single-process encoder's for every image."""
    img = _kodak()
    batch = np.stack([np.roll(img, 53 * i, axis=1) for i in range(8)])

    outs = _run_workers("batch_default", batch, tmp_path)
    assert len(outs) == 8

    from mozjpeg_tpu import encode, EncoderConfig
    cfg = EncoderConfig(quality=75)
    for i in range(8):
        assert outs[i] == encode(batch[i], cfg), "image %d differs" % i


def test_multihost_trellis_progressive_byte_exact(tmp_path):
    """Trellis sequential + trellis progressive across hosts, vs the
    single-host row-sharded encoders."""
    img = _kodak("kodak_like_768x512_3.ppm")
    from mozjpeg_tpu.parallel import rows as R

    outs = _run_workers("trellis", img, tmp_path)
    assert len(outs) == 2 and outs[0] == outs[1]
    assert outs[0] == R.encode_row_sharded_trellis(
        img, quality=75.0, restart_rows=1)

    outs = _run_workers("progressive", img, tmp_path)
    assert len(outs) == 2 and outs[0] == outs[1]
    assert outs[0] == R.encode_row_sharded_progressive(
        img, quality=75.0, restart_rows=1)
