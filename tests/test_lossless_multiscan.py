"""Multi-scan lossless decode (VERDICT r4 item 7): streams whose scans
cover one component each, with per-scan predictors / point transforms /
tables / restart intervals.  The reference ENCODER cannot emit these
("Bogus buffer control mode"), but its DECODER accepts them
(jdlhuff.c + jdinput.c scan sequencing) — so the goldens are synthesized
by marker surgery from per-channel single-scan encodes and pinned
against `djpeg` output."""
import subprocess

import numpy as np
import pytest

from conftest import DJPEG, have_reference

from mozjpeg_tpu import decode
from mozjpeg_tpu.codec import marker
from mozjpeg_tpu.codec.lossless import encode_lossless
from mozjpeg_tpu.utils import ppm


def _synth_multiscan(img, preds, pts, rows=0):
    """Per-channel lossless encodes stitched into one SOF3 3-scan file."""
    parts = []
    for c in range(3):
        data = encode_lossless(img[:, :, c], predictor=preds[c],
                               point_transform=pts[c],
                               restart_in_rows=rows)
        jp = marker.parse(data)
        sc = jp.scans[0]
        tbl = jp.scan_htables[0][(0, 0)]
        parts.append((sc, tbl, data[sc.data_start:sc.data_end]))
    h, w = img.shape[:2]
    wtr = marker.MarkerWriter()
    wtr.soi()
    wtr.sof(marker.SOF3, 8, h, w, [(c + 1, 1, 1, 0) for c in range(3)])
    for c, (sc, tbl, seg) in enumerate(parts):
        wtr.dht(0, 0, tbl)
        if rows:
            wtr.dri(rows * w)
        wtr.sos([(c + 1, 0, 0)], preds[c], 0, 0, pts[c])
        wtr.raw(seg)
    wtr.eoi()
    return wtr.bytes()


@pytest.mark.parametrize("preds,pts,rows", [
    ((1, 1, 1), (0, 0, 0), 0),
    ((2, 4, 7), (0, 1, 0), 0),
    ((5, 3, 6), (0, 0, 2), 4),
])
def test_multiscan_lossless_matches_djpeg(testorig, tmp_path, preds, pts,
                                          rows):
    if not have_reference():
        pytest.skip("no reference build")
    img = np.ascontiguousarray(testorig[:56, :40])
    data = _synth_multiscan(img, preds, pts, rows)
    p = tmp_path / "ms.jpg"
    p.write_bytes(data)
    out = tmp_path / "ms.ppm"
    subprocess.run([DJPEG, "-outfile", str(out), str(p)], check=True)
    ref = ppm.read(str(out))
    ours = decode(data)
    np.testing.assert_array_equal(ours, ref)


def test_multiscan_missing_component_rejected(testorig):
    img = np.ascontiguousarray(testorig[:24, :24])
    data = _synth_multiscan(img, (1, 1, 1), (0, 0, 0))
    # a 2-scan stream with a coverage hole must be rejected, not crash
    wtr = marker.MarkerWriter()
    wtr.soi()
    h, w = img.shape[:2]
    wtr.sof(marker.SOF3, 8, h, w, [(c + 1, 1, 1, 0) for c in range(3)])
    for c in range(2):
        d1 = encode_lossless(img[:, :, c], predictor=1)
        jp1 = marker.parse(d1)
        wtr.dht(0, 0, jp1.scan_htables[0][(0, 0)])
        wtr.sos([(c + 1, 0, 0)], 1, 0, 0, 0)
        wtr.raw(d1[jp1.scans[0].data_start:jp1.scans[0].data_end])
    wtr.eoi()
    with pytest.raises(ValueError):
        decode(wtr.bytes())
