"""Wrapper for the default-backend byte-exactness smoke.

The suite pins CPU (conftest), so the real check lives in
scripts/tpu_smoke.py and runs in a fresh interpreter against whatever
backend the machine's default is (the real TPU on the bench host).
Opt-in (it needs the chip and ~a minute of compiles):

    MJ_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
"""
import os
import subprocess
import sys

import pytest

from conftest import REPO, have_reference


@pytest.mark.skipif(os.environ.get("MJ_TPU_SMOKE") != "1",
                    reason="set MJ_TPU_SMOKE=1 (needs the real chip)")
def test_tpu_backend_byte_exact():
    if not have_reference():
        pytest.skip("reference binaries not built")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # let the default backend win
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        capture_output=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-4000:]
    assert b"TPU SMOKE PASS" in r.stdout
