"""Test configuration: force CPU platform with a virtual 8-device mesh.

The axon TPU tunnel ignores JAX_PLATFORMS env; jax.config works. Tests run
on CPU for speed and to exercise multi-device sharding without real chips.
"""
import os
import tempfile

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
# Per-session throwaway compile cache: sharing XLA:CPU AOT executables
# across processes with different XLA target tuning (axon plugin loaded
# vs not, other containers) can SIGSEGV in the cache loader
# (jax compilation_cache get_executable_and_time). Same-process entries
# are safe; cross-process CPU sharing is not worth the risk in tests.
os.environ.setdefault("MOZJPEG_TPU_JAX_CACHE",
                      tempfile.mkdtemp(prefix="mj_jax_cache_"))

# Best-effort: raise vm.max_map_count for direct `pytest tests/` runs
# (scripts/ci.sh does the same). XLA:CPU AOT executables hold several
# mmaps each; a big module's compile volume can exhaust the ~65530
# default and SIGABRT the compiler mid-mmap (observed at ~52% of the
# suite on a fresh kernel). This is a persistent system-wide sysctl
# change; opt out with MJ_SET_MAP_COUNT=0.
if os.environ.get("MJ_SET_MAP_COUNT", "1") != "0":
    try:
        with open("/proc/sys/vm/max_map_count") as _f:
            if int(_f.read()) < 1048576:
                with open("/proc/sys/vm/max_map_count", "w") as _g:
                    _g.write("1048576")
                import sys as _sys
                print("conftest: raised vm.max_map_count to 1048576 "
                      "(persistent; MJ_SET_MAP_COUNT=0 to skip)",
                      file=_sys.stderr)
    except OSError:
        pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: every XLA CPU
    executable holds several memory mappings and the process otherwise
    runs into vm.max_map_count (~65530) late in the suite, crashing the
    compiler mid-mmap."""
    yield
    jax.clear_caches()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.path.join(REPO, ".refbuild")
CORPUS = os.path.join(REPO, "corpus")
CJPEG = os.path.join(REFBUILD, "cjpeg")
DJPEG = os.path.join(REFBUILD, "djpeg")
JPEGTRAN = os.path.join(REFBUILD, "jpegtran")


def have_reference():
    return os.path.exists(CJPEG)


@pytest.fixture(scope="session")
def ref_tools():
    if not have_reference():
        pytest.skip("reference binaries not built (.refbuild)")
    return {"cjpeg": CJPEG, "djpeg": DJPEG, "jpegtran": JPEGTRAN}


@pytest.fixture(scope="session")
def testorig():
    from mozjpeg_tpu.utils import ppm
    path = os.path.join(CORPUS, "testorig.ppm")
    if not os.path.exists(path):
        path = "/root/reference/testimages/testorig.ppm"
    return ppm.read(path)


def run_cjpeg(args, src_path, out_path):
    subprocess.run([CJPEG] + args + ["-outfile", out_path, src_path],
                   check=True)
    with open(out_path, "rb") as f:
        return f.read()


def run_djpeg(jpg_path, out_path, args=None):
    from mozjpeg_tpu.utils import ppm
    subprocess.run([DJPEG] + (args or []) + ["-outfile", out_path, jpg_path],
                   check=True)
    return ppm.read(out_path)
