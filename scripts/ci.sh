#!/usr/bin/env bash
# CI entry point: native build, unit + golden tests, multi-chip dryrun,
# wheel build smoke. Mirrors what the reference's CMake/CTest wiring
# covers (CMakeLists.txt:903+) plus the TPU-specific dryrun.
set -euo pipefail

# XLA:CPU AOT executables hold many mmaps; a big test module's compile
# volume can exhaust the default vm.max_map_count (~65530) and segfault
# the compiler mid-mmap. Raise it when we can (best effort).
sysctl -w vm.max_map_count=1048576 2>/dev/null || true
cd "$(dirname "$0")/.."

echo "== native build (pinned flags) =="
python - <<'EOF'
from mozjpeg_tpu.native import lib
print("libmjentropy loaded:", lib is not None)
EOF

echo "== reference binaries for golden tests =="
if [ ! -x .refbuild/cjpeg ] && [ -d /root/reference ]; then
  mkdir -p .refbuild
  (cd .refbuild && cmake -G Ninja -DCMAKE_BUILD_TYPE=Release -DWITH_SIMD=0 \
      -DWITH_ARITH_ENC=1 -DWITH_ARITH_DEC=1 \
      -DENABLE_SHARED=0 -DPNG_SUPPORTED=0 /root/reference >/dev/null \
      && ninja >/dev/null \
      && cp /root/reference/testimages/testorig.ppm .)
fi

echo "== reference-library harnesses (oracle tests skip without) =="
scripts/build_harnesses.sh || true

echo "== corpus =="
python scripts/make_corpus.py

echo "== test suite (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== multi-chip dryrun (8-device virtual mesh) =="
python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8): ok")
EOF

echo "== TPU smoke (byte-exactness ON the chip, when one is attached) =="
python - <<'EOF'
import subprocess, sys
import jax
if jax.default_backend() in ("tpu", "axon"):
    r = subprocess.run([sys.executable, "scripts/tpu_smoke.py"])
    if r.returncode != 0:
        raise SystemExit("tpu_smoke failed")
else:
    print("no TPU attached; skipped")
EOF

echo "== wheel build =="
pip wheel --no-deps --no-build-isolation -w dist/ . >/dev/null
ls dist/*.whl

echo "CI PASS"
