"""Single source of truth for building the native host engine.

The reference pins its native build in CMakeLists.txt (flags, sources,
output names); this module is the analog for the ctypes-loaded
libmjentropy.so. Used both by the import-time auto-build
(native/__init__.py, developer convenience) and by setup.py's wheel
build hook, so the flag set can never drift between the two.

MJ_NATIVE_PORTABLE=1 drops -march=native for distributable wheels
(slower hot loops, runs on any x86-64/aarch64 host).
"""
from __future__ import annotations

import os
import subprocess

SOURCES = (
    "entropy.cpp",      # seq + progressive Huffman enc/dec, tablegen
    "arith.cpp",        # QM arithmetic coder enc/dec + rate export
    "lossless.cpp",     # lossless (SOF3) predictor codec, 8/12/16-bit
    "quant.cpp",        # 1-pass/2-pass color quantizers (djpeg -colors)
    "imageio.cpp",      # PPM/BMP/TGA row codecs for the CLIs
    "scansearch.cpp",   # full jpegrescan candidate sweep + selection
    "prep.cpp",         # RGB->YCbCr + subsampling host prep
    "post.cpp",         # decode: sparse coeff upload pack, upsample+color
    "hostenc.cpp",      # host engine: FDCT + dering + trellis (serial path)
    "planepack.cpp",    # lossless sample-plane pack for tunnel transfers
)

LIB_NAME = "libmjentropy.so"

# -ffp-contract=off: the trellis/dering float semantics require every f32
# product to round before feeding an add (the reference's SSE2 build has
# no FMA; codec/trellis.py _frnd enforces the same on TPU). -march=native
# enables FMA on this host, so contraction must be explicitly forbidden.
BASE_FLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
              "-ffp-contract=off", "-DNDEBUG"]


def compile_flags() -> list:
    flags = list(BASE_FLAGS)
    if os.environ.get("MJ_NATIVE_PORTABLE") != "1":
        flags.insert(1, "-march=native")
    return flags


def build(src_dir: str, out_path: str, cxx: str = "g++") -> None:
    """Compile every source in src_dir into one shared library at
    out_path (atomic: writes out_path + '.tmp' then renames)."""
    srcs = [os.path.join(src_dir, s) for s in SOURCES
            if os.path.exists(os.path.join(src_dir, s))]
    cmd = [cxx, *compile_flags(), *srcs, "-o", out_path + ".tmp"]
    subprocess.run(cmd, check=True)
    os.replace(out_path + ".tmp", out_path)
