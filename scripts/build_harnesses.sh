#!/bin/sh
# Build the reference-library test harnesses into .bench/ (oracles for
# API-only knobs and colorspaces; tests skip when absent).
set -e
cd "$(dirname "$0")/.."
mkdir -p .bench
CFLAGS="-O2 -I/root/reference -I.refbuild"
LDFLAGS="-L.refbuild -ljpeg -Wl,-rpath,\$ORIGIN/../.refbuild -lm"
gcc $CFLAGS scripts/encode_harness.c $LDFLAGS -o .bench/encode_harness
gcc $CFLAGS scripts/colorspace_harness.c $LDFLAGS -o .bench/colorspace_harness
gcc $CFLAGS scripts/decode_harness.c $LDFLAGS -o .bench/decode_harness
echo "harnesses built in .bench/"
