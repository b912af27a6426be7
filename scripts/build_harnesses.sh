#!/bin/sh
# Build the reference-library test harnesses into .bench/ (oracles for
# API-only knobs and colorspaces; tests skip when absent).
set -e
cd "$(dirname "$0")/.."
mkdir -p .bench
CFLAGS="-O2 -I/root/reference -I.refbuild"
if [ -f .refbuild/libjpeg.so ]; then
  LIBS="-L.refbuild -ljpeg -Wl,-rpath,\$ORIGIN/../.refbuild"
else
  LIBS=".refbuild/libjpeg.a"      # ENABLE_SHARED=0 builds
fi
for h in encode_harness colorspace_harness decode_harness; do
  gcc $CFLAGS scripts/$h.c $LIBS -lm -o .bench/$h
done
echo "harnesses built in .bench/"
