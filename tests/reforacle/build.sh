#!/bin/sh
# Build the reference-parity oracle: reference headers (read straight from
# $REF, never copied) + from-scratch shims + driver.cpp -> reforacle binary.
set -e
REF="${REF:-/root/reference}"
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="${OUT:-$HERE/reforacle}"
g++ -O2 -std=c++17 -w \
  -I"$HERE/shims" -I"$REF" \
  "$HERE/driver.cpp" \
  -lpng -o "$OUT"
echo "built $OUT"
