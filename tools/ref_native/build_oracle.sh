#!/bin/bash
# Build the Ceres BA oracle (tools/ref_native/ba_oracle.cpp) against the
# natively-built vendored Ceres from build.sh.  Fast (<1 min) once the
# Ceres library exists at $REFNATIVE_BUILD/ceres (run build.sh first).
set -e
REF=/root/reference
B=${REFNATIVE_BUILD:-/tmp/refnative}
HERE="$(cd "$(dirname "$0")" && pwd)"

if [ ! -f "$B/ceres/lib/libceres.a" ]; then
  echo "ceres not built — run tools/ref_native/build.sh first" >&2
  exit 1
fi

g++ -O2 -std=c++17 \
  -I"$B/ceres/include" \
  -I"$B/ceres/include/ceres/internal/miniglog" \
  -I"$REF/src/libs/eigen" \
  -o "$B/ba_oracle" "$HERE/ba_oracle.cpp" \
  "$B/ceres/lib/libceres.a" -lpthread
echo "built $B/ba_oracle"
