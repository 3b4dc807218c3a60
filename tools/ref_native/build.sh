#!/bin/bash
# Build the reference AlvaAR SLAM engine (/root/reference) as a NATIVE host
# binary, so we can record golden trajectories and measure ATE parity against
# it (BASELINE.json target: "ATE RMSE within 1% of the WASM reference").
#
# The reference normally compiles to WASM via emscripten (ref
# src/slam/CMakeLists.txt); the engine itself is portable C++17, so we link it
# against the system OpenCV 4.6 and natively-built vendored Ceres + OpenGV
# (Eigen/Sophus are header-only). embind.cpp (the emscripten binding) is
# excluded; tools/ref_native/runner.cpp is our own driver over the public
# System API (ref src/slam/src/system.hpp:19-56).
#
# Artifacts land in $REFNATIVE_BUILD (default /tmp/refnative); this host has a
# single core, so the ceres/opengv compiles run tens of minutes — invoke under
# `nice` in the background.
set -e
REF=/root/reference
B=${REFNATIVE_BUILD:-/tmp/refnative}
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$B"
cd "$B"

log() { echo "[ref-native $(date +%H:%M:%S)] $*"; }

# ---- 1. Eigen: header-only, and the vendored checkout has build-tooling files
#      stripped, so don't run its cmake at all — use the source dir directly
#      and hand Ceres a minimal Eigen3 CONFIG-package shim.
EIGEN_INC="$REF/src/libs/eigen"
mkdir -p "$B/eigen-cmake"
cat > "$B/eigen-cmake/Eigen3Config.cmake" <<EOF
set(EIGEN3_INCLUDE_DIR "$EIGEN_INC")
set(EIGEN3_INCLUDE_DIRS "$EIGEN_INC")
set(EIGEN3_VERSION_STRING "3.4.0")
set(EIGEN3_FOUND TRUE)
if(NOT TARGET Eigen3::Eigen)
  add_library(Eigen3::Eigen INTERFACE IMPORTED)
  set_target_properties(Eigen3::Eigen PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "$EIGEN_INC")
endif()
EOF
cat > "$B/eigen-cmake/Eigen3ConfigVersion.cmake" <<'EOF'
set(PACKAGE_VERSION "3.4.0")
if("${PACKAGE_VERSION}" VERSION_LESS "${PACKAGE_FIND_VERSION}")
  set(PACKAGE_VERSION_COMPATIBLE FALSE)
else()
  set(PACKAGE_VERSION_COMPATIBLE TRUE)
  if("${PACKAGE_VERSION}" VERSION_EQUAL "${PACKAGE_FIND_VERSION}")
    set(PACKAGE_VERSION_EXACT TRUE)
  endif()
endif()
EOF

# ---- 2. Ceres (static, miniglog, eigensparse, no threads — mirrors ref
#      src/libs/build.sh:124-137; Schur specializations off purely to cut the
#      single-core compile time, generic eliminator is numerically identical)
if [ ! -f "$B/ceres/lib/libceres.a" ]; then
  log "configuring Ceres"
  cmake -S "$REF/src/libs/ceres-solver" -B "$B/ceres-build" \
    -DCMAKE_BUILD_TYPE=Release \
    -DCMAKE_CXX_FLAGS="-O1 -w" \
    -DCMAKE_INSTALL_PREFIX="$B/ceres" \
    -DBUILD_SHARED_LIBS=OFF -DBUILD_EXAMPLES=OFF -DBUILD_TESTING=OFF \
    -DBUILD_BENCHMARKS=OFF \
    -DMINIGLOG=ON -DEIGENSPARSE=ON -DCERES_THREADING_MODEL=NO_THREADS \
    -DSCHUR_SPECIALIZATIONS=OFF \
    -DEigen3_DIR="$B/eigen-cmake" > "$B/ceres-configure.log" 2>&1
  log "building Ceres (slow, single core)"
  cmake --build "$B/ceres-build" --target install -- -j1 > "$B/ceres-build.log" 2>&1
  log "Ceres done"
fi

# ---- 3. OpenGV (static; its CMakeLists forces -O3 -march=native and
#      CXX_STANDARD 11.  The standard MUST be lifted to 17 to match the
#      engine build: Eigen 3.4's aligned heap path differs between C++11
#      (handmade aligned malloc, original pointer stashed before the
#      returned block) and C++17 (native overaligned operator new), and
#      header-inlined Eigen code in engine TUs exchanges heap blocks with
#      the library — mixed dialects fault on free inside
#      opengv::relative_pose::optimize_nonlinear.  Likewise its forced
#      -march=native must be dropped: AVX-512 TUs set
#      EIGEN_MAX_ALIGN_BYTES=64 (handmade aligned heap) while generic TUs
#      (Ceres, engine) use 16 (plain malloc) — Eigen blocks crossing those
#      boundaries are freed with the wrong deallocator (observed as a free
#      fault inside Ceres SimplicialLDLT::Factorize).  One dialect, one
#      ISA, everywhere.  A compiler wrapper enforces both since the
#      project hardcodes CXX_STANDARD and appends -march=native.)
cat > "$B/gxx17" <<'EOF'
#!/bin/bash
args=()
for a in "$@"; do
  case "$a" in
    -std=gnu++11|-std=c++11) a=-std=gnu++17;;
    -march=native) continue;;
  esac
  args+=("$a")
done
exec g++ "${args[@]}"
EOF
chmod +x "$B/gxx17"
if [ ! -f "$B/opengv-build/lib/libopengv.a" ]; then
  log "configuring OpenGV"
  cmake -S "$REF/src/libs/opengv" -B "$B/opengv-build" \
    -DCMAKE_BUILD_TYPE=Release \
    -DCMAKE_CXX_COMPILER="$B/gxx17" \
    -DBUILD_TESTS=OFF -DBUILD_PYTHON=OFF -DBUILD_SHARED_LIBS=OFF \
    -DEIGEN_INCLUDE_DIR="$EIGEN_INC" > "$B/opengv-configure.log" 2>&1
  log "building OpenGV (slow, single core)"
  cmake --build "$B/opengv-build" -- -j1 > "$B/opengv-build.log" 2>&1
  log "OpenGV done"
fi

# ---- 4. Reference engine + our runner
log "compiling SLAM engine + runner"
SLAM_SRC="$REF/src/slam/src"
# system.cpp uses unqualified duration_cast (compiles under emscripten only
# because its libc++ headers leak the name); force-include a shim.
cat > "$B/chrono_shim.hpp" <<'EOF'
#include <chrono>
using std::chrono::duration_cast;
EOF
ENGINE_CPP="system state camera_calibration frame map_point map_manager \
  feature_extractor feature_tracker visual_frontend mapper \
  multi_view_geometry optimizer ceres_parametrization utils"
SRCS=""
for s in $ENGINE_CPP; do SRCS="$SRCS $SLAM_SRC/$s.cpp"; done

# generic ISA to match Ceres/OpenGV (see the Eigen alignment note above)
g++ -O2 -std=c++17 -w -DNDEBUG \
  -include "$B/chrono_shim.hpp" \
  -I"$SLAM_SRC" \
  -I/usr/include/opencv4 \
  -I"$EIGEN_INC" \
  -I"$REF/src/libs/Sophus" \
  -I"$B/ceres/include" \
  -I"$B/ceres/include/ceres/internal/miniglog" \
  -I"$REF/src/libs/opengv/include" \
  $SRCS "$HERE/runner.cpp" \
  -o "$B/alva_ref_runner" \
  "$B/ceres/lib/libceres.a" \
  "$B/opengv-build/lib/libopengv.a" \
  -lopencv_calib3d -lopencv_features2d -lopencv_video -lopencv_flann \
  -lopencv_imgproc -lopencv_core -lopencv_highgui \
  -lpthread
log "BUILD COMPLETE: $B/alva_ref_runner"
