#!/usr/bin/env bash
# Build the native io library (C++ CDR batch decoders) -> fl_slam_tpu/io/libgcio.so
set -euo pipefail
cd "$(dirname "$0")"
# -fno-math-errno -fno-trapping-math: value-safe (results unchanged; only
# errno-setting and FP-trap ordering dropped) and REQUIRED for gcc to
# vectorize the staging kernel's sigmoid/floor pass (see fexp_bf notes in
# gcio.cpp). ISA selection is runtime-dispatched via target_clones (ifunc),
# never baked in — this host's visible CPU features drift run to run.
g++ -O3 -fPIC -shared -std=c++17 -Wall -Wextra \
    -fno-math-errno -fno-trapping-math \
    -o fl_slam_tpu/io/libgcio.so src/gcio.cpp
echo "built fl_slam_tpu/io/libgcio.so"
g++ -O3 -fPIC -shared -std=c++17 -Wall -Wextra \
    -o fl_slam_tpu/camera/libgcvision.so src/gcvision.cpp
echo "built fl_slam_tpu/camera/libgcvision.so"
