#!/usr/bin/env bash
# Build the native io library (C++ CDR batch decoders) -> fl_slam_tpu/io/libgcio.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -Wall -Wextra \
    -o fl_slam_tpu/io/libgcio.so src/gcio.cpp
echo "built fl_slam_tpu/io/libgcio.so"
g++ -O3 -fPIC -shared -std=c++17 -Wall -Wextra \
    -o fl_slam_tpu/camera/libgcvision.so src/gcvision.cpp
echo "built fl_slam_tpu/camera/libgcvision.so"
