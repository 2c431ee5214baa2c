#!/bin/bash
# Build the reference Mutect2Cpp_master binary (deepmutect/Mutect2Cpp-master,
# /root/reference) as a VCF-concordance oracle for tests/test_golden_vcf.py.
#
# The reference tree is read-only and expects boost + /usr/libtorch, neither
# of which exists in this image, so we:
#   1. copy the tree to a scratch dir,
#   2. point CMAKE_PREFIX_PATH at the pip-installed torch's cmake configs,
#   3. satisfy the seven boost includes with the minimal shim headers in
#      scripts/oracle/boost/ (our own implementations, see each header),
#   4. build the bundled htslib without bz2/lzma/libcurl/libdeflate
#      (absent from the image; only BGZF+BAM paths are exercised),
#   5. drop the libjemalloc link (not installed; allocator choice does not
#      affect output), and
#   6. add <numeric> to MathUtils.cpp (old-gcc transitive include).
#
# Usage: bash scripts/oracle/build_mutect2_oracle.sh [scratch_dir]
# Produces: ${scratch_dir}/Mutect2Cpp-master/build/Mutect2Cpp_master
set -euo pipefail

SCRATCH="${1:-/tmp/m2oracle}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
SHIM="$REPO/scripts/oracle"
TORCH_CMAKE="$(python -c 'import torch; print(torch.utils.cmake_prefix_path)')"

if [ -x "$SCRATCH/Mutect2Cpp-master/build/Mutect2Cpp_master" ]; then
    echo "already built: $SCRATCH/Mutect2Cpp-master/build/Mutect2Cpp_master"
    exit 0
fi

rm -rf "$SCRATCH"
mkdir -p "$SCRATCH"
cp -r /root/reference/deepmutect/htslib "$SCRATCH/htslib"
cp -r /root/reference/deepmutect/Mutect2Cpp-master "$SCRATCH/Mutect2Cpp-master"
chmod -R u+w "$SCRATCH"

# htslib: static lib only, no optional compression backends
cd "$SCRATCH/htslib"
chmod +x configure version.sh 2>/dev/null || true
bash ./configure --disable-bz2 --disable-lzma --disable-libcurl \
    --without-libdeflate > configure.log 2>&1
make -j"$(nproc)" libhts.a > build.log 2>&1

# Mutect2Cpp: patch CMakeLists (torch path, shim include, jemalloc/lzma/bz2)
cd "$SCRATCH/Mutect2Cpp-master"
sed -i \
    -e "s|set(CMAKE_PREFIX_PATH \"/usr/libtorch/\")|set(CMAKE_PREFIX_PATH \"$TORCH_CMAKE\")|" \
    -e "s|set(CMAKE_CXX_FLAGS \"-g -pthread\")|set(CMAKE_CXX_FLAGS \"-g -pthread -isystem $SHIM -include boost/utility.hpp\")|" \
    -e 's|target_link_libraries(Mutect2Cpp_master libjemalloc.a -ldl)|target_link_libraries(Mutect2Cpp_master -ldl)|' \
    -e 's|libhts.a -lz -llzma -lbz2 -ldl|libhts.a -lz -ldl|' \
    CMakeLists.txt
sed -i 's|#include "MathUtils.h"|#include "MathUtils.h"\n#include <numeric>\nusing std::accumulate;|' \
    src/MathUtils.cpp

mkdir -p build && cd build
cmake -GNinja -DCMAKE_BUILD_TYPE=Release .. > cmake.log 2>&1
ninja > ninja.log 2>&1
echo "built: $SCRATCH/Mutect2Cpp-master/build/Mutect2Cpp_master"
