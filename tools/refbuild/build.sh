#!/bin/bash
# Rebuild the reference brisk+agast (SSE path, OpenCV4) for golden generation.
set -e
REF=/root/reference
CXXFLAGS="-O2 -mssse3 -msse2 -std=c++14 -I$REF/agast/include -I$REF/brisk/include -I/tmp/refbuild/shim -I/usr/include/opencv4 -DHAVE_OPENCV=1 -DAGAST_GLOG=1 -Wno-deprecated-declarations -Wno-unused-variable"
mkdir -p obj
for f in $REF/agast/src/*.cc; do
  o=obj/agast_$(basename $f .cc).o
  [ -f $o ] || g++ $CXXFLAGS -c $f -o $o &
done
for f in brisk-descriptor-extractor brisk-feature-detector brisk-layer brisk-opencv brisk-scale-space brisk-v1 brute-force-matcher harris-feature-detector harris-score-calculator-float harris-score-calculator harris-scores image-down-sampling pattern-provider timer vectorized-filters; do
  o=obj/brisk_$f.o
  [ -f $o ] || g++ $CXXFLAGS -c $REF/brisk/src/$f.cc -o $o &
done
wait
ar rcs libbrisk_ref.a obj/*.o
echo BUILD OK
