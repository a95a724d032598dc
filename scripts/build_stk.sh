#!/bin/bash
# Build STK SVite + SResults from the reference's vendored decoder trunk
# into ${STK:-/tmp/stk} (idempotent: no-op when already built). The decode
# scripts and the test suite's decode fixture share this single recipe —
# the reference delegates decoding to HVite/SVite the same way
# (examples/*/decode.sh).
set -e

STK=${STK:-/tmp/stk}
TRUNK=/root/reference/src/STKLib/trunk

if [ -x $STK/SVite ] && [ -x $STK/SResults ]; then
  exit 0
fi
if [ ! -d $TRUNK ]; then
  echo "build_stk.sh: vendored STK trunk not found at $TRUNK" >&2
  exit 1
fi

rm -rf $STK
cp -r $TRUNK $STK
cd $STK && mkdir -p objs
FLAGS="-std=gnu++03 -fpermissive -w -O1 -DHAVE_REENTRANT_SEARCH=1 \
  -DHAVE_SEARCH_H=1 -include stdint.h -include cstring -I. -Isrc \
  -Isrc/STKLib -Ilib"
for f in src/STKLib/*.cc src/STKLib/*.C; do
  case $f in *imagesc*|*BQuestion*|*Score.cc|*BDTree*|*ContextSample*) continue;; esac
  g++ $FLAGS -c "$f" -o objs/$(basename ${f%.*}).o &
done
wait
g++ $FLAGS -c src/SVite.cc -o objs/SVite_main.o
g++ $FLAGS -c src/SResults.cc -o objs/SResults_main.o
for tool in SVite SResults; do
  g++ -o $tool objs/${tool}_main.o $(ls objs/*.o | grep -v _main) \
    /lib/x86_64-linux-gnu/libblas.so.3 /lib/x86_64-linux-gnu/liblapack.so.3 \
    -pthread -lm
done
echo "built $STK/SVite and $STK/SResults"
