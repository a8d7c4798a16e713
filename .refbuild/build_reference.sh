#!/bin/bash
# Hand-rolled build of the reference KAT binary (no autotools on this box).
# Mirrors src/Makefile.am + lib/Makefile.am flags; HAVE_CONFIG_H and
# HAVE_PYTHON deliberately undefined (python plotting not needed for parity).
set -ex
R=/root/reference
B=/root/repo/.refbuild
J=$R/deps/jellyfish-2.2.0
mkdir -p $B/obj/boost $B/obj/jf $B/obj/kat $B/lib $B/bin

CXX="g++ -std=c++11 -O2 -fwrapv -m64 -fPIC -w -I/root/repo/.refbuild/include -DHAVE_CONFIG_H"
BOOSTINC="-I$R/deps/boost"
INc="-I$R/deps/seqan-library-2.0.0/include -I$J/include -I$R/deps/boost -I$R/lib/include"
DEFS='-DKAT_SCRIPTS="/root/repo/.refbuild/scripts" -DKAT_EXECPREFIX="/root/repo/.refbuild" -DPACKAGE_VERSION="2.4.2" -DPACKAGE_NAME="kat" -DSEQAN_HAS_ZLIB=1' 

# ---- boost static libs ----
for lib in system chrono timer filesystem program_options; do
  for f in $R/deps/boost/libs/$lib/src/*.cpp; do
    base=$(basename $f .cpp)
    case $base in windows_file_codecvt|winmain) continue;; esac
    obj=$B/obj/boost/${lib}_${base}.o
    [ -f $obj ] || $CXX $BOOSTINC -c $f -o $obj &
  done
done
wait
for lib in system chrono timer filesystem program_options; do
  ar rcs $B/lib/libboost_$lib.a $B/obj/boost/${lib}_*.o
done

# ---- jellyfish lib ----
for f in $J/lib/*.cc $J/lib/*.cpp; do
  base=$(basename $f); base=${base%.*}
  obj=$B/obj/jf/$base.o
  [ -f $obj ] || $CXX -I$J/include -I$J -c $f -o $obj &
done
wait
ar rcs $B/lib/libkat_jellyfish.a $B/obj/jf/*.o

# ---- libkat ----
for f in $R/lib/src/*.cc; do
  base=$(basename $f .cc)
  obj=$B/obj/kat/lib_$base.o
  [ -f $obj ] || $CXX $INc $DEFS -c $f -o $obj &
done
wait

# ---- kat tools + main ----
for f in $R/src/*.cc; do
  base=$(basename $f .cc)
  obj=$B/obj/kat/src_$base.o
  [ -f $obj ] || $CXX $INc $DEFS -c $f -o $obj &
done
wait

$CXX -o $B/bin/kat $B/obj/kat/*.o \
  $B/lib/libkat_jellyfish.a \
  $B/lib/libboost_timer.a $B/lib/libboost_chrono.a \
  $B/lib/libboost_filesystem.a $B/lib/libboost_program_options.a \
  $B/lib/libboost_system.a \
  -lz -lpthread -lrt
echo BUILD_OK
$B/bin/kat --version
