#!/bin/sh
# Build a dump-only `tdb` binary from the UNMODIFIED reference sources at
# /root/reference, out-of-tree (objects and binary land in tools/refbin).
# The sandbox lacks libJudy and libarchive; the read/dump path needs
# neither (a 4-op JudyL shim covers the per-trail filter-option map, and
# tar packages are read natively by src/tdb_package.c, no libarchive).
# Cons-side ops are stubbed to exit 100 (stubs.c).
set -e
REF=${REF:-/root/reference}
OUT=$(dirname "$0")/../refbin
mkdir -p "$OUT"
gcc -std=c99 -O2 -D_DEFAULT_SOURCE -D_GNU_SOURCE -include inttypes.h \
  -I"$(dirname "$0")/include" -I"$REF/src" -I"$REF/tdbcli" \
  "$REF/src/tdb.c" "$REF/src/tdb_decode.c" "$REF/src/tdb_package.c" \
  "$REF/src/tdb_huffman.c" "$REF/src/tdb_uuid.c"\
  "$REF/src/tdb_multi_cursor.c" "$REF/src/judy_128_map.c" \
  "$REF/src/tdb_queue.c" "$REF/src/pqueue/pqueue.c" \
  "$REF/tdbcli/main.c" "$REF/tdbcli/op_dump.c" "$REF/tdbcli/filter.c" \
  "$(dirname "$0")/judy_shim.c" "$(dirname "$0")/stubs.c" \
  -o "$OUT/tdb" -lm
echo "built $OUT/tdb"
