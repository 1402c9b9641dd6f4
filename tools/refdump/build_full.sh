#!/bin/sh
# Build a make-capable `tdb` binary (tools/refbin/tdb-make) from the
# UNMODIFIED reference sources at /root/reference, out-of-tree — the
# cons/encode/index side on top of everything build.sh compiles. The
# sandbox lacks libJudy and libarchive: JudyL/Judy1 are covered by the
# hash-backed shim in include/Judy.h + judy_shim.c (ordered iteration
# included — the encode path's trail order depends on it), and the one
# libarchive coupling (`--tdb-format pkg` output) is stubbed to fail
# loudly (stubs_full.c). Used by the compression-parity bench to get the
# reference engine's own bytes/event on identical input data.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
OUT="$HERE"/../refbin
mkdir -p "$OUT"
gcc -std=c99 -O2 -D_DEFAULT_SOURCE -D_GNU_SOURCE -DDSFMT_MEXP=521 \
  -include inttypes.h -include limits.h \
  -I"$HERE/include" -I"$REF/src" -I"$REF/tdbcli" \
  "$REF/src/tdb.c" "$REF/src/tdb_decode.c" "$REF/src/tdb_package.c" \
  "$REF/src/tdb_huffman.c" "$REF/src/tdb_uuid.c" \
  "$REF/src/tdb_multi_cursor.c" "$REF/src/judy_128_map.c" \
  "$REF/src/tdb_queue.c" "$REF/src/pqueue/pqueue.c" \
  "$REF/src/tdb_cons.c" "$REF/src/tdb_encode.c" \
  "$REF/src/tdb_encode_model.c" "$REF/src/judy_str_map.c" \
  "$REF/src/arena.c" "$REF/src/xxhash/xxhash.c" "$REF/src/dsfmt/dSFMT.c" \
  "$REF/tdbcli/main.c" "$REF/tdbcli/op_dump.c" "$REF/tdbcli/op_make.c" \
  "$REF/tdbcli/op_merge.c" "$REF/tdbcli/op_index.c" \
  "$REF/tdbcli/tdb_index.c" "$REF/tdbcli/thread_util.c" \
  "$REF/tdbcli/jsmn/jsmn.c" "$REF/tdbcli/filter.c" \
  "$HERE/judy_shim.c" "$HERE/stubs_full.c" \
  -o "$OUT/tdb-make" -lm -lpthread
echo "built $OUT/tdb-make"
