#!/bin/sh
# Build the reference's OWN benchmark harness (util/traildb_bench.c —
# the manual timing tool BASELINE.md cites: decode-all / decode <fields>
# / append-all / recode, wall-clock per op) from the UNMODIFIED sources,
# against the same shim/object set as build_full.sh. Used by
# `graft.tools.CompressionBench --throughput` for the head-to-head
# decode-throughput comparison the baseline's "single-node throughput"
# target asks for.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
OUT="$HERE"/../refbin
mkdir -p "$OUT"
gcc -std=c99 -O2 -D_DEFAULT_SOURCE -D_GNU_SOURCE -DDSFMT_MEXP=521 \
  -include inttypes.h -include limits.h \
  -I"$HERE/include" -I"$REF/src" \
  "$REF/src/tdb.c" "$REF/src/tdb_decode.c" "$REF/src/tdb_package.c" \
  "$REF/src/tdb_huffman.c" "$REF/src/tdb_uuid.c" \
  "$REF/src/tdb_multi_cursor.c" "$REF/src/judy_128_map.c" \
  "$REF/src/tdb_queue.c" "$REF/src/pqueue/pqueue.c" \
  "$REF/src/tdb_cons.c" "$REF/src/tdb_encode.c" \
  "$REF/src/tdb_encode_model.c" "$REF/src/judy_str_map.c" \
  "$REF/src/arena.c" "$REF/src/xxhash/xxhash.c" "$REF/src/dsfmt/dSFMT.c" \
  "$REF/util/traildb_bench.c" \
  "$HERE/judy_shim.c" "$HERE/stubs_full.c" \
  -o "$OUT/tdb-bench" -lm
echo "built $OUT/tdb-bench"
