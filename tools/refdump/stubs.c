/* Stubs for the tdbcli ops NOT needed by the dump-only interop binary.
 * The sandbox has no libJudy / libarchive, so the construction side of the
 * reference cannot build — but the READ path (tdb_open on a directory or a
 * format-v1 tar package, cursor decode, `tdb dump`) has no such
 * dependency, and that is the side the interop check exercises: a package
 * written by graft's TdbWriter must open and dump identically under the
 * reference engine. */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>

#include <traildb.h>

#include "tdbcli.h"
#include "tdb_index.h"

static int not_built(const char *op)
{
    fprintf(stderr,
        "tdb %s: not compiled into this dump-only interop binary\n", op);
    exit(100);
}

/* tdb_open validates field names at read time (src/tdb.c:200) but the
 * validator lives in the cons translation unit we can't compile; this is
 * the documented contract of src/tdb_cons.c:181-195 / tdb_limits.h:44-51
 * re-stated: reject "time", empty, over-long, or charset-violating names. */
int is_fieldname_invalid(const char *field)
{
    static const char *ok = "_-%"
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789";
    uint64_t i;
    if (!strcmp(field, "time"))
        return 1;
    for (i = 0; i < TDB_MAX_FIELDNAME_LENGTH && field[i]; i++)
        if (!strchr(ok, field[i]))
            return 1;
    if (i == 0 || i == TDB_MAX_FIELDNAME_LENGTH)
        return 1;
    return 0;
}

int op_make(struct tdbcli_options *opt) { (void)opt; return not_built("make"); }
int op_index(struct tdbcli_options *opt) { (void)opt; return not_built("index"); }
int op_merge(struct tdbcli_options *opt, const char **inputs,
             uint32_t num_inputs)
{ (void)opt; (void)inputs; (void)num_inputs; return not_built("merge"); }

/* No on-disk index will exist next to interop fixtures; returning NULL
 * makes op_dump take its plain full-scan path (op_dump.c:233). */
char *tdb_index_find(const char *root) { (void)root; return NULL; }
struct tdb_index *tdb_index_open(const char *tdb_path, const char *index_path)
{ (void)tdb_path; (void)index_path; not_built("index_open"); return NULL; }
void tdb_index_close(struct tdb_index *index) { (void)index; }
uint64_t *tdb_index_match_candidates(const struct tdb_index *index,
                                     const struct tdb_event_filter *filter,
                                     uint64_t *num_candidates)
{ (void)index; (void)filter; (void)num_candidates;
  not_built("index_match"); return NULL; }
