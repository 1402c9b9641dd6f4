/* Stub for the ONLY libarchive coupling in the make-capable interop
 * binary (tools/refdump/build_full.sh): `tdb make --tdb-format pkg`
 * writes a tar package via src/tdb_cons_package.c, which needs
 * libarchive — absent in this sandbox. Directory output (the default,
 * and the layout the compression-parity bench measures) never reaches
 * it. Requesting package output fails loudly with the reference's own
 * package IO error instead of silently writing a directory.
 *
 * Everything else the dump-only build stubbed (op_make/op_merge/
 * op_index, tdb_index_*, is_fieldname_invalid) is compiled from the
 * UNMODIFIED reference sources in this build. Test tooling only — NOT
 * part of the graft library. */
#include "tdb_internal.h"
#include "tdb_package.h"

tdb_error cons_package(const tdb_cons *cons)
{
    (void)cons;
    return TDB_ERR_IO_PACKAGE;
}
