/* Minimal JudyL shim — just enough of the public Judy API
 * (http://judy.sourceforge.net, LGPL; API is public documentation) for the
 * reference engine's READ/DUMP path to compile in this sandbox, which has
 * no libJudy. Only four JudyL operations are reachable from that path
 * (tdb.c:444,767,770,792 and tdb_decode.c:167 — the per-trail event-filter
 * option map, usually empty during a plain dump). Backed by an unsorted
 * growable (key,value) array in judy_shim.c; pointers returned by JLI/JLG
 * are invalidated by the next modification, same contract as real Judy.
 *
 * This file is test tooling for cross-engine interop verification only —
 * it is NOT part of the graft library and nothing in src/ depends on it.
 */
#ifndef JUDY_SHIM_H
#define JUDY_SHIM_H

#include <stddef.h>

typedef unsigned long Word_t, *PWord_t;
typedef void *Pvoid_t;
typedef void **PPvoid_t;

PWord_t judy_shim_ins(Pvoid_t *pa, Word_t idx);
PWord_t judy_shim_get(Pvoid_t pa, Word_t idx);
int judy_shim_del(Pvoid_t *pa, Word_t idx);
Word_t judy_shim_free(Pvoid_t *pa);
PWord_t judy_shim_first(Pvoid_t pa, Word_t *idx);
PWord_t judy_shim_next(Pvoid_t pa, Word_t *idx);

#define JLI(PV, PA, IDX) ((PV) = (void *)judy_shim_ins((Pvoid_t *)&(PA), (Word_t)(IDX)))
#define JLG(PV, PA, IDX) ((PV) = (void *)judy_shim_get((Pvoid_t)(PA), (Word_t)(IDX)))
#define JLD(RC, PA, IDX) ((RC) = judy_shim_del((Pvoid_t *)&(PA), (Word_t)(IDX)))
#define JLFA(RC, PA)     ((RC) = judy_shim_free((Pvoid_t *)&(PA)))
/* Ordered iteration (smallest key >= / > *IDX; *IDX updated to the hit).
 * Reached only from judy_128_map.c's fold, which the dump path never
 * invokes (encode-side codebook construction) — implemented faithfully
 * anyway so a future cons build cannot silently mis-iterate. */
#define JLF(PV, PA, IDX) ((PV) = (void *)judy_shim_first((Pvoid_t)(PA), &(IDX)))
#define JLN(PV, PA, IDX) ((PV) = (void *)judy_shim_next((Pvoid_t)(PA), &(IDX)))

#endif /* JUDY_SHIM_H */
