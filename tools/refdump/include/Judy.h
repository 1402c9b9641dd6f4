/* Minimal JudyL/Judy1 shim — just enough of the public Judy API
 * (http://judy.sourceforge.net, LGPL; API is public documentation) for the
 * reference engine to compile in this sandbox, which has no libJudy.
 *
 * Two consumers:
 *  - the dump-only interop binary (tools/refdump/build.sh): 4 reachable
 *    JudyL ops on the usually-empty per-trail filter-option map;
 *  - the make-capable binary (tools/refdump/build_full.sh): the whole
 *    cons/encode path — judy_128_map's uuid→trail map (one JLI per
 *    event), judy_str_map's hashed lexicons, the encode model's gram
 *    mining (JLI/JLF/JLN + Judy1 candidate sets) and tdbcli's op_make
 *    field maps (incl. JLL) — used by the compression-parity bench.
 *
 * Backing store (judy_shim.c): per-array open-addressing hash table for
 * O(1) JLI/JLG plus an insertion-ordered entry array with a LAZILY
 * SORTED view for the ordered-iteration ops (JLF/JLN/JLL re-sort only
 * after a modification, then binary-search) — real Judy iterates in key
 * order and the encode path DEPENDS on that (trail order = sorted uuid
 * keys via j128m_fold). Judy1 is the same structure with values unused.
 * Pointers returned by JLI/JLG are invalidated by the next modification,
 * same contract as real Judy.
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
PWord_t judy_shim_last(Pvoid_t pa, Word_t *idx);

#define JLI(PV, PA, IDX) ((PV) = (void *)judy_shim_ins((Pvoid_t *)&(PA), (Word_t)(IDX)))
#define JLG(PV, PA, IDX) ((PV) = (void *)judy_shim_get((Pvoid_t)(PA), (Word_t)(IDX)))
#define JLD(RC, PA, IDX) ((RC) = judy_shim_del((Pvoid_t *)&(PA), (Word_t)(IDX)))
#define JLFA(RC, PA)     ((RC) = judy_shim_free((Pvoid_t *)&(PA)))
/* Ordered iteration (smallest key >= / > *IDX, largest <= *IDX; *IDX is
 * updated to the hit). */
#define JLF(PV, PA, IDX) ((PV) = (void *)judy_shim_first((Pvoid_t)(PA), &(IDX)))
#define JLN(PV, PA, IDX) ((PV) = (void *)judy_shim_next((Pvoid_t)(PA), &(IDX)))
#define JLL(PV, PA, IDX) ((PV) = (void *)judy_shim_last((Pvoid_t)(PA), &(IDX)))

/* Judy1 bit sets: value-less JudyL. J1S returns 1 iff the bit was newly
 * set; J1U 1 iff it was previously set; J1T tests; J1F/J1N iterate in
 * key order. */
#define J1S(RC, PA, IDX) ((RC) = (judy_shim_get((Pvoid_t)(PA), (Word_t)(IDX)) ? 0 : \
                          (judy_shim_ins((Pvoid_t *)&(PA), (Word_t)(IDX)), 1)))
#define J1U(RC, PA, IDX) ((RC) = judy_shim_del((Pvoid_t *)&(PA), (Word_t)(IDX)))
#define J1T(RC, PA, IDX) ((RC) = (judy_shim_get((Pvoid_t)(PA), (Word_t)(IDX)) != NULL))
#define J1F(RC, PA, IDX) ((RC) = (judy_shim_first((Pvoid_t)(PA), &(IDX)) != NULL))
#define J1N(RC, PA, IDX) ((RC) = (judy_shim_next((Pvoid_t)(PA), &(IDX)) != NULL))
#define J1FA(RC, PA)     ((RC) = judy_shim_free((Pvoid_t *)&(PA)))

/* JudySL: string-keyed map with strcmp-ordered iteration (op_merge's
 * field-name union iterates it to fix the merged field order). JSLF/JSLN
 * copy the found key into the caller's Index buffer, like real Judy. */
PWord_t judy_shim_sl_ins(Pvoid_t *pa, const unsigned char *key);
PWord_t judy_shim_sl_first(Pvoid_t pa, unsigned char *key);
PWord_t judy_shim_sl_next(Pvoid_t pa, unsigned char *key);
Word_t judy_shim_sl_free(Pvoid_t *pa);

#define JSLI(PV, PA, IDX) ((PV) = (void *)judy_shim_sl_ins((Pvoid_t *)&(PA), (const unsigned char *)(IDX)))
#define JSLF(PV, PA, IDX) ((PV) = (void *)judy_shim_sl_first((Pvoid_t)(PA), (unsigned char *)(IDX)))
#define JSLN(PV, PA, IDX) ((PV) = (void *)judy_shim_sl_next((Pvoid_t)(PA), (unsigned char *)(IDX)))
#define JSLFA(RC, PA)     ((RC) = judy_shim_sl_free((Pvoid_t *)&(PA)))

/* JudyHS: arbitrary-bytes-keyed hash map, no ordered iteration
 * (op_make's JSON field-name lookup). */
PWord_t judy_shim_hs_ins(Pvoid_t *pa, const void *key, Word_t len);
PWord_t judy_shim_hs_get(Pvoid_t pa, const void *key, Word_t len);
Word_t judy_shim_hs_free(Pvoid_t *pa);

#define JHSI(PV, PA, IDX, LEN) ((PV) = (void *)judy_shim_hs_ins((Pvoid_t *)&(PA), (const void *)(IDX), (Word_t)(LEN)))
#define JHSG(PV, PA, IDX, LEN) ((PV) = (void *)judy_shim_hs_get((Pvoid_t)(PA), (const void *)(IDX), (Word_t)(LEN)))
#define JHSFA(RC, PA)          ((RC) = judy_shim_hs_free((Pvoid_t *)&(PA)))

#endif /* JUDY_SHIM_H */
