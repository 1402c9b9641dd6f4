/* Backing store for the JudyL shim (see include/Judy.h). Unsorted dynamic
 * array — the reachable use is the per-trail event-filter option map,
 * which holds zero entries during a plain `tdb dump`. */
#include <stdlib.h>
#include "Judy.h"

struct judy_shim_arr {
    Word_t *keys;
    Word_t *vals;
    size_t n, cap;
};

PWord_t judy_shim_ins(Pvoid_t *pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    size_t i;
    if (!a) {
        a = calloc(1, sizeof(*a));
        if (!a) return NULL;
        *pa = a;
    }
    for (i = 0; i < a->n; i++)
        if (a->keys[i] == idx)
            return &a->vals[i];
    if (a->n == a->cap) {
        size_t ncap = a->cap ? a->cap * 2 : 8;
        Word_t *nk = realloc(a->keys, ncap * sizeof(Word_t));
        Word_t *nv = realloc(a->vals, ncap * sizeof(Word_t));
        if (!nk || !nv) return NULL;
        a->keys = nk; a->vals = nv; a->cap = ncap;
    }
    a->keys[a->n] = idx;
    a->vals[a->n] = 0;
    return &a->vals[a->n++];
}

PWord_t judy_shim_get(Pvoid_t pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)pa;
    size_t i;
    if (!a) return NULL;
    for (i = 0; i < a->n; i++)
        if (a->keys[i] == idx)
            return &a->vals[i];
    return NULL;
}

int judy_shim_del(Pvoid_t *pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    size_t i;
    if (!a) return 0;
    for (i = 0; i < a->n; i++)
        if (a->keys[i] == idx) {
            a->keys[i] = a->keys[a->n - 1];
            a->vals[i] = a->vals[a->n - 1];
            a->n--;
            return 1;
        }
    return 0;
}

static PWord_t shim_ge(struct judy_shim_arr *a, Word_t lo, Word_t *idx)
{
    size_t i;
    int found = 0;
    Word_t best = 0;
    PWord_t pv = NULL;
    if (!a) return NULL;
    for (i = 0; i < a->n; i++)
        if (a->keys[i] >= lo && (!found || a->keys[i] < best)) {
            found = 1;
            best = a->keys[i];
            pv = &a->vals[i];
        }
    if (found) *idx = best;
    return pv;
}

PWord_t judy_shim_first(Pvoid_t pa, Word_t *idx)
{
    return shim_ge((struct judy_shim_arr *)pa, *idx, idx);
}

PWord_t judy_shim_next(Pvoid_t pa, Word_t *idx)
{
    if (*idx == (Word_t)-1) return NULL;
    return shim_ge((struct judy_shim_arr *)pa, *idx + 1, idx);
}

Word_t judy_shim_free(Pvoid_t *pa)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    Word_t freed = 0;
    if (a) {
        freed = (Word_t)(a->cap * 2 * sizeof(Word_t) + sizeof(*a));
        free(a->keys);
        free(a->vals);
        free(a);
    }
    *pa = NULL;
    return freed;
}
