/* Backing store for the JudyL/Judy1 shim (see include/Judy.h).
 *
 * Layout per array: an insertion-ordered (key, value) entry list, an
 * open-addressing hash index over it (power-of-two, linear probing,
 * grown at 2/3 load) for O(1) insert/lookup, and a lazily (re)sorted
 * index for the ordered-iteration ops — JLF/JLN/JLL sort once after any
 * modification, then binary-search, so build-then-iterate phases (the
 * reference's encode path) cost O(n log n) total, matching real Judy's
 * ordered semantics. Deletion (rare: one JLD site in tdb.c's filter
 * option map) swap-removes the entry and rebuilds the hash index.
 *
 * Test tooling only — NOT part of the graft library. */
#include <stdlib.h>
#include <string.h>
#include "Judy.h"

struct judy_shim_arr {
    Word_t *keys;      /* insertion-ordered */
    Word_t *vals;
    size_t n, cap;
    size_t *slots;     /* hash index: 1-based entry index, 0 = empty */
    size_t nslots;     /* power of two */
    size_t *order;     /* indices into keys, ascending by key */
    int sorted;
};

static size_t hash_word(Word_t x)
{
    /* splitmix64 finalizer — good avalanche for sequential keys */
    unsigned long long z = (unsigned long long)x;
    z += 0x9e3779b97f4a7c15ULL;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return (size_t)(z ^ (z >> 31));
}

/* find the slot holding `key`, or the empty slot where it would go */
static size_t *probe(const struct judy_shim_arr *a, Word_t key)
{
    size_t mask = a->nslots - 1;
    size_t i = hash_word(key) & mask;
    for (;;) {
        size_t e = a->slots[i];
        if (!e || a->keys[e - 1] == key)
            return &a->slots[i];
        i = (i + 1) & mask;
    }
}

static int rehash(struct judy_shim_arr *a, size_t nslots)
{
    size_t *ns = calloc(nslots, sizeof(size_t));
    size_t i;
    if (!ns) return 0;
    free(a->slots);
    a->slots = ns;
    a->nslots = nslots;
    for (i = 0; i < a->n; i++)
        *probe(a, a->keys[i]) = i + 1;
    return 1;
}

PWord_t judy_shim_ins(Pvoid_t *pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    size_t *slot;
    if (!a) {
        a = calloc(1, sizeof(*a));
        if (!a) return NULL;
        if (!rehash(a, 16)) { free(a); return NULL; }
        *pa = a;
    }
    slot = probe(a, idx);
    if (*slot)
        return &a->vals[*slot - 1];
    if (a->n == a->cap) {
        size_t ncap = a->cap ? a->cap * 2 : 8;
        Word_t *nk = realloc(a->keys, ncap * sizeof(Word_t));
        Word_t *nv = realloc(a->vals, ncap * sizeof(Word_t));
        if (!nk || !nv) return NULL;
        a->keys = nk; a->vals = nv; a->cap = ncap;
        free(a->order); a->order = NULL;
    }
    a->keys[a->n] = idx;
    a->vals[a->n] = 0;
    a->n++;
    a->sorted = 0;
    *slot = a->n;
    if (a->n * 3 > a->nslots * 2 && !rehash(a, a->nslots * 2))
        return NULL;
    /* rehash may have moved slots; re-probe for a stable value pointer */
    return &a->vals[*probe(a, idx) - 1];
}

PWord_t judy_shim_get(Pvoid_t pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)pa;
    size_t *slot;
    if (!a || !a->n) return NULL;
    slot = probe(a, idx);
    return *slot ? &a->vals[*slot - 1] : NULL;
}

int judy_shim_del(Pvoid_t *pa, Word_t idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    size_t *slot, e;
    if (!a || !a->n) return 0;
    slot = probe(a, idx);
    if (!*slot) return 0;
    e = *slot - 1;
    a->keys[e] = a->keys[a->n - 1];
    a->vals[e] = a->vals[a->n - 1];
    a->n--;
    a->sorted = 0;
    /* linear-probe chains break on hole-punching: rebuild the index */
    rehash(a, a->nslots);
    return 1;
}

Word_t judy_shim_free(Pvoid_t *pa)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)*pa;
    Word_t bytes;
    if (!a) return 0;
    bytes = (Word_t)(a->n * 2 * sizeof(Word_t));
    free(a->keys);
    free(a->vals);
    free(a->slots);
    free(a->order);
    free(a);
    *pa = NULL;
    return bytes;
}

static const struct judy_shim_arr *sort_ctx;
static int cmp_order(const void *x, const void *y)
{
    Word_t kx = sort_ctx->keys[*(const size_t *)x];
    Word_t ky = sort_ctx->keys[*(const size_t *)y];
    return kx < ky ? -1 : (kx > ky ? 1 : 0);
}

static int ensure_sorted(struct judy_shim_arr *a)
{
    size_t i;
    if (a->sorted) return 1;
    {
        size_t *no = realloc(a->order, (a->cap ? a->cap : 1) * sizeof(size_t));
        if (!no) return 0;
        a->order = no;
    }
    for (i = 0; i < a->n; i++)
        a->order[i] = i;
    sort_ctx = a;
    qsort(a->order, a->n, sizeof(size_t), cmp_order);
    a->sorted = 1;
    return 1;
}

/* smallest position in order[] whose key >= idx (a->n when none) */
static size_t lower_bound(const struct judy_shim_arr *a, Word_t idx)
{
    size_t lo = 0, hi = a->n;
    while (lo < hi) {
        size_t mid = lo + (hi - lo) / 2;
        if (a->keys[a->order[mid]] < idx) lo = mid + 1;
        else hi = mid;
    }
    return lo;
}

static PWord_t at_order(struct judy_shim_arr *a, size_t pos, Word_t *idx)
{
    if (pos >= a->n) return NULL;
    *idx = a->keys[a->order[pos]];
    return &a->vals[a->order[pos]];
}

PWord_t judy_shim_first(Pvoid_t pa, Word_t *idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)pa;
    if (!a || !a->n || !ensure_sorted(a)) return NULL;
    return at_order(a, lower_bound(a, *idx), idx);
}

PWord_t judy_shim_next(Pvoid_t pa, Word_t *idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)pa;
    size_t pos;
    if (!a || !a->n || !ensure_sorted(a)) return NULL;
    pos = lower_bound(a, *idx);
    /* skip an exact hit: JLN wants strictly greater */
    if (pos < a->n && a->keys[a->order[pos]] == *idx) pos++;
    return at_order(a, pos, idx);
}

PWord_t judy_shim_last(Pvoid_t pa, Word_t *idx)
{
    struct judy_shim_arr *a = (struct judy_shim_arr *)pa;
    size_t pos;
    if (!a || !a->n || !ensure_sorted(a)) return NULL;
    pos = lower_bound(a, *idx);
    /* largest key <= idx: step back unless we sit exactly on idx */
    if (pos < a->n && a->keys[a->order[pos]] == *idx)
        return at_order(a, pos, idx);
    if (pos == 0) return NULL;
    return at_order(a, pos - 1, idx);
}

/* ---- JudySL: string keys, strcmp-ordered iteration -------------------- */

struct judy_shim_sl {
    char **keys;       /* strdup'd, insertion-ordered */
    Word_t *vals;
    size_t n, cap;
    size_t *order;     /* indices sorted by strcmp */
    int sorted;
};

PWord_t judy_shim_sl_ins(Pvoid_t *pa, const unsigned char *key)
{
    struct judy_shim_sl *a = (struct judy_shim_sl *)*pa;
    size_t i;
    if (!a) {
        a = calloc(1, sizeof(*a));
        if (!a) return NULL;
        *pa = a;
    }
    /* linear scan: every reachable JudySL holds field NAMES (<= the
     * format's 2^14 fields, in practice a handful) — n is tiny */
    for (i = 0; i < a->n; i++)
        if (!strcmp(a->keys[i], (const char *)key))
            return &a->vals[i];
    if (a->n == a->cap) {
        size_t ncap = a->cap ? a->cap * 2 : 8;
        char **nk = realloc(a->keys, ncap * sizeof(char *));
        Word_t *nv = realloc(a->vals, ncap * sizeof(Word_t));
        if (!nk || !nv) return NULL;
        a->keys = nk; a->vals = nv; a->cap = ncap;
        free(a->order); a->order = NULL;
    }
    a->keys[a->n] = strdup((const char *)key);
    if (!a->keys[a->n]) return NULL;
    a->vals[a->n] = 0;
    a->sorted = 0;
    return &a->vals[a->n++];
}

static const struct judy_shim_sl *sl_sort_ctx;
static int sl_cmp_order(const void *x, const void *y)
{
    return strcmp(sl_sort_ctx->keys[*(const size_t *)x],
                  sl_sort_ctx->keys[*(const size_t *)y]);
}

static int sl_ensure_sorted(struct judy_shim_sl *a)
{
    size_t i;
    if (a->sorted) return 1;
    {
        size_t *no = realloc(a->order, (a->cap ? a->cap : 1) * sizeof(size_t));
        if (!no) return 0;
        a->order = no;
    }
    for (i = 0; i < a->n; i++)
        a->order[i] = i;
    sl_sort_ctx = a;
    qsort(a->order, a->n, sizeof(size_t), sl_cmp_order);
    a->sorted = 1;
    return 1;
}

/* smallest sorted position whose key is >= (or > when `strict`) key */
static PWord_t sl_from(struct judy_shim_sl *a, unsigned char *key, int strict)
{
    size_t lo = 0, hi;
    if (!a || !a->n || !sl_ensure_sorted(a)) return NULL;
    hi = a->n;
    while (lo < hi) {
        size_t mid = lo + (hi - lo) / 2;
        int c = strcmp(a->keys[a->order[mid]], (const char *)key);
        if (c < 0 || (strict && c == 0)) lo = mid + 1;
        else hi = mid;
    }
    if (lo >= a->n) return NULL;
    strcpy((char *)key, a->keys[a->order[lo]]);
    return &a->vals[a->order[lo]];
}

PWord_t judy_shim_sl_first(Pvoid_t pa, unsigned char *key)
{
    return sl_from((struct judy_shim_sl *)pa, key, 0);
}

PWord_t judy_shim_sl_next(Pvoid_t pa, unsigned char *key)
{
    return sl_from((struct judy_shim_sl *)pa, key, 1);
}

Word_t judy_shim_sl_free(Pvoid_t *pa)
{
    struct judy_shim_sl *a = (struct judy_shim_sl *)*pa;
    Word_t bytes = 0;
    size_t i;
    if (!a) return 0;
    for (i = 0; i < a->n; i++) {
        bytes += (Word_t)strlen(a->keys[i]) + 1;
        free(a->keys[i]);
    }
    free(a->keys);
    free(a->vals);
    free(a->order);
    free(a);
    *pa = NULL;
    return bytes;
}

/* ---- JudyHS: (bytes, len) keys, hash only ----------------------------- */

struct judy_shim_hs_entry {
    unsigned char *key;
    Word_t len;
    Word_t val;
};

struct judy_shim_hs {
    struct judy_shim_hs_entry *es;
    size_t n, cap;
};

static PWord_t hs_find(struct judy_shim_hs *a, const void *key, Word_t len)
{
    size_t i;
    for (i = 0; i < a->n; i++)
        if (a->es[i].len == len && !memcmp(a->es[i].key, key, len))
            return &a->es[i].val;
    return NULL;
}

PWord_t judy_shim_hs_ins(Pvoid_t *pa, const void *key, Word_t len)
{
    struct judy_shim_hs *a = (struct judy_shim_hs *)*pa;
    PWord_t hit;
    if (!a) {
        a = calloc(1, sizeof(*a));
        if (!a) return NULL;
        *pa = a;
    }
    /* linear scan: the reachable JudyHS holds JSON field names — tiny */
    hit = hs_find(a, key, len);
    if (hit) return hit;
    if (a->n == a->cap) {
        size_t ncap = a->cap ? a->cap * 2 : 8;
        struct judy_shim_hs_entry *ne =
            realloc(a->es, ncap * sizeof(*a->es));
        if (!ne) return NULL;
        a->es = ne; a->cap = ncap;
    }
    a->es[a->n].key = malloc(len ? len : 1);
    if (!a->es[a->n].key) return NULL;
    memcpy(a->es[a->n].key, key, len);
    a->es[a->n].len = len;
    a->es[a->n].val = 0;
    return &a->es[a->n++].val;
}

PWord_t judy_shim_hs_get(Pvoid_t pa, const void *key, Word_t len)
{
    struct judy_shim_hs *a = (struct judy_shim_hs *)pa;
    if (!a) return NULL;
    return hs_find(a, key, len);
}

Word_t judy_shim_hs_free(Pvoid_t *pa)
{
    struct judy_shim_hs *a = (struct judy_shim_hs *)*pa;
    Word_t bytes = 0;
    size_t i;
    if (!a) return 0;
    for (i = 0; i < a->n; i++) {
        bytes += a->es[i].len;
        free(a->es[i].key);
    }
    free(a->es);
    free(a);
    *pa = NULL;
    return bytes;
}
