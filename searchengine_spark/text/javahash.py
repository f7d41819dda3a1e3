"""Simulation of java.util.HashMap<String, ·> iteration order.

Why this exists: the reference computes the doc weight Ld by iterating
``termFrequencyMap.keySet()`` (``Milestone1/SimpleEngine.java:251-258``).
Float64 summation is order-dependent, so bit-identical Ld values require
summing in Java's HashMap iteration order, not first-occurrence order.

The simulation is exact for HashMap semantics (JDK 8+):
  - ``String.hashCode`` = Σ s[i]·31^(n-1-i) over UTF-16 code units, int32
  - ``HashMap.hash``    = h ^ (h >>> 16)
  - bucket index        = hash & (capacity-1); default capacity 16,
    load factor 0.75, resize doubles when size exceeds threshold
  - resize splits each bucket into lo/hi lists preserving relative order
  - treeification preserves the linked-list `next` order for iteration,
    so the list model remains exact
"""

from __future__ import annotations


def java_string_hash(s: str) -> int:
    """int32 String.hashCode over UTF-16 code units."""
    h = 0
    for ch in s:
        cp = ord(ch)
        if cp > 0xFFFF:  # surrogate pair, as Java sees two code units
            cp -= 0x10000
            for unit in (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)):
                h = (31 * h + unit) & 0xFFFFFFFF
        else:
            h = (31 * h + cp) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def _spread(h: int) -> int:
    u = h & 0xFFFFFFFF
    return (u ^ (u >> 16)) & 0xFFFFFFFF


def _final_capacity(n: int) -> int:
    """Table capacity after n insertions into ``new HashMap<>()``:
    cap starts at 16 (threshold 12) and doubles whenever size exceeds
    the threshold (HashMap.resize, JDK8)."""
    cap, thr = 16, 12
    while n > thr:
        cap <<= 1
        thr = (cap * 3) >> 2  # == int(cap * 0.75) for powers of two
    return cap


# Closed form used below (replaces the per-call bucket simulation —
# this replay sits on the tokenize hot path and was ~⅓ of kernel time):
# iteration order == STABLE sort of the insertion sequence by final
# bucket index (hash & (final_cap - 1)). Proof: buckets are append-only
# lists; JDK8 resize splits each list into lo/hi preserving relative
# order, and every key's final bucket is hash & (final_cap - 1), so
# relative order within a final bucket is insertion order at every
# capacity. Treeified bins iterate in preserved `next` order, so the
# list model (and the sort) stays exact.

def hashmap_iteration_order_sim(keys: list, hash_fn) -> list:
    """Reference BUCKET-LEVEL simulation of JDK8 ``new HashMap<>()``
    insertion + resize + iteration — the model the closed form below was
    proved against. Kept checked-in as the test oracle so the CLAUDE.md
    equivalence gate (re-run on any change to this module) is reproducible
    from the repo: ``tests/test_text_pipeline.py::test_hashmap_closed_form_equivalence``.

    Semantics replayed: default capacity 16, load factor 0.75, resize
    doubles when size exceeds threshold; resize splits each bucket into
    lo/hi lists preserving relative order (HashMap.resize, JDK8);
    iteration walks buckets in index order, entries in list order.
    ``hash_fn`` is the key's Java ``hashCode()`` (int32); keys distinct.
    """
    cap, thr = 16, 12
    table: list[list] = [[] for _ in range(cap)]
    size = 0
    for k in keys:
        h = _spread(hash_fn(k) & 0xFFFFFFFF)
        table[h & (cap - 1)].append((k, h))
        size += 1
        if size > thr:
            cap <<= 1
            thr = (cap * 3) >> 2
            # lo/hi split: new bucket j's entries all come from old bucket
            # j & (old_cap-1), so appending in old-bucket order preserves
            # each entry pair's relative order — exactly JDK8's split
            ntab: list[list] = [[] for _ in range(cap)]
            for bucket in table:
                for kk, hh in bucket:
                    ntab[hh & (cap - 1)].append((kk, hh))
            table = ntab
    out = []
    for bucket in table:
        out.extend(kk for kk, _ in bucket)
    return out


_STR_HASH_MEMO: dict[str, int] = {}


def spread_string_hash(s: str) -> int:
    """Memoized ``_spread(String.hashCode)`` — the per-key quantity every
    HashMap-order replay needs. Shared memo with
    :func:`hashmap_iteration_order` (same values, same bound)."""
    memo = _STR_HASH_MEMO
    if len(memo) > 1_000_000:  # bound worker memory on open vocabularies
        memo.clear()
    h = memo.get(s)
    if h is None:
        h = _spread(java_string_hash(s))
        memo[s] = h
    return h


def hashmap_iteration_order_ints(keys_in_insertion_order: list[int]) -> list[int]:
    """Iteration order of ``new HashMap<Integer, ·>()`` after inserting
    the given distinct int keys in order. ``Integer.hashCode`` is the
    value itself; the bucket machinery is identical to the String case.
    Needed by the scored tier writer, whose PriorityQueue is fed from
    ``accumulator.values()`` — a HashMap<Integer, DiskPosting>
    (``TieredIndexWriterWithScore.java:117,158``)."""
    mask = _final_capacity(len(keys_in_insertion_order)) - 1
    bs = [_spread(k & 0xFFFFFFFF) & mask for k in keys_in_insertion_order]
    idx = sorted(range(len(bs)), key=bs.__getitem__)  # stable
    return [keys_in_insertion_order[i] for i in idx]


def hashmap_iteration_order(keys_in_insertion_order: list[str]) -> list[str]:
    """Iteration order of a ``new HashMap<>()`` after inserting the given
    distinct keys in order (value updates don't move entries). String
    hashes are memoized process-wide (term vocabularies repeat heavily
    across documents)."""
    memo = _STR_HASH_MEMO
    if len(memo) > 1_000_000:  # bound worker memory on open vocabularies
        memo.clear()
    mask = _final_capacity(len(keys_in_insertion_order)) - 1
    bs = []
    for k in keys_in_insertion_order:
        h = memo.get(k)
        if h is None:
            h = _spread(java_string_hash(k))
            memo[k] = h
        bs.append(h & mask)
    idx = sorted(range(len(bs)), key=bs.__getitem__)  # stable
    return [keys_in_insertion_order[i] for i in idx]
