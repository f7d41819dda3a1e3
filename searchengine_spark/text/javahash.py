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


def hashmap_iteration_order_ints(keys_in_insertion_order: list[int]) -> list[int]:
    """Iteration order of ``new HashMap<Integer, ·>()`` after inserting
    the given distinct int keys in order. ``Integer.hashCode`` is the
    value itself; the bucket machinery is identical to the String case.
    Needed by the scored tier writer, whose PriorityQueue is fed from
    ``accumulator.values()`` — a HashMap<Integer, DiskPosting>
    (``TieredIndexWriterWithScore.java:117,158``)."""
    cap = 16
    threshold = 12
    buckets: list[list[tuple[int, int]]] = [[] for _ in range(cap)]
    size = 0
    for k in keys_in_insertion_order:
        h = _spread(k & 0xFFFFFFFF)
        buckets[h & (cap - 1)].append((k, h))
        size += 1
        if size > threshold:
            cap *= 2
            threshold = int(cap * 0.75)
            nb: list[list[tuple[int, int]]] = [[] for _ in range(cap)]
            for b in buckets:
                for k2, h2 in b:
                    nb[h2 & (cap - 1)].append((k2, h2))
            buckets = nb
    return [k for b in buckets for k, _ in b]


def hashmap_iteration_order(keys_in_insertion_order: list[str]) -> list[str]:
    """Iteration order of a ``new HashMap<>()`` after inserting the given
    distinct keys in order (value updates don't move entries)."""
    cap = 16
    threshold = 12
    buckets: list[list[tuple[str, int]]] = [[] for _ in range(cap)]
    size = 0
    for k in keys_in_insertion_order:
        h = _spread(java_string_hash(k))
        buckets[h & (cap - 1)].append((k, h))
        size += 1
        if size > threshold:
            cap *= 2
            threshold = int(cap * 0.75)
            nb: list[list[tuple[str, int]]] = [[] for _ in range(cap)]
            for b in buckets:  # split preserves relative order (JDK8 resize)
                for k2, h2 in b:
                    nb[h2 & (cap - 1)].append((k2, h2))
            buckets = nb
    return [k for b in buckets for k, _ in b]
