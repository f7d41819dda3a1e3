"""Exact replay of ``java.util.PriorityQueue`` (JDK 8+) sift order.

Why: the reference assigns tier membership by popping a PriorityQueue
whose comparator returns 0 on equal wdt (``TieredIndexWriter.java:109-126``).
Pop order among EQUAL-wdt postings is therefore binary-heap order — an
implementation detail of the JDK's siftUp/siftDown — and tier boundaries
cut through tie runs, so bit-faithful tier membership requires replaying
the heap, not just a stable sort. Insertion order is the postings'
docID order (``addAll`` offers in list order, built at ``:122-126``).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence


class JavaPriorityQueue:
    """Semantics-exact binary heap: offer = append + siftUp, poll = take
    root, move last element to root, siftDown. cmp(a, b) < 0 ⇒ a first."""

    def __init__(self, cmp: Callable) -> None:
        self._q: list = []
        self._cmp = cmp

    def __len__(self) -> int:
        return len(self._q)

    def offer(self, x) -> None:
        q, cmp = self._q, self._cmp
        k = len(q)
        q.append(x)
        while k > 0:
            parent = (k - 1) >> 1
            if cmp(x, q[parent]) >= 0:
                break
            q[k] = q[parent]
            k = parent
        q[k] = x

    def add_all(self, xs: Sequence) -> None:
        for x in xs:
            self.offer(x)

    def poll(self):
        q, cmp = self._q, self._cmp
        result = q[0]
        x = q.pop()
        size = len(q)
        if size > 0:
            k, half = 0, size >> 1
            while k < half:
                child = 2 * k + 1
                right = child + 1
                if right < size and cmp(q[child], q[right]) > 0:
                    child = right
                if cmp(x, q[child]) <= 0:
                    break
                q[k] = q[child]
                k = child
            q[k] = x
        return result


def _wdt_cmp(a: tuple, b: tuple) -> int:
    """TieredIndexWriter.java:110-118: descending wdt, 0 on ties."""
    if a[0] < b[0]:
        return 1
    if a[0] > b[0]:
        return -1
    return 0


def assign_tiers_scored(
    doc_ids: Sequence[int], scores: Sequence[float]
) -> list[int]:
    """Tier labels for the WithScore writer
    (``TieredIndexWriterWithScore.java:100-166``): the PriorityQueue is
    ranked by the precomputed score, and — crucially for tie order — fed
    from ``accumulator.values()``, a HashMap<Integer,·> built in posting
    (docID) order, so the offer sequence is HashMap-Integer iteration
    order, not docID order."""
    from ..text.javahash import hashmap_iteration_order_ints

    n = len(doc_ids)
    pos = {d: i for i, d in enumerate(doc_ids)}
    insertion = hashmap_iteration_order_ints(list(doc_ids))
    pq = JavaPriorityQueue(_wdt_cmp)
    pq.add_all([(scores[pos[d]], pos[d]) for d in insertion])
    out = [0] * n
    for tier, quota in (
        (1, math.ceil(n / 10)),
        (2, math.ceil(n / 3)),
        (3, n),
    ):
        taken = 0
        while taken < quota and len(pq):
            out[pq.poll()[1]] = tier
            taken += 1
    return out


def assign_tiers(doc_ids: Sequence[int], tfs: Sequence[int]) -> list[int]:
    """Tier (1/2/3) per posting, aligned with the input (docID order —
    the reference's insertion order). Tier sizes ⌈n/10⌉ / ⌈n/3⌉ / rest
    (``TieredIndexWriter.java:133-137``), membership by exact heap pops."""
    n = len(doc_ids)
    pq = JavaPriorityQueue(_wdt_cmp)
    # entries (wdt, index); wdt = 1 + ln(tf), TieredIndexWriter.java:122
    pq.add_all([(1.0 + math.log(tf), i) for i, tf in enumerate(tfs)])
    out = [0] * n
    for tier, quota in (
        (1, math.ceil(n / 10)),
        (2, math.ceil(n / 3)),
        (3, n),
    ):
        taken = 0
        while taken < quota and len(pq):
            out[pq.poll()[1]] = tier
            taken += 1
    return out
