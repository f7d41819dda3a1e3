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


# --------------------------------------------------------------------------
# Flat-buffer replay: the 16 B/posting fast path for hot terms
# --------------------------------------------------------------------------
#
# JavaPriorityQueue above stores one Python tuple per posting (~100 B +
# pointer churn) — fine for the fuzz corpora, a per-task memory and speed
# wall for a 10^8-posting stopword (VERDICT r4 #3). The functions below
# replay the IDENTICAL siftUp/siftDown sequence on two flat 8-byte
# buffers (key + insertion index), so heap state is exactly 16 B/posting,
# and they stop popping at the tier-2 boundary: everything still in the
# heap after ⌈n/10⌉+⌈n/3⌉ pops is tier 3 BY DEFINITION (the reference's
# third loop pops the remainder in some order but assigns one constant
# label — order inside tier 3 is unobservable), so ~57 % of the poll work
# vanishes with zero fidelity loss. Equivalence to the object heap is
# property-tested on tie-heavy fuzz (test_tiered.py) and the integrated
# path is diffchecked against the real Java engine.
#
# Key dtypes: the unscored writer compares wdt = 1+ln(tf) (float64), which
# is strictly increasing in integer tf for tf < 2^52 — ties ⟺ equal tf —
# so the replay compares raw tf ('q'); the scored writer compares the
# precomputed DOUBLE score, and two distinct tfs could in principle round
# to one double after ·wqt, so there the replay compares the score bits
# themselves ('d'), exactly like Java.


def _heap_pop_order(keys, typecode: str, n_pops: int):
    """Replay JDK offers (insertion order) + the first ``n_pops`` polls
    over flat buffers. ``keys``: numpy array (descending priority = larger
    key first). Returns int64 numpy array of the popped insertion indices,
    in pop order."""
    from array import array

    import numpy as np

    n = len(keys)
    if n_pops <= 0 or n == 0:
        return np.empty(0, dtype=np.int64)
    hk = array(typecode)  # heap keys, 8 B each
    hk.frombytes(keys.tobytes())  # insertion-order seed; no Python objects
    hi = array("q", range(n))  # heap payload: insertion index
    # ---- offers: siftUp with the JDK's >=-parent early break ----------
    # (seeded arrays are overwritten in place exactly as q[k]=x would)
    for k in range(n):
        x, xi = hk[k], k
        while k > 0:
            parent = (k - 1) >> 1
            pk = hk[parent]
            if x <= pk:  # cmp(x, parent) >= 0 → stop
                break
            hk[k], hi[k] = pk, hi[parent]
            k = parent
        hk[k], hi[k] = x, xi
    # ---- polls: root out, last to root, siftDown (left child on ties) --
    out = np.empty(n_pops, dtype=np.int64)
    size = n
    for p in range(n_pops):
        out[p] = hi[0]
        size -= 1
        x, xi = hk[size], hi[size]
        if size > 0:
            k, half = 0, size >> 1
            while k < half:
                child = 2 * k + 1
                right = child + 1
                ck = hk[child]
                if right < size and ck < hk[right]:  # cmp(l, r) > 0 → right
                    child = right
                    ck = hk[child]
                if x >= ck:  # cmp(x, child) <= 0 → stop
                    break
                hk[k], hi[k] = ck, hi[child]
                k = child
            hk[k], hi[k] = x, xi
    return out


def _tier_labels_from_pops(n: int, pops) -> "np.ndarray":
    """pops (insertion indices, pop order) → int32 tier labels aligned
    with insertion order; unpopped = tier 3."""
    import numpy as np

    t1 = min(math.ceil(n / 10), n)
    out = np.full(n, 3, dtype=np.int32)
    out[pops[:t1]] = 1
    out[pops[t1:]] = 2
    return out


def assign_tiers_flat(tfs) -> "np.ndarray":
    """``assign_tiers`` on flat buffers: int64 tf array (docID order) →
    int32 tier array. Bit-identical membership, 16 B/posting heap."""
    import numpy as np

    tf_arr = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(tf_arr)
    n_pops = min(math.ceil(n / 10) + math.ceil(n / 3), n)
    return _tier_labels_from_pops(n, _heap_pop_order(tf_arr, "q", n_pops))


def assign_tiers_scored_flat(doc_ids, scores) -> "np.ndarray":
    """``assign_tiers_scored`` on flat buffers: offer order is the
    HashMap<Integer> iteration order of the docIDs (closed form in
    text/javahash.py), keys are the precomputed float64 scores."""
    import numpy as np

    from ..text.javahash import hashmap_iteration_order_ints

    ids = list(doc_ids)
    n = len(ids)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    sc = np.ascontiguousarray(scores, dtype=np.float64)
    pos = {d: i for i, d in enumerate(ids)}
    ins = np.fromiter(
        (pos[d] for d in hashmap_iteration_order_ints(ids)),
        dtype=np.int64,
        count=n,
    )
    n_pops = min(math.ceil(n / 10) + math.ceil(n / 3), n)
    pops = _heap_pop_order(sc[ins], "d", n_pops)
    out = np.full(n, 3, dtype=np.int32)
    t1 = min(math.ceil(n / 10), n)
    out[ins[pops[:t1]]] = 1
    out[ins[pops[t1:]]] = 2
    return out
