"""Pure-Python oracle backend for the boolean planner (tests only).

Sorted-list two-pointer merges over the :class:`OracleIndex` postings —
the direct analogue of the reference's merge loops
(``Milestone2/BooleanQueryParser.java:198-305,311-360,449-471``). Plists
are ``list[(doc_id, positions list | None)]`` in ascending doc_id order.
"""

from __future__ import annotations

from ..query.boolean import BooleanPlanner
from .refmodel import OracleIndex

PList = list  # [(doc_id, positions|None), ...] docID-ascending


class OracleBackend:
    def __init__(self, oidx: OracleIndex) -> None:
        self.oidx = oidx

    def lookup(self, term: str, with_positions: bool):
        plist = self.oidx.index.get(term)
        if plist is None:
            return None
        if with_positions:
            return [(d, list(ps)) for d, ps in plist]
        return [(d, None) for d, _ in plist]

    def and_merge(self, a: PList, b: PList) -> PList:
        bset = {d for d, _ in b}
        return [(d, p) for d, p in a if d in bset]

    def or_merge(self, a: PList, b: PList) -> PList:
        have = {d for d, _ in a}
        out = list(a) + [(d, p) for d, p in b if d not in have]
        out.sort(key=lambda x: x[0])
        return out

    def andnot(self, a: PList, b: PList) -> PList:
        bset = {d for d, _ in b}
        return [(d, p) for d, p in a if d not in bset]

    def phrase_merge(self, a: PList, b: PList, k: int) -> PList:
        bpos = {d: set(p) for d, p in b}
        out = []
        for d, ps in a:
            if d not in bpos or ps is None:
                continue
            hits = [p for p in ps if p + k in bpos[d]]
            if hits:
                out.append((d, hits))
        return out

    def is_empty(self, p: PList) -> bool:
        return len(p) == 0


def boolean_query_oracle(oidx: OracleIndex, query: str) -> list[int]:
    """Ascending doc_ids the reference would return (None query → [])."""
    plist = BooleanPlanner(OracleBackend(oidx)).execute(query)
    if plist is None:
        return []
    return sorted(d for d, _ in plist)
