"""Generate tests/fixtures/qrels_mini.json — a small labeled query/qrel
fixture so MAP measures retrieval quality against judgments that are
INDEPENDENT of any engine's scoring (the round-1 harness only had
self-referential qrels: MAP 0.778 measured BM25-vs-tfidf agreement).

Relevance rule (explicit, engine-independent, applied to raw text —
the stand-in for a human judge on this synthetic corpus):

    doc is RELEVANT to query q  ⇔  every query term appears as a raw
    lowercased whitespace token of the doc's text (AND-containment).

The rule never sees tokenizer output, stemming, positions, or any
score — an engine that ranks well against it does so on its own
merits. Corpus: the deterministic clustered synthetic pages table
(corpus.page_row(i, clustered=True)) at N_DOCS docs, doc_id = url-sort
order (identical to the build's dense-id assignment).

Run:  python tools/make_mini_qrels.py   (rewrites the fixture in place)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from searchengine_spark.corpus import _REAL, page_row, topic_terms  # noqa: E402

N_DOCS = 800

QUERIES: list[str] = (
    # topic-selective (clustered corpus: contiguous doc ranges)
    [" ".join(topic_terms(t, 2)) for t in range(10)]
    + [" ".join(topic_terms(t, 3)) for t in (10, 12, 14)]
    # head-vocabulary pairs shared with the driver testdata vocabulary
    + [
        "fast data",
        "spark stream",
        "search engine",
        "index rank",
        "merge sort join",
        "vanilla-shake",
        "crawl web page",
    ]
)


def main() -> None:
    pages = [page_row(i, clustered=True) for i in range(N_DOCS)]
    # doc_id = rank in url order (the build's dense-id rule)
    order = sorted(range(N_DOCS), key=lambda i: pages[i][0])
    toks = {
        doc_id: set(pages[i][3].lower().split(" "))
        for doc_id, i in enumerate(order)
    }
    out = []
    for qid, q in enumerate(QUERIES):
        terms = [t for t in q.lower().split(" ") if t]
        rel = sorted(
            d for d, ts in toks.items() if all(t in ts for t in terms)
        )
        if not rel:
            raise SystemExit(f"query {q!r} has no relevant docs — adjust")
        out.append({"qid": qid, "query": q, "relevant": rel})
    fixture = {
        "corpus": {"n_docs": N_DOCS, "clustered": True, "order": "url"},
        "rule": "AND-containment of raw lowercased whitespace tokens",
        "queries": out,
    }
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "qrels_mini.json"
    )
    with open(path, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    sizes = [len(q["relevant"]) for q in out]
    print(f"{len(out)} queries; relevant-set sizes min={min(sizes)} "
          f"median={sorted(sizes)[len(sizes)//2]} max={max(sizes)}")


if __name__ == "__main__":
    main()
