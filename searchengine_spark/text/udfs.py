"""Arrow-batched (pandas) UDFs — the only Python↔JVM boundary the engine
uses. Per-row Python UDFs are banned (input_hint; audit: ``df.explain()``
must show ArrowEvalPython, never BatchEvalPython).

Layers:
  - ``extract_text``      html binary → text (the reference's "extraction"
    is JSON-field access, SimpleEngine.java:114; our web-page analogue is
    a deterministic template parse with a generic tag-strip fallback —
    byte-identical to the ``text`` column per url, tested)
  - ``tokenize_doc``      text → per-doc aggregated term vector
    (term, tf, positions[]) + dl + Ld in ONE pass: groupBy(term,doc) is
    pre-aggregated inside the UDF so the shuffle moves per-doc-term rows,
    never per-token rows
  - ``simple_tokens``     lowercase whitespace tokens (SQL-expressible
    semantics, used by the DuckDB-oracle-checked analytics queries)
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .porter import StemCache
from .tokenizer import doc_ld, java_ws_split, token_events, tokenize_events

# --------------------------------------------------------------------------
# extract_text
# --------------------------------------------------------------------------

_BODY_P = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"\s+")


def _extract_one(b: bytes | None) -> str | None:
    if b is None:
        return None
    m = _BODY_P.search(b)
    if m is not None:  # our corpus template: exact inverse of generation
        return _html.unescape(m.group(1).decode("utf-8"))
    # generic fallback: strip tags, collapse whitespace
    txt = _TAG.sub(" ", b.decode("utf-8", errors="replace"))
    return _WS_RUN.sub(" ", _html.unescape(txt)).strip()


@F.pandas_udf(T.StringType())
def extract_text(html_col: pd.Series) -> pd.Series:
    return html_col.map(_extract_one)


# --------------------------------------------------------------------------
# tokenize_doc: text -> (terms[], dl, ld)
# --------------------------------------------------------------------------

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField(
            "terms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType()),
                        T.StructField("tf", T.IntegerType()),
                        T.StructField("positions", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
        # dl = Σ tf (term-event count, the BM25 doc length we define;
        # includes hyphen-expansion concat terms)
        T.StructField("dl", T.IntegerType()),
        # ld = reference Ld (float64, Java-HashMap-order summation)
        T.StructField("ld", T.DoubleType()),
    ]
)


def _tokenize_batch(texts: pd.Series) -> pd.DataFrame:
    stems = StemCache()  # memoized across the whole Arrow batch
    # raw-token → (term, advance) events memo: the per-token pipeline
    # (edge strip, apostrophes, hyphen expansion, stem) is a pure
    # function of the raw token, and Zipf text repeats tokens heavily —
    # distinct raw tokens per batch are a small fraction of total, so
    # most tokens cost one dict hit instead of regex+stem work
    tok_events: dict[str, tuple] = {}
    out_terms, out_dl, out_ld = [], [], []
    for text in texts:
        acc: dict[str, list[int]] = {}
        if text:
            pos = 1
            for raw in java_ws_split(text):
                ev = tok_events.get(raw)
                if ev is None:
                    ev = token_events(raw, stems.stem)
                    tok_events[raw] = ev
                for term, adv in ev:
                    acc.setdefault(term, []).append(pos)
                    pos += adv
        out_terms.append(
            [
                {"term": t, "tf": len(ps), "positions": ps}
                for t, ps in acc.items()
            ]
        )
        out_dl.append(sum(len(ps) for ps in acc.values()))
        out_ld.append(doc_ld({t: len(ps) for t, ps in acc.items()}))
    return pd.DataFrame({"terms": out_terms, "dl": out_dl, "ld": out_ld})


@F.pandas_udf(TOKENIZED_SCHEMA)
def tokenize_doc(texts: pd.Series) -> pd.DataFrame:
    return _tokenize_batch(texts)


# --------------------------------------------------------------------------
# simple_tokens: SQL-oracle-compatible tokenization (documents table)
# --------------------------------------------------------------------------


@F.pandas_udf(T.ArrayType(T.StringType()))
def simple_tokens(texts: pd.Series) -> pd.Series:
    """Lowercase split on single spaces — matches DuckDB
    ``string_split(lower(text), ' ')`` with empties dropped, so every
    analytics query built on it has an exact ANSI-SQL oracle."""
    return texts.map(
        lambda t: [w for w in t.lower().split(" ") if w] if t is not None else None
    )
