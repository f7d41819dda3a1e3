"""Index compaction — LSM-style merge of chunked posting blocks.

Chunked batch builds and streaming ingest both append postings as
``chunk=…`` directories; a long-lived index accumulates many small
blocks per (term, bucket), which multiplies scan row-groups and decode
calls. Compaction merges every (term, bucket) group's blocks into one:
decode → concatenate (doc ranges across chunks are disjoint) → re-sort
by docID → re-encode, recomputing the block stats (df/cf/max_tf/min_dl/
min_ld/doc range/block-max). Skew stays bounded: the merge key is the
same (term, bucket) range-salt as the build, so no group exceeds
bucket_docs postings.

Commit protocol (crash-safe, mirrors the build's manifest discipline):
write ``postings_compacted``, verify Σdf_b matches the live postings,
atomically swap directories (old postings moved aside, then removed),
rebuild the lexicon, commit the manifest last.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .varbyte import (
    decode_position_lists,
    decode_sorted,
    encode_positions_flat,
    encode_sorted,
    vb_decode,
    vb_encode,
)

_OUT_SCHEMA = (
    "term string, bucket int, df_b int, cf_b long, max_tf long, min_dl int, "
    "min_ld double, doc_first long, doc_last long, max_wdt double, "
    "docs_vb binary, tfs_vb binary, pos_vb binary, dls_vb binary"
)


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for (term, bucket), g in pdf.groupby(["term", "bucket"], sort=False):
        ds, tfs, dls, poss = [], [], [], []
        for dvb, tvb, lvb, pvb in zip(
            g["docs_vb"], g["tfs_vb"], g["dls_vb"], g["pos_vb"]
        ):
            d = decode_sorted(bytes(dvb))
            t = vb_decode(bytes(tvb)).astype(np.int64)
            ds.append(d)
            tfs.append(t)
            dls.append(vb_decode(bytes(lvb)).astype(np.int64))
            poss.extend(decode_position_lists(bytes(pvb), t))
        d = np.concatenate(ds)
        t = np.concatenate(tfs)
        dl = np.concatenate(dls)
        order = np.argsort(d, kind="stable")
        d, t, dl = d[order], t[order], dl[order]
        flat = (
            np.concatenate([poss[i] for i in order])
            if poss
            else np.empty(0, dtype=np.int64)
        )
        out.append(
            (
                term,
                bucket,
                int(d.size),
                int(t.sum()),
                int(t.max()),
                int(g["min_dl"].min()),
                float(g["min_ld"].min()),
                int(d.min()),
                int(d.max()),
                1.0 + math.log(int(t.max())),
                encode_sorted(d),
                vb_encode(t),
                encode_positions_flat(flat, t),
                vb_encode(dl),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "term", "bucket", "df_b", "cf_b", "max_tf", "min_dl", "min_ld",
            "doc_first", "doc_last", "max_wdt", "docs_vb", "tfs_vb", "pos_vb",
            "dls_vb",
        ],
    )


_SENTINEL = "_compaction_in_progress"


def _sentinel_path(idx_dir: str) -> str:
    return os.path.join(idx_dir, _SENTINEL)


def _sentinel_held(idx_dir: str, ttl_sec: float) -> bool:
    """True while a LIVE compaction owns the layout: the sentinel exists,
    is fresher than ttl_sec, and (when written by this host) its pid is
    still alive. A crashed compactor's sentinel goes stale and repair
    proceeds."""
    p = _sentinel_path(idx_dir)
    try:
        st = os.stat(p)
    except FileNotFoundError:
        return False
    if time.time() - st.st_mtime > ttl_sec:
        return False
    try:
        info = json.load(open(p))
        pid = int(info.get("pid", 0))
        if pid:
            os.kill(pid, 0)  # raises if the writer died (same-host check)
    except (ProcessLookupError,):
        return False
    except Exception:
        pass  # unreadable/foreign sentinel: trust the TTL
    return True


def recover_compaction(idx_dir: str, ttl_sec: float = 3600.0) -> str | None:
    """Detect and repair a half-finished compaction swap (crash between
    the two renames in compact_index). Returns the action taken, or None.

    Called at compact start and at index open (IndexHandle /
    LocalIndexReader), so a crashed swap can never leave the index
    without a postings directory:

      * postings missing + postings_compacted present → roll FORWARD
        (the compacted data was already Σdf-verified before the swap
        began; finish its rename, drop the old dir)
      * postings missing + only postings_old present → roll BACK
      * postings present + leftovers → delete the leftovers (either the
        swap finished and cleanup died, or compaction never swapped)

    Mutual exclusion: compact_index holds a sentinel file while it works;
    while the sentinel is live (fresh + writer pid alive) this function
    takes NO action — a reader opening mid-compaction must not delete the
    writer's in-progress postings_compacted dir or roll its swap forward
    between the writer's own renames. If the sentinel is live AND the
    postings dir is missing, the writer is inside the two-rename window:
    raise rather than race it (the caller retries after the swap)."""
    post_dir = os.path.join(idx_dir, "postings")
    old_dir = os.path.join(idx_dir, "postings_old")
    new_dir = os.path.join(idx_dir, "postings_compacted")
    if _sentinel_held(idx_dir, ttl_sec):
        if os.path.exists(post_dir):
            return None  # live compaction, layout intact: nothing to do
        raise RuntimeError(
            f"compaction in progress on {idx_dir} (mid-swap); retry shortly"
        )
    # not held: any sentinel left behind is a crashed compactor's — clear it
    try:
        os.remove(_sentinel_path(idx_dir))
    except FileNotFoundError:
        pass
    if os.path.exists(post_dir):
        action = None
        if os.path.exists(new_dir):
            shutil.rmtree(new_dir, ignore_errors=True)
            action = "dropped_stale_compacted"
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir, ignore_errors=True)
            action = (action + "+dropped_old") if action else "dropped_old"
        return action
    if os.path.exists(new_dir):
        os.rename(new_dir, post_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        return "rolled_forward"
    if os.path.exists(old_dir):
        os.rename(old_dir, post_dir)
        return "rolled_back"
    return None


def compact_index(spark: SparkSession, idx_dir: str) -> dict:
    t0 = time.time()
    recover_compaction(idx_dir)
    # hold the layout: concurrent index opens must neither delete the
    # in-progress postings_compacted dir nor roll the swap forward while
    # this process is between its two renames (ADVICE r2)
    sent = _sentinel_path(idx_dir)
    with open(sent + ".tmp", "w") as f:
        json.dump({"pid": os.getpid(), "started": time.time()}, f)
    os.replace(sent + ".tmp", sent)
    try:
        return _compact_locked(spark, idx_dir, t0)
    finally:
        try:
            os.remove(sent)
        except FileNotFoundError:
            pass


def _compact_locked(spark: SparkSession, idx_dir: str, t0: float) -> dict:
    post_dir = os.path.join(idx_dir, "postings")
    post = spark.read.option("basePath", post_dir).parquet(post_dir)
    before = post.agg(
        F.count(F.lit(1)).alias("blocks"), F.sum("df_b").alias("postings")
    ).collect()[0]

    merged = (
        post.select(
            "term", "bucket", "min_dl", "min_ld", "docs_vb", "tfs_vb", "pos_vb",
            "dls_vb",
        )
        .groupBy("term", "bucket")
        .applyInPandas(lambda pdf: _merge_group(pdf), schema=_OUT_SCHEMA)
    )
    new_dir = os.path.join(idx_dir, "postings_compacted")
    merged.repartition(
        max(spark.sparkContext.defaultParallelism, 4), "term"
    ).sortWithinPartitions("term", "bucket").write.mode("overwrite").parquet(
        os.path.join(new_dir, "chunk=compacted")
    )

    new = spark.read.option("basePath", new_dir).parquet(new_dir)
    after = new.agg(
        F.count(F.lit(1)).alias("blocks"), F.sum("df_b").alias("postings")
    ).collect()[0]
    if int(after["postings"] or 0) != int(before["postings"] or 0):
        raise RuntimeError(
            f"compaction postings mismatch: {after['postings']} != {before['postings']}"
        )

    old_dir = os.path.join(idx_dir, "postings_old")
    os.rename(post_dir, old_dir)
    os.rename(new_dir, post_dir)
    shutil.rmtree(old_dir, ignore_errors=True)

    # lexicon totals are unchanged but n_blocks shrank — rebuild
    live = spark.read.option("basePath", post_dir).parquet(post_dir)
    live.groupBy("term").agg(
        F.sum("df_b").cast("long").alias("df"),
        F.sum("cf_b").cast("long").alias("cf"),
        F.max("max_tf").alias("max_tf"),
        F.max("max_wdt").alias("max_wdt"),
        F.count(F.lit(1)).alias("n_blocks"),
    ).write.mode("overwrite").parquet(os.path.join(idx_dir, "lexicon"))

    payload = {
        "stage": "compaction",
        "blocks_before": int(before["blocks"]),
        "blocks_after": int(after["blocks"]),
        "postings": int(after["postings"] or 0),
        "elapsed_sec": time.time() - t0,
    }
    man = os.path.join(idx_dir, "_manifests", f"compaction_{int(before['blocks'])}.json")
    tmp = man + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, man)
    return payload
