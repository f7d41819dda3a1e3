"""Semantic properties of the round-5 curation operators that oracle
equality alone can't see: exact stratum quotas + determinism for
stratified sampling, contamination flagging of an exact eval duplicate,
directional asymmetry of containment, LM-score ordering (rare-token docs
score higher NLL), and the k-means profile partitioning the corpus."""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _doc(doc_id, text, lang="en"):
    return (doc_id, text, lang, "src", len(text))


def test_stratified_sample_exact_quota_and_determinism(spark, tmp_path):
    """Every stratum yields exactly min(quota, |stratum|) rows, and the
    md5-keyed draw is a pure function of the corpus (two runs identical)."""
    rows = (
        [_doc(i, f"alpha {i}", "en") for i in range(30)]
        + [_doc(100 + i, f"beta {i}", "de") for i in range(25)]
        + [_doc(200 + i, f"gamma {i}", "fr") for i in range(5)]
    )
    sf = _write_docs(spark, tmp_path, rows)
    got = entry_mod._q_stratified_sample(spark, sf).collect()
    per_lang = {}
    for r in got:
        per_lang.setdefault(r["lang"], []).append(r["doc_id"])
    quota = entry_mod._SAMPLE_PER_LANG
    assert len(per_lang["en"]) == min(quota, 30)
    assert len(per_lang["de"]) == min(quota, 25)
    assert len(per_lang["fr"]) == 5  # under-quota stratum keeps everything
    again = entry_mod._q_stratified_sample(spark, sf).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # ranks are 1..N contiguous within each stratum
    for lang, ids in per_lang.items():
        ranks = sorted(
            r["sample_rank"] for r in got if r["lang"] == lang
        )
        assert ranks == list(range(1, len(ids) + 1))


def test_stratified_two_phase_equals_single_window(spark, tmp_path):
    """The two-phase exact top-N (per-input-partition top-N, then final
    rank over survivors) must equal the naive one-window form for every
    input partitioning — the property that lets the plan avoid routing
    a whole stratum through one task. Fuzzed over a skewed stratum
    layout and three repartitions of the same corpus."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(77)
    rows = [
        _doc(i, f"body {i}", rng.choice(["en"] * 8 + ["de", "fr"]))
        for i in range(120)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(
        tuple(r) for r in entry_mod._q_stratified_sample(spark, sf).collect()
    )
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("skey")
    )
    for nparts in (1, 7, 64):
        w = Window.partitionBy("lang").orderBy("skey")
        naive = sorted(
            tuple(r)
            for r in d.repartition(nparts)
            .withColumn("sample_rank", F.row_number().over(w).cast("long"))
            .where(F.col("sample_rank") <= entry_mod._SAMPLE_PER_LANG)
            .select("lang", "sample_rank", "doc_id")
            .collect()
        )
        assert naive == got, nparts


def test_decontaminate_flags_exact_eval_duplicate(spark, tmp_path):
    """A training doc that byte-duplicates an eval doc (doc_id % 97 == 0)
    is fully contaminated (ratio 1.0, flagged); a disjoint-vocab doc is
    clean; eval docs themselves never appear in the output."""
    eval_text = "quick brown fox jumps over the lazy dog tonight"
    rows = [
        _doc(0, eval_text),                       # eval slice (0 % 97 == 0)
        _doc(5, eval_text),                       # exact duplicate of eval
        _doc(7, "zeta eta theta iota kappa lam"),  # disjoint vocab
        _doc(9, "quick brown fox jumps apple pear plum"),  # partial overlap
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in entry_mod._q_decontaminate(spark, sf).collect()}
    assert 0 not in got
    assert got[5]["n_contaminated"] == got[5]["n_shingles"]
    assert got[5]["contamination_ratio"] == 1.0 and got[5]["flagged"] == 1
    assert got[7]["n_contaminated"] == 0 and got[7]["flagged"] == 0
    # doc 9 shares exactly the 'quick brown fox' / 'brown fox jumps' 3-grams
    assert got[9]["n_contaminated"] == 2 and got[9]["n_shingles"] == 5


def test_containment_is_directional(spark, tmp_path):
    """A doc fully embedded in a larger doc scores containment 1.0 in the
    src→dst direction only — the asymmetric quote/wrapper case whose
    symmetric Jaccard (3/8 here) stays under every near-dup cut."""
    small = "one two three four five"                # 3 shingles
    big = small + " six seven eight nine ten"        # 8 shingles
    rows = [_doc(1, small), _doc(2, big)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_src"], r["doc_dst"]): r
        for r in entry_mod._q_containment_pairs(spark, sf).collect()
    }
    assert (1, 2) in got and got[(1, 2)]["containment"] == 1.0
    assert (2, 1) not in got  # 3/8 = 0.375 < threshold


def test_quality_lm_rare_tokens_score_higher(spark, tmp_path):
    """Docs made of corpus-rare tokens must carry a higher mean negative
    log-prob than docs made of the dominant token — the fluency ordering
    the gate exists to produce."""
    rows = [_doc(i, "x " * 9 + "x") for i in range(5)] + [
        _doc(99, "aardvark basilisk chimera dryad erlking fenrir golem hydra imp jotun")
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in entry_mod._q_quality_lm(spark, sf).collect()}
    assert got[99]["mean_nll"] > got[0]["mean_nll"]
    # every common doc scores identically (same token multiset)
    assert len({got[i]["mean_nll"] for i in range(5)}) == 1
    assert got[0]["n_tokens"] == 10 and got[99]["n_tokens"] == 10


def test_span_dedup_detects_shared_boilerplate(spark, tmp_path):
    """Two docs sharing a 48-char boilerplate prefix each carry exactly
    the two windows inside it as duplicated spans; a same-length unique
    doc carries none; a doc shorter than one window is excluded."""
    boiler = "shared license header exactly fortyeight chars--"  # 48 chars
    assert len(boiler) == 48
    rows = [
        _doc(1, boiler + " alpha unique tail for document one padding"),
        _doc(2, boiler + " totally different continuation two padding"),
        _doc(3, "an entirely unique document body with no repeats at all"),
        _doc(4, "too short"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in entry_mod._q_span_dedup_stats(spark, sf).collect()}
    assert 4 not in got
    # windows at offsets 0 and 16 lie inside the 48-char shared prefix
    assert got[1]["n_dup_windows"] == 2 and got[2]["n_dup_windows"] == 2
    assert got[3]["n_dup_windows"] == 0 and got[3]["dup_span_ratio"] == 0.0
    assert 0 < got[1]["dup_span_ratio"] < 1


def test_top_terms_rank_rare_repeated_token_first(spark, tmp_path):
    """A term that is frequent WITHIN a doc but rare across the corpus
    must out-rank corpus-wide filler — the tf·idf ordering the keyword
    extractor exists to produce; every doc gets exactly min(K, n_terms)
    rows with contiguous ranks."""
    rows = [_doc(i, "common filler words appear everywhere always") for i in range(6)]
    rows.append(_doc(10, "zebra zebra zebra common filler"))
    sf = _write_docs(spark, tmp_path, rows)
    got = entry_mod._q_top_terms(spark, sf).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    assert by_doc[10][0] == (1, "zebra")
    for doc_id, terms in by_doc.items():
        assert [r for r, _ in terms] == list(range(1, len(terms) + 1))
        assert len(terms) <= entry_mod._TOP_TERMS_K


def test_kmeans_clusters_partition_the_corpus(spark):
    """Cluster sizes must sum to the corpus (rank-0 assignment is a
    partition), cells must match the adaptive K, and the profile must be
    non-degenerate (no empty cells surface, norms positive)."""
    from pyspark.sql import functions as F

    got = entry_mod._q_kmeans_clusters(spark, SF_DIR).collect()
    n_vecs = entry_mod._emb(spark, SF_DIR).count()
    assert sum(r["n_vecs"] for r in got) == n_vecs
    k = entry_mod._ivf_k(n_vecs)
    assert len(got) <= k
    assert all(r["n_vecs"] >= 1 and r["mean_nrm"] > 0 for r in got)
    assert all(0 <= r["cell"] < k for r in got)
