"""Degenerate-input robustness for the DataFrame ML programs.

The gate proves value equality on the synthetic corpus; these pin the
edge shapes a 10^12-doc pipeline inevitably contains — empty partitions
after a filter, single-word documents, corpora with no duplicates —
where an off-by-one in a window/sequence/slice would throw or emit
phantom rows rather than mismatch values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geodesk_gol_spark.operators import mldf


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_dedup_programs_on_duplicate_free_corpus(spark):
    docs = _docs(spark, [(1, "alpha beta gamma delta"),
                         (2, "epsilon zeta eta theta"),
                         (3, "iota kappa lambda mu")])
    assert mldf.dedup_minhash(docs).count() == 0
    assert mldf.dedup_ngram_jaccard(docs).count() == 0
    assert mldf.dedup_simhash_pairs(docs).count() == 0
    assert mldf.dedup_incremental(docs).count() == 0


def test_dedup_programs_on_empty_corpus(spark):
    docs = _docs(spark, [])
    assert mldf.dedup_minhash(docs).count() == 0
    assert mldf.dedup_simhash(docs).count() == 0
    assert mldf.dedup_exact(docs).count() == 0
    assert mldf.text_repetition(docs).count() == 0


def test_text_chunks_single_and_exact_boundary(spark):
    one = _docs(spark, [(1, "solo")])
    got = mldf.text_chunks(one).collect()
    assert [(r.chunk_idx, r.chunk_len) for r in got] == [(0, 1)]
    # n = step words -> ONE chunk (no empty trailing window)
    atstep = _docs(spark, [(2, " ".join(f"w{i}" for i in range(48)))])
    got = mldf.text_chunks(atstep).collect()
    assert [(r.chunk_idx, r.chunk_len) for r in got] == [(0, 48)]
    # n in (step, win] -> a trailing overlap chunk of n-step words is
    # part of the defined (engine ≡ oracle) semantics: windows advance
    # by step while any word remains unstarted
    exact = _docs(spark, [(3, " ".join(f"w{i}" for i in range(64)))])
    got = sorted((r.chunk_idx, r.chunk_len)
                 for r in mldf.text_chunks(exact).collect())
    assert got == [(0, 64), (1, 64 - 48)]


def test_fingerprint_is_order_sensitive(spark):
    docs = _docs(spark, [(1, "one two three"), (2, "three two one")])
    fp = {r.doc_id: r.fingerprint
          for r in mldf.text_fingerprint(docs).collect()}
    assert fp[1] != fp[2]


def test_sample_programs_short_strata(spark):
    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    assert mldf.sample_stratified(docs, per_stratum=40).count() == 2
    got = mldf.sample_temperature(docs).count()
    assert got == 2  # quota floor(4*sqrt(2)) = 5 >= both docs


def test_change_merge_no_matching_targets(spark):
    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 7, "view", 1.0)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    li = spark.createDataFrame(
        [Row(l_orderkey=10**9, l_linenumber=1)],
        "l_orderkey long, l_linenumber int")
    assert mldf.change_merge(ev, li).count() == 0


def test_ivf_assign_tie_breaks_to_lowest_centroid(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0] + [0.0] * 63)],
        "vec_id long, embedding array<double>")
    # two IDENTICAL centroids: argmin must pick centroid 0
    cents = [[1.0] + [0.0] * 63, [1.0] + [0.0] * 63]
    got = mldf.ann_ivf_assign(emb, cents).collect()
    assert [(r.vec_id, r.centroid) for r in got] == [(0, 0)]


def test_ann_topk_fallback_covers_sparse_buckets(spark):
    # 5 vectors, query 0; with planes separating everything the probe
    # set may hold < k candidates -> brute fallback must still return
    # exactly k=3 ranked neighbors
    vecs = [[float(i == j) for j in range(64)] for i in range(5)]
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    planes = [[float(j == i) for j in range(64)] for i in range(8)]
    got = mldf.ann_lsh_topk(emb, planes, k=3, n_q=1).collect()
    assert sorted(r.rank for r in got) == [1, 2, 3]
    assert all(r.q_id == 0 for r in got)
