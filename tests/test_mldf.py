"""DataFrame-API ML programs (operators/mldf.py) vs the SQL templates.

Round-3 review: the ML gate family ran the SAME SQL text in engine and
oracle, so the gate proved cross-engine determinism rather than
independent correctness.  The five family heads are now DataFrame
programs; these tests pin each program against the (now oracle-only)
template executed by Spark itself — two independently written
formulations of the same algorithm over the same rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geodesk_gol_spark import gate_ml
from geodesk_gol_spark.operators import mldf

SF = "/root/testdata/sf0.001"


def _norm(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _tpl(spark, template, table="documents", **kw):
    v = gate_ml._view(spark, SF, table)
    return spark.sql(template(v, "spark", **kw))


def test_dedup_minhash_df_matches_template(spark):
    got = _norm(mldf.dedup_minhash(_docs(spark)))
    want = _norm(_tpl(spark, gate_ml.sql_dedup_minhash))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0  # non-vacuous: the corpus has near-dups


def test_dedup_incremental_df_matches_template(spark):
    got = _norm(mldf.dedup_incremental(_docs(spark)))
    want = _norm(_tpl(spark, gate_ml.sql_dedup_incremental))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_text_quality_df_matches_template(spark):
    got = _norm(mldf.text_quality(_docs(spark)))
    want = _norm(_tpl(spark, gate_ml.sql_text_quality))
    pd.testing.assert_frame_equal(got, want)
    assert got["n_tokens"].gt(0).all()


def test_pack_sequences_df_matches_template(spark):
    got = _norm(mldf.pack_sequences(_docs(spark)))
    want = _norm(_tpl(spark, gate_ml.sql_pack_sequences))
    pd.testing.assert_frame_equal(got, want)
    # packing invariants: every sequence fills to cap except each
    # source's last; per-doc segment tokens sum to the doc's tokens
    per_seq = got.groupby(["source", "seq_id"])["seg_tokens"].sum()
    last = per_seq.groupby("source").tail(1).index
    assert (per_seq.drop(index=last) == 64).all()


def test_pack_sequences_boundary_doc_spans_sequences(spark):
    """A 100-token doc after a 60-token doc (cap 64) must contribute
    segments to sequences 0, 1 and 2 with offsets/tokens that tile."""
    docs = spark.createDataFrame(
        [("s", 1, "w " * 59 + "w"), ("s", 2, "v " * 99 + "v")],
        "source string, doc_id long, text string",
    )
    got = (
        mldf.pack_sequences(docs).orderBy("doc_id", "seq_id").toPandas()
    )
    rows = [tuple(r) for r in got.itertuples(index=False)]
    assert rows == [
        ("s", 1, 0, 0, 60),
        ("s", 2, 0, 60, 4),
        ("s", 2, 1, 0, 64),
        ("s", 2, 2, 0, 32),
    ]


def test_ann_lsh_topk_df_matches_template(spark):
    planes = gate_ml._plane_vectors(spark, SF, 8, 100)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _norm(mldf.ann_lsh_topk(emb, planes))
    want = _norm(_tpl(spark, gate_ml.sql_ann_lsh_topk, table="embeddings",
                      planes=planes))
    pd.testing.assert_frame_equal(got, want)
    # every query returns exactly k ranks 1..k
    per_q = got.groupby("q_id")["rank"].agg(["min", "max", "count"])
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == 5).all()
    assert (per_q["count"] == 5).all()


def test_dedup_minhash_df_finds_planted_near_dup(spark):
    """Independent end-to-end check on hand-built docs: two documents
    sharing >50% of shingles pair up; an unrelated one does not."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " zzz yyy"
    other = " ".join(f"unrel{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    got = mldf.dedup_minhash(docs).toPandas()
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == [(1, 2)]


# --- second wave: remaining family members converted to DF programs ---

def test_second_wave_df_matches_templates(spark):
    """Each converted program == its (now oracle-only) SQL template run
    by Spark itself — two formulations, same rows."""
    cases = [
        ("dedup_exact", gate_ml.sql_dedup_exact, "documents"),
        ("text_langid", gate_ml.sql_text_langid, "documents"),
        ("text_tokens_by_lang", gate_ml.sql_text_tokens_by_lang,
         "documents"),
        ("text_tokens_bpe", gate_ml.sql_text_tokens_bpe, "documents"),
        ("text_fingerprint", gate_ml.sql_text_fingerprint, "documents"),
        ("sample_stratified", gate_ml.sql_sample_stratified, "documents"),
        ("ann_cosine_topk", gate_ml.sql_ann_cosine_topk, "embeddings"),
    ]
    for fn_name, template, table in cases:
        tbl = spark.read.parquet(f"{SF}/{table}.parquet")
        got = _norm(getattr(mldf, fn_name)(tbl))
        want = _norm(_tpl(spark, template, table=table))
        pd.testing.assert_frame_equal(got, want, obj=fn_name)
        assert len(got) > 0, fn_name


def test_lsh_buckets_df_matches_template(spark):
    planes = gate_ml._plane_vectors(spark, SF, 8, 100)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _norm(mldf.lsh_buckets(emb, planes))
    want = _norm(_tpl(spark, gate_ml.sql_ann_lsh_buckets,
                      table="embeddings", planes=planes))
    pd.testing.assert_frame_equal(got, want)
    assert got["bucket"].between(0, 255).all()


def test_sample_stratified_is_per_stratum_topn(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = mldf.sample_stratified(docs, per_stratum=7).toPandas()
    per = got.groupby("lang").size()
    avail = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, n in per.items():
        assert n == min(7, int(avail[lang]))


# --- third wave: the rest of the shared-template family ---

def test_third_wave_df_matches_templates(spark):
    cases = [
        ("dedup_ngram_jaccard", gate_ml.sql_dedup_ngram_jaccard,
         "documents"),
        ("dedup_simhash", gate_ml.sql_dedup_simhash, "documents"),
        ("text_decontaminate", gate_ml.sql_text_decontaminate,
         "documents"),
        ("text_repetition", gate_ml.sql_text_repetition, "documents"),
        ("text_chunks", gate_ml.sql_text_chunks, "documents"),
        ("text_pii_scrub", gate_ml.sql_text_pii_scrub, "documents"),
    ]
    for fn_name, template, table in cases:
        tbl = spark.read.parquet(f"{SF}/{table}.parquet")
        got = _norm(getattr(mldf, fn_name)(tbl))
        want = _norm(_tpl(spark, template, table=table))
        pd.testing.assert_frame_equal(got, want, obj=fn_name)
        assert len(got) > 0, fn_name


def test_ivf_family_df_matches_templates(spark):
    cents = gate_ml._plane_vectors(spark, SF, 8, 200)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for fn_name, template in [
        ("ann_ivf_assign", gate_ml.sql_ann_ivf_assign),
        ("ann_ivf_topk", gate_ml.sql_ann_ivf_topk),
        ("ann_kmeans_iter", gate_ml.sql_ann_kmeans_iter),
    ]:
        got = _norm(getattr(mldf, fn_name)(emb, cents))
        want = _norm(_tpl(spark, template, table="embeddings",
                          cents=cents))
        pd.testing.assert_frame_equal(got, want, obj=fn_name)
        assert len(got) > 0, fn_name


def test_simhash_bits_in_range(spark):
    got = mldf.dedup_simhash(_docs(spark), bits=32).toPandas()
    assert got["simhash"].between(0, (1 << 32) - 1).all()


def test_ngram_jaccard_pairs_satisfy_threshold(spark):
    got = mldf.dedup_ngram_jaccard(_docs(spark)).toPandas()
    jac = got["n_common"] / (got["n_a"] + got["n_b"] - got["n_common"])
    assert (jac >= 0.5).all()
    assert (got["doc_a"] < got["doc_b"]).all()


def test_kmeans_iter_counts_match_assignment(spark):
    cents = gate_ml._plane_vectors(spark, SF, 8, 200)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    it = mldf.ann_kmeans_iter(emb, cents).toPandas()
    asn = mldf.ann_ivf_assign(emb, cents).toPandas()
    sizes = asn.groupby("centroid").size()
    for (c, d), grp in it.groupby(["centroid", "dim"]):
        assert int(grp["n"].iloc[0]) == int(sizes[c])
    assert set(it["dim"]) == set(range(1, 65))


# --- fourth wave: final shared-template entries ---

def test_fourth_wave_df_matches_templates(spark):
    docs = _docs(spark)
    cases = [
        (mldf.dedup_simhash_pairs(docs),
         _tpl(spark, gate_ml.sql_dedup_simhash_pairs), "simhash_pairs"),
        (mldf.sample_temperature(docs),
         _tpl(spark, gate_ml.sql_sample_temperature), "temperature"),
    ]
    for got_df, want_df, name in cases:
        got, want = _norm(got_df), _norm(want_df)
        pd.testing.assert_frame_equal(got, want, obj=name)
        assert len(got) > 0, name


def test_embed_cosine_df_matches_template(spark):
    planes = gate_ml._plane_vectors(spark, SF, 8, 100)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _norm(mldf.dedup_embed_cosine(emb, planes))
    want = _norm(_tpl(spark, gate_ml.sql_dedup_embed_cosine,
                      table="embeddings", planes=planes))
    pd.testing.assert_frame_equal(got, want)


def test_embed_cosine_stays_compiled(spark):
    # regression pin: inlining all three 64-term dot chains per pair once
    # blew janino's 64 KB method limit when the score projection fused
    # into the candidate-distinct hashAgg's output method, and the stage
    # silently ran interpreted.  Must MATERIALIZE every column through
    # the real gate callable — .count() prunes the projection away and
    # compiles even the bad shape.  fallback=false turns any future
    # codegen failure here into a hard error instead of a slowdown.
    import __spark_entry__ as e
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert len(e.queries()["dedup_embed_cosine"](spark, SF)
                   .toPandas()) > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_change_merge_window_agg_df_match_templates(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    ev_v = gate_ml._view(spark, SF, "events")
    li_v = gate_ml._view(spark, SF, "lineitem")
    got = _norm(mldf.change_merge(ev, li))
    want = _norm(spark.sql(gate_ml.sql_change_merge(ev_v, li_v, "spark")))
    pd.testing.assert_frame_equal(got, want, obj="change_merge")
    got = _norm(mldf.window_agg(ev))
    want = _norm(spark.sql(gate_ml.sql_window_agg(ev_v, "spark")))
    pd.testing.assert_frame_equal(got, want, obj="window_agg")
    assert len(got) > 0


def test_simhash_pairs_hamming_bound(spark):
    got = mldf.dedup_simhash_pairs(_docs(spark)).toPandas()
    assert got["hamming"].between(0, 2).all()
    assert (got["doc_a"] < got["doc_b"]).all()
