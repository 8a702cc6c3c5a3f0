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
