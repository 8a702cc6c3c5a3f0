"""Shared MinHash building blocks (constants + DataFrame-side ops).

One 48-bit base hash per shingle (md5 prefix — same value both engines,
see gate_ml.hex2int), then Carter-Wegman mixing into the signature
slots: ``((h0 mod p)·a_i + b_i) mod p`` with p = 2^31−1 and a_i < 2^31,
so every product stays < 2^62 — no int64 overflow in Spark, DuckDB or
numpy, which is what makes engine-vs-oracle comparisons exact.

The SQL templates in gate_ml and the DataFrame ops here MUST agree on
these constants; both import :func:`mixers`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P = 2147483647  # 2^31 − 1


def mixers(n_hash: int) -> list[tuple[int, int]]:
    """(a_i, b_i) Carter-Wegman pairs, a_i forced odd."""
    return [((2654435761 * (i + 1)) % P | 1, (2246822519 * (i + 3)) % P)
            for i in range(n_hash)]


def shingle_hashes(docs: DataFrame, k: int = 3,
                   doc_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, h0): DISTINCT 48-bit hashes of the k-word shingles.

    Mirrors gate_ml.shingles_from + hex2int exactly: whitespace split,
    ``concat_ws(' ', slice(ws, i, k))``, md5-prefix hash."""
    ws = F.split(F.col(text_col), " ")
    sh = (
        docs.select(F.col(doc_col).alias("doc_id"), ws.alias("ws"))
        .filter(F.size("ws") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (k - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("ws"), i, k)),
                )
            ).alias("sh"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("sh"), 1, 12), 16, 10)
            .cast("long").alias("h0"),
        )
        .distinct()
    )
    return sh


def signatures(sh: DataFrame, n_hash: int = 8) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): column-wise minhash signature."""
    aggs = [
        F.min(((F.col("h0") % P) * a + b) % P).alias(f"mh{i}")
        for i, (a, b) in enumerate(mixers(n_hash))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def band_keys(sigs: DataFrame, n_hash: int = 8) -> DataFrame:
    """(doc_id, band, key): 2-slot band buckets — the LSH join key."""
    parts = [
        sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", F.col(f"mh{2 * b}").cast("string"),
                F.col(f"mh{2 * b + 1}").cast("string"),
            ).alias("key"),
        )
        for b in range(n_hash // 2)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
