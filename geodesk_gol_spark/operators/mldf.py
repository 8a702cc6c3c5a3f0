"""DataFrame-API engine programs for the ML-family gate heads.

Round-3 review finding: ~30 ML gate entries executed ``spark.sql()`` on
the SAME template text as their DuckDB oracle (dialect-translated), so
a logic bug in the template would pass both engines identically.  As of
round 4 EVERY entry in ``gate_ml.ml_queries()`` runs one of these
independently written DataFrame programs (or a custom iterative /
streaming / mapInPandas engine path); the SQL templates in
:mod:`..gate_ml` remain the oracle side only.

Every comparison-relevant value is integer-exact or a single correctly
rounded IEEE op evaluated in the same association order as the oracle
template, so value-hash equality is bit-for-bit (see gate_ml module
docstring).  All programs are built-in-function-only (whole-stage
codegen, no Python UDFs): at 10^12-doc scale the only shuffles are the
keyed joins/aggregations the algorithm itself requires.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.minhash import P, mixers


# ---------------------------------------------------------------------------
# shared shingle pipeline (raw strings; the hot-shingle cap and the
# exact-verification join key both operate on the string, not the hash)
# ---------------------------------------------------------------------------

def doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh): DISTINCT k-word shingles per document."""
    ws = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, k)),
                )
            ).alias("sh"),
        )
        .distinct()
    )


def capped_shingles(docs: DataFrame, k: int = 3, cap: int = 50) -> DataFrame:
    """Shingles minus the hot ones (document frequency > cap).

    The cap bounds candidate-pair fan-out at any corpus size: a shingle
    shared by d docs creates O(d²) bucket pairs, so boilerplate shingles
    (license headers, navigation chrome) would otherwise dominate.

    The document-frequency filter is a count window over ``sh`` (one
    exchange of the shingle table) rather than groupBy + join-back
    (which exchanges it twice: once into the aggregate, once as the
    join probe).  Per-key state is one counter, so a hot shingle skews
    a window partition no worse than it would skew the join."""
    sh = doc_shingles(docs, k)
    w = Window.partitionBy("sh")
    return (
        sh.withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= cap)
        .select("doc_id", "sh")
    )


def _h48(col) -> F.Column:
    """First 12 hex chars of md5 → 48-bit BIGINT (gate_ml.hex2int)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _signatures(sh2: DataFrame, n_hash: int) -> DataFrame:
    """Column-wise Carter-Wegman minhash signature over shingle hashes."""
    hashes = sh2.select("doc_id", _h48(F.col("sh")).alias("h0"))
    aggs = [
        F.min(((F.col("h0") % P) * F.lit(a) + F.lit(b)) % P).alias(f"mh{i}")
        for i, (a, b) in enumerate(mixers(n_hash))
    ]
    return hashes.groupBy("doc_id").agg(*aggs)


def _band_keys(sigs: DataFrame, n_hash: int, extra: list[str]) -> DataFrame:
    """(doc_id, *extra, band, key): 2-slot band buckets (LSH join key).

    One in-row explode (a narrow Generate) instead of an n_hash/2-way
    union of selects over the same aggregate — the union shape planned
    the signature aggregation subtree once per band."""
    pairs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                F.col(f"mh{2 * b}").cast("string"),
                F.col(f"mh{2 * b + 1}").cast("string"),
            ).alias("key"),
        )
        for b in range(n_hash // 2)
    ])
    return sigs.select(
        "doc_id", *extra, F.explode(pairs).alias("_bk")
    ).select("doc_id", *extra, F.col("_bk.band").alias("band"),
             F.col("_bk.key").alias("key"))


def _verify_pairs(cand: DataFrame, sh2: DataFrame,
                  left: str, right: str) -> DataFrame:
    """Exact containment check inside LSH candidate pairs: count common
    DISTINCT shingles, keep pairs with Jaccard ≥ 0.5
    (2·common ≥ |A| + |B| − common).  Adds column ``com``."""
    sizes = sh2.groupBy("doc_id").count().withColumnRenamed("count", "n")
    com = (
        cand
        .join(sh2.select(F.col("doc_id").alias(left), "sh"), left)
        .join(sh2.select(F.col("doc_id").alias(right), "sh"),
              [right, "sh"])
        .groupBy(left, right)
        .agg(F.count("*").alias("com"))
    )
    return (
        com
        .join(sizes.select(F.col("doc_id").alias(left),
                           F.col("n").alias("n_l")), left)
        .join(sizes.select(F.col("doc_id").alias(right),
                           F.col("n").alias("n_r")), right)
        .filter(F.col("com") * 2 >= F.col("n_l") + F.col("n_r") - F.col("com"))
    )


# ---------------------------------------------------------------------------
# 1. minhash-LSH near-dedup (batch)
# ---------------------------------------------------------------------------

def dedup_minhash(docs: DataFrame, n_hash: int = 8, cap: int = 50,
                  sh2: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, n_common): near-duplicate pairs via banded
    minhash-LSH candidates + exact shingle verification.

    Scale shape: hashing is map-side, the signature is one groupBy, the
    candidate join is keyed on an 8-bit-entropy (band, key) pair, and
    only verified candidates ever join back to the shingle table — no
    all-pairs term anywhere.  Pass a materialized ``sh2`` to share the
    capped-shingle table across consumers (it is read 3×)."""
    if sh2 is None:
        sh2 = capped_shingles(docs, cap=cap)
    bands = _band_keys(_signatures(sh2, n_hash), n_hash, [])
    cand = (
        bands.alias("a")
        .join(bands.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        _verify_pairs(cand, sh2, "doc_a", "doc_b")
        .select("doc_a", "doc_b", F.col("com").alias("n_common"))
    )


# ---------------------------------------------------------------------------
# 2. incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------

def dedup_incremental(docs: DataFrame, n_hash: int = 8, cap: int = 50,
                      sh2: DataFrame | None = None) -> DataFrame:
    """(new_doc, canon_seen, n_matches): NEW batch deduplicated against
    the SEEN corpus, never re-pairing seen×seen.  Split is deterministic
    on the doc_id hash (~8:2).  At 10^12-doc scale the seen-side band
    buckets are a materialized table each arriving batch probes — no
    seen-corpus rescan beyond the bucket join."""
    if sh2 is None:
        sh2 = capped_shingles(docs, cap=cap)
    side = F.when(
        _h48(F.col("doc_id").cast("string")) % 10 < 8, F.lit("seen")
    ).otherwise(F.lit("new"))
    sigs = _signatures(sh2, n_hash).withColumn("side", side)
    bands = _band_keys(sigs, n_hash, ["side"])
    cand = (
        bands.filter(F.col("side") == "seen").alias("s")
        .join(bands.filter(F.col("side") == "new").alias("n"),
              (F.col("s.band") == F.col("n.band"))
              & (F.col("s.key") == F.col("n.key")))
        .select(F.col("s.doc_id").alias("seen_doc"),
                F.col("n.doc_id").alias("new_doc"))
        .distinct()
    )
    dups = _verify_pairs(cand, sh2, "seen_doc", "new_doc")
    return (
        dups.groupBy("new_doc")
        .agg(F.min("seen_doc").alias("canon_seen"),
             F.count("*").cast("long").alias("n_matches"))
    )


# ---------------------------------------------------------------------------
# 3. text quality metrics
# ---------------------------------------------------------------------------

def text_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_stopwords, stop_ratio_milli) —
    pure per-row map, no shuffle."""
    ws = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", "n_chars",
        F.size(ws).alias("n_tokens"),
        F.size(F.filter(ws, lambda w: (w == "the") | (w == "a")))
        .alias("n_stopwords"),
    )
    return base.withColumn(
        "stop_ratio_milli",
        F.floor(F.col("n_stopwords") * 1000 / F.col("n_tokens"))
        .cast("long"),
    )


# ---------------------------------------------------------------------------
# 4. sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, cap: int = 64) -> DataFrame:
    """(source, doc_id, seq_id, seq_offset, seg_tokens): concat-and-chunk
    packing of documents into fixed-capacity training sequences, per
    source, in doc_id order.  One window cumsum per source partition +
    a narrow explode over the ≤ toks/cap+1 sequences a doc touches.

    At 100 TB a source larger than one partition sub-shards by doc_id
    range and offsets each shard's cumsum with a broadcast prefix —
    same arithmetic, no global sort."""
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    base = docs.select("source", "doc_id", toks.alias("toks")).filter(
        F.col("toks") >= 1
    )
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        base.withColumn("cum_end", F.sum("toks").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("toks"))
        .withColumn("s0", F.floor(F.col("cum_start") / cap).cast("long"))
        .withColumn("s1",
                    F.floor((F.col("cum_end") - 1) / cap).cast("long"))
    )
    seq = spans.select(
        "source", "doc_id", "cum_start", "cum_end",
        F.explode(F.sequence(F.col("s0"), F.col("s1"))).alias("seq_id"),
    )
    lo = F.greatest(F.col("cum_start"), F.col("seq_id") * cap)
    hi = F.least(F.col("cum_end"), (F.col("seq_id") + 1) * cap)
    return seq.select(
        "source", "doc_id", F.col("seq_id").cast("long").alias("seq_id"),
        (lo - F.col("seq_id") * cap).cast("long").alias("seq_offset"),
        (hi - lo).cast("long").alias("seg_tokens"),
    )


# ---------------------------------------------------------------------------
# 5. LSH ANN top-k
# ---------------------------------------------------------------------------

def _dot_cols(emb, q, dim: int = 64) -> F.Column:
    """Left-associated 64-term dot product — the same association order
    as the oracle template, so the IEEE result is bit-identical.

    Accepts column NAMES (fast path: the whole chain is one F.expr
    string, a single JVM parse) or Column objects (py4j-built tree —
    ~128 round-trips; avoid in per-call hot paths: the driver-side tree
    build costs ~1 s per call, measured in bench q_ann_topk)."""
    if isinstance(emb, str) and isinstance(q, str):
        terms = " + ".join(
            f"(CAST({emb}[{i}] AS DOUBLE) * CAST({q}[{i}] AS DOUBLE))"
            for i in range(dim))
        return F.expr(f"({terms})")
    return reduce(
        lambda acc, i: acc + emb[i].cast("double") * q[i].cast("double"),
        range(1, dim), emb[0].cast("double") * q[0].cast("double"),
    )


def _dot_lit_cols(emb, plane: list[float]) -> F.Column:
    """Dot against a literal vector.  Column-name fast path mirrors the
    oracle's literal emission exactly: repr() is the shortest
    round-trip decimal and CAST('…' AS DOUBLE) parses with correct
    rounding, so the literal IS the stored double bit-for-bit."""
    if isinstance(emb, str):
        terms = " + ".join(
            f"(CAST({emb}[{i}] AS DOUBLE) * CAST('{plane[i]!r}' AS DOUBLE))"
            for i in range(len(plane)))
        return F.expr(f"({terms})")
    return reduce(
        lambda acc, i: acc + emb[i].cast("double") * F.lit(plane[i]),
        range(1, len(plane)), emb[0].cast("double") * F.lit(plane[0]),
    )


def lsh_buckets(emb: DataFrame, planes: list[list[float]]) -> DataFrame:
    """(vec_id, bucket): sign-bit code against broadcast hyperplanes."""
    bucket = reduce(
        lambda acc, jp: acc + F.when(
            _dot_lit_cols("embedding", jp[1]) > 0,
            F.lit(1 << jp[0]).cast("long")
        ).otherwise(F.lit(0).cast("long")),
        enumerate(planes), F.lit(0).cast("long"),
    )
    return emb.select("vec_id", bucket.alias("bucket"))


def ann_lsh_topk(emb: DataFrame, planes: list[list[float]],
                 buckets: DataFrame | None = None,
                 k: int = 5, n_q: int = 4,
                 n_planes: int = 8) -> DataFrame:
    """(q_id, neighbor_id, rank): ANN top-k through LSH buckets with
    hamming-1 multiprobe, exact cosine re-rank inside candidates, and a
    per-query brute fallback ONLY where probes yield < k candidates.
    The bucket join is a hash join keyed by an 8-bit code; no cross
    join on the main path."""
    eb = buckets if buckets is not None else lsh_buckets(emb, planes)
    e_all = emb.select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    qb = eb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"), "bucket")
    bits = reduce(
        lambda a, b: a.unionByName(b),
        [qb.sparkSession.range(1).select(
            F.lit(1 << j).cast("long").alias("bit"))
         for j in range(n_planes)],
    )
    probes = qb.select("q_id", F.col("bucket").alias("probe")).unionByName(
        qb.crossJoin(bits).select(
            "q_id",
            F.col("bucket").bitwiseXOR(F.col("bit")).alias("probe"))
    )
    cand = probes.join(
        eb.select(F.col("vec_id").alias("neighbor_id"),
                  F.col("bucket").alias("probe")), "probe"
    ).select("q_id", "neighbor_id")
    scored = (
        cand
        .join(e_all.select(F.col("vec_id").alias("neighbor_id"),
                           "embedding"), "neighbor_id")
        .join(q, "q_id")
        .select(
            "q_id", "neighbor_id",
            (_dot_cols("embedding", "q_emb")
             / F.sqrt(_dot_cols("embedding", "embedding")))
            .alias("score"),
        )
    )
    wrank = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    ranked = scored.select(
        "q_id", "neighbor_id",
        F.row_number().over(wrank).cast("int").alias("rank"),
        F.count("*").over(Window.partitionBy("q_id")).alias("ncand"),
    )
    ok = ranked.filter(F.col("ncand") >= k).select("q_id").distinct()
    sparse = q.join(ok, "q_id", "left_anti")
    fb = (
        e_all.crossJoin(sparse)
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"),
            (_dot_cols("embedding", "q_emb")
             / F.sqrt(_dot_cols("embedding", "embedding")))
            .alias("score"),
        )
        .select("q_id", "neighbor_id",
                F.row_number().over(wrank).cast("int").alias("rank"))
    )
    return (
        ranked.filter((F.col("rank") <= k) & (F.col("ncand") >= k))
        .select("q_id", "neighbor_id", "rank")
        .unionByName(fb.filter(F.col("rank") <= k))
    )


# ---------------------------------------------------------------------------
# second wave (r04): the remaining high-traffic family members, same
# de-sharing rationale — DataFrame engine programs, SQL stays oracle-only
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """(grp, n_docs, min_doc): exact near-head dedup — md5 of the first
    40 chars groups byte-identical prefixes; one hash groupBy."""
    return (
        docs.select(F.md5(F.substring("text", 1, 40)).alias("grp"),
                    "doc_id")
        .groupBy("grp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


def text_langid(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, lang_pred): n-gram-heuristic language id —
    pure per-row map."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(padded.contains(" the "), "en")
        .when(padded.contains(" data "), "datalang")
        .when(padded.contains(" spark "), "sparklang")
        .otherwise("other")
    )
    return docs.select("doc_id", "lang", pred.alias("lang_pred"))


def text_tokens_by_lang(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, total_tokens, max_tokens) — one shuffle keyed by
    the (low-cardinality) language; partial aggregation map-side."""
    n = F.size(F.split(F.col("text"), " "))
    return (
        docs.select("lang", n.alias("n"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n").cast("long").alias("total_tokens"),
             F.max("n").alias("max_tokens"))
    )


def text_tokens_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens_ws, n_tokens_bpe): whitespace count next to a
    GPT-2-flavor pre-tokenizer regex count (letter runs, single digits,
    single punctuation) — per-row, codegen'd regexp_count."""
    ws = F.size(F.split(F.col("text"), " ")).cast("long")
    pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    return docs.select(
        "doc_id", ws.alias("n_tokens_ws"),
        F.regexp_count("text", F.lit(pat)).cast("long")
        .alias("n_tokens_bpe"),
    )


def text_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling hash —
    ((acc·31 + code) mod 1e9+7) folded over per-word codes
    (len·31 + first char), all inside one aggregate expression."""
    ws = F.split(F.col("text"), " ")
    codes = F.transform(
        ws, lambda w: (F.length(w) * 31
                       + F.ascii(F.substring(w, 1, 1))).cast("long"))
    fp = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007)
    return docs.select("doc_id", fp.alias("fingerprint"))


def sample_stratified(docs: DataFrame, per_stratum: int = 40) -> DataFrame:
    """(lang, doc_id, n_chars): deterministic top-N per language
    stratum ordered by a salted md5 keyed permutation.  Spark plans the
    rank filter as WindowGroupLimit: per-partition partial top-N, one
    merge — hot strata never gather unsampled rows."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))),
        "doc_id")
    return (
        docs.select("lang", "doc_id", "n_chars",
                    F.row_number().over(w).cast("int").alias("rk"))
        .filter(F.col("rk") <= per_stratum)
        .select("lang", "doc_id", "n_chars")
    )


def ann_cosine_topk(emb: DataFrame, k: int = 5, n_q: int = 4) -> DataFrame:
    """(q_id, neighbor_id, rank): exact brute-force cosine top-k — the
    declared-cartesian baseline the bucketed paths are verified
    against.  Query side broadcast (n_q rows); candidate side scans
    once."""
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "q_id", F.col("vec_id").alias("neighbor_id"),
        (_dot_cols("embedding", "q_emb")
         / F.sqrt(_dot_cols("embedding", "embedding")))
        .alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.select("q_id", "neighbor_id",
                      F.row_number().over(w).cast("int").alias("rank"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# third wave (r04): remaining shared-template entries become independent
# DataFrame programs; after this only the tiny view-composition wrappers
# (simhash_pairs composition, embed_cosine, temperature) share any text
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(docs: DataFrame, cap: int = 50,
                        sh2: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, n_common, n_a, n_b): exact n-gram Jaccard ≥ 0.5
    pairs.  Pair generation happens only inside capped shingle buckets
    (document frequency ≤ ``cap``), so the worst fan-out per shingle is
    cap² — the same bound that makes the MinHash verifier scale."""
    if sh2 is None:
        sh2 = capped_shingles(docs, 3, cap)
    sizes = sh2.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        sh2.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(sh2.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("n_b")), "doc_b")
        .filter(F.col("n_common") * 2
                >= F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
    )


def dedup_simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): per-document SimHash over distinct words.
    Bit b of the hash is set when the ±1 majority vote of the words'
    48-bit hashes' bit b is positive.  One explode + one groupBy with
    ``bits`` conditional-sum aggregates — all map-side combinable.
    Bit extraction is shiftright/&1 (the oracle floor-divides through
    DOUBLE; values are < 2^48 < 2^53, so both are exact)."""
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("w"))
    wh = words.select("doc_id", _h48(F.col("w")).alias("h"))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
              .otherwise(-1)).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = wh.groupBy("doc_id").agg(*votes)
    sim = reduce(
        lambda a, b: a + b,
        [F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
         .otherwise(F.lit(0).cast("long")) for b in range(bits)],
    )
    return agg.select("doc_id", sim.alias("simhash"))


def text_decontaminate(docs: DataFrame, k: int = 5, mod: int = 41,
                       res: int = 7) -> DataFrame:
    """(doc_id, n_hits, n_bench_docs): flag corpus docs sharing any
    k-gram with the held-out benchmark slice (doc_id % mod = res).
    The benchmark-gram side is broadcast — the corpus side never
    self-joins, so cost is one corpus scan + a broadcast hash join."""
    corpus = docs.filter(F.col("doc_id") % mod != res)
    bench = docs.filter(F.col("doc_id") % mod == res)
    cg = doc_shingles(corpus, k)
    bg = doc_shingles(bench, k).select(F.col("doc_id").alias("b_id"), "sh")
    return (
        cg.join(F.broadcast(bg), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"),
             F.countDistinct("b_id").cast("long").alias("n_bench_docs"))
    )


def text_repetition(docs: DataFrame) -> DataFrame:
    """(doc_id, top_bigram_milli, dup_bigram_milli): Gopher-style
    repetition signals as integer milli-fractions.  Two keyed
    aggregations, no join, no corpus-wide window."""
    # bigram counts must keep duplicates — doc_shingles dedups, so
    # the (doc_id, bigram) explode is built inline
    ws = F.split(F.col("text"), " ")
    bg = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, 2)),
                )
            ).alias("sh"),
        )
    )
    cnt = bg.groupBy("doc_id", "sh").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").cast("long").alias("total"),
        F.count("*").alias("n_distinct"),
    )
    return agg.select(
        "doc_id",
        F.floor(F.col("top_c") * 1000 / F.col("total"))
        .cast("long").alias("top_bigram_milli"),
        F.floor((F.col("total") - F.col("n_distinct")) * 1000
                / F.col("total")).cast("long").alias("dup_bigram_milli"),
    )


def text_chunks(docs: DataFrame, win: int = 64, step: int = 48) -> DataFrame:
    """(doc_id, chunk_idx, chunk_len, chunk_hash): sliding-window
    chunking with a per-chunk rolling hash.  Pure per-row explode —
    embarrassingly parallel, zero shuffle."""
    ws = F.split(F.col("text"), " ")
    base = (
        docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n"))
        .filter(F.col("n") >= 1)
    )
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.col("n") - 1) / step).cast("int"))
    ).alias("i")
    chunk = F.slice(F.col("ws"), F.col("i") * step + 1, F.lit(win))
    codes = F.transform(
        chunk,
        lambda w: (F.length(w) * 31
                   + F.ascii(F.substring(w, 1, 1))).cast("long"))
    rolled = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007)
    return (
        base.select("doc_id", "ws", "n", idx)
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.least(F.lit(win), F.col("n") - F.col("i") * step)
            .cast("int").alias("chunk_len"),
            rolled.alias("chunk_hash"),
        )
    )


def text_pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_longnums, redacted_fp): count + redact
    email-shaped tokens and ≥6-digit runs over the PII-augmented text,
    then fingerprint the redacted text (proving the replacement, not
    just the counts).  Pure per-row regex — whole-stage codegen."""
    email, num = "[A-Za-z0-9_.]+@[A-Za-z0-9.]+", "[0-9]{6,}"
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com ref "),
        (F.col("n_chars") * 1234567).cast("string"))
    red = F.regexp_replace(
        F.regexp_replace(aug, email, "<EMAIL>"), num, "<NUM>")
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(num)).cast("long").alias("n_longnums"),
        _h48(red).alias("redacted_fp"),
    )


# --- IVF / k-means family -------------------------------------------------

def _ivf_score_cols(cents: list[list[float]]) -> list[F.Column]:
    """score_j = ||c_j||² − 2·e·c_j (monotone in L2 distance; ||e||²
    cancels inside argmin).  ||c_j||² is folded in Python with the same
    left-to-right order as the oracle's literal, and the dot product is
    the same left-associated chain — bit-identical doubles."""
    out = []
    for c in cents:
        acc = 0.0
        for v in c:
            acc = acc + v * v
        out.append(F.lit(acc) - 2 * _dot_lit_cols("embedding", c))
    return out


def ann_ivf_assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, centroid): IVF coarse quantization — nearest of the
    broadcast-literal codebook, ties to the lowest centroid id.  A
    narrow map over the corpus; the assignment is the partitioning key
    of the inverted lists downstream."""
    scores = _ivf_score_cols(cents)
    scored = emb.select(
        "vec_id", *[s.alias(f"s{j}") for j, s in enumerate(scores)])
    best = F.least(*[F.col(f"s{j}") for j in range(len(cents))])
    pick = F.lit(None).cast("int")
    for j in range(len(cents) - 1, -1, -1):
        pick = F.when(F.col(f"s{j}") == best, j).otherwise(pick)
    return scored.select("vec_id", pick.cast("int").alias("centroid"))


def ann_kmeans_iter(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(centroid, dim, n, sum_milli): one distributed Lloyd step over
    the IVF assignment.  Components are floored to milli-units BEFORE
    summing, so the aggregation is exact integer arithmetic under any
    partial-aggregation order.  posexplode keeps the dim fan-out inside
    one narrow stage."""
    asn = ann_ivf_assign(emb, cents)
    x = (
        emb.join(asn, "vec_id")
        .select("centroid", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "centroid",
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.floor(F.col("val").cast("double") * 1000)
            .cast("long").alias("v"),
        )
    )
    return x.groupBy("centroid", "dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_milli"),
    )


def _rerank_with_fallback(cand: DataFrame, emb: DataFrame, q: DataFrame,
                          k: int) -> DataFrame:
    """Shared ANN tail: exact cosine re-rank inside candidate sets,
    brute fallback ONLY for queries whose candidates hold < k vectors.
    ``cand``: (q_id, neighbor_id); ``q``: (q_id, q_emb)."""
    e_all = emb.select("vec_id", "embedding")
    scored = (
        cand
        .join(e_all.select(F.col("vec_id").alias("neighbor_id"),
                           "embedding"), "neighbor_id")
        .join(q, "q_id")
        .select(
            "q_id", "neighbor_id",
            (_dot_cols("embedding", "q_emb")
             / F.sqrt(_dot_cols("embedding", "embedding")))
            .alias("score"),
        )
    )
    wrank = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    ranked = scored.select(
        "q_id", "neighbor_id",
        F.row_number().over(wrank).cast("int").alias("rank"),
        F.count("*").over(Window.partitionBy("q_id")).alias("ncand"),
    )
    ok = ranked.filter(F.col("ncand") >= k).select("q_id").distinct()
    sparse = q.join(ok, "q_id", "left_anti")
    fb = (
        e_all.crossJoin(sparse)
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"),
            (_dot_cols("embedding", "q_emb")
             / F.sqrt(_dot_cols("embedding", "embedding")))
            .alias("score"),
        )
        .select("q_id", "neighbor_id",
                F.row_number().over(wrank).cast("int").alias("rank"))
    )
    return (
        ranked.filter((F.col("rank") <= k) & (F.col("ncand") >= k))
        .select("q_id", "neighbor_id", "rank")
        .unionByName(fb.filter(F.col("rank") <= k))
    )


def ann_ivf_topk(emb: DataFrame, cents: list[list[float]], k: int = 5,
                 n_q: int = 4, nprobe: int = 2) -> DataFrame:
    """(q_id, neighbor_id, rank): ANN top-k through the IVF lists —
    probe the ``nprobe`` nearest centroids per query, exact cosine
    re-rank inside the probed lists, brute fallback only where probes
    hold < k vectors.  Assignment and query probing share ONE ranked
    (vec_id, centroid, s) frame, so the scores compute once."""
    n_cent = len(cents)
    scored = emb.select(
        "vec_id",
        *[s.alias(f"s{j}") for j, s in enumerate(_ivf_score_cols(cents))])
    unpiv = reduce(
        lambda a, b: a.unionByName(b),
        [scored.select("vec_id", F.lit(j).alias("centroid"),
                       F.col(f"s{j}").alias("s")) for j in range(n_cent)],
    )
    wcent = Window.partitionBy("vec_id").orderBy("s", "centroid")
    cent_rank = unpiv.select(
        "vec_id", "centroid", F.row_number().over(wcent).alias("rn"))
    assign = cent_rank.filter(F.col("rn") == 1).select("vec_id", "centroid")
    probes = (
        cent_rank
        .filter((F.col("rn") <= nprobe) & (F.col("vec_id") < n_q))
        .select(F.col("vec_id").alias("q_id"), "centroid")
    )
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    cand = probes.join(assign, "centroid").select(
        "q_id", F.col("vec_id").alias("neighbor_id"))
    return _rerank_with_fallback(cand, emb, q, k)


# ---------------------------------------------------------------------------
# fourth wave (r04): the final shared-template entries — after these,
# every ML-family engine path is an independent DataFrame program and
# the SQL templates in gate_ml are oracle-only text
# ---------------------------------------------------------------------------

def dedup_simhash_pairs(docs: DataFrame, bits: int = 48, bands: int = 6,
                        max_ham: int = 2,
                        sim: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming): SimHash near-dup pairs — band the
    ``bits``-bit hash into ``bands`` 8-bit slices, candidates from an
    equality hash join on (band, slice value), verify hamming ≤
    ``max_ham`` via xor+popcount.  No all-pairs term anywhere.
    ``sim``: pre-materialized (doc_id, simhash) frame (built 3× here)."""
    if sim is None:
        sim = dedup_simhash(docs, bits)
    band_bits = bits // bands
    bnd = reduce(
        lambda a, b: a.unionByName(b),
        [sim.select(
            "doc_id", F.lit(b).alias("band"),
            (F.shiftright(F.col("simhash"), b * band_bits)
             % (1 << band_bits)).alias("bval"))
         for b in range(bands)],
    )
    cand = (
        bnd.select(F.col("doc_id").alias("doc_a"), "band", "bval")
        .join(bnd.select(F.col("doc_id").alias("doc_b"), "band", "bval"),
              ["band", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand
        .join(sim.select(F.col("doc_id").alias("doc_a"),
                         F.col("simhash").alias("ha")), "doc_a")
        .join(sim.select(F.col("doc_id").alias("doc_b"),
                         F.col("simhash").alias("hb")), "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_ham)
    )


def dedup_embed_cosine(emb: DataFrame, planes: list[list[float]],
                       buckets: DataFrame | None = None,
                       tau_milli: int = 280,
                       n_planes: int = 8) -> DataFrame:
    """(vec_a, vec_b, cos_milli): embedding near-dup pairs — candidate
    pairs from hyperplane-LSH bucket equality (own bucket + hamming-1
    multiprobe), exact cosine ≥ τ re-check inside candidates only."""
    eb0 = buckets if buckets is not None else lsh_buckets(emb, planes)
    probes = reduce(
        lambda a, b: a.unionByName(b),
        [eb0.select("vec_id", F.col("bucket").alias("probe"))]
        + [eb0.select(
            "vec_id",
            F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("long"))
            .alias("probe"))
           for j in range(n_planes)],
    )
    cand = (
        probes
        .join(eb0.select(F.col("vec_id").alias("vb"),
                         F.col("bucket").alias("probe")), "probe")
        .filter(F.col("vec_id") < F.col("vb"))
        .select(F.col("vec_id").alias("va"), "vb")
        .distinct()
    )
    # norms are computed ONCE PER VECTOR before the pair join (n sqrt
    # chains, not |pairs|), and the pair projection carries a single
    # 64-term chain: inlining all three dots per pair put ~192
    # multiply-adds in one generated method, tripping janino's 64 KB
    # method limit and silently dropping the stage to interpreted mode.
    # Same FP ops in the same association order — bit-identical score.
    normed = emb.select(
        "vec_id", "embedding",
        F.sqrt(_dot_cols("embedding", "embedding")).alias("nrm"))
    score = _dot_cols("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        cand
        .join(normed.select(F.col("vec_id").alias("va"),
                            F.col("embedding").alias("ea"),
                            F.col("nrm").alias("na")), "va")
        .join(normed.select(F.col("vec_id").alias("vb"),
                            F.col("embedding").alias("eb"),
                            F.col("nrm").alias("nb")), "vb")
        .select(F.col("va").alias("vec_a"), F.col("vb").alias("vec_b"),
                score.alias("score"))
        .filter(F.col("score") * 1000 >= tau_milli)
        .select("vec_a", "vec_b",
                F.floor(F.col("score") * 1000).cast("long")
                .alias("cos_milli"))
    )


def sample_temperature(docs: DataFrame, scale: int = 4,
                       cap: int | None = None) -> DataFrame:
    """(source, doc_id, rk): temperature-weighted mixture sampling
    (α = 0.5) — per-source quota ⌊scale·√n⌋ under a salted-md5 keyed
    permutation.  ``cap``: literal rank bound ≥ every quota; the
    redundant conjunct sits below the quota join so Spark plans the
    window as a per-partition group limit."""
    quota = (
        docs.groupBy("source").agg(F.count("*").alias("n"))
        .select("source",
                F.greatest(F.lit(1), F.floor(scale * F.sqrt(F.col("n"))))
                .cast("long").alias("quota"))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        "doc_id")
    r = docs.select("source", "doc_id",
                    F.row_number().over(w).cast("int").alias("rk"))
    if cap is not None:
        r = r.filter(F.col("rk") <= cap)
    return (
        r.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select("source", "doc_id", "rk")
    )


def change_merge(events: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(id, state): OSC-style change application — latest event per
    synthetic target id wins (ts, then event_id), 'purchase' maps to
    'deleted', applied to the lineitem-derived node id space.  One
    window over the (small) change stream + one hash join."""
    changes = events.select(
        "event_id", "ts", "event_type",
        ((F.col("user_id") % 1500) * 8 + 1 + (F.col("event_id") % 7))
        .alias("target"),
    )
    w = Window.partitionBy("target").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        changes.select("target", "event_type",
                       F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("target", "event_type")
    )
    nodes = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"))
    return (
        nodes.join(latest, nodes["id"] == latest["target"])
        .select(
            "id",
            F.when(F.col("event_type") == "purchase", "deleted")
            .otherwise(F.col("event_type")).alias("state"),
        )
    )


def window_agg(events: DataFrame) -> DataFrame:
    """(window_start, event_type, n, sum_milli): 5-minute tumbling
    window aggregate with integer milli-sums (exact under partial
    aggregation).  The batch twin of the streaming window query."""
    bucket = (F.floor(F.unix_timestamp(F.col("ts")) / 300) * 300
              ).cast("long")
    return (
        events.select(bucket.alias("window_start"), "event_type",
                      F.floor(F.col("value") * 1000).cast("long").alias("v"))
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n"),
             F.sum("v").cast("long").alias("sum_milli"))
    )


# ---------------------------------------------------------------------------
# round-5 additions: funnel / retention analytics + quantized ANN
# ---------------------------------------------------------------------------

def events_funnel(events: DataFrame) -> DataFrame:
    """Ordered-funnel analysis view -> click -> purchase per user.

    ``t_view`` is the user's first view; ``t_click`` the first click
    STRICTLY AFTER that view; ``t_purchase`` the first purchase
    strictly after that click; ``stage`` how deep the user got (0-3).
    The standard product-analytics operator a training-data /
    clickstream pipeline runs at petabyte scale.

    Scale shape: all three conditional-min window passes and the final
    per-user collapse share the ``user_id`` hash partitioning — ONE
    shuffle of the events table regardless of corpus size, no join
    against a per-stage subquery (the oracle does it the join way,
    independently).
    """
    w = Window.partitionBy("user_id")
    df = events.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    df = df.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        df.select("user_id", "t_view", "t_click", "t_purchase")
        .distinct()
        .withColumn("stage", stage.cast("int"))
    )


def events_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    each later active day as (cohort_day, day_offset, n_users).

    Scale shape: ONE pass over events — first day and the active-day
    set come out of the same per-user aggregate (collect_set is
    bounded by the retention horizon in days, not by event volume, so
    per-user state stays tiny at any corpus size), then the exploded
    (cohort_day, day_offset) aggregate is days x days rows however
    large the corpus.  Two exchanges total vs four for the naive
    agg + distinct + join shape.
    """
    d = events.select("user_id", F.to_date("ts").alias("d"))
    per_user = d.groupBy("user_id").agg(
        F.min("d").alias("cohort_day"), F.collect_set("d").alias("days")
    )
    return (
        per_user.select(
            "user_id", "cohort_day", F.explode("days").alias("d")
        )
        .groupBy(
            # ISO string, not DATE: gate value-hashing is dtype-exact
            # and the two engines disagree on DATE's pandas dtype
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def _sq_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, s, codes): per-vector max-abs scale + int8-range codes.

    ``floor(x / s * 127 + 0.5)`` instead of round(): floor of an
    identical double chain is bit-deterministic across engines, while
    round() half-way modes differ between dialects.  All-zero vectors
    (s = 0) code to all-zero instead of dividing by zero.
    """
    s = F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
    )
    zero = F.transform(F.col("embedding"), lambda x: F.lit(0).cast("long"))
    coded = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("s") * 127 + 0.5)
        .cast("long"),
    )
    return (
        emb.select("vec_id", "embedding").withColumn("s", s)
        .select(
            "vec_id", "s",
            F.when(F.col("s") == 0.0, zero).otherwise(coded).alias("codes"),
        )
    )


def ann_sq_topk(emb: DataFrame, k: int = 5, n_q: int = 4,
                cand_mult: int = 3) -> DataFrame:
    """Scalar-quantized (int8) ANN with exact float re-rank.

    The memory-bound scale path for ANN over 10^11 vectors: the
    full-corpus pass touches only the ~4x-smaller (vec_id, scale,
    codes) projection (integer dot + two scale multiplies per pair),
    and float vectors are fetched — a keyed join, not a scan — for
    only ``cand_mult * k`` candidates per query before the exact
    cosine re-rank.  Candidate score ``(s_e * s_q) * int_dot`` is
    integer-exact in the dot and a fixed two-multiply double chain, so
    the candidate cut is deterministic across engines.
    """
    qz = _sq_codes(emb)
    q = qz.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"),
        F.col("s").alias("qs"),
        F.col("codes").alias("qcodes"),
    )
    idot = F.aggregate(
        F.zip_with("codes", "qcodes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        qz.crossJoin(F.broadcast(q))
        .withColumn("approx", (F.col("s") * F.col("qs")) * idot.cast("double"))
    )
    wc = Window.partitionBy("q_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cands = (
        scored.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= cand_mult * k)
        .select("q_id", "vec_id")
    )
    qe = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qemb")
    )
    ex = (
        cands.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "q_id")
        .withColumn(
            "score",
            _dot_cols("embedding", "qemb")
            / F.sqrt(_dot_cols("embedding", "embedding")),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        ex.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def events_transitions(events: DataFrame) -> DataFrame:
    """Clickstream path mining: the event-type bigram transition matrix
    (prev_type, next_type, n, total_gap_us) over per-user timelines.

    Dwell time sums in integer MICROSECONDS (unix_micros both engines;
    epoch-seconds would truncate in Spark but round in DuckDB).  Ties
    in ts break on event_id so consecutive-pair formation is
    deterministic.  Scale shape: one user_id window shuffle forms the
    pairs, then the transition matrix aggregate is |event types|^2 rows
    however large the corpus.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the session tz is pinned to UTC so the LTZ
    # cast is instant-preserving and unix_micros == DuckDB epoch_us
    s = events.select(
        "user_id", "event_type", "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    ).withColumn("prev_type", F.lag("event_type").over(w)) \
     .withColumn("prev_us", F.lag("us").over(w))
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("us") - F.col("prev_us")).alias("total_gap_us"),
        )
    )
