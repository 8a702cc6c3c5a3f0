"""Deterministic synthesis of the interleaved-document input table.

The engine's authoritative input (BASELINE.json ``input_hint``) is an
Iceberg-style table::

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Geometry rides *inside* spans: ``kind`` ∈ {node, way, relation} spans carry a
compact JSON feature payload in ``text`` (id, lon/lat ×1e7 ints, node refs,
members, tags); ``kind`` ∈ {text, media} spans are interleaved noise that must
pass through the pipeline untouched, and offsets are cumulative and strictly
increasing per document (span-sequence invariant).

We synthesize this table deterministically from the driver-provided TPC-H-ish
parquet (TESTDATA.md) using the shared fragments in :mod:`..sqlgen` — so every
downstream result stays expressible as a DuckDB oracle over the same base
tables.  Document grouping mirrors the reference's PBF block structure
(one producer emits nodes, then ways, then relations —
/root/reference/src/osm/OsmPbfReader.h:232-262):

- one doc per order      → 1 text span + per-lineitem node spans (some with a
  preceding media span) + 1 way span (orders with ≥2 lineitems)
- one doc per customer   → 1 text span + relation span (members = its ways)
- one doc per nation     → relation span (members = customer relations)
- one doc per region     → relation span (members = nation relations)

Everything is JVM-side Column expressions (to_json / windows / collect_list);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sqlgen

MEDIA_LEN = 32  # synthetic byte length charged to a media span's offset

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


# Replicated node ids flow through a Knuth-multiply tag hash
# (id · 2654435761 under ANSI), so the largest node id
# (orderkey·8 + linenumber) must stay below 2^63 / 2654435761.
_MAX_NODE_ID = (1 << 63) // 2654435761


def _replicate_offset(max_orderkey: int, replicate: int) -> int:
    """Orderkey stride per replica: the next power of two above the
    base's actual max orderkey (a fixed stride silently collides once
    sf grows past it — same doc_id/node ids, merged spans)."""
    off = 1 << int(max_orderkey).bit_length()
    top = (max_orderkey + (replicate - 1) * off) * 8 + 7
    if top > _MAX_NODE_ID:
        raise ValueError(
            f"replicate={replicate} over max orderkey {max_orderkey} "
            f"would push node ids past the tag-hash overflow bound "
            f"({top} > {_MAX_NODE_ID}); use a smaller base or fewer "
            f"replicas")
    return off


def load_base(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> dict[str, DataFrame]:
    """Load base tables; ``replicate > 1`` deterministically clones the
    order/lineitem fact tables with offset keys (used by bench --scaling
    to reach the compute-bound regime that models 100 TB inputs; the
    correctness gate always runs replicate=1)."""
    names = ["lineitem", "orders", "customer", "nation", "region"]
    base = {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
    if replicate > 1:
        mx = base["orders"].agg(F.max("o_orderkey")).collect()[0][0]
        reps = spark.range(replicate).select(
            (F.col("id") * _replicate_offset(int(mx), replicate))
            .alias("_off")
        )
        # repartition the small base BEFORE the broadcast expansion:
        # otherwise map parallelism is capped at the handful of parquet
        # input splits and the xN blow-up runs on 4-8 tasks regardless
        # of executor count
        par = spark.sparkContext.defaultParallelism * 2
        base["lineitem"] = (
            base["lineitem"].repartition(par)
            .crossJoin(F.broadcast(reps))
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_off"))
            .drop("_off")
        )
        base["orders"] = (
            base["orders"].repartition(par)
            .crossJoin(F.broadcast(reps))
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_off"))
            .drop("_off")
        )
    return base


def _node_payload_cols(df: DataFrame) -> DataFrame:
    """lineitem → node feature columns via the shared deterministic exprs.

    (orderkey, linenumber) pairs are NOT unique in the generated lineitem
    table — dedupe first so node ids are unique (matches sqlgen's
    SELECT DISTINCT)."""
    df = df.select("l_orderkey", "l_linenumber").dropDuplicates(
        ["l_orderkey", "l_linenumber"]
    )
    return df.selectExpr(
        f"{sqlgen.NODE_ID} AS id",
        f"{sqlgen.LON100ND} AS lon",
        f"{sqlgen.LAT100ND} AS lat",
        f"{sqlgen.NODE_HIGHWAY} AS highway",
        f"{sqlgen.NODE_NAME} AS name",
        f"{sqlgen.NODE_AMENITY} AS amenity",
        f"{sqlgen.NODE_ADDR} AS addr_street",
        f"{sqlgen.NODE_MAXSPEED} AS maxspeed",
        f"{sqlgen.H1} AS h1",
        "l_orderkey AS orderkey",
        "l_linenumber AS linenumber",
    )


def _tags_expr(*cols):
    """map of tag key → column, NULLs dropped.  Each item is a column
    name used as the key, or a (key, column) pair when the key is not a
    safe identifier (e.g. 'natural', 'area')."""
    items = [(c, c) if isinstance(c, str) else c for c in cols]
    pairs = ", ".join(f"'{k}', {c}" for k, c in items)
    return F.expr(f"map_filter(map({pairs}), (k, v) -> v IS NOT NULL)")


def synth_docs(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Build the interleaved-document table (doc_id, spans)."""
    base = load_base(spark, sf_dir, replicate)
    li, orders = base["lineitem"], base["orders"]
    customer, nation, region = base["customer"], base["nation"], base["region"]

    nodes = _node_payload_cols(li).withColumn(
        "tags",
        _tags_expr(
            "highway", "name", "amenity", "maxspeed",
            ("addr:street", "addr_street"),
        ),
    )

    # --- order docs: text span + (media?, node)* + way span -----------------
    doc = F.concat(F.lit("doc-"), F.col("orderkey").cast("string"))

    node_spans = nodes.select(
        doc.alias("doc_id"),
        (F.col("linenumber") * 2).cast("long").alias("seq"),
        F.lit("node").alias("kind"),
        F.to_json(F.struct("id", "lon", "lat", "tags")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    media_spans = nodes.filter(F.col("h1") % 5 == 0).select(
        doc.alias("doc_id"),
        (F.col("linenumber") * 2 - 1).cast("long").alias("seq"),
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("blob://"), F.col("id").cast("string")).alias("media_ref"),
    )
    text_spans = orders.select(
        F.concat(F.lit("doc-"), F.col("o_orderkey").cast("string")).alias("doc_id"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("text").alias("kind"),
        F.concat(
            F.lit("order "),
            F.col("o_orderkey").cast("string"),
            F.lit(" priority "),
            F.col("o_orderpriority"),
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )

    way_nodes = (
        nodes.groupBy("orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.array_sort(F.collect_list(F.struct("linenumber", "id"))).alias("ns"),
        )
        .withColumn("node_ids", F.expr("transform(ns, s -> s.id)"))
        .filter(F.col("n_nodes") >= 2)
        .withColumn(
            "closed",
            F.expr(f"{sqlgen.h_expr('orderkey', 2654435761)} % 7 = 0")
            & (F.col("n_nodes") >= 3),
        )
        .withColumn(
            "node_ids",
            F.when(
                F.col("closed"),
                F.concat(F.col("node_ids"), F.slice(F.col("node_ids"), 1, 1)),
            ).otherwise(F.col("node_ids")),
        )
    )
    way_spans = way_nodes.selectExpr(
        "orderkey",
        "node_ids",
        f"{sqlgen.WAY_HIGHWAY.replace('o_orderkey', 'orderkey')} AS highway",
        f"{sqlgen.WAY_NAME.replace('o_orderkey', 'orderkey')} AS name",
        f"{sqlgen.WAY_BUILDING.replace('o_orderkey', 'orderkey')} AS building",
        f"{sqlgen.WAY_LEISURE.replace('o_orderkey', 'orderkey')} AS leisure",
        f"{sqlgen.WAY_NATURAL.replace('o_orderkey', 'orderkey')} AS natural_val",
        f"{sqlgen.WAY_RAILWAY.replace('o_orderkey', 'orderkey')} AS railway",
        f"{sqlgen.WAY_AREATAG.replace('o_orderkey', 'orderkey')} AS area_val",
    ).select(
        F.concat(F.lit("doc-"), F.col("orderkey").cast("string")).alias("doc_id"),
        F.lit(1_000_000).cast("long").alias("seq"),
        F.lit("way").alias("kind"),
        F.to_json(
            F.struct(
                F.col("orderkey").alias("id"),
                F.col("node_ids").alias("nodes"),
                _tags_expr(
                    "highway", "name", "building", "leisure", "railway",
                    ("natural", "natural_val"), ("area", "area_val"),
                ).alias("tags"),
            )
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )

    # --- relation docs: customer relations, members = its order-ways --------
    cust_rel_members = (
        orders.join(way_nodes.select("orderkey"), orders.o_orderkey == F.col("orderkey"))
        .select("o_custkey", "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderkey")).alias("way_ids"))
        .withColumn(
            "members",
            F.expr(
                "transform(way_ids, (w, i) -> struct(1 AS t, w AS id, "
                "CASE WHEN i = 0 THEN 'outer' ELSE 'inner' END AS role))"
            ),
        )
    )
    cust_rels = (
        customer.join(cust_rel_members, customer.c_custkey == F.col("o_custkey"))
        .selectExpr(
            "c_custkey",
            "c_name",
            "members",
            f"{sqlgen.REL_BOUNDARY} AS boundary",
            f"{sqlgen.REL_NAME} AS name",
        )
        .withColumn("rel_id", F.col("c_custkey") + F.lit(sqlgen.CUST_REL_BASE))
        .withColumn("tags", _tags_expr("boundary", "name"))
    )
    cust_text = cust_rels.select(
        F.concat(F.lit("cust-"), F.col("c_custkey").cast("string")).alias("doc_id"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("text").alias("kind"),
        F.concat(F.lit("customer "), F.col("c_name")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    cust_rel_spans = cust_rels.select(
        F.concat(F.lit("cust-"), F.col("c_custkey").cast("string")).alias("doc_id"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("relation").alias("kind"),
        F.to_json(
            F.struct(F.col("rel_id").alias("id"), F.col("members"), F.col("tags"))
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )

    # nation / region super-relations
    nat_members = (
        cust_rels.join(customer, "c_custkey")
        .groupBy("c_nationkey")
        .agg(F.array_sort(F.collect_list("rel_id")).alias("mids"))
        .withColumn(
            "members",
            F.expr("transform(mids, m -> struct(2 AS t, m AS id, 'subarea' AS role))"),
        )
    )
    nat_rel_spans = nation.join(
        nat_members, nation.n_nationkey == F.col("c_nationkey")
    ).select(
        F.concat(F.lit("nat-"), F.col("n_nationkey").cast("string")).alias("doc_id"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("relation").alias("kind"),
        F.to_json(
            F.struct(
                (F.col("n_nationkey") + F.lit(sqlgen.NATION_REL_BASE)).alias("id"),
                F.col("members"),
                F.map_from_arrays(
                    F.array(F.lit("name")), F.array(F.col("n_name"))
                ).alias("tags"),
            )
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    reg_members = (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_sort(
                F.collect_list(F.col("n_nationkey") + F.lit(sqlgen.NATION_REL_BASE))
            ).alias("mids")
        )
        .withColumn(
            "members",
            F.expr("transform(mids, m -> struct(2 AS t, m AS id, 'subarea' AS role))"),
        )
    )
    reg_rel_spans = region.join(
        reg_members, region.r_regionkey == F.col("n_regionkey")
    ).select(
        F.concat(F.lit("reg-"), F.col("r_regionkey").cast("string")).alias("doc_id"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("relation").alias("kind"),
        F.to_json(
            F.struct(
                (F.col("r_regionkey") + F.lit(sqlgen.REGION_REL_BASE)).alias("id"),
                F.col("members"),
                F.map_from_arrays(
                    F.array(F.lit("name")), F.array(F.col("r_name"))
                ).alias("tags"),
            )
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )

    all_spans = (
        text_spans.unionByName(node_spans)
        .unionByName(media_spans)
        .unionByName(way_spans)
        .unionByName(cust_text)
        .unionByName(cust_rel_spans)
        .unionByName(nat_rel_spans)
        .unionByName(reg_rel_spans)
    )

    # cumulative offsets (strictly increasing within a document), computed
    # INSIDE the per-doc aggregate: one shuffle total — the previous
    # window-then-groupBy shape shuffled and sorted every span twice
    docs = (
        all_spans.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "kind", "text", "media_ref"))
            ).alias("raw")
        )
        .withColumn(
            "spans",
            F.expr(
                "aggregate(raw, "
                "  struct(0 AS off, CAST(array() AS "
                f"  {SPAN_SCHEMA}) AS out), "
                "  (acc, s) -> struct("
                "    acc.off + CASE WHEN s.kind = 'media' THEN "
                f"     {MEDIA_LEN} ELSE length(s.text) END, "
                "    array_append(acc.out, struct(s.kind AS kind, "
                "      s.text AS text, s.media_ref AS media_ref, "
                "      acc.off AS offset))), "
                "  acc -> acc.out)"
            ).cast(SPAN_SCHEMA),
        )
        .select("doc_id", "spans")
    )
    return docs
