"""Generic relational operators of the reference, validated on neutral data.

The reference's feature layer is SQL shipped to Postgres
(/root/reference/postgres/src/main/scala/fs2/osm/postgres/Queries.scala:31-34);
its relational surface is catalogued in SURVEY.md §2.3 (R1-R30). Each query
here exercises one of those operator shapes on the driver's TPC-H-ish tables,
with a DuckDB oracle, so the correctness gate covers the operator itself
independently of OSM-specific data.

Operator -> reference citation mapping is in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.io import load
from fs2_osm_spark.queries.registry import register


# --------------------------------------------------------------------------
# R1-R4: CROSS JOIN LATERAL unnest + equi join + ordered aggregation
# (PolygonFeature.scala:43-47, insert-into-osm-lines.sql:2-9)
# Analogue: assemble each order's "line" of part keys in linenumber order.
# --------------------------------------------------------------------------
@register(
    "r01_ordered_assembly",
    oracle="""
    SELECT l.l_orderkey AS order_id,
           o.o_orderpriority AS priority,
           string_agg(CAST(l.l_partkey AS VARCHAR), ',' ORDER BY l.l_linenumber, l.l_partkey) AS line,
           CAST(count(*) AS BIGINT) AS n_pts
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, o.o_orderpriority
    """,
)
def r01_ordered_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered aggregation: ST_MakeLine(geom ORDER BY index) semantics (R3).

    collect_list is unordered across partitions, so determinism comes from
    array_sort on the (index, value) struct — same trick the engine uses for
    real geometry assembly. At scale this is one shuffle on the group key
    with partial aggregation map-side.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    assembled = li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s.l_partkey.cast("string"),
            ),
        ).alias("line"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    return (
        assembled.join(orders, assembled.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("o_orderpriority").alias("priority"),
            "line",
            "n_pts",
        )
    )


# --------------------------------------------------------------------------
# R2: equi inner join to resolve per-position values
# (PolygonFeature.scala:47, insert-into-osm-lines.sql:6-7)
# --------------------------------------------------------------------------
@register(
    "r02_resolve_join",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(l.l_quantity), 2) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def r02_resolve_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join lineitem->part (node-geometry resolution shape, R2).

    part is small relative to lineitem: Catalyst broadcasts it (checked via
    explain in tests) — the same choice the engine makes for dimension
    tables and small polygon sets.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# R5: tag-value equality predicate (tags->>'k' = 'v', WaterFeature.scala:48)
# events.props is a JSON map like the reference's JSONB tags column.
# --------------------------------------------------------------------------
@register(
    "r05_tag_equality",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(value), 4) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) < 10
    GROUP BY event_type
    """,
)
def r05_tag_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON tag extraction + predicate, the tags->>'k' shape (R5)."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": (\\d+)', 1).cast("bigint")
    return (
        ev.filter(k < 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# R6: has-key / IS NOT NULL presence predicate (PolygonFeature.scala:49-57)
# --------------------------------------------------------------------------
@register(
    "r06_presence_predicate",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE text LIKE '%window%'
    GROUP BY lang
    """,
)
def r06_presence_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-presence filter shape (map_contains_key / tags ?? 'k', R6)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").like("%window%"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# R7: IN-list predicate on tag values (PolygonFeature.scala:59-69)
# --------------------------------------------------------------------------
@register(
    "r07_in_list",
    oracle="""
    SELECT p_brand AS brand, p_type AS kind, CAST(count(*) AS BIGINT) AS n
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    GROUP BY p_brand, p_type
    """,
)
def r07_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("kind"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# R8: compound NULL-tolerant boolean predicate (PolygonFeature.scala:48-69)
# --------------------------------------------------------------------------
@register(
    "r08_null_tolerant_bool",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nation_id, CAST(count(*) AS BIGINT) AS n
    FROM customer
    WHERE (c_mktsegment IS NULL OR c_mktsegment <> 'AUTOMOBILE')
      AND (c_acctbal > 5000.0 OR c_nationkey IN (1, 2, 3))
    GROUP BY c_nationkey
    """,
)
def r08_null_tolerant_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicates SQL 3-valued logic explicitly: `tags->>'area' != 'no'`
    is false for NULL in the reference, so the NULL branch is explicit."""
    cust = load(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    pred = (seg.isNull() | (seg != "AUTOMOBILE")) & (
        (F.col("c_acctbal") > 5000.0) | F.col("c_nationkey").isin(1, 2, 3)
    )
    return (
        cust.filter(pred)
        .groupBy(F.col("c_nationkey").cast("bigint").alias("nation_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# R9: post-aggregation closure filter (ST_IsClosed, PolygonFeature.scala:72)
# "ring closed" analogue: first element == last element in index order.
# --------------------------------------------------------------------------
@register(
    "r09_closure_filter",
    oracle="""
    SELECT order_id, n_pts FROM (
        SELECT l_orderkey AS order_id,
               CAST(count(*) AS BIGINT) AS n_pts,
               min_by(l_suppkey, l_linenumber * 100000 + l_suppkey) AS first_pt,
               max_by(l_suppkey, l_linenumber * 100000 + l_suppkey) AS last_pt
        FROM lineitem GROUP BY l_orderkey
    ) WHERE first_pt = last_pt AND n_pts >= 2
    """,
)
def r09_closure_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min_by("l_suppkey", F.col("l_linenumber") * 100000 + F.col("l_suppkey")).alias(
            "first_pt"
        ),
        F.max_by("l_suppkey", F.col("l_linenumber") * 100000 + F.col("l_suppkey")).alias(
            "last_pt"
        ),
    )
    return g.filter((F.col("first_pt") == F.col("last_pt")) & (F.col("n_pts") >= 2)).select(
        "order_id", "n_pts"
    )


# --------------------------------------------------------------------------
# R10: scalar projection of tags into typed columns (HighwayFeature.scala:38-54)
# --------------------------------------------------------------------------
@register(
    "r10_typed_projection",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS part_id,
           string_split(p_type, ' ')[1] AS kind,
           string_split(p_type, ' ')[-1] AS material,
           coalesce(p_size > 25, false) AS oversize
    FROM part
    """,
)
def r10_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-map -> typed column projection with coalesce'd boolean, the
    highways kind/footway/surface shape (R10)."""
    part = load(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return part.select(
        F.col("p_partkey").cast("bigint").alias("part_id"),
        words.getItem(0).alias("kind"),
        F.element_at(words, -1).alias("material"),
        F.coalesce(F.col("p_size") > 25, F.lit(False)).alias("oversize"),
    )


# --------------------------------------------------------------------------
# R13/R15: multi-hop join chain replacing per-key correlated lookups
# (ComplexPolygonBuilder.scala:52-56 redesigned set-based)
# --------------------------------------------------------------------------
@register(
    "r15_join_chain",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(round(sum(o.o_totalprice), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
)
def r15_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop join chain: the set-based replacement for the reference's
    per-relation nested-loop (R13). region/nation broadcast; orders->customer
    shuffles once on the customer key."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# R20: min-vertex HAVING-style filter (ComplexPolygonBuilder.scala:116-130)
# --------------------------------------------------------------------------
@register(
    "r20_min_vertex",
    oracle="""
    SELECT l_orderkey AS order_id, CAST(count(*) AS BIGINT) AS n_pts
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 3
    """,
)
def r20_min_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .filter(F.col("n_pts") > 3)
    )


# --------------------------------------------------------------------------
# R24: IN-subquery semi join (ObsoleteFeature.scala:102-106)
# --------------------------------------------------------------------------
@register(
    "r24_semi_join",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS cust_id, CAST(c_nationkey AS BIGINT) AS nation_id
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
    """,
)
def r24_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        F.col("c_custkey").cast("bigint").alias("cust_id"),
        F.col("c_nationkey").cast("bigint").alias("nation_id"),
    )


# --------------------------------------------------------------------------
# R25: limit / take(n) (Queries.scala:24-25) — made deterministic with sort.
# --------------------------------------------------------------------------
@register(
    "r25_limit_take",
    oracle="""
    SELECT o_orderkey AS order_id,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def r25_limit_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.round("o_totalprice", 2).cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# R27: dedupe keep-first (ON CONFLICT DO NOTHING, RelationImporter.scala:52-68)
# --------------------------------------------------------------------------
@register(
    "r27_dedupe_keep_first",
    oracle="""
    SELECT l_orderkey AS order_id,
           CAST(l_suppkey AS BIGINT) AS supp_id,
           CAST(min(l_linenumber) AS BIGINT) AS first_line,
           CAST(min_by(l_partkey, l_linenumber * 100000 + l_partkey) AS BIGINT) AS kept_part
    FROM lineitem GROUP BY l_orderkey, l_suppkey
    """,
)
def r27_dedupe_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedupe on a unique key. dropDuplicates() is
    order-nondeterministic in Spark, so the engine expresses keep-first as
    min_by over the arrival-order column — deterministic at any parallelism."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_suppkey").cast("bigint").alias("supp_id"),
    ).agg(
        F.min("l_linenumber").cast("bigint").alias("first_line"),
        F.min_by("l_partkey", F.col("l_linenumber") * 100000 + F.col("l_partkey"))
        .cast("bigint")
        .alias("kept_part"),
    )


# --------------------------------------------------------------------------
# R28: union-all of two passes into one table (WaterFeature.scala:29-32)
# --------------------------------------------------------------------------
@register(
    "r28_union_all",
    oracle="""
    SELECT pass, l_linestatus AS status, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'returned' AS pass, l_linestatus FROM lineitem WHERE l_returnflag = 'R'
        UNION ALL
        SELECT 'accepted' AS pass, l_linestatus FROM lineitem WHERE l_returnflag = 'A'
    ) GROUP BY pass, l_linestatus
    """,
)
def r28_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("returned").alias("pass"), F.col("l_linestatus").alias("status")
    )
    b = li.filter(F.col("l_returnflag") == "A").select(
        F.lit("accepted").alias("pass"), F.col("l_linestatus").alias("status")
    )
    return a.unionByName(b).groupBy("pass", "status").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# R29: aggregate kind defaulting (tags.getOrElse, WaterFeature.scala:63)
# --------------------------------------------------------------------------
@register(
    "r29_kind_default",
    oracle="""
    SELECT coalesce(nullif(o_orderstatus, 'O'), 'unspecified') AS kind,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
)
def r29_kind_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    kind = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("unspecified")
    ).alias("kind")
    return orders.groupBy(kind).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Window top-k: the engine's kNN refinement step uses exactly this shape
# (SURVEY.md §4.2 — k-ring expand then Window.partitionBy().orderBy() top-k).
# --------------------------------------------------------------------------
@register(
    "topk_window",
    oracle="""
    SELECT cust_id, rank, order_id FROM (
        SELECT o_custkey AS cust_id,
               CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
               o_orderkey AS order_id
        FROM orders
    ) WHERE rank <= 3
    """,
)
def topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            F.col("o_custkey").alias("cust_id"),
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col("o_orderkey").alias("order_id"),
        )
        .filter(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# Pricing summary aggregate (partial-agg / map-side combine showcase).
# --------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).cast("double").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).cast("double").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# R1 explicit: posexplode round trip — array build then positional explode.
# --------------------------------------------------------------------------
@register(
    "r01_posexplode",
    oracle="""
    WITH arrs AS (
        SELECT l_orderkey AS order_id, list(l_partkey ORDER BY l_partkey) AS pts
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT order_id,
           CAST(generate_subscripts(pts, 1) - 1 AS BIGINT) AS pos,
           CAST(unnest(pts) AS BIGINT) AS part_id
    FROM arrs
    """,
)
def r01_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode preserves order+multiplicity like PG's lateral unnest (R1)."""
    li = load(spark, sf_dir, "lineitem")
    arrs = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.array_sort(F.collect_list("l_partkey")).alias("pts")
    )
    return arrs.select(
        "order_id", F.posexplode("pts").alias("pos", "part_id")
    ).select(
        "order_id", F.col("pos").cast("bigint"), F.col("part_id").cast("bigint")
    )
