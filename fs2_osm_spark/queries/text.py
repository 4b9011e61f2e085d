"""Text-analysis operators over the documents table, all oracle-checked.

Token counting, quality scoring, language ID (marker heuristic), and an
order-sensitive rolling fingerprint — the text half of the training-data
pipeline ops (task brief), expressed with built-in functions (split /
higher-order filter / window lead) so everything stays JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.functions.text import (
    LANG_MARKERS,
    h16_sql,
    marker_count_duck,
    marker_count_sql,
)
from fs2_osm_spark.io import load
from fs2_osm_spark.queries.registry import register


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6) AS DOUBLE)
               AS avg_token_len,
           CAST(round(CAST({marker_count_duck(('the', 'a'))} AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS DOUBLE) AS stopword_ratio,
           (n_chars >= 50 AND n_chars <= 10000) AS length_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    stop = F.expr(marker_count_sql(("the", "a"))).cast("double")
    return docs.select(
        "doc_id",
        F.round(F.col("n_chars").cast("double") / n_tok, 6).alias("avg_token_len"),
        F.round(stop / n_tok, 6).alias("stopword_ratio"),
        ((F.col("n_chars") >= 50) & (F.col("n_chars") <= 10000)).alias("length_ok"),
    )


_lang_counts_duck = {k: marker_count_duck(v) for k, v in LANG_MARKERS.items()}
_l1, _l2, _l3 = LANG_MARKERS.keys()


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN c1 >= c2 AND c1 >= c3 THEN '{_l1}'
                WHEN c2 >= c3 THEN '{_l2}'
                ELSE '{_l3}' END AS pred_lang,
           CAST(c1 + c2 + c3 AS BIGINT) AS n_markers
    FROM (
        SELECT doc_id,
               {_lang_counts_duck[_l1]} AS c1,
               {_lang_counts_duck[_l2]} AS c2,
               {_lang_counts_duck[_l3]} AS c3
        FROM documents
    )
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c1 = F.expr(marker_count_sql(LANG_MARKERS[_l1]))
    c2 = F.expr(marker_count_sql(LANG_MARKERS[_l2]))
    c3 = F.expr(marker_count_sql(LANG_MARKERS[_l3]))
    base = docs.select("doc_id", c1.alias("c1"), c2.alias("c2"), c3.alias("c3"))
    pred = (
        F.when((F.col("c1") >= F.col("c2")) & (F.col("c1") >= F.col("c3")), _l1)
        .when(F.col("c2") >= F.col("c3"), _l2)
        .otherwise(_l3)
    )
    return base.select(
        "doc_id",
        pred.alias("pred_lang"),
        (F.col("c1") + F.col("c2") + F.col("c3")).cast("bigint").alias("n_markers"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST(sum((pos % 7 + 1) * {h16_sql("w")}) % 1000000007 AS BIGINT)
               AS fingerprint
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ) GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted 16-bit token
    hashes mod 1e9+7 (rolling-hash family, SQL-portable)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    term = (F.col("pos") % 7 + 1) * F.expr(h16_sql("w"))
    return words.groupBy("doc_id").agg(
        (F.sum(term) % 1000000007).cast("bigint").alias("fingerprint")
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (letters runs / digit runs / punct),
    the pre-tokenizer split shape; pattern chosen to behave identically
    under Java regex (Spark) and RE2 (DuckDB)."""
    docs = load(spark, sf_dir, "documents")
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(pat)).cast("bigint").alias("n_bpe_tokens"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+")).cast("bigint").alias("n_numbers"),
    )
