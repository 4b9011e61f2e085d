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


PACK_BUDGET = 512


@register(
    "text_pack_bins",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS psum
        FROM t
    )
    SELECT doc_id, n_tokens,
           psum // {PACK_BUDGET} AS bin_id,
           psum % {PACK_BUDGET} AS offset_in_bin
    FROM s
    """,
)
def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: token-budget bin assignment over the global doc_id
    order (concat-and-chunk, the LM-training packing shape). The Spark side
    runs the DISTRIBUTED prefix sum (range shuffle + two narrow passes —
    operators/packing.py; a global Window would collapse to one task); the
    oracle is DuckDB's single-node window cumsum, so the distributed
    decomposition must reproduce the sequential scan exactly."""
    from fs2_osm_spark.operators.packing import pack_token_bins

    docs = load(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    packed = pack_token_bins(counted, "n_tokens", ["doc_id"], PACK_BUDGET)
    return packed.select(
        "doc_id", "n_tokens",
        F.col("bin_id"),
        F.col("offset_in_bin").cast("bigint").alias("offset_in_bin"),
    )


# deterministic mixing weights: keep-permille per source bucket (a "data
# recipe"); unlisted sources fall back to DEFAULT_PERMILLE
MIX_PERMILLE = {"src0": 1000, "src1": 750, "src2": 500, "src3": 250, "src4": 0}
DEFAULT_PERMILLE = 900
TRAIN_PERMILLE = 950  # 95/5 train-val split


def _mix_oracle() -> str:
    from fs2_osm_spark.functions.text import h16_sql

    keep_h = h16_sql("'mix|' || doc_id")
    split_h = h16_sql("'split|' || doc_id")
    cases = " ".join(
        f"WHEN source = '{s}' THEN {p}" for s, p in MIX_PERMILLE.items()
    )
    return f"""
    SELECT doc_id, source,
           ({keep_h} % 1000) < (CASE {cases} ELSE {DEFAULT_PERMILLE} END)
               AS kept,
           CASE WHEN ({split_h} % 1000) < {TRAIN_PERMILLE}
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """


@register("text_dataset_mix", oracle=_mix_oracle())
def text_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset mixing + train/val split: per-source keep
    rates (a data recipe) and a 95/5 split, both decided by a content
    hash of the doc id — reproducible across runs, cluster sizes and
    engines (the md5 fragment evaluates identically in Spark and DuckDB),
    and embarrassingly parallel: a pure Column filter, no shuffle, no
    sampling state."""
    from fs2_osm_spark.functions.text import h16_sql

    docs = load(spark, sf_dir, "documents")
    keep_h = F.expr(h16_sql("'mix|' || doc_id"))
    split_h = F.expr(h16_sql("'split|' || doc_id"))
    permille = F.lit(DEFAULT_PERMILLE)
    for s, p in reversed(MIX_PERMILLE.items()):
        permille = F.when(F.col("source") == s, F.lit(p)).otherwise(permille)
    return docs.select(
        "doc_id",
        "source",
        ((keep_h % 1000) < permille).alias("kept"),
        F.when((split_h % 1000) < TRAIN_PERMILLE, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )
