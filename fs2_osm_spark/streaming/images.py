"""Streaming image ingest with dedup-on-arrival.

The training-data shape: a feed of images arrives in micro-batches; an
image is NOVEL iff no earlier-arrived image is a perceptual near-dup
(hamming(aHash64) <= t). Every arriving image — novel or not — joins the
accumulated hash index, so later arrivals dedup against everything seen.

Because the 8x8-bit banding has full recall at hamming <= 7 (pigeonhole),
the banded streaming result is EXACTLY the threshold formula
``novel(i) = not exists j: arrival_j < arrival_i and d(i,j) <= t`` — which
is what the DuckDB twin evaluates all-pairs from the fixture's recorded
hashes, and why the result is independent of how the ordered feed is cut
into micro-batches (pinned by tests/test_stream_image_dedup.py).

Ordering: novelty is defined against ARRIVAL order, so the source must
deliver batches in order — here a file stream whose staged slices are
written sequentially (increasing mtime, replayed oldest-first, the
events-stream pattern); a production feed would be a log source with
per-partition ordering. State follows the CDC swap-on-write pattern:
per-batch parquet snapshots, previous snapshot dropped, final state
swapped through catalog.write_table into a durable per-run table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.operators.multimodal import band_cols, phash_frame

# previous run's durable output table (same bounded-disk contract as
# _CDC_STATE in streaming/events.py: at most one superseded tree)
_IMG_DEDUP_OUT: dict[str, str | None] = {"path": None}


def _earlier_dup_ids(
    batch: DataFrame, prior: DataFrame, n_bands: int, hamming_t: int
) -> DataFrame:
    """img_ids in `batch` having a near-dup in `prior` with smaller
    arrival (prior may include the batch itself). Banded join: only
    (arrival, phash, band) reaches the shuffle, never image bytes."""
    explode = F.posexplode(
        F.array(*band_cols("phash", n_bands))
    ).alias("k", "bv")
    b = batch.select("img_id", "arrival", "phash", explode)
    p = prior.select(
        F.col("img_id").alias("p_id"),
        F.col("arrival").alias("p_arrival"),
        F.col("phash").alias("p_phash"),
        explode,
    ).withColumnsRenamed({"k": "pk", "bv": "pbv"})
    return (
        b.join(
            p,
            on=[
                F.col("k") == F.col("pk"),
                F.col("bv") == F.col("pbv"),
                F.col("p_arrival") < F.col("arrival"),
            ],
        )
        .where(
            F.bit_count(F.col("phash").bitwiseXOR(F.col("p_phash"))) <= hamming_t
        )
        .select("img_id")
        .distinct()
    )


def stream_image_dedup(
    spark: SparkSession,
    corpus_path: str,
    n_batches: int = 5,
    n_bands: int = 8,
    hamming_t: int = 6,
) -> DataFrame:
    """Run the ordered image feed through foreachBatch dedup-on-arrival;
    returns the durable (img_id, is_novel) table."""
    from fs2_osm_spark.catalog import read_table, write_table

    corpus = spark.read.parquet(corpus_path).select("img_id", "bytes", "fmt")
    # fixture-scale arrival rank (1000 rows). At feed scale arrival comes
    # from the log offset; the scale-safe batch rank is
    # operators/packing.distributed_prefix_sum (see text_global_shuffle).
    from pyspark.sql.window import Window

    ordered = corpus.withColumn(
        "arrival",
        F.row_number().over(Window.orderBy("img_id")).cast("bigint") - 1,
    )
    n_rows = ordered.count()
    per = (n_rows + n_batches - 1) // n_batches

    root = tempfile.mkdtemp(prefix="img_dedup_stream_")
    feed_dir = os.path.join(root, "feed")
    os.makedirs(feed_dir)
    # FileStreamSource replays oldest-mtime-first at MILLISECOND
    # granularity: two fast sequential writes can tie and replay in random
    # part-file-name order, so each slice's files get an explicit strictly
    # increasing timestamp instead of relying on write latency
    base_t = int(os.stat(feed_dir).st_mtime)
    for k in range(n_batches):
        before = set(os.listdir(feed_dir))
        ordered.filter(
            (F.col("arrival") >= k * per) & (F.col("arrival") < (k + 1) * per)
        ).coalesce(1).write.mode("append").parquet(feed_dir)
        for f in set(os.listdir(feed_dir)) - before:
            os.utime(os.path.join(feed_dir, f), (base_t + k + 1, base_t + k + 1))

    schema = ordered.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )

    holder: dict[str, str | None] = {"state": None}
    flags_dir = os.path.join(root, "flags")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # pin the decoded hashes: `hashed` feeds the dup join twice (probe
        # side + prior union), the flags join, and the state snapshot —
        # unpersisted, every micro-batch would decode its images ~4x
        hashed = (
            phash_frame(batch_df)
            .join(batch_df.select("img_id", "arrival"), "img_id")
            .persist()
        )
        try:
            prev_path = holder["state"]
            if prev_path is not None:
                state = spark.read.parquet(prev_path)
                prior = state.unionByName(hashed)
            else:
                prior = hashed
            dup = _earlier_dup_ids(hashed, prior, n_bands, hamming_t)
            flags = hashed.join(
                dup.withColumn("_d", F.lit(True)), "img_id", "left"
            ).select(
                "img_id", F.coalesce(F.col("_d"), F.lit(False)).alias("is_dup")
            )
            flags.write.mode("append").parquet(flags_dir)
            out = os.path.join(root, f"state_v{batch_id}")
            # every arrival joins the index (dups of dups are still dups)
            prior.select("img_id", "arrival", "phash").write.mode(
                "overwrite"
            ).parquet(out)
            holder["state"] = out
            if prev_path is not None:
                shutil.rmtree(prev_path, ignore_errors=True)
        finally:
            hashed.unpersist()

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out_table = tempfile.mkdtemp(prefix="fs2_osm_img_dedup_")
    write_table(
        spark.read.parquet(flags_dir).select(
            "img_id", (~F.col("is_dup")).alias("is_novel")
        ),
        out_table,
    )
    shutil.rmtree(root, ignore_errors=True)
    prev_out = _IMG_DEDUP_OUT.get("path")
    if prev_out is not None:
        shutil.rmtree(prev_out, ignore_errors=True)
    _IMG_DEDUP_OUT["path"] = out_table
    return read_table(spark, out_table)
