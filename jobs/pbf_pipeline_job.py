"""spark-submit entry for the full PBF lifecycle job.

Framed .osm.pbf -> wire decode (S4-S10) -> export fan-out + 17 feature
passes (S12-S14, PostgresExporter.runExport parity) -> flagship image PIP
join + tiling, batched with lineage resume: re-submitting after a kill
continues from the last completed flagship batch.

    zip -r fs2_osm_spark.zip fs2_osm_spark
    spark-submit --py-files fs2_osm_spark.zip jobs/pbf_pipeline_job.py \
        --pbf <frame dir> --output <root> [--images N] [--batches N] \
        [--synth-zones N]   # writes the .osm.pbf input first if given
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pbf", required=True, help="dir of framed .osm.pbf files")
    ap.add_argument("--output", required=True, help="output root (export + flagship)")
    ap.add_argument("--images", type=int, default=2_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--synth-zones", type=int, default=0,
        help="if >0, synthesize this many zones into --pbf first",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fs2_osm_spark.plans.pbf_pipeline import run_pbf_pipeline

    spark = SparkSession.builder.appName("fs2_osm_spark_pbf_pipeline").getOrCreate()

    if args.synth_zones:
        from fs2_osm_spark.sources.pbf_writer import write_osm_pbf

        s = write_osm_pbf(spark, args.pbf, args.synth_zones).collect()
        print(f"wrote {len(s)} pbf files, {sum(r.n_bytes for r in s)} bytes")

    t0 = time.time()
    out = run_pbf_pipeline(
        spark, args.pbf, args.output, n_images=args.images, n_batches=args.batches
    )
    print(
        json.dumps(
            {
                "wall_sec": round(time.time() - t0, 2),
                "batches_this_run": out["batches"],
                "summary": out["summary"],
            },
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
