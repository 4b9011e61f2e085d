"""PBF-lifecycle scale trend: time write_osm_pbf + run_pbf_pipeline at a
series of zone counts in ONE warm local[N] session and update
BENCH/lifecycle_scale.json (the table behind BENCH/LIFECYCLE.md).

The pipeline wall should track data volume sub-linearly (the fixed costs —
image synthesis for the batched flagship stage, 24 sink jobs, lineage —
amortize; the volume-tracking parts are decode + export + feature passes,
which parallelize across cores/executors). Run on a QUIET host.

Run: python tools/lifecycle_scale.py [--zones 512 2048 8192] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "BENCH", "lifecycle_scale.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, nargs="+", default=[512, 2048, 8192])
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    import duckdb

    from fs2_osm_spark.plans.pbf_pipeline import run_pbf_pipeline
    from fs2_osm_spark.session import get_spark
    from fs2_osm_spark.sources.pbf_writer import write_osm_pbf

    spark = get_spark(cores=args.cpus, app_name="lifecycle_scale")
    try:
        with open(OUT_JSON) as f:
            table = json.load(f)
    except OSError:
        table = {}

    for n_zones in args.zones:
        root = tempfile.mkdtemp(prefix=f"lifecycle_{n_zones}_")
        try:
            pbf_dir = os.path.join(root, "pbf")
            t0 = time.time()
            files = write_osm_pbf(spark, pbf_dir, n_zones, args.cpus).collect()
            write_sec = time.time() - t0
            pbf_bytes = sum(r.n_bytes for r in files)
            t0 = time.time()
            run_pbf_pipeline(
                spark, pbf_dir, os.path.join(root, "out"),
                n_images=2_000, n_batches=8,
            )
            pipeline_sec = time.time() - t0
            nodes = duckdb.sql(
                f"SELECT count(*) FROM '{root}/out/export/nodes/*.parquet'"
            ).fetchone()[0]
            ways = duckdb.sql(
                f"SELECT count(*) FROM '{root}/out/export/ways/*.parquet'"
            ).fetchone()[0]
            table[str(n_zones)] = {
                "write_sec": round(write_sec, 2),
                "pipeline_sec": round(pipeline_sec, 2),
                "pbf_bytes": int(pbf_bytes),
                "nodes": int(nodes),
                "ways": int(ways),
            }
            print(n_zones, table[str(n_zones)])
        finally:
            shutil.rmtree(root, ignore_errors=True)
    table["note"] = (
        f"warm local[{args.cpus}]; regenerate: python tools/lifecycle_scale.py; "
        "see BENCH/LIFECYCLE.md"
    )
    tmp = OUT_JSON + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1)
    os.replace(tmp, OUT_JSON)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
