"""Decode-bound scaling evidence: the 250k-image tile pyramid at two
parallelism levels (fresh JVM per level, best-of-3 in-process).

Complements tools/scaling_bench.py (the join-bound flagship, which carries
the north-rule gate): the pyramid's hot loop is the Arrow-batched decode
pass, so this measures Python-worker scaling rather than shuffle/join
scaling. Results recorded in BENCH/PYRAMID.md.

Usage:  python tools/pyramid_scaling.py            # runs 8 then 32
        python tools/pyramid_scaling.py <cores>    # one level (child mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = os.path.join(REPO, "BENCH", "cache", "images_pyramid_250k.parquet")
N_IMAGES = 250_000


def run_level(cores: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fs2_osm_spark.queries.multimodal2 import pyramid_rollup
    from fs2_osm_spark.synth.images import images_table

    if not os.path.exists(CORPUS):
        images_table(spark, N_IMAGES, partitions=64).write.mode(
            "overwrite"
        ).parquet(CORPUS)

    best, tiles = None, 0
    for _ in range(3):
        t0 = time.time()
        # the EXACT registered plan (oracled as img_tile_pyramid)
        tiles = pyramid_rollup(spark.read.parquet(CORPUS)).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, tiles


def main() -> int:
    if len(sys.argv) > 1:  # child: one level, fresh JVM
        best, tiles = run_level(int(sys.argv[1]))
        print(json.dumps({"cores": int(sys.argv[1]), "best_sec": best, "tiles": tiles}))
        return 0
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    assert results[8]["tiles"] == results[32]["tiles"], "output diverged"
    raw = (results[8]["best_sec"] / results[32]["best_sec"]) / 4.0
    print(f"raw scaling efficiency 8->32: {raw:.3f} "
          f"(normalize against BENCH/null_ceiling_8_32.json)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
