"""Self-verification CLI replicating the driver's correctness gate.

Usage:  python tools/selfcheck.py [sf_dir] [name_filter]
        python tools/selfcheck.py --driver-sim [sf_dir] [n_queries]

--driver-sim replicates the DRIVER's environment instead of the engine's:
a vanilla ``SparkSession.builder.getOrCreate()`` (none of session.py's
confs — Arrow off, 200 shuffle partitions, default broadcast threshold),
only the first-N PRIORITY-prefix queries in queries() iteration order, and
NO inter-query hygiene (no release_pins / clearCache — the driver does
none). This is the harness that would have caught the r05 lineage failure
and the r07 img_shard_pack cache-eviction window; run it before every
round-end commit.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fs2_osm_spark.oracle import compare, duckdb_connection  # noqa: E402
from fs2_osm_spark.queries import QUERIES, queries_map  # noqa: E402


def run_driver_sim(sf_dir: str, n_queries: int) -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("selfcheck_driver_sim").getOrCreate()
    con = duckdb_connection(sf_dir)
    failures = []
    names = list(queries_map())[:n_queries]
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                status = [] if sdf.count() > 0 else ["0 rows (rows-only check)"]
            else:
                status = compare(sdf, q.oracle, con)
        except Exception as e:  # noqa: BLE001
            status = [f"error: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if status:
            failures.append(name)
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(status), flush=True)
        else:
            print(f"ok   {name} ({dt:.1f}s)", flush=True)
        # deliberately NO release_pins()/clearCache() between queries
    print(f"\n[driver-sim] {len(names)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--driver-sim" in sys.argv[1:]:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        n_queries = int(argv[1]) if len(argv) > 1 else 50
        return run_driver_sim(sf_dir, n_queries)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    name_filter = argv[1] if len(argv) > 1 else ""

    from fs2_osm_spark.session import get_spark

    con = duckdb_connection(sf_dir)
    spark = get_spark(cores=8, app_name="selfcheck")
    failures = []
    for name, q in sorted(QUERIES.items()):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = sdf.count()
                status = [] if n > 0 else ["0 rows (rows-only check)"]
            else:
                status = compare(sdf, q.oracle, con)
        except Exception as e:  # noqa: BLE001
            status = [f"error: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if status:
            failures.append(name)
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(status))
        else:
            mode = "rows-only" if q.oracle is None else "oracle"
            print(f"ok   {name} [{mode}] ({dt:.1f}s)")
        if name.startswith("dedup_"):
            # the dedup operators pin small intermediate plans with
            # .persist(); release them between queries so a 148-query
            # session's storage memory stays flat instead of accumulating
            from fs2_osm_spark.operators.dedup import release_pins

            release_pins()
        if name in ("text_pack_bins", "text_global_shuffle", "img_shard_pack"):
            from fs2_osm_spark.operators.packing import release_pins as rp

            rp()
        if name == "img_phash_neardup":
            # same pin hygiene as the dedup_ prefix: CC iteration pins
            from fs2_osm_spark.operators.dedup import release_pins

            release_pins()
        if name in (
            "text_global_shuffle",
            "osm_apply_diff",
            "img_shard_pack",
            "img_phash_neardup",
            "img_phash_multiprobe",
        ):
            # these queries cache small frames their lazily-consumed result
            # depends on; once the CLI has collected, drop them
            spark.catalog.clearCache()

    print(f"\n{len(QUERIES)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
