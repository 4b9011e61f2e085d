"""Self-verification CLI replicating the driver's correctness gate.

Usage:  python tools/selfcheck.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fs2_osm_spark.oracle import compare, duckdb_connection  # noqa: E402
from fs2_osm_spark.queries import QUERIES  # noqa: E402
from fs2_osm_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

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
                status = [] if n > 0 else [f"0 rows (rows-only check)"]
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
            # .persist(); release them between queries so a 109-query
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
