"""Hardware scaling calibration (the null test).

Measures how a ZERO-I/O, ZERO-string, pure-JVM-arithmetic pipeline —
spark.range -> hex-cell Column math -> max aggregate, nothing the engine
can do better or worse — scales between two local[] thread counts on THIS
host. Any shortfall from perfect 4x here is a property of the sandbox VM
(vCPU contention / frequency scaling invisible to the guest), not of a
query plan, and bounds what ANY job can show between the same levels.

Usage: python tools/null_scaling.py [n_lo n_hi [rows]]
Prints one JSON line with median-of-3 fresh-JVM timings per level and the
ceiling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from fs2_osm_spark.session import get_spark
from fs2_osm_spark.functions.hex import hex_cell
spark = get_spark(cores={cores}, app_name="null_scaling")
rng = spark.range(0, {rows}, 1, 256)
lon = (F.col("id") % 1000000) / 1000000.0 * 8 + 7
lat = (F.col("id") % 999983) / 999983.0 * 4 + 51
df = rng.select(hex_cell(lon, lat, 8).alias("c"))
best = None
for _ in range(3):
    t0 = time.time(); df.agg(F.max("c")).collect(); dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(best)
"""


def run_level(cores: int, rows: int, runs: int = 3) -> float:
    vals = []
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO, cores=cores, rows=rows)],
            capture_output=True, text=True, timeout=1200, check=True,
        )
        vals.append(float(out.stdout.strip().splitlines()[-1]))
    vals.sort()
    return vals[len(vals) // 2]


def main() -> None:
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 640_000_000
    lo = run_level(n_lo, rows)
    hi = run_level(n_hi, rows)
    eff = (lo / hi) / (n_hi / n_lo)
    print(json.dumps({
        "rows": rows, "cores_lo": n_lo, "cores_hi": n_hi,
        "sec_lo": round(lo, 2), "sec_hi": round(hi, 2),
        "ceiling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
