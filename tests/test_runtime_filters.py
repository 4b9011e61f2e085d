"""Runtime bloom-filter join pruning — the optimizer feature that makes
selective fact-to-dimension shuffle joins cheap at 100 TB: Spark builds a
bloom filter over the filtered (small) side's join keys and injects a
might-contain predicate into the fact side BEFORE the shuffle, so rows
that cannot match never leave the scan stage. The engine relies on it
being ON (session default); this test pins that the plan actually carries
the injected filter for the canonical selective-orders -> lineitem shape,
so a conf regression or a Spark-version behavior change fails loudly
instead of silently shuffling the whole fact table."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_selective_join_gets_runtime_bloom_filter(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    # local thresholds so the sf0.001 tables qualify (at real scale the
    # 10MB/10GB defaults are what gate injection)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # creation side: bloom built over the filtered dimension's keys
        assert "bloom_filter_agg" in plan, plan
        # application side: the fact scan is guarded by might_contain
        assert "BloomFilterMightContain" in plan or "might_contain" in plan, plan
        # and the result is still correct (one priority class survives)
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
