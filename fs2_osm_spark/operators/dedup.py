"""Engine-native dedup operators — the scale path.

Unlike queries/dedup.py (md5 fragments chosen for cross-engine oracle
parity), these use xxhash64 — Spark's JVM-side 64-bit hash — so the whole
MinHash/SimHash pipeline stays inside whole-stage codegen: shingling is
posexplode + window lead, hashing is a Catalyst expression, signatures are
plain min() aggregates. No Python in the hot path at all.

Clustering uses iterative min-label propagation over the candidate-pair
graph (connected components), a bounded number of self-join rounds — the
set-based replacement for a driver-side union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pin(df: DataFrame) -> DataFrame:
    """Truncate lineage before ITERATION (connected components).

    Uses a RELIABLE checkpoint when the session has a checkpoint dir
    (survives executor loss — what a 1000-executor job must use), else
    localCheckpoint (fine on local[N]; pins executors on a real cluster).
    Eager by design: callers are iterative loops that run actions anyway.

    Non-iterative self-joins (LSH banding, hamming blocking) use persist()
    instead — lazy share-once semantics with zero jobs at compose time
    (under AQE even localCheckpoint(eager=False) materializes the upstream
    shuffle stages, because RDD conversion executes the adaptive plan).
    """
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


# Every lazy plan-pin persist() issued by this module, so long-lived
# sessions (bench loops, the driver sampling all queries) have a release
# path: cached blocks otherwise accumulate until session end, since an
# operator cannot unpersist mid-plan without losing the share-once shape.
_PINNED: list[DataFrame] = []


def _persist_pinned(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PINNED.append(df)
    return df


# public name for sibling operator modules (multimodal's phash banding)
# whose pins should ride the same release path callers already invoke
persist_pinned = _persist_pinned


def release_pins() -> int:
    """Unpersist every plan-pin this module has persisted. Safe any time —
    an in-flight plan that still references a released pin just recomputes.
    Call after materializing a dedup query's result. Returns the count."""
    n = 0
    while _PINNED:
        try:
            _PINNED.pop().unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
        n += 1
    return n


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) word n-grams. JVM-side, narrow: split once, slide the
    n-gram window over the WORD ARRAY with transform(sequence(...)), then
    explode. The r07 formulation posexploded words and ran lead() over a
    per-document window — a full shuffle+sort of every word in the corpus
    just to look one row ahead; the array form emits identical shingles
    (verified multiset-equal) with no exchange at all, so the minhash
    pipeline's only shuffle is its signature groupBy.

    The split lands behind an explode(array(...)) Generate node ON
    PURPOSE: referencing the raw split(...) expression from inside the
    transform lambda re-evaluates the split per emitted element (the
    projection-collapse/inlining trap — measured 4x SLOWER than the
    window it replaced); the Generate is a projection barrier, so the
    lambda reads a materialized array attribute instead."""
    ws_df = df.select(
        F.col(id_col),
        F.explode(F.array(F.split(F.col(text_col), " "))).alias("_ws"),
    ).filter(F.size("_ws") >= n)
    ws = F.col("_ws")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return ws_df.select(F.col(id_col), F.explode(grams).alias("sh"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, sig array<bigint>): n_hashes seeded xxhash64 minima."""
    sh = shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, n_bands: int, n_hashes: int
) -> DataFrame:
    """Band the signature array, self-join on (band, key): candidate pairs.

    Scale shape: the join key is (band, band-hash) — co-partitioned equi
    join, no cross product; hot bands (boilerplate text) are exactly the
    skew case AQE skew-join splitting handles.

    n_hashes (the signature length) is required: composing this operator
    must never trigger a Spark job, and inferring the length from data would
    execute the whole upstream signature pipeline once just to measure the
    array — a cost a 100 TB caller must not pay.
    """
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, "bk.band", "bk.key"
    )
    # persist before the self-join: otherwise BOTH join sides re-run the
    # whole shingle+minhash pipeline (lazy — composing runs no job);
    # registered in _PINNED so release_pins() can free the cache later
    banded = _persist_pinned(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame, max_iters: int = 10
) -> DataFrame:
    """(id, cluster) via min-label propagation over undirected pairs.

    Each round joins current labels across edges and takes the min —
    converges in O(diameter) rounds; near-dup clusters are tiny, so
    max_iters=10 is far beyond any realistic diameter. Deterministic.
    """
    # pin the pair list first — the symmetric union would otherwise compute
    # the upstream pair-generation pipeline twice; then pin the edge list so
    # iterations never reach upstream at all. No distinct() on the
    # symmetric union (r08): id_a < id_b makes the two directions disjoint,
    # and the per-round min() aggregate is duplicate-insensitive anyway —
    # the distinct was a whole extra shuffle of the edge list for nothing.
    pairs = _pin(pairs)
    edges = pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y")).unionByName(
        pairs.select(F.col("id_b").alias("x"), F.col("id_a").alias("y"))
    )
    edges = _pin(edges)
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("cluster"))
    )
    for _ in range(max_iters):
        # one join + ONE aggregation per round (r08): the self label and
        # every neighbor label land in a union keyed by id, and a single
        # groupBy takes min over {self} ∪ {neighbors} — identical to the
        # classic least(self, coalesce(neighbor_min, self)) but without
        # the separate neighbor_min groupBy AND the left join back onto
        # labels (a whole label-vector shuffle per round). The convergence
        # flag (new < old self label) rides on the same aggregation; its
        # check is a narrow scan of the checkpointed output.
        own = labels.select("id", "cluster", F.lit(True).alias("_own"))
        nbr = edges.join(labels, edges.y == labels.id).select(
            F.col("x").alias("id"), F.col("cluster"), F.lit(False).alias("_own")
        )
        new_labels = (
            own.unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("cluster").alias("cluster"),
                F.min(F.when(F.col("_own"), F.col("cluster"))).alias("_old"),
            )
            .select(
                "id", "cluster", (F.col("cluster") < F.col("_old")).alias("_chg")
            )
        )
        new_labels = _pin(new_labels)  # truncate the plan per round
        labels = new_labels.select("id", "cluster")
        if new_labels.filter(F.col("_chg")).limit(1).count() == 0:
            break
    return labels


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash from xxhash64 token hashes — 64 JVM-side aggregates.

    Near-dup detection then filters on hamming distance:
    bit_count(a ^ b) <= t (see hamming_pairs).
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).select(id_col, F.xxhash64("w").alias("h"))
    bits = None
    for b in range(64):
        weight = F.sum(
            2 * F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) - 1
        )
        term = F.when(weight > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(
            F.lit(0)
        )
        bits = term if bits is None else bits + term
    return words.groupBy(id_col).agg(bits.cast("bigint").alias("simhash"))


def _band_bounds(n_bands: int) -> list[int]:
    return [round(i * 64 / n_bands) for i in range(n_bands + 1)]


def _band_key(lo: int, hi: int) -> F.Column:
    # bits [lo, hi) of the unsigned 64-bit hash; mask with bitwiseAND
    # (sign-safe — % would follow the sign of a negative bigint and
    # split equal low bits by bit 63). Full-width band needs no mask
    # (the literal 2^64-1 would overflow int64).
    shifted = F.shiftrightunsigned(F.col("simhash"), lo)
    if hi - lo >= 64:
        return shifted
    return shifted.bitwiseAND(F.lit((1 << (hi - lo)) - 1))


def hamming_pairs(
    sims: DataFrame,
    id_col: str,
    max_distance: int,
    n_bands: int | None = None,
    probe_bits: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance — blocked, never all-pairs.

    Pigeonhole recall guarantee: split the 64 bits into n_bands contiguous
    bands; if two hashes differ in d <= (probe_bits+1)*n_bands - 1 bits,
    at least one band carries <= probe_bits of those differences, so either
    the band keys agree exactly (probe_bits=0) or the probe side's <=1-bit
    perturbation of its key equals the other side's key (probe_bits=1).
    The union of the per-band equi-joins therefore has full recall.

    Candidate volume is governed by the band key width w = 64/n_bands: each
    band's self-join groups collide in a 2^w key space, so expected
    candidates ~ n_bands * N^2 / 2^w for random hashes. Exact banding at
    large d is a scale trap — d=12 would need 13 bands of ~5 bits (~32 keys,
    ~N^2/32 candidates per band, effectively all-pairs). Defaults keep the
    key wide instead:

      d <= 3  -> exact banding, d+1 bands (>= 16-bit keys)   [probe_bits=0]
      d >  3  -> multi-probe, ceil((d+1)/2) bands            [probe_bits=1]
                 (probe side also emits every 1-bit flip of each band key:
                 width+1 probe rows per band, a constant-factor fan-out that
                 buys half the band count and so squares the key space
                 relative to exact banding at the same d)

    The join key stays (band_idx, band_bits): a co-partitioned equi-join per
    band, no cross product; duplicates from pairs matching several
    bands/probes are removed by the groupBy.
    """
    if probe_bits is None:
        probe_bits = 0 if (n_bands is not None or max_distance <= 3) else 1
    assert probe_bits in (0, 1)
    if n_bands is None:
        n_bands = (max_distance + probe_bits + 1) // (probe_bits + 1)
    assert 1 <= n_bands <= 64
    if (probe_bits + 1) * n_bands < max_distance + 1:
        raise ValueError(
            f"recall guarantee violated: (probe_bits+1)*n_bands="
            f"{(probe_bits + 1) * n_bands} must exceed max_distance={max_distance}"
        )
    bounds = _band_bounds(n_bands)

    def entries(probe: bool) -> list[F.Column]:
        out = []
        for i in range(n_bands):
            lo, hi = bounds[i], bounds[i + 1]
            key = _band_key(lo, hi)
            out.append(F.struct(F.lit(i).alias("band"), key.alias("key")))
            if probe and probe_bits >= 1:
                # every 1-bit perturbation of this band's key (XOR is
                # literal-folded by Catalyst; bit 63 of a full-width band
                # flips sign, which bitwiseXOR handles exactly)
                for j in range(hi - lo):
                    flip = (1 << j) if (hi - lo < 64 or j < 63) else -(1 << 63)
                    out.append(
                        F.struct(
                            F.lit(i).alias("band"),
                            key.bitwiseXOR(F.lit(flip)).alias("key"),
                        )
                    )
        return out

    # lazy: self-join sides reuse one simhash pass (release via release_pins)
    sims = _persist_pinned(sims)
    exact = sims.select(
        F.col(id_col), "simhash", F.explode(F.array(*entries(False))).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.key")
    if probe_bits == 0:
        probed = exact
    else:
        probed = sims.select(
            F.col(id_col), "simhash", F.explode(F.array(*entries(True))).alias("bk")
        ).select(id_col, "simhash", "bk.band", "bk.key")
    a = probed.alias("a")
    b = exact.alias("b")
    dist = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(dist <= max_distance)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.first(dist).alias("hamming"))
    )
