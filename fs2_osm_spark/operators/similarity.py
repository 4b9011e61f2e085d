"""Similarity search operators: brute-force baseline + IVF ANN scale path.

Brute force broadcasts the query set and scores JVM-side (zip_with +
aggregate fold — no UDF). The IVF path builds a deterministic coarse
quantizer (strided sample of the corpus as centroids), assigns vectors to
their nearest centroid with one vectorized numpy matmul per Arrow batch
(pandas UDF — the legitimate Python fast path), and probes the n_probe
nearest lists at query time: candidate generation becomes a centroid-id
equi-join instead of a cross join, which is the shape that survives 10^12
rows (lists are range-partitionable, hot lists saltable).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id",
    vec_col: str = "v", query_id_col: str = "query_id", query_vec_col: str = "qv",
) -> DataFrame:
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(F.col("cos"), 7).desc(), F.col("neighbor_id")
    )
    return scored.select(
        query_id_col,
        F.row_number().over(w).cast("bigint").alias("rank"),
        "neighbor_id",
        F.round("cos", 6).alias("cos_sim"),
    ).filter(F.col("rank") <= k)


# ----------------------------------------------------------------- IVF -----
def ivf_centroids(corpus: DataFrame, n_centroids: int, id_col: str = "vec_id",
                  vec_col: str = "v", sample_mod: int = 17) -> list[tuple[int, np.ndarray]]:
    """Deterministic coarse quantizer: hash-strided sample. (K-means would
    refine these; a fixed sample keeps the index reproducible, which the
    resume/lineage story depends on.)

    Scale shape: `xxhash64(id) % sample_mod == 0` thins the corpus ~1/mod in
    a single narrow scan, then orderBy(hash, id).limit(k) compiles to
    TakeOrderedAndProject — a distributed partial top-k with no global sort
    shuffle and no driver-side count. (The previous design ran
    row_number() over an un-partitioned Window plus corpus.count(): a
    single-task full-corpus funnel, the 100 TB scale-killer.) Ordering by
    the hash rather than the id keeps the k survivors spread uniformly
    across the id range — ordering by id would draw every centroid from the
    head of the corpus, skewing id-correlated data to one region. If the
    thinned sample is too small (tiny corpus), fall back to top-k-by-hash
    of the full table.
    """
    by_hash = [F.xxhash64(F.lit(1), F.col(id_col)), F.col(id_col)]
    sampled = (
        corpus.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)
        .orderBy(*by_hash)
        .limit(n_centroids)
        .collect()
    )
    if len(sampled) < n_centroids:
        sampled = (
            corpus.select(id_col, vec_col).orderBy(*by_hash).limit(n_centroids).collect()
        )
    return [(i, np.asarray(r[vec_col], np.float64)) for i, r in enumerate(sampled)]


def _assign_udf(centroid_matrix: np.ndarray, metric: str = "cos"):
    """Nearest-centroid id per vector: argmax cosine (default) or argmin
    expanded-L2 (`x·x − 2 x·c + c·c` — the PQ codebook metric). Ties
    resolve to the lowest centroid id in both metrics (numpy arg* return
    the first extremum)."""
    if metric == "cos":
        cm = centroid_matrix / np.linalg.norm(
            centroid_matrix, axis=1, keepdims=True
        )

        def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                mat = np.stack([np.asarray(v, np.float64) for v in s])
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
                )
                sims = mat @ cm.T  # one matmul per Arrow batch
                yield pd.Series(np.argmax(sims, axis=1).astype(np.int64))

    elif metric == "l2":
        cm = centroid_matrix
        cc = np.einsum("ij,ij->i", cm, cm)

        def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                mat = np.stack([np.asarray(v, np.float64) for v in s])
                xx = np.einsum("ij,ij->i", mat, mat)
                d2 = xx[:, None] - 2.0 * (mat @ cm.T) + cc[None, :]
                yield pd.Series(np.argmin(d2, axis=1).astype(np.int64))

    else:
        raise ValueError(f"unknown metric {metric!r} (cos|l2)")
    return F.pandas_udf(assign, T.LongType())


def _list_to_matrix(col) -> np.ndarray:
    """pyarrow list<double> column -> (n, d) float64 matrix.

    Zero-copy fast path (guide §4.2): a list column is one contiguous
    values buffer plus offsets, so when every row has the same length the
    matrix is just a reshape of the values buffer — no per-row Python
    boxing (np.stack over 100k object rows was the dominant cost of the
    1M-vector assign/encode passes). Rows of unequal length (never
    produced by this engine's vector tables) fall back to per-row stack.
    """
    import pyarrow.compute as pc

    n = len(col)
    if n == 0:
        return np.zeros((0, 0), np.float64)
    lens = np.asarray(pc.list_value_length(col))
    d = int(lens[0])
    if (lens == d).all():
        flat = np.asarray(col.flatten(), dtype=np.float64)
        return flat.reshape(n, d)
    return np.stack([np.asarray(v, np.float64) for v in col.to_pylist()])


def ivf_assign(corpus: DataFrame, centroids: list[tuple[int, np.ndarray]],
               vec_col: str = "v", metric: str = "cos") -> DataFrame:
    """Nearest-centroid id per corpus vector, appended as `centroid_id`.

    r08: mapInArrow over the record batch instead of a pandas UDF on the
    vector column — the batch's list column reshapes zero-copy into the
    matmul operand (_list_to_matrix), where the pandas path paid a
    per-row object conversion. Identical float64 math (same normalize /
    argmax / expanded-L2 argmin expressions), so assignments are
    bit-identical."""
    import pyarrow as pa

    cm = np.stack([c for _, c in centroids])
    if metric == "cos":
        cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        cc = None
    elif metric == "l2":
        cmn = cm
        cc = np.einsum("ij,ij->i", cm, cm)
    else:
        raise ValueError(f"unknown metric {metric!r} (cos|l2)")
    vidx = corpus.schema.fieldNames().index(vec_col)
    out_schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("centroid_id", T.LongType(), False)]
    )

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:  # zero-row Arrow batch: (0,0) matmul throws
                continue
            mat = _list_to_matrix(batch.column(vidx))
            if metric == "cos":
                m = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
                )
                ids = np.argmax(m @ cmn.T, axis=1).astype(np.int64)
            else:
                xx = np.einsum("ij,ij->i", mat, mat)
                d2 = xx[:, None] - 2.0 * (mat @ cmn.T) + cc[None, :]
                ids = np.argmin(d2, axis=1).astype(np.int64)
            yield batch.append_column(
                pa.field("centroid_id", pa.int64(), nullable=False),
                pa.array(ids, pa.int64()),
            )

    return corpus.mapInArrow(fn, out_schema)


def ivf_search(
    assigned: DataFrame,
    centroids: list[tuple[int, np.ndarray]],
    queries: DataFrame,
    k: int,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Probe the n_probe nearest inverted lists, exact-rerank candidates."""
    cm = np.stack([c for _, c in centroids])
    cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)

    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack([np.asarray(v, np.float64) for v in s])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = mat @ cmn.T
            top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int64)
            yield pd.Series(list(top))

    probe_udf = F.pandas_udf(probe, T.ArrayType(T.LongType()))
    q = queries.withColumn("probe_lists", probe_udf(F.col(query_vec_col)))
    q = q.select(query_id_col, query_vec_col, F.explode("probe_lists").alias("centroid_id"))
    cand = q.join(assigned, "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(F.col("cos"), 7).desc(), F.col("neighbor_id")
    )
    return scored.select(
        query_id_col,
        F.row_number().over(w).cast("bigint").alias("rank"),
        "neighbor_id",
        F.round("cos", 6).alias("cos_sim"),
    ).filter(F.col("rank") <= k)


# ------------------------------------------------------------------ PQ -----
def pq_codes(
    df: DataFrame,
    subs: list[np.ndarray],
    id_cols: tuple[str, ...] = ("vec_id", "centroid_id"),
    vec_col: str = "v",
) -> DataFrame:
    """Product-quantization encode: the compressed index rows of IVF-PQ.

    Each vector splits into len(subs) subspaces; each subspace is encoded as
    the argmin-L2 codeword index (expanded form x·x − 2 x·c + c·c, ties →
    lowest code) and the 4-bit codes pack into ONE BIGINT — a billion-row
    index is 8 bytes/vector plus ids, small enough to keep hot. One numpy
    matmul per subspace per Arrow batch against the broadcast codebook; the
    payload vector column is DROPPED on output (that is the point: ADC
    search never touches raw vectors until the exact rerank).
    """
    import pyarrow as pa

    n_sub = len(subs)
    k = subs[0].shape[0]
    assert k <= 16 and n_sub <= 15, (
        "4-bit packing needs K<=16 codewords and <=15 subspaces: the 16th "
        "subspace would occupy bits 60-63, where numpy packing wraps to a "
        "negative BIGINT while the DuckDB twin's code*(1<<(4*m)) overflows "
        "instead — the cross-engine contract only holds below the sign bit"
    )
    d_sub = subs[0].shape[1]
    cc = [np.einsum("ij,ij->i", s, s) for s in subs]
    bc = df.sparkSession.sparkContext.broadcast((subs, cc))
    id_fields = [f for f in df.schema.fields if f.name in id_cols]
    present_ids = [f.name for f in id_fields]
    schema = T.StructType(
        id_fields + [T.StructField("pq_code", T.LongType(), False)]
    )
    names = df.schema.fieldNames()
    vidx = names.index(vec_col)

    # r08: mapInArrow with the zero-copy list->matrix reshape (the pandas
    # path re-boxed every vector row before the per-subspace matmuls);
    # identical float64 expressions, so codes are bit-identical.
    def fn(batches):
        subs_b, cc_b = bc.value
        for batch in batches:
            if not batch.num_rows:
                continue
            x = _list_to_matrix(batch.column(vidx))
            codes = np.empty((len(x), n_sub), np.int64)
            for m in range(n_sub):
                xm = x[:, m * d_sub : (m + 1) * d_sub]
                xx = np.einsum("ij,ij->i", xm, xm)
                xc = xm @ subs_b[m].T
                d2 = xx[:, None] - 2.0 * xc + cc_b[m][None, :]
                codes[:, m] = np.argmin(d2, axis=1)  # first min = lowest code
            packed = (codes << (4 * np.arange(n_sub, dtype=np.int64))).sum(axis=1)
            arrays = [batch.column(names.index(c)) for c in present_ids]
            arrays.append(pa.array(packed, pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[*present_ids, "pq_code"]
            )

    return df.mapInArrow(fn, schema)


def pq_train(
    corpus: DataFrame,
    subs_init: list[np.ndarray],
    n_iters: int = 2,
    round_decimals: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list[np.ndarray]:
    """Lloyd-refine a PQ codebook per subspace (the k-means PQ codebooks a
    production IVF-PQ index trains, replacing the fixed sample codebook).

    Each subspace's codewords are fitted independently: slice the vector
    column (pure Column ops), run the distributed Lloyd loop with the L2
    metric (PQ encodes by argmin-L2, so training must optimize the same
    objective), centroids quantized to `round_decimals` per round — the
    same cross-engine fixed-point trick as sim_kmeans_fit_md5, which lets
    a DuckDB twin re-derive the whole training trajectory bit-identically.
    Per round this is one narrow Arrow-batch assign pass and one
    (subspace-code, dim) shuffle aggregate; only the tiny k×d codebook
    returns to the driver."""
    d_sub = subs_init[0].shape[1]
    trained: list[np.ndarray] = []
    for m, s0 in enumerate(subs_init):
        sub_corpus = corpus.select(
            id_col,
            F.transform(
                F.slice(F.col(vec_col), m * d_sub + 1, d_sub),
                lambda x: x.cast("double"),
            ).alias("v"),
        )
        init = [
            (j, np.round(s0[j].astype(np.float64), round_decimals))
            for j in range(s0.shape[0])
        ]
        fitted = kmeans_fit(
            sub_corpus, k=len(init), n_iters=n_iters, id_col=id_col,
            vec_col="v", init=init, round_decimals=round_decimals,
            metric="l2",
        )
        trained.append(np.stack([v for _, v in fitted]))
    return trained


def pq_encode_recon(
    corpus: DataFrame,
    subs: list[np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, pq_code, recon_cos): PQ-encode against `subs` and measure the
    reconstruction cosine — the quality metric of a codebook. Same kernel
    shape as pq_codes (one matmul per subspace per Arrow batch) plus the
    reconstruction gather."""
    n_sub = len(subs)
    k = subs[0].shape[0]
    assert k <= 16 and n_sub <= 15, (
        "4-bit packing needs K<=16 codewords and <=15 subspaces: the 16th "
        "subspace would occupy bits 60-63, where numpy packing wraps to a "
        "negative BIGINT while the DuckDB twin's code*(1<<(4*m)) overflows "
        "instead — the cross-engine contract only holds below the sign bit"
    )
    d_sub = subs[0].shape[1]
    cc = [np.einsum("ij,ij->i", s, s) for s in subs]
    bc = corpus.sparkSession.sparkContext.broadcast((subs, cc))
    schema = T.StructType(
        [
            next(f for f in corpus.schema.fields if f.name == id_col),
            T.StructField("pq_code", T.LongType(), False),
            T.StructField("recon_cos", T.DoubleType(), False),
        ]
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        subs_b, cc_b = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            codes = np.empty((len(x), n_sub), np.int64)
            recon = np.empty_like(x)
            for m in range(n_sub):
                xm = x[:, m * d_sub : (m + 1) * d_sub]
                xx = np.einsum("ij,ij->i", xm, xm)
                d2 = xx[:, None] - 2.0 * (xm @ subs_b[m].T) + cc_b[m][None, :]
                codes[:, m] = np.argmin(d2, axis=1)
                recon[:, m * d_sub : (m + 1) * d_sub] = subs_b[m][codes[:, m]]
            packed = (codes << (4 * np.arange(n_sub, dtype=np.int64))).sum(axis=1)
            num = np.einsum("ij,ij->i", x, recon)
            cos = num / (
                np.sqrt(np.einsum("ij,ij->i", x, x))
                * np.sqrt(np.einsum("ij,ij->i", recon, recon))
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pq_code": packed,
                    "recon_cos": np.round(cos, 5),
                }
            )

    return corpus.mapInPandas(fn, schema)


def pq_adc_search(
    index: DataFrame,
    corpus: DataFrame,
    q_ids: np.ndarray,
    qmat: np.ndarray,
    cents: np.ndarray,
    subs: list[np.ndarray],
    n_probe: int,
    rerank: int,
    top_k: int,
    lut_scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """ADC search over a pq_codes index — the IVF-PQ query path.

    `index` is the compressed (id, centroid_id, pq_code) table; `corpus`
    the raw-vector table (touched only by the exact rerank of ≤
    len(q_ids)·rerank ids); `q_ids`/`qmat` the query vectors (driver-side —
    O(queries), tiny); `cents` the coarse-quantizer matrix; `subs` the PQ
    codebook sub-matrices.

    Plan shape: the (query, probed-centroid, integer-LUT) rows broadcast
    against the code index — a centroid-id equi-join, never a cross join —
    and the asymmetric distance is len(subs) element_at lookups summed in
    JVM Column arithmetic (integer-exact: LUT entries are
    floor(d2·lut_scale+0.5) BIGINTs, so ranking cannot drift on float
    reduce order). The per-query top-`rerank` shortlist (tie-break
    neighbor id) broadcasts back against the corpus for the exact cosine
    rerank. At 10^12 rows only the 8-byte-payload index shuffles; raw
    vectors stay in columnar storage until the rerank's pruned id probe.
    """
    n_sub = len(subs)
    k = subs[0].shape[0]
    spark = index.sparkSession
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    cmn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-30
    )
    sims = qn @ cmn.T
    # stable argsort on -sims: ties keep ascending centroid id
    probes = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
    luts = pq_lut(qmat, subs, lut_scale)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.repeat(q_ids, n_probe),
                "centroid_id": probes.reshape(-1),
                "qv": [qmat[i].tolist() for i in range(len(q_ids))
                       for _ in range(n_probe)],
                "lut": [luts[i].tolist() for i in range(len(q_ids))
                        for _ in range(n_probe)],
            }
        ),
        "query_id long, centroid_id long, qv array<double>, lut array<bigint>",
    )
    cand = (
        F.broadcast(qdf)
        .join(index, "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    adc = None
    for m in range(n_sub):
        code = (
            F.shiftrightunsigned(F.col("pq_code"), 4 * m)
            .bitwiseAND(F.lit(15))
            .cast("int")
        )
        term = F.element_at(F.col("lut"), code + F.lit(m * k + 1))
        adc = term if adc is None else adc + term
    scored = cand.select(
        "query_id", "qv", F.col(id_col).alias("neighbor_id"), adc.alias("adc")
    )
    # (a two-phase top-rerank — local rank within (query, neighbor-hash
    # bucket) then global — was tried in r08 and measured SLOWER at this
    # scale: the extra 3.8M-row shuffle outweighs the per-query sort it
    # saves. At true cluster scale with orders more candidates per query
    # the two-phase shape is the one to revisit.)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.select(
            "query_id", "qv", "neighbor_id",
            F.row_number().over(w).alias("adc_rank"),
        )
        .filter(F.col("adc_rank") <= rerank)
    )
    rer = F.broadcast(shortlist).join(
        corpus, F.col(id_col) == F.col("neighbor_id")
    )
    exact = rer.select(
        "query_id", "neighbor_id",
        cosine(F.col("qv"), F.col(vec_col)).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 7).desc(), F.col("neighbor_id")
    )
    return (
        exact.select(
            "query_id",
            F.row_number().over(w2).cast("bigint").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
        .filter(F.col("rank") <= top_k)
    )


def pq_lut(queries: np.ndarray, subs: list[np.ndarray], scale: int) -> np.ndarray:
    """Per-query ADC lookup tables, INTEGER-quantized: entry (m, j) is the
    L2² distance from the query's m-th sub-slice to codeword j, times
    `scale`, floor(x+0.5)-rounded to BIGINT. Integer LUTs make the ADC sum
    exact arithmetic — bit-identical across engines and reduce orders —
    instead of a float knife-edge. Shape (n_queries, n_sub * k), m-major."""
    n_sub = len(subs)
    k = subs[0].shape[0]
    d_sub = subs[0].shape[1]
    luts = np.empty((len(queries), n_sub * k), np.int64)
    for m in range(n_sub):
        xm = queries[:, m * d_sub : (m + 1) * d_sub]
        xx = np.einsum("ij,ij->i", xm, xm)
        xc = xm @ subs[m].T
        cc = np.einsum("ij,ij->i", subs[m], subs[m])
        d2 = xx[:, None] - 2.0 * xc + cc[None, :]
        luts[:, m * k : (m + 1) * k] = np.floor(d2 * scale + 0.5).astype(
            np.int64
        )
    return luts


# -------------------------------------------------------------- k-means ----
def kmeans_fit(
    corpus: DataFrame,
    k: int,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    init: list[tuple[int, np.ndarray]] | None = None,
    round_decimals: int | None = None,
    metric: str = "cos",
) -> list[tuple[int, np.ndarray]]:
    """Distributed Lloyd iterations over an embedding column.

    Init = the deterministic hash-stride sample (ivf_centroids), or an
    injected `init` list (e.g. the portable md5-strided sample). Each round
    is one narrow assign pass (vectorized numpy matmul per Arrow batch) and
    one (centroid, dim) shuffle aggregate; only the k x d centroid matrix —
    tiny — returns to the driver between rounds, so the plan scales with
    executors while the loop stays O(n_iters) jobs. Reproducible up to
    floating-sum reduce order (assignments are argmax over cosines, robust
    to last-ulp drift except on exact ties); `round_decimals` quantizes the
    updated centroids each round, pinning the iteration to a cross-engine
    fixed point so an independent re-derivation (the sim_kmeans_fit_md5
    DuckDB twin) lands on bit-identical centroids.
    """
    centroids = init if init is not None else ivf_centroids(corpus, k, id_col, vec_col)
    if not centroids:
        raise ValueError("kmeans_fit: corpus is empty — no vectors to seed centroids")
    for _ in range(n_iters):
        assigned = ivf_assign(corpus, centroids, vec_col, metric)
        stats = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "x")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not stats:
            # empty corpus (or all-null vectors): nothing to update —
            # keep the seed centroids rather than crash on max() of []
            return centroids
        dim = len(centroids[0][1])
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in stats:
            sums.setdefault(r.centroid_id, np.zeros(dim))[r.dim] = r.s
            counts[r.centroid_id] = r.n
        centroids = [
            (
                c,
                sums[c] / counts[c] if c in sums else vec,  # empty list keeps seed
            )
            for c, vec in centroids
        ]
        if round_decimals is not None:
            centroids = [(c, np.round(v, round_decimals)) for c, v in centroids]
    return centroids


def kmeans_assignments(
    corpus: DataFrame,
    centroids: list[tuple[int, np.ndarray]],
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, centroid_id, cos to own centroid) for a fitted model."""
    assigned = ivf_assign(corpus, centroids, vec_col)
    spark = corpus.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(
                {"centroid_id": [c for c, _ in centroids],
                 "cvec": [v.tolist() for _, v in centroids]}
            ),
            "centroid_id long, cvec array<double>",
        )
    )
    return assigned.join(cdf, "centroid_id").select(
        id_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("cvec")), 6).alias("cos_to_centroid"),
    )
