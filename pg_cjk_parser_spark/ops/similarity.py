"""Similarity search over embedding columns.

* brute-force cosine top-k: exact baseline; broadcast the query
  vector, JVM-side zip_with/aggregate arithmetic, global orderBy+limit.
* LSH-bucketed ANN: random-hyperplane signatures (sign of dot with
  h fixed Gaussian vectors, seeded) -> multi-probe bucket join ->
  exact cosine only within colliding buckets.  At 10^12 scale the
  bucket join touches a tiny candidate fraction; the signature pass is
  one Arrow sweep and bucketing is an equi-join Catalyst can shuffle
  or broadcast as sizes dictate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _cos_cols(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    n2 = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (n1 * n2)


def brute_force_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """``round_digits`` controls the score rounding used for ordering;
    oracle comparisons round exactly once (here), never twice."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(_cos_cols(F.col(vec_col), q), round_digits).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def lsh_signatures(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) random-hyperplane LSH buckets: ``n_tables``
    independent hash tables of ``n_planes`` bits each (classic LSH -
    more tables raises recall, more planes shrinks buckets)."""
    H = _hyperplanes(dim, n_planes, n_tables, seed)
    shifts = np.arange(n_planes, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            frames = []
            for t in range(n_tables):
                bits = (M @ H[t].T) > 0
                buckets = (
                    (bits.astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
                )
                frames.append(
                    pd.DataFrame(
                        {"id": ids, "table": t, "bucket": buckets}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        gen, "id long, table int, bucket long"
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2000,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    cos >= ``threshold`` and id_a < id_b.

    Scale path: random-hyperplane LSH buckets (collision probability
    (1 - theta/pi)^planes per table) generate candidates - only
    colliding vectors join - then an exact JVM-side cosine verifies
    each candidate.  For real near-dup workloads (cos >= 0.9, tightly
    clustered embeddings) the default (8 planes, 8 tables) recalls
    essentially everything while touching a tiny pair fraction; lower
    thresholds on diffuse data need fewer planes / more tables (the
    driver query uses 3/16 for a provably complete candidate set on
    the near-uniform synthetic table).  Hot buckets (e.g. zero
    vectors) are capped like the MinHash path."""
    head = emb.select(vec_col).first()
    if head is None or head[0] is None:
        id_t = emb.schema[id_col].dataType.simpleString()
        return emb.sparkSession.createDataFrame(
            [], f"id_a {id_t}, id_b {id_t}, cos double"
        )
    dim = len(head[0])
    sigs = lsh_signatures(emb, dim, n_planes, n_tables, seed, id_col, vec_col)
    if max_bucket_size is not None:
        hot = (
            sigs.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_bucket_size)
            .select("table", "bucket")
        )
        sigs = sigs.join(F.broadcast(hot), ["table", "bucket"], "left_anti")
    l = sigs.alias("l")
    r = sigs.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _cos_cols(F.col("va"), F.col("vb")), round_digits
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def train_ivf_numpy(
    M: np.ndarray, n_clusters: int = 16, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Spherical k-means on an in-memory float64 matrix.  Deterministic
    given (matrix, row order, params); shared by the Spark trainer and
    the DuckDB oracle builder so both derive bit-identical centroids."""
    X = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_clusters, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                C[c] = v / np.maximum(np.linalg.norm(v), 1e-12)
    return C


def train_ivf_centroids(
    emb: DataFrame,
    n_clusters: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample_limit: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample (driver-side
    NumPy; training cost is independent of corpus size).

    Scale path: instead of sorting the whole table and collecting the
    first ``sample_limit`` rows (a global sort feeding an O(sample)
    driver collect - the round-2 shape), the sample is a deterministic
    hash-filter ``xxhash64(id) % ceil(n/sample_limit) == 0``: the scan
    is embarrassingly parallel, nothing but ~sample_limit rows ever
    leaves the executors, and the final orderBy+limit compiles to
    TakeOrderedAndProject over the already-sampled set (so it is both
    cheap and reproducible run-to-run regardless of partitioning).
    When n <= sample_limit the modulus is 1 and training sees the full
    table ordered by id - bit-identical to an exhaustive trainer,
    which is what the embedded DuckDB oracle replicates."""
    if n_rows is None:
        n_rows = emb.count()
    mod = max(1, -(-n_rows // sample_limit))  # ceil
    sampled = emb
    if mod > 1:
        sampled = emb.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
        )
    sample = (
        sampled.orderBy(id_col)
        .select(vec_col)
        .limit(sample_limit)
        .collect()
    )
    M = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample])
    return train_ivf_numpy(M, n_clusters, iters, seed)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) nearest-centroid assignment, one Arrow pass."""
    C = centroids

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {"id": ids, "cluster": (M @ C.T).argmax(axis=1).astype(np.int32)}
            )

    return emb.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        gen, "id long, cluster int"
    )


def ivf_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF ANN: rescore only vectors assigned to the ``nprobe``
    centroids nearest the query (at scale the assignment is
    precomputed/partitioned-by-cluster so the probe is a partition-
    pruned read; here it composes with a broadcast semi-join)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / np.maximum(np.linalg.norm(qv), 1e-12)
    probes = np.argsort(-(centroids @ qv))[:nprobe].tolist()
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    cand_ids = assign.where(
        F.col("cluster").isin([int(c) for c in probes])
    ).select(F.col("id").alias(id_col))
    cand = emb.join(F.broadcast(cand_ids), id_col)
    return brute_force_cosine_topk(
        cand, query_vec, k, id_col, vec_col, round_digits
    )


def ann_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    probe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors that collide with the
    query in any table within ``probe_bits`` Hamming distance
    (multi-table, multi-probe random-hyperplane LSH)."""
    dim = len(query_vec)
    H = _hyperplanes(dim, n_planes, n_tables, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    shifts = np.arange(n_planes, dtype=np.uint64)
    probe_rows = []
    for t in range(n_tables):
        qbits = (H[t] @ qv) > 0
        qb = int((qbits.astype(np.uint64) << shifts).sum())
        probes = {qb}
        if probe_bits >= 1:
            for i in range(n_planes):
                probes.add(qb ^ (1 << i))
        if probe_bits >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(qb ^ (1 << i) ^ (1 << j))
        probe_rows.extend((t, int(p)) for p in probes)

    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probe_rows, "table int, bucket long")
    sigs = lsh_signatures(emb, dim, n_planes, n_tables, seed, id_col, vec_col)
    cand_ids = (
        sigs.join(F.broadcast(probe_df), ["table", "bucket"])
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    cand = emb.join(cand_ids, id_col)
    return brute_force_cosine_topk(
        cand, query_vec, k, id_col, vec_col, round_digits
    )
