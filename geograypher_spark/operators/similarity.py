"""Similarity search over embedding columns (training-data-pipeline ops).

- brute-force cosine top-k: the correctness baseline. Embeddings are
  quantized to integers (round(x*1000)) so dot products and norms are
  EXACT integer sums — order-independent, bit-identical across engines
  (the DuckDB oracle reproduces them); the final score
  dot / sqrt(na*nb) is a fixed sequence of correctly-rounded IEEE ops.
- LSH-bucketed variant (random hyperplanes from xxhash64 signs): the scale
  path — bucket join + exact re-rank inside buckets, never N².

All JVM-side (zip_with/aggregate/transform higher-order functions — no
Python in the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantized(col: Column, scale: int = 1000) -> Column:
    """array<float> → array<long> with round(double(x)*scale). The explicit
    double cast keeps the multiply in (correctly-rounded) double on every
    engine — float32 arithmetic would diverge from the SQL oracle."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_topk_bruteforce(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, scale: int = 1000,
) -> DataFrame:
    """→ (vec_id, neighbor_id, rank): exact top-k cosine neighbors per
    vector (self excluded). Ties break on lowest neighbor id. O(N²/p) —
    baseline only; use ``cosine_topk_lsh`` beyond ~10⁵ vectors."""
    q = embeddings.select(
        F.col(id_col).alias("vec_id"), quantized(F.col(vec_col), scale).alias("qv"))
    # the cross join's parallelism = left-side partitions (right side is
    # broadcast); small single-file scans would otherwise run 1-3 tasks
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a = q.repartition(max(par * 2, 8)).select(
        F.col("vec_id"), F.col("qv").alias("qa"),
        _norm2(F.col("qv")).alias("na"))
    b = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"),
                 _norm2(F.col("qv")).alias("nb"))
    pairs = a.crossJoin(b).filter(F.col("vec_id") != F.col("neighbor_id"))
    sim = (_dot(F.col("qa"), F.col("qb")).cast("double")
           / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank")
    )


def hyperplane_signature_udf(n_planes: int = 16, seed: int = 42):
    """Deterministic random-hyperplane LSH signature: bit j =
    sign(dot(vec, plane_j)), planes from a seeded Gaussian — regenerated
    identically on every executor from the closure (no stored state).
    One Arrow batch → one matmul (Charikar 2002 signatures at memory
    bandwidth, not per-element expression evaluation)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def sig(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack(vec.to_numpy())            # (n, dim)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((M.shape[1], n_planes))
        bits = (M.astype(np.float64) @ planes) > 0   # (n, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig


def cosine_topk_lsh(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_planes: int = 24, bands: int = 4, scale: int = 1000,
) -> DataFrame:
    """Approximate top-k: hyperplane signature split into bands; vectors
    sharing any band bucket become candidates; exact quantized cosine
    re-rank inside candidates. Recall tunes with n_planes/bands."""
    rows = n_planes // bands
    sig_udf = hyperplane_signature_udf(n_planes)
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    base = embeddings.repartition(max(par * 2, 8)).select(
        F.col(id_col).alias("vec_id"),
        quantized(F.col(vec_col), scale).alias("qv"),
        sig_udf(F.col(vec_col)).alias("sig"),
    ).withColumn("n2", _norm2(F.col("qv")))
    # ONE pass: explode a band array — a union of per-band selects would
    # re-execute the signature stage once per branch per join side
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright("sig", b * rows)
            .bitwiseAND(F.lit((1 << rows) - 1)).alias("band_val"))
        for b in range(bands)])
    stacked = base.select(
        "vec_id", "qv", "n2", F.explode(band_structs).alias("_b")
    ).select("vec_id", "qv", "n2", F.col("_b.band_idx").alias("band_idx"),
             F.col("_b.band_val").alias("band_val"))
    a = stacked.select(F.col("vec_id"), F.col("qv").alias("qa"),
                       F.col("n2").alias("na"), "band_idx", "band_val")
    b_ = stacked.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("qv").alias("qb"), F.col("n2").alias("nb"),
                        "band_idx", "band_val")
    cand = (
        a.join(b_, ["band_idx", "band_val"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    sim = (_dot(F.col("qa"), F.col("qb")).cast("double")
           / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "sim")
    )
