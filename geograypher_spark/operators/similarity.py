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


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """INTEGER-quantized random hyperplanes (round(gauss*1000)): sign bits
    come from exact integer dot products of the quantized vector and the
    quantized plane — order-free, bit-identical in any engine, so the
    DuckDB oracle can embed these planes as literals and reproduce the
    bucketing exactly (float matmul sign would depend on summation order)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((dim, n_planes)) * 1000.0)


def _plane_bits(M: np.ndarray, n_planes: int, seed: int) -> np.ndarray:
    Q = np.round(M.astype(np.float64) * 1000.0)
    planes = lsh_planes(M.shape[1], n_planes, seed)
    # integer-valued doubles: |dot| < dim * 3e3 * 3e3 * margin << 2^53, exact
    return (Q @ planes) > 0


def _topk_desc_tiebreak(sims: np.ndarray, ids: np.ndarray, k_eff: int
                        ) -> np.ndarray:
    """Row-wise top-``k_eff`` column indices of ``sims`` ordered by
    (sim DESC, id ASC) — identical to
    ``np.lexsort((ids_bcast, -sims))[:, :k_eff]`` on every FINITE slot
    (the -inf padding slots a caller drops with ``isfinite`` may come out
    in a different id order) but at argpartition cost:
    the full-width lexsort was the dominant Python time of the bucketed
    ANN kernels (O(m log m) tuple sort per query row; measured ~20 s of
    worker time per ann_lsh trial at sf1.0 against a ~2 s matmul).

    Selection: argpartition by sim gives the top-k by value with arbitrary
    tie order; a row is 'unsafe' only when a FINITE boundary value has
    more ties in the full row than made it into the partition (then the
    id tie-break must choose among them) — those rare rows fall back to
    the exact full-width lexsort. Rows with fewer than k_eff valid
    candidates are safe by construction: every finite sim sorts strictly
    before the -inf padding, so argpartition keeps all of them, and
    callers drop the non-finite slots afterwards."""
    c, m = sims.shape
    part = np.argpartition(sims, m - k_eff, axis=-1)[:, m - k_eff:]
    psims = np.take_along_axis(sims, part, axis=-1)
    # order the kept entries exactly: lexsort over (id ASC, sim DESC)
    order = np.lexsort((np.take_along_axis(
        np.broadcast_to(ids, (c, m)), part, axis=-1), -psims), axis=-1)
    idx = np.take_along_axis(part, order, axis=-1)
    kth = psims.min(axis=1)
    finite = np.isfinite(kth)
    if finite.any():
        total_at = np.count_nonzero(sims == kth[:, None], axis=1)
        kept_at = np.count_nonzero(psims == kth[:, None], axis=1)
        unsafe = finite & (total_at > kept_at)
        if unsafe.any():
            rows_u = np.nonzero(unsafe)[0]
            idx[rows_u] = np.lexsort(
                (np.broadcast_to(ids, (len(rows_u), m)), -sims[rows_u]),
                axis=-1)[:, :k_eff]
    return idx


def band_values_udf(n_planes: int, bands: int, seed: int = 42):
    """Per-vector array of ``bands`` band values (contiguous groups of
    ``n_planes//bands`` hyperplane sign bits, same grouping as splitting a
    packed signature). Emitting band values directly (array<long>) removes
    the 64-plane packing ceiling — n_planes scales with log2(N)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rows = n_planes // bands

    @pandas_udf(T.ArrayType(T.LongType()))
    def bv(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(vec.to_numpy())            # (n, dim)
        bits = _plane_bits(M, n_planes, seed)   # (n, n_planes)
        weights = 1 << np.arange(rows, dtype=np.int64)
        vals = np.stack(
            [bits[:, b * rows:(b + 1) * rows].astype(np.int64) @ weights
             for b in range(bands)], axis=1)    # (n, bands)
        return pd.Series(list(vals))

    return bv


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """Exact BigDecimal-HALF_UP rounding of doubles (|x| < 2^52) — the
    semantics of Spark's ``F.round(double)`` / DuckDB's ``round``,
    reproduced without the ``floor(x + 0.5)`` representability pitfall:
    ``x - floor(x)`` is exact (Sterbenz for |floor(x)| ≥ 1, trivially
    exact below), so the .5 comparison is performed on the true
    fractional part. Ties round AWAY FROM ZERO (+.5 up, -.5 down),
    matching HALF_UP for both signs."""
    f = np.floor(x)
    d = x - f
    return f + np.where(x >= 0, d >= 0.5, d > 0.5)


def quantized_band_struct_udf(n_planes: int, bands: int, scale: int = 1000,
                              seed: int = 42):
    """ONE Python pass per vector → struct(qv: binary, bv: array<long>):
    the int32-LE-packed quantized vector and its band values.

    Replaces the previous two-step shape (a JVM higher-order ``transform``
    for qv — evaluated interpreted per element — plus a separate pandas
    UDF for bv over the raw embedding). Benefits, measured at sf1.0:
    the 64-element ``array<long>`` qv (~528 B/row through every band
    exchange) becomes a 256 B binary cell (~2× fewer shuffle bytes after
    the ×bands explode), the kernel-side decode is one ``frombuffer``
    over joined bytes instead of per-row object-array stacking, and only
    one column crosses the Python boundary once.

    Quantization uses :func:`_round_half_up` — bit-identical to the JVM
    ``F.round`` / oracle ``round`` for every double input — and the band
    bits are signs of EXACT integer dots of that same quantized vector
    with the integer planes (``lsh_planes``), which is precisely the
    oracle's formulation (the previous ``_plane_bits`` rounded with
    ``np.round``, i.e. half-to-even — equal on any input without exact
    .5 ties, which the tie-free fixture guarantees, but HALF_UP is the
    contract)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rows = n_planes // bands
    out_t = T.StructType([
        T.StructField("qv", T.BinaryType()),
        T.StructField("bv", T.ArrayType(T.LongType()))])

    @pandas_udf(out_t)
    def f(vec: pd.Series) -> pd.DataFrame:
        if len(vec) == 0:
            return pd.DataFrame({"qv": pd.Series([], dtype=object),
                                 "bv": pd.Series([], dtype=object)})
        M = np.stack(vec.to_numpy()).astype(np.float64)      # (n, dim)
        Q = _round_half_up(M * float(scale))                 # ints in double
        planes = lsh_planes(M.shape[1], n_planes, seed)
        bits = (Q @ planes) > 0                              # exact int dots
        weights = 1 << np.arange(rows, dtype=np.int64)
        vals = np.stack(
            [bits[:, b * rows:(b + 1) * rows].astype(np.int64) @ weights
             for b in range(bands)], axis=1)                 # (n, bands)
        qb = Q.astype("<i4").tobytes()
        row_b = M.shape[1] * 4
        return pd.DataFrame({
            "qv": [qb[i * row_b:(i + 1) * row_b] for i in range(len(M))],
            "bv": list(vals)})

    # the value is pure, but the nondeterministic mark stops the optimizer
    # duplicating the evaluation: the downstream posexplode's implicit
    # size(bv) > 0 filter was pushed below the repartition exchange,
    # yielding TWO ArrowEvalPython nodes for one UDF (guide §4.4 pattern;
    # observed in the sf1.0 plan — every vector paid the signature matmul
    # and the Arrow round trip twice)
    return f.asNondeterministic()


def _decode_qv(col: "pd.Series") -> np.ndarray:
    """binary int32-LE cells → (n, dim) float64 matrix (exact ints)."""
    buf = b"".join(col)
    n = len(col)
    return np.frombuffer(buf, dtype="<i4").astype(np.float64).reshape(n, -1)


def cosine_topk_lsh(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_planes: int | None = None, bands: int = 8,
    scale: int = 1000, target_bucket: int = 64, n_vectors: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane band values; vectors sharing any band
    bucket become candidates; exact quantized cosine re-rank on candidates.

    SCALE SHAPE: with ``n_planes=None`` the band width auto-sizes from the
    corpus size so the expected bucket holds ~``target_bucket`` vectors —
    E[candidates] = bands · N²/2^rows ≈ bands · target_bucket · N, i.e.
    LINEAR in N, not Θ(N²/2^rows) with a fixed width (round-1 used 6-bit
    buckets: N²/64). Pass ``n_vectors`` (e.g. from table stats) to skip the
    count job. Recall tunes with bands (OR-amplification across bands).

    Each candidate pair is attributed to its FIRST matching band (a filter
    on the two band arrays) instead of dropDuplicates — no extra shuffle of
    the wide candidate rows; the only shuffle after the join is the final
    per-vector top-k window over slim (id, id, sim) rows."""
    if n_planes is None:
        if n_vectors is None:
            n_vectors = embeddings.count()
        rows = max(1, int(np.ceil(np.log2(max(n_vectors, 2) / target_bucket))))
        n_planes = rows * bands
    else:
        if n_planes % bands:
            raise ValueError(f"n_planes={n_planes} not divisible by bands={bands}")
        rows = n_planes // bands
    qb_udf = quantized_band_struct_udf(n_planes, bands, scale)
    # no pre-UDF repartition: the signature UDF is one small matmul per
    # batch, and the band-bucket exchange right below already gives the
    # kernel stage its parallelism — the old repartition(2*cores) added a
    # full exchange of the embedding arrays purely to spread a trivial
    # UDF over a single-row-group local file (measured at sf1.0: full
    # query 2.5 s with it, 1.6 s without; at warehouse scale the scan
    # is already split and the exchange was pure overhead)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        qb_udf(F.col(vec_col)).alias("_s"),
    ).select("vec_id", F.col("_s.qv").alias("qv"),
             F.col("_s.bv").alias("bv"))
    # ONE pass: posexplode the band array — a union of per-band selects
    # would re-execute the signature stage once per branch per join side
    stacked = base.select(
        "vec_id", "qv", "bv",
        F.posexplode("bv").alias("band_idx", "band_val"))

    from pyspark.sql import types as T

    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("vec_id", id_type),
        T.StructField("neighbor_id", id_type),
        T.StructField("sim", T.DoubleType()),
    ])
    kk = int(k)

    def bucket_topk(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        """All-pairs exact cosine inside ONE bucket, vectorized (matmul at
        memory bandwidth, not per-pair expression eval). Emits each query's
        bucket-local top-k only: a neighbor absent from the query's top-k
        of every shared bucket is dominated by ≥k better candidates there,
        so it can never enter the global top-k — bucket-local truncation
        is lossless. Pairs matching in several bands are attributed to the
        FIRST matching band (vectorized band-array compare), so each pair
        is emitted exactly once — dedup as a kernel filter, no shuffle."""
        band_idx = int(key[0])
        m = len(pdf)
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=object),
                              "neighbor_id": pd.Series([], dtype=object),
                              "sim": pd.Series([], dtype="float64")})
        if m < 2:
            return empty
        Q = _decode_qv(pdf["qv"])  # int32-LE cells -> exact ints in double
        n2 = (Q * Q).sum(axis=1)
        ids = pdf["vec_id"].to_numpy()
        B = np.stack(pdf["bv"].to_numpy()) if band_idx > 0 else None
        k_eff = min(kk, m - 1)
        outs = []
        # row-chunked so a hot bucket never allocates an m×m matrix
        chunk = max(1, min(m, 2_000_000 // max(m, 1) + 1, 4096))
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            # dot / sqrt(na*nb): the exact op sequence of the brute-force
            # path (ints exact in double, product < 2^53, one rounded sqrt
            # + one rounded divide) — bit-identical across engines
            # dot / sqrt(na*nb) kept as the exact brute-force op sequence;
            # the divide is IN-PLACE (identical correctly-rounded values,
            # one fewer full-size temporary) and masked slots are assigned
            # -inf directly instead of np.where over a bool mask (saves
            # two more (c, m) passes — the kernel is memory-bound on this
            # host next to its ~1 GFLOP/s GEMM)
            sims = Q[lo:hi] @ Q.T
            sims /= np.sqrt(np.outer(n2[lo:hi], n2))
            c = hi - lo
            sims[np.arange(c), np.arange(lo, hi)] = -np.inf  # self
            if band_idx > 0:
                earlier = (
                    B[lo:hi, None, :band_idx] == B[None, :, :band_idx]
                ).any(axis=-1)
                sims[earlier] = -np.inf
            idx = _topk_desc_tiebreak(sims, ids, k_eff)
            rowi = np.repeat(np.arange(c), k_eff)
            coli = idx.ravel()
            s = sims[rowi, coli]
            valid = np.isfinite(s)
            outs.append(pd.DataFrame({
                "vec_id": ids[lo:hi][rowi[valid]],
                "neighbor_id": ids[coli[valid]],
                "sim": s[valid]}))
        return pd.concat(outs) if outs else empty

    # plain grouped applyInPandas: with the argpartition kernel the
    # per-bucket compute is cheap enough that AQE's byte-based partition
    # sizing is the right cost model again — the balanced-exchange variant
    # (assign join + explicit repartition) was measured SLOWER at both
    # sf0.1 (1.2 -> 2.1 s) and sf1.0 (1.6 -> 2.6 s): its extra broadcast
    # round and fixed 64-task waves cost more than the coalesced stage
    local = stacked.groupBy("band_idx", "band_val").applyInPandas(
        bucket_topk, schema=out_schema)
    # global top-k over ≤ bands·k slim rows per query — tiny window shuffle
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("vec_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_planes: int | None = None, bands: int = 8,
    scale: int = 1000, target_bucket: int = 64, n_vectors: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, sim) with id_a < id_b: embedding-cosine NEAR-DUP
    pairs — the embedding tier of the dedup suite (alongside exact /
    Jaccard / MinHash-LSH / SimHash).

    Candidates = hyperplane-LSH band collisions (identical auto-sized
    banding to ``cosine_topk_lsh``); the exact quantized cosine filters
    inside each bucket, and each pair is attributed to its FIRST matching
    band, so pairs are emitted exactly once with no dedup shuffle. Output
    size is bounded by the true near-duplicate density (pairs ≥ threshold
    within a bucket), never N². As with all LSH dedup, a pair colliding in
    no band is missed by design — recall tunes with ``bands``."""
    if n_planes is None:
        if n_vectors is None:
            n_vectors = embeddings.count()
        rows = max(1, int(np.ceil(np.log2(max(n_vectors, 2) / target_bucket))))
        n_planes = rows * bands
    elif n_planes % bands:
        raise ValueError(f"n_planes={n_planes} not divisible by bands={bands}")
    else:
        rows = n_planes // bands
    qb_udf = quantized_band_struct_udf(n_planes, bands, scale)
    # no pre-UDF repartition: the signature UDF is one small matmul per
    # batch, and the band-bucket exchange right below already gives the
    # kernel stage its parallelism — the old repartition(2*cores) added a
    # full exchange of the embedding arrays purely to spread a trivial
    # UDF over a single-row-group local file (measured at sf1.0: full
    # query 2.5 s with it, 1.6 s without; at warehouse scale the scan
    # is already split and the exchange was pure overhead)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        qb_udf(F.col(vec_col)).alias("_s"),
    ).select("vec_id", F.col("_s.qv").alias("qv"),
             F.col("_s.bv").alias("bv"))
    stacked = base.select(
        "vec_id", "qv", "bv",
        F.posexplode("bv").alias("band_idx", "band_val"))

    from pyspark.sql import types as T

    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id_a", id_type),
        T.StructField("id_b", id_type),
        T.StructField("sim", T.DoubleType()),
    ])
    thr = float(threshold)

    def bucket_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        band_idx = int(key[0])
        m = len(pdf)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object),
                              "sim": pd.Series([], dtype="float64")})
        if m < 2:
            return empty
        Q = _decode_qv(pdf["qv"])  # int32-LE cells -> exact ints in double
        n2 = (Q * Q).sum(axis=1)
        ids = pdf["vec_id"].to_numpy()
        B = np.stack(pdf["bv"].to_numpy()) if band_idx > 0 else None
        outs = []
        chunk = max(1, min(m, 2_000_000 // max(m, 1) + 1, 4096))
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            sims = Q[lo:hi] @ Q.T
            sims /= np.sqrt(np.outer(n2[lo:hi], n2))
            ok = ids[lo:hi, None] < ids[None, :]
            ok &= sims >= thr
            if band_idx > 0:
                earlier = (
                    B[lo:hi, None, :band_idx] == B[None, :, :band_idx]
                ).any(axis=-1)
                ok &= ~earlier
            ri, ci = np.nonzero(ok)
            if len(ri):
                outs.append(pd.DataFrame({
                    "id_a": ids[lo:hi][ri], "id_b": ids[ci],
                    "sim": sims[ri, ci]}))
        return pd.concat(outs) if outs else empty

    return stacked.groupBy("band_idx", "band_val").applyInPandas(
        bucket_pairs, schema=out_schema)


def cosine_topk_ivf(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_lists: int | None = None, n_probe: int = 4,
    scale: int = 1000, refine_iters: int = 0, n_vectors: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k — the inverted-list ANN scale path
    alongside the LSH variant.

    Coarse quantizer: the ``n_lists`` lowest-id vectors serve as list
    anchors (sampled-anchor IVF). Every vector joins the list of its
    nearest anchor (min L2 over EXACT integer-quantized arithmetic, ties
    to the lowest anchor index); a query probes its ``n_probe`` nearest
    lists and re-ranks their members with the exact quantized cosine.
    ``refine_iters`` > 0 runs distributed Lloyd steps to improve the
    anchors (better recall; the anchors then depend on means and lose the
    closed-form SQL twin, so the contract query uses 0).

    Scale shape: assignment is one broadcast-matmul pass (anchors are tiny
    by construction); the probe join shuffles each vector once per probed
    list; per-list re-rank is a vectorized matmul bounded by list size
    ~N/n_lists. A neighbor appears in exactly ONE list, so per-list top-k
    rows are already pair-unique — no dedup shuffle. Lossless within the
    probed lists (exact re-rank + the bucket-truncation argument of
    ``cosine_topk_lsh``)."""
    from pyspark.sql import types as T

    if n_lists is None:
        if n_vectors is None:
            n_vectors = embeddings.count()
        n_lists = max(1, int(np.ceil(np.sqrt(n_vectors))))
    anchors_rows = (embeddings.orderBy(id_col).limit(n_lists)
                    .select(id_col, vec_col).collect())
    if not anchors_rows:  # empty corpus → empty result, typed
        from pyspark.sql import types as T

        id_type = embeddings.schema[id_col].dataType
        return embeddings.sparkSession.createDataFrame([], T.StructType([
            T.StructField("vec_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("sim", T.DoubleType())]))
    C = np.round(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                           for r in anchors_rows]) * scale)  # (L, d) ints
    c_n2 = (C * C).sum(axis=1)
    bc = embeddings.sparkSession.sparkContext.broadcast((C, c_n2))
    n_probe = min(n_probe, n_lists)

    par = embeddings.sparkSession.sparkContext.defaultParallelism
    base = embeddings.repartition(max(par * 2, 8)).select(
        F.col(id_col).alias("vec_id"),
        quantized(F.col(vec_col), scale).alias("qv"))

    assign_schema = T.StructType([
        T.StructField("vec_id", embeddings.schema[id_col].dataType),
        T.StructField("qv", T.ArrayType(T.LongType())),
        T.StructField("own_list", T.IntegerType()),
        T.StructField("probes", T.ArrayType(T.IntegerType())),
    ])
    npb = int(n_probe)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Cm, cn2 = bc.value
            Q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            # argmin ||q-c||^2 = argmin (|c|^2 - 2 q.c): exact integers
            d2 = cn2[None, :] - 2.0 * (Q @ Cm.T)
            order = np.argsort(d2, axis=1, kind="stable")  # ties -> low idx
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "qv": pdf["qv"],
                "own_list": order[:, 0].astype(np.int32),
                "probes": list(order[:, :npb].astype(np.int32)),
            })

    assigned = base.mapInPandas(assign, schema=assign_schema)
    if refine_iters > 0:
        for _ in range(refine_iters):
            means = (assigned.select("own_list", F.posexplode("qv")
                                     .alias("dim", "val"))
                     .groupBy("own_list", "dim").agg(F.avg("val").alias("m"))
                     .groupBy("own_list")
                     .agg(F.sort_array(F.collect_list(F.struct("dim", "m")))
                          .alias("vals")).collect())
            Cm = bc.value[0].copy()
            for r in means:
                Cm[int(r["own_list"])] = np.round(
                    [v["m"] for v in r["vals"]])
            bc = embeddings.sparkSession.sparkContext.broadcast(
                (Cm, (Cm * Cm).sum(axis=1)))
            assigned = base.mapInPandas(assign, schema=assign_schema)

    members = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qn"),
        F.col("own_list").alias("probe_list"))
    queries = assigned.select(
        "vec_id", F.col("qv").alias("qq"),
        F.explode("probes").alias("probe_list"))

    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("vec_id", id_type),
        T.StructField("neighbor_id", id_type),
        T.StructField("sim", T.DoubleType()),
    ])
    kk = int(k)

    def list_topk(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=object),
                              "neighbor_id": pd.Series([], dtype=object),
                              "sim": pd.Series([], dtype="float64")})
        qs = pdf[pdf["side"] == 0]
        ns = pdf[pdf["side"] == 1]
        if not len(qs) or not len(ns):
            return empty
        Q = np.stack(qs["qv"].to_numpy()).astype(np.float64)
        Nn = np.stack(ns["qv"].to_numpy()).astype(np.float64)
        qn2 = (Q * Q).sum(axis=1)
        nn2 = (Nn * Nn).sum(axis=1)
        qids = qs["vec_id"].to_numpy()
        nids = ns["vec_id"].to_numpy()
        outs = []
        chunk = max(1, min(len(Q), 2_000_000 // max(len(Nn), 1) + 1, 4096))
        for lo in range(0, len(Q), chunk):
            hi = min(lo + chunk, len(Q))
            sims = (Q[lo:hi] @ Nn.T) / np.sqrt(np.outer(qn2[lo:hi], nn2))
            ok = qids[lo:hi, None] != nids[None, :]
            sims = np.where(ok, sims, -np.inf)
            k_eff = min(kk, sims.shape[1])
            idx = _topk_desc_tiebreak(sims, nids, k_eff)
            rowi = np.repeat(np.arange(hi - lo), k_eff)
            coli = idx.ravel()
            s = sims[rowi, coli]
            valid = np.isfinite(s)
            outs.append(pd.DataFrame({
                "vec_id": qids[lo:hi][rowi[valid]],
                "neighbor_id": nids[coli[valid]], "sim": s[valid]}))
        return pd.concat(outs) if outs else empty

    both = (queries.select("probe_list", F.col("vec_id"), F.col("qq").alias("qv"),
                           F.lit(0).alias("side"))
            .unionByName(members.select(
                "probe_list", F.col("neighbor_id").alias("vec_id"),
                F.col("qn").alias("qv"), F.lit(1).alias("side"))))
    local = both.groupBy("probe_list").applyInPandas(list_topk, out_schema)
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select("vec_id", "neighbor_id", "rank", "sim"))
