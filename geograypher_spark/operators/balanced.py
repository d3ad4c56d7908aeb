"""Balanced grouped-apply for compute-dense Pandas stages.

Spark sizes shuffle partitions by BYTES: AQE's partition coalescing
targets ``advisoryPartitionSizeInBytes`` (with a ``minPartitionSize``
floor), so a grouped ``applyInPandas`` whose per-row compute cost is
~1000× its byte size — e.g. a tile render burning ~50 ms of kernel per
~1k-row, ~80 KB group — gets coalesced to a handful of tasks and stops
scaling with cores (measured: a 680-group render stage ran as 14 tasks
on 16 cores because its shuffle input was ~20 MB). Byte-based sizing is
the right default for scan/join stages; it is the wrong cost model for
CPU-dense Python stages.

``grouped_apply_balanced`` keeps the same (key, pdf) → pdf contract as
``DataFrame.groupBy(...).applyInPandas`` but controls the exchange:

- **volume regime** (many groups): an explicit ``repartition(p, keys)``
  — user-specified repartitions are exempt from AQE coalescing, and with
  groups ≫ partitions the hash assignment is balanced by the law of
  large numbers. ``applyInPandas`` then reuses that exchange (its
  ClusteredDistribution on the same keys is already satisfied).
- **enumeration regime** (group count within ~2 orders of magnitude of
  the core count — where hash assignment is Poisson-skewed and one
  straggler partition caps the whole stage): enumerate the distinct
  groups (tiny, map-side-combined distinct), stripe them round-robin
  across exactly ``p`` buckets, and repartition on a *bucket key chosen
  so Spark's own hash places bucket b in partition b* (Murmur3 inverted
  driver-side, see ``inverse_bucket_keys``). Every partition gets
  ⌈groups/p⌉ or ⌊groups/p⌋ groups — no birthday-problem collisions.
  The group function runs inside ``mapInPandas`` with an in-task pandas
  groupby (a post-repartition ``applyInPandas`` would re-shuffle on the
  raw keys and undo the balancing).

At 100 TB the volume regime is the norm; the enumeration regime is what
keeps the LAST reduction of a pipeline — hundreds of tiles/cameras on
hundreds of cores — from being bound by one unlucky hash bucket.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Spark-compatible Murmur3 (x86_32) of a LongType value, seed 42 — the
# function behind HashPartitioning, reimplemented so the driver can
# precompute which partition a bucket key lands in. Verified against
# F.hash in tests/test_balanced.py.
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def spark_hash_long(value: int, seed: int = 42) -> int:
    """Spark's ``hash(bigint)``: Murmur3_x86_32 over the two 32-bit
    halves of the long (low word first), returned as a signed int32."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    out = _fmix(h1, 8)
    return out - (1 << 32) if out >= (1 << 31) else out


_INVERSE_CACHE: dict[int, list[int]] = {}


def inverse_bucket_keys(p: int) -> list[int]:
    """For each target partition t in [0, p): the smallest non-negative
    long k with pmod(spark_hash_long(k), p) == t, so that
    ``repartition(p, key)`` places bucket t's rows in partition t."""
    if p in _INVERSE_CACHE:
        return _INVERSE_CACHE[p]
    keys: list[int | None] = [None] * p
    found, k = 0, 0
    while found < p:
        t = spark_hash_long(k) % p
        if keys[t] is None:
            keys[t] = k
            found += 1
        k += 1
    _INVERSE_CACHE[p] = keys  # type: ignore[assignment]
    return keys  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# The operator
# ---------------------------------------------------------------------------

def grouped_apply_balanced(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    schema,
    partitions: int | None = None,
    max_enumerated_groups: int = 100_000,
    groups: Sequence[tuple] | None = None,
    volume: bool = False,
) -> DataFrame:
    """``df.groupBy(*keys).applyInPandas(fn, schema)`` with a
    compute-aware exchange (see module docstring).

    ``fn(key_tuple, pdf) -> pdf`` — identical contract to applyInPandas;
    ``pdf`` contains the full rows including the key columns.

    ``partitions`` defaults to 2× the session's default parallelism —
    round-robin assignment is already exact, so two waves absorb
    group-cost variance without paying per-task Python-worker overhead
    on many more tasks. Groups are atomic: one group's rows always land
    in one task, so per-task memory is bounded by the largest
    ⌈groups/partitions⌉ groups (enumeration regime) or by the streamed
    single group (volume regime).

    Group enumeration pulls at most ``max_enumerated_groups`` distinct
    keys to the driver in one action; beyond that the group count alone
    guarantees hash balance and the volume path is used. When ``df`` is
    itself expensive to compute, that probe action re-runs its lineage —
    callers that already know the key domain (e.g. a broadcast camera
    dict) should pass ``groups`` (a superset is fine: empty buckets cost
    nothing, and keys with no rows produce no output, exactly like
    applyInPandas). ``volume=True`` skips the probe and goes straight to
    the hash-routed path — right for chained stages whose group count is
    known to be large but whose keys are data-dependent.
    """
    keys = list(keys)
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    p = partitions or max(par * 2, 8)

    # ONE extra action: pull the distinct groups if there are few enough
    # to enumerate (map-side-combined distinct, tiny result). Everything
    # else — round-robin assignment, placement inversion — happens on the
    # driver, so no count job and no single-partition window stage.
    cap = max_enumerated_groups
    if volume and groups is None:
        return (df.repartition(p, *keys)
                  .groupBy(*keys).applyInPandas(fn, schema=schema))
    if groups is not None:
        head = [tuple(g) if isinstance(g, (tuple, list)) else (g,)
                for g in groups]
    else:
        head = df.select(*keys).distinct().take(cap + 1)
    if not head:
        return spark.createDataFrame([], schema)
    if len(head) > cap:
        return (df.repartition(p, *keys)
                  .groupBy(*keys).applyInPandas(fn, schema=schema))

    inv = inverse_bucket_keys(p)
    # stripe in content-hash order, not key order: group cost usually
    # varies smoothly with the natural key (neighboring cameras/tiles see
    # similar geometry), and a fixed stride over a spatially-ordered list
    # can alias with that structure (measured: a 24-wide camera grid
    # striped mod 32 put one stripe at ~2x the median cost). Hashing the
    # key first gives every stripe an i.i.d.-like cost sample. md5, not
    # hash(): PYTHONHASHSEED must not change the plan between runs.
    import hashlib

    rows = sorted(
        (tuple(r) for r in head),
        key=lambda r: hashlib.md5(repr(r).encode()).digest())
    assign = spark.createDataFrame(
        pd.DataFrame(
            [(*r, int(inv[i % p])) for i, r in enumerate(rows)],
            columns=[*keys, "_gb"]),
        schema=df.select(*keys).schema.add("_gb", "long"),
    )
    routed = df.join(F.broadcast(assign), keys).repartition(p, "_gb")

    def run_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if not len(pdf):
            return
        for key, g in pdf.groupby(keys, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            out = fn(key, g.drop(columns=["_gb"]).reset_index(drop=True))
            if out is not None and len(out):
                yield out

    return routed.mapInPandas(run_partition, schema=schema)
