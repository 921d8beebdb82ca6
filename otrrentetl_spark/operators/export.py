"""Training-shard export: the tail of a corpus pipeline — a
deterministic seeded shuffle of the curated corpus, weight-balanced
assignment into N shards, and the physical shard write.

Why each piece is shaped the way it is at 100 TB:

- **Seeded shuffle** = a pseudorandom RANK per row from plain integer
  arithmetic (two rounds of Knuth multiplicative hashing, every
  intermediate < 2^63 so ANSI mode can't overflow). Deterministic
  across runs/engines — reshuffling with the same seed reproduces the
  exact training order, and the DuckDB oracle replays it verbatim
  (``xxhash64`` would be Spark-only).
- **Weight-balanced sharding**: rows sorted by rank are cut into N
  contiguous spans of ~equal total weight (token mass), so every
  shard feeds a trainer the same token budget. shard =
  ``start_offset * N div total`` — each row's offset is the exact
  prefix sum of weights in rank order.
- **Distributed prefix sum**: a single global window would serialize
  into ONE task chain. The offset is computed two-level instead:
  rows bucket into ``chunks`` contiguous rank ranges (top bits of
  rank), each chunk windows its own cumsum in parallel, and the
  per-chunk base offsets — ``chunks`` tiny rows — are a driver-side
  running total broadcast back. Bit-identical to the global window
  (integer sums, same total order) — the oracle runs the global
  window and must hash-match.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^31-bounded multiplicative mixing constants (Knuth / Murmur finalizer)
_M1 = 2654435761  # 0x9E3779B1
_M2 = 2246822519  # 0x85EBCA77
_MOD = 2**31


def seeded_rank(id_col: str, seed: int) -> F.Column:
    """Deterministic pseudorandom rank in [0, 2^31): two multiplicative
    rounds over the id. Portable: plain * % arithmetic; every operand
    is reduced mod 2^31 before multiplying, so no intermediate exceeds
    2^31 * max(M1,M2) < 2^63 — safe under ANSI overflow checking at
    any id magnitude."""
    s = F.lit(int(seed) % _MOD)
    i = F.pmod(F.col(id_col).cast("long"), F.lit(_MOD))
    r1 = F.pmod(i * F.lit(_M1), F.lit(_MOD))
    return F.pmod(F.pmod(r1 + s, F.lit(_MOD)) * F.lit(_M2), F.lit(_MOD))


def seeded_rank_sql(id_expr: str, seed: int) -> str:
    """The ANSI-SQL twin of :func:`seeded_rank` (oracle replay). SQL
    ``%`` keeps the dividend's sign while Spark ``pmod`` is always
    non-negative, so the first reduction — the only one that can see a
    negative value — is written as ``((x % m) + m) % m``."""
    s = int(seed) % _MOD
    i = f"((CAST({id_expr} AS BIGINT) % {_MOD}) + {_MOD}) % {_MOD}"
    return f"(({i} * {_M1}) % {_MOD} + {s}) % {_MOD} * {_M2} % {_MOD}"


def shard_by_weight(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
    chunks: int = 64,
) -> DataFrame:
    """Add ``rank`` (the seeded shuffle order) and ``shard`` (0-based,
    ~equal total ``weight_col`` per shard) columns. Two-level prefix
    sum: ``chunks`` parallel window chains + a driver-side base-offset
    map (``chunks`` longs — not a data collect)."""
    shift = 31 - max(1, chunks - 1).bit_length()
    ranked = df.withColumn("rank", seeded_rank(id_col, seed)).withColumn(
        "__chunk", F.shiftrightunsigned(F.col("rank"), shift)
    )
    ranked = ranked.localCheckpoint(eager=True)  # rank pass runs once
    per_chunk = {
        int(r["__chunk"]): int(r["w"])
        for r in ranked.groupBy("__chunk")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    }
    total = sum(per_chunk.values())
    base, acc = {}, 0
    for c in sorted(per_chunk):
        base[c] = acc
        acc += per_chunk[c]
    base_expr = F.create_map(
        *[F.lit(x) for kv in base.items() for x in kv]
    )
    w = (
        Window.partitionBy("__chunk")
        .orderBy("rank", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wcol = F.col(weight_col).cast("long")
    start = (
        base_expr[F.col("__chunk")]
        + F.sum(wcol).over(w)
        - wcol
    )
    # exact integer floor-division (`div`), never double `/` — at
    # corpus scale start*N exceeds the 53-bit double mantissa
    return (
        ranked.withColumn("__start", start)
        .withColumn(
            "shard",
            F.least(
                F.lit(n_shards - 1).cast("long"),
                F.expr(f"__start * {int(n_shards)} div {max(total, 1)}"),
            ),
        )
        .drop("__chunk", "__start")
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    weight_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
) -> dict:
    """Physically export: shard assignment, then one contiguous
    (shard, rank) slice per write task — one file per ``shard=N``
    directory, rows inside in shuffle order — plus a
    ``_SHARD_MANIFEST.json`` recording the seed and per-shard
    row/weight totals. Returns the manifest dict."""
    assigned = shard_by_weight(df, n_shards, weight_col, seed, id_col)
    (
        # hash-repartition on shard: ALL of a shard's rows share one
        # task (range sampling could split a shard across tasks), so
        # every shard=N directory holds exactly one file, internally
        # in shuffle order
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "rank", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # manifest stats from the WRITTEN files (two cheap columns), not
    # a second run of the assignment pipeline — the window prefix sum
    # over the full corpus would otherwise execute twice
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(weight_col).cast("long")).alias("weight"),
        )
        .collect()
    )
    manifest = {
        "seed": int(seed),
        "n_shards": int(n_shards),
        "weight_col": weight_col,
        "shards": {
            str(int(r["shard"])): {
                "n_rows": int(r["n_rows"]),
                "weight": int(r["weight"]),
            }
            for r in stats
        },
    }
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_SHARD_MANIFEST.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=1).encode()))
    finally:
        out.close()
    return manifest
