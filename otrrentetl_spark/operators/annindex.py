"""Materialized ANN indexes — the persisted scale path for similarity
search (r7 verdict item 2: the inline ``ann_topk_lsh`` / ``ivf_topk``
forms recompute every vector's signature / assignment per query, a
full-corpus scan; at 100 TB a top-k probe must read only matching
buckets).

Both indexes are ordinary :class:`~otrrentetl_spark.operators.merge.
KeyedParquetTable` instances — the engine's snapshot-versioned keyed
table — so they inherit for free exactly what an index needs:

- **partition pruning**: the table is partitioned by the bucket key
  (signature prefix for LSH, cluster id for IVF); a probe resolves its
  bucket set driver-side (tiny: a hamming ball / nprobe ids) and reads
  ONLY those partitions' manifest-pinned files via
  ``read_partitions`` — the plan's ``inputFiles`` are a strict subset
  of the table's, asserted in tests/test_annindex.py.
- **snapshot consistency**: a probe plans over one committed manifest
  version; a concurrent refresh flips atomically underneath it.
- **incremental refresh**: base-table changes arrive as a
  change-feed batch (streaming/changefeed.py — the K8 face) and
  ``apply_changes`` folds them in: delete-by-key for removed/updated
  vectors (their OLD bucket found by an id-level semi-join against
  the index, broadcast — the batch is small), re-bucketed append for
  new/updated ones. No rebuild.

LSH layout note: the full ``n_planes``-bit signature would make up to
2^n_planes partition directories — unbounded small-file pressure. The
partition key is therefore the TOP ``prefix_bits`` of the signature
(bounded directory count at any corpus size) and the full signature is
a plain column: a probe prunes partitions by the ball's distinct
prefixes, then filters the exact ball in-file (parquet row-group
predicate pushdown on ``sig``). Two-level pruning — the standard
coarse/fine split.

Design reference: the inline operators in operators/similarity.py are
the semantics oracle — an indexed probe returns bit-identical rows to
its inline twin (registry queries ``similarity_ann_indexed`` /
``similarity_ivf_indexed`` hash against the same DuckDB oracle SQL as
the inline forms).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.operators.merge import KeyedParquetTable
from otrrentetl_spark.operators.similarity import (
    _SEED,
    cosine,
    hyperplanes,
    lsh_bucket,
)

_META_NAME = "_ANN_META.json"


def _hamming_ball(sig: int, n_bits: int, radius: int) -> list[int]:
    """Every n_bits-wide signature within hamming ``radius`` of
    ``sig`` — |ball| = sum_{i<=r} C(n_bits, i), driver-side tiny for
    the radii ANN uses (12 bits, r=2 → 79 values)."""
    out = [sig]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_bits), r):
            flip = 0
            for b in bits:
                flip |= 1 << b
            out.append(sig ^ flip)
    return out


class AnnLshIndex:
    """Persisted random-hyperplane LSH index over an embedding table.

    On disk: a KeyedParquetTable at ``path`` keyed
    ``(pfx, <id_col>)`` with columns (id, embedding, sig), plus a
    ``_ANN_META.json`` pinning (n_planes, prefix_bits, dim, seed) so a
    reader reconstructs the exact hyperplane family (deterministic
    from the seed — the same contract the inline form relies on).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._meta_cache: dict | None = None

    # ------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        n_planes: int = 12,
        prefix_bits: int = 6,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        dim: int | None = None,
        seed: int = _SEED,
    ) -> AnnLshIndex:
        """One corpus pass: signature projection (narrow, JVM-side) →
        partitioned write. The index holds the vectors themselves so a
        probe never joins back to the base table."""
        if dim is None:
            first = df.select(F.size(vec_col).alias("d")).first()
            dim = 1 if first is None else int(first["d"])
        idx = cls(spark, path)
        planes = hyperplanes(dim, n_planes, seed)
        rows = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            lsh_bucket(F.col(vec_col), planes).alias("sig"),
        ).withColumn(
            "pfx",
            F.shiftrightunsigned(
                F.col("sig"), n_planes - prefix_bits
            ).cast("long"),
        )
        # Bucket-aligned layout BEFORE the partitioned write: without
        # it every write task emits one file into every prefix dir it
        # touches (tasks × 2^prefix_bits files — measured 8,156 files
        # for a 100k-vector build). Range-partitioning on
        # (pfx, sig, id) gives each task one contiguous slice — ~one
        # file per prefix dir (more for oversized buckets, each with
        # disjoint sig/id footer ranges, so in-file sig pruning holds).
        n_tasks = max(2**prefix_bits, df.rdd.getNumPartitions())
        rows = rows.repartitionByRange(
            n_tasks, "pfx", "sig", "id"
        ).sortWithinPartitions("pfx", "sig", "id")
        idx._table().overwrite(rows)
        idx._write_meta(
            {
                "kind": "lsh",
                "n_planes": int(n_planes),
                "prefix_bits": int(prefix_bits),
                "dim": int(dim),
                "seed": int(seed),
            }
        )
        return idx

    # ------------------------------------------------------------ probe
    def topk(
        self, query_vec: list[float], k: int = 10, max_hamming: int = 2
    ) -> DataFrame:
        """Approximate top-k: ONLY the ball's prefix partitions are
        read (manifest-pinned file subset), the exact ball filtered
        in-file, exact cosine on survivors. Bit-identical to the
        inline ``ann_topk_lsh`` on the same corpus/params."""
        m = self.meta()
        planes = hyperplanes(m["dim"], m["n_planes"], m["seed"])
        q_sig = int(
            sum(
                (1 << j)
                for j, h in enumerate(planes)
                if float(np.dot(query_vec, h)) > 0
            )
        )
        ball = _hamming_ball(q_sig, m["n_planes"], max_hamming)
        shift = m["n_planes"] - m["prefix_bits"]
        prefixes = sorted({s >> shift for s in ball})
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self._table()
            .read_partitions(prefixes)
            .filter(F.col("sig").isin(ball))
            .select(
                F.col("id").alias("vec_id"),
                F.round(cosine(F.col("v"), q), 6).alias("cosine_sim"),
            )
            .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
            .limit(k)
        )

    # ------------------------------------------------------- batch face
    def knn_join(
        self,
        queries: DataFrame,
        k: int = 10,
        max_hamming: int = 2,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
    ) -> DataFrame:
        """Batch top-k join: every query row against the index in ONE
        pruned scan + ONE broadcast join — the training-pipeline face
        (dedup/score a candidate set against a reference corpus),
        where per-query ``topk`` probes would pay the fixed plan cost
        per row.

        Plan: each query expands into its hamming ball — |ball| rows
        per query (an index row matches at most ONE ball row per
        query — sig^qsig is a single fixed mask — so the equi-join on
        full signature is duplicate-free); the index side reads only
        the union of the balls' prefix partitions; the per-query
        top-k is one window over the ball survivors.

        The query side is the SMALL side by contract (it is broadcast
        wholesale), so the one driver-side ``collect`` of it — which
        both resolves the partition prune set AND computes each
        query's signature with the same numpy dot products ``topk``
        uses (a Spark-side expression fold can round a near-zero
        plane projection to the other sign and flip a ball) — is
        bounded by the query count, not the corpus.
        """
        from pyspark.sql.window import Window

        if qid_col == "vec_id":
            raise ValueError(
                "qid_col='vec_id' collides with the index id output"
                " column; alias the query id first"
            )
        m = self.meta()
        planes = hyperplanes(m["dim"], m["n_planes"], m["seed"])
        shift = m["n_planes"] - m["prefix_bits"]
        masks = _hamming_ball(0, m["n_planes"], max_hamming)
        qrows = queries.select(qid_col, qvec_col).collect()
        qitems = [
            (
                r[qid_col],
                [float(x) for x in r[qvec_col]],
            )
            for r in qrows
        ]
        sig_of = {
            qid: int(
                sum(
                    (1 << j)
                    for j, h in enumerate(planes)
                    if float(np.dot(v, h)) > 0
                )
            )
            for qid, v in qitems
        }
        prefixes = sorted({
            (s ^ mk) >> shift for s in sig_of.values() for mk in masks
        })
        qid_type = queries.schema[qid_col].dataType.simpleString()
        # ball frame built wholly driver-side (vectors ride along) —
        # the query plan is never re-scanned and the probe's
        # inputFiles are index files only
        ball = self.spark.createDataFrame(
            [
                (qid, v, sig_of[qid] ^ mk)
                for qid, v in qitems
                for mk in masks
            ],
            f"`__qid` {qid_type}, __qv array<double>, __bsig long",
        )
        joined = self._table().read_partitions(prefixes).join(
            F.broadcast(ball), F.col("sig") == F.col("__bsig"), "inner"
        )
        scored = joined.select(
            F.col("__qid").alias(qid_col),
            F.col("id").alias("vec_id"),
            F.round(cosine(F.col("v"), F.col("__qv")), 6).alias(
                "cosine_sim"
            ),
        )
        w = Window.partitionBy(qid_col).orderBy(
            F.col("cosine_sim").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(qid_col, "vec_id", "cosine_sim", "rk")
        )

    # ---------------------------------------------------------- refresh
    def apply_changes(self, batch: DataFrame) -> None:
        """Fold one change-feed batch (columns: <id>, <vector>,
        change_type ∈ insert/update/delete — the K8 shape projected to
        the vector column) into the index without a rebuild:

        1. rows whose id is updated/deleted: locate their CURRENT
           bucket by an id-level join against the index (the batch is
           broadcast — CDC batches are small against a 100 TB index)
           and delete those (bucket, id) keys;
        2. insert/update rows: recompute signature/prefix and
           partition-scoped upsert.

        An update whose vector moved buckets is thereby a K5-style
        re-key (delete old partition entry + insert new), which the
        keyed table's commit makes atomic at the manifest level.
        """
        m = self.meta()
        planes = hyperplanes(m["dim"], m["n_planes"], m["seed"])
        batch = batch.localCheckpoint(eager=True)  # pin: read twice
        gone_ids = batch.filter(
            F.col("change_type").isin("update", "delete")
        ).select(F.col("id").alias("__gid"))
        t = self._table()
        old_keys = (
            t.read()
            .join(F.broadcast(gone_ids), F.col("id") == F.col("__gid"), "inner")
            .select("pfx", "id")
        )
        if old_keys.limit(1).count() > 0:
            t.delete_by_keys(old_keys)
        fresh = batch.filter(
            F.col("change_type").isin("insert", "update")
        ).select(
            "id",
            F.col("v"),
            lsh_bucket(F.col("v"), planes).alias("sig"),
        ).withColumn(
            "pfx",
            F.shiftrightunsigned(
                F.col("sig"), m["n_planes"] - m["prefix_bits"]
            ).cast("long"),
        )
        if fresh.limit(1).count() > 0:
            t.upsert_replace_partitions(fresh)

    # ---------------------------------------------------------- plumbing
    def _table(self) -> KeyedParquetTable:
        t = KeyedParquetTable(self.spark, self.path, keys=("pfx", "id"))
        t.retain_stale_s = 3600.0  # in-flight probes keep their files
        return t

    def meta(self) -> dict:
        if self._meta_cache is None:
            t = self._table()
            doc = t._read_json(f"{self.path}/{_META_NAME}")
            if doc is None:
                raise ValueError(f"no ANN index metadata at {self.path}")
            self._meta_cache = doc
        return self._meta_cache

    def _write_meta(self, doc: dict) -> None:
        self._table()._write_json_atomic(
            f"{self.path}/{_META_NAME}", doc
        )
        self._meta_cache = doc


class IvfIndex:
    """Persisted IVF index: vectors partitioned by their coarse
    centroid assignment; a probe reads the ``nprobe`` nearest
    clusters' partitions only. Centroids live in the metadata doc
    (k × dim doubles — trivially small), so probe selection is a
    driver-side argsort with no Spark job."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._meta_cache: dict | None = None

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        centroids: list[tuple[int, list[float]]],
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> IvfIndex:
        """One corpus pass: nearest-centroid assignment (narrow
        projection over the literal centroid table — operators.
        similarity.ivf_assign, the oracle-replayed quantizer) →
        partitioned write keyed (cluster, id)."""
        from otrrentetl_spark.operators.similarity import ivf_assign

        idx = cls(spark, path)
        # ivf_assign emits "__cluster"; partition DIRECTORIES must not
        # be underscore-prefixed (Spark's FileIndex treats _-paths as
        # hidden), so the index column is plain "cluster"
        rows = ivf_assign(df, centroids, vec_col).select(
            F.col("__cluster").alias("cluster"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
        )
        # cluster-aligned layout (same rationale as the LSH build):
        # one contiguous (cluster, id) slice per task instead of one
        # file per (task, cluster) pair
        n_tasks = max(len(centroids), df.rdd.getNumPartitions())
        rows = rows.repartitionByRange(
            n_tasks, "cluster", "id"
        ).sortWithinPartitions("cluster", "id")
        idx._table().overwrite(rows)
        idx._write_meta(
            {
                "kind": "ivf",
                "centroids": [
                    [int(cid), [float(x) for x in c]]
                    for cid, c in centroids
                ],
            }
        )
        return idx

    def topk(
        self, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """nprobe nearest clusters by driver-side L2 over the metadata
        centroids (same ordering as the inline ``ivf_topk``), then
        exact cosine over ONLY those partitions' manifest files."""
        cents = [(cid, c) for cid, c in self.meta()["centroids"]]
        q = np.asarray(query_vec, dtype=float)
        order = sorted(
            cents, key=lambda c: float(np.sum((np.asarray(c[1]) - q) ** 2))
        )
        probes = [int(cid) for cid, _ in order[:nprobe]]
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self._table()
            .read_partitions(probes)
            .select(
                F.col("id").alias("vec_id"),
                F.round(cosine(F.col("v"), qcol), 6).alias("cosine_sim"),
            )
            .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
            .limit(k)
        )

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
    ) -> DataFrame:
        """Batch top-k join over the IVF index (the LSH ``knn_join``
        pattern with cluster probing): the query set — small by
        contract, it is broadcast wholesale — is collected once and
        each query's ``nprobe`` nearest centroids are picked with the
        IDENTICAL driver-side numpy sort ``topk`` uses (same distance
        accumulation, same stable tie order over the metadata
        centroid list), so the batch face matches per-query ``topk``
        row-for-row by construction. The index reads only the union
        of probed clusters' partitions; one broadcast equi-join on
        cluster; one top-k window."""
        from pyspark.sql.window import Window

        if qid_col == "vec_id":
            raise ValueError(
                "qid_col='vec_id' collides with the index id output"
                " column; alias the query id first"
            )
        cents = [(int(cid), c) for cid, c in self.meta()["centroids"]]
        qrows = queries.select(qid_col, qvec_col).collect()
        probe_rows = []
        for r in qrows:
            v = [float(x) for x in r[qvec_col]]
            q = np.asarray(v, dtype=float)
            order = sorted(
                cents,
                key=lambda c: float(np.sum((np.asarray(c[1]) - q) ** 2)),
            )
            probe_rows += [
                (r[qid_col], v, int(cid)) for cid, _ in order[:nprobe]
            ]
        probes = sorted({p for _, _, p in probe_rows})
        qid_type = queries.schema[qid_col].dataType.simpleString()
        # probe frame built wholly driver-side (vectors ride along) —
        # no re-scan of the query plan, index-only inputFiles
        qs = self.spark.createDataFrame(
            probe_rows,
            f"`__qid` {qid_type}, __qv array<double>, __probe long",
        )
        joined = self._table().read_partitions(probes).join(
            F.broadcast(qs), F.col("cluster") == F.col("__probe"), "inner"
        )
        scored = joined.select(
            F.col("__qid").alias(qid_col),
            F.col("id").alias("vec_id"),
            F.round(cosine(F.col("v"), F.col("__qv")), 6).alias(
                "cosine_sim"
            ),
        )
        w = Window.partitionBy(qid_col).orderBy(
            F.col("cosine_sim").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(qid_col, "vec_id", "cosine_sim", "rk")
        )

    def _table(self) -> KeyedParquetTable:
        t = KeyedParquetTable(
            self.spark, self.path, keys=("cluster", "id")
        )
        t.retain_stale_s = 3600.0
        return t

    def meta(self) -> dict:
        if self._meta_cache is None:
            doc = self._table()._read_json(f"{self.path}/{_META_NAME}")
            if doc is None:
                raise ValueError(f"no ANN index metadata at {self.path}")
            self._meta_cache = doc
        return self._meta_cache

    def _write_meta(self, doc: dict) -> None:
        self._table()._write_json_atomic(f"{self.path}/{_META_NAME}", doc)
        self._meta_cache = doc
