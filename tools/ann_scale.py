"""Scale-pin the materialized ANN index path (r7 verdict item 2's
"done =" evidence at corpus scale).

Builds a replicated embedding corpus (base 2000 sf0.1 vectors × R
deterministic jittered replicas — default R=1000 → 2M vectors,
dim 64), then compares for the SAME query vectors:

  - ``AnnLshIndex.topk``  — persisted index probe: reads ONLY the
    hamming ball's prefix partitions (manifest-pinned file subset);
  - inline ``ann_topk_lsh`` — the full-corpus scan the index replaces
    (signature recomputed for every vector at query time);
  - ``cosine_topk``       — exact brute force, the recall baseline.

Prints per-face walls (min of 3 fresh plans), the files-read subset
ratio, and recall@10 of each approximate face against brute force.
The claim under test: the indexed probe's wall and files-read stay
~constant as the corpus grows, while both scan faces grow linearly.

    python tools/ann_scale.py [replicas] [scratch_dir]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1/embeddings.parquet"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_scale"
    shutil.rmtree(scratch, ignore_errors=True)

    from pyspark.sql import functions as F

    from otrrentetl_spark.operators.annindex import AnnLshIndex, IvfIndex
    from otrrentetl_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
        ivf_topk,
        kmeans_lloyd,
    )
    from otrrentetl_spark.session import get_spark

    spark = get_spark("ann_scale")
    base = spark.read.parquet(BASE)

    # ---- corpus: R jittered replicas, fully deterministic -----------
    # id = replica*10_000 + vec_id (base ids < 10_000, collision-free);
    # jitter each component by a hash-derived offset in [-0.025, 0.025]
    # so replicas spread across nearby LSH buckets instead of stacking.
    corpus_path = f"{scratch}/corpus.parquet"
    (
        base.crossJoin(spark.range(replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("rep") * 10_000 + F.col("vec_id")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (
                    F.pmod(
                        F.hash(F.col("rep") * 10_000 + F.col("vec_id"), i),
                        F.lit(1000),
                    ).cast("double")
                    / 1000.0
                    - 0.5
                )
                * 0.05,
            ).alias("embedding"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    print(f"corpus: {n} vectors, dim 64, replicas={replicas}")

    queries = [
        [float(x) for x in r["embedding"]]
        for r in base.orderBy("vec_id").limit(3).collect()
    ]

    def timed(fn, runs=3):
        best, out = float("inf"), None
        fn()  # warm-up (fresh plan inside fn each call)
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    # ---- LSH index ---------------------------------------------------
    t0 = time.perf_counter()
    lsh = AnnLshIndex.build(
        spark, corpus, f"{scratch}/lsh", n_planes=16, prefix_bits=8, dim=64
    )
    t_build = time.perf_counter() - t0
    total_files = len(lsh._table()._read_snapshot()["files"])
    print(f"lsh build: {t_build:.2f}s, {total_files} index files")

    for qi, q in enumerate(queries):
        probe_files = len(lsh.topk(q, 10).inputFiles())
        w_idx, r_idx = timed(lambda: {
            t["vec_id"] for t in lsh.topk(q, 10, max_hamming=2).collect()
        })
        w_inl, r_inl = timed(lambda: {
            t["vec_id"]
            for t in ann_topk_lsh(
                corpus, q, 10, n_planes=16, max_hamming=2
            ).collect()
        })
        w_bf, exact = timed(lambda: {
            t["vec_id"] for t in cosine_topk(corpus, q, 10).collect()
        })
        print(
            f"q{qi}: indexed {w_idx:5.2f}s ({probe_files}/{total_files}"
            f" files) | inline-scan {w_inl:5.2f}s | brute {w_bf:5.2f}s"
            f" | identical-to-inline {r_idx == r_inl}"
            f" | recall@10 {len(r_idx & exact)}/10"
        )

    # ---- IVF index ---------------------------------------------------
    _, cents_df = kmeans_lloyd(base, k=64, iters=2)
    centroids = [
        (int(r["cid"]), [float(x) for x in r["c"]])
        for r in cents_df.collect()
    ]
    t0 = time.perf_counter()
    ivf = IvfIndex.build(spark, corpus, f"{scratch}/ivf", centroids)
    t_build = time.perf_counter() - t0
    total_files = len(ivf._table()._read_snapshot()["files"])
    print(f"ivf build: {t_build:.2f}s, {total_files} index files")

    for qi, q in enumerate(queries):
        probe_files = len(ivf.topk(q, 10, nprobe=4).inputFiles())
        w_idx, r_idx = timed(lambda: {
            t["vec_id"] for t in ivf.topk(q, 10, nprobe=4).collect()
        })
        w_inl, r_inl = timed(lambda: {
            t["vec_id"]
            for t in ivf_topk(corpus, q, centroids, 10, nprobe=4).collect()
        })
        print(
            f"q{qi}: indexed {w_idx:5.2f}s ({probe_files}/{total_files}"
            f" files) | inline-scan {w_inl:5.2f}s"
            f" | identical-to-inline {r_idx == r_inl}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
