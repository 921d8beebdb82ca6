"""Experiment harness for the two perf stragglers: time plan variants
at sf0.1 under the bench session, optionally with conf tweaks."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(fn, n=3):
    fn().collect()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from otrrentetl_spark.operators import text
    from otrrentetl_spark.session import get_spark

    spark = get_spark("exp")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )

    def toks():
        return docs.select(
            "doc_id", F.explode(text.tokens("text")).alias("term")
        ).filter(F.col("term") != "")

    def surp_old():
        tk = toks()
        tf = tk.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
        ntok = tk.agg(F.count(F.lit(1)).alias("n_corpus"))
        return (
            tk.join(tf, "term")
            .crossJoin(F.broadcast(ntok))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_tok"),
                F.round(
                    F.avg(F.col("n_corpus").cast("double") / F.col("tf")), 6
                ).alias("surprisal_proxy"),
            )
        )

    def surp_dt_nojoin_reuse():
        # dt pre-agg, NO explicit repartition (rely on exchange reuse)
        tk = toks()
        dt = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("k"))
        tf = dt.groupBy("term").agg(F.sum("k").alias("tf"))
        ntok = tf.agg(F.sum("tf").alias("n_corpus"))
        q9 = F.round(
            F.col("n_corpus").cast("double") / F.col("tf") * F.lit(1e9)
        ).cast("long")
        return (
            dt.join(tf, "term")
            .crossJoin(F.broadcast(ntok))
            .groupBy("doc_id")
            .agg(
                F.sum("k").alias("n_tok"),
                F.sum(q9.cast("decimal(38,0)") * F.col("k")).alias("s9"),
            )
            .select(
                "doc_id",
                "n_tok",
                F.round(
                    F.col("s9").cast("double") / F.lit(1e9) / F.col("n_tok"), 6
                ).alias("surprisal_proxy"),
            )
        )

    def surp_repart():
        tk = toks()
        dt = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("k"))
        dt_t = dt.repartition("term")
        tf = dt_t.groupBy("term").agg(F.sum("k").alias("tf"))
        ntok = tf.agg(F.sum("tf").alias("n_corpus"))
        q9 = F.round(
            F.col("n_corpus").cast("double") / F.col("tf") * F.lit(1e9)
        ).cast("long")
        return (
            dt_t.join(tf, "term")
            .crossJoin(F.broadcast(ntok))
            .groupBy("doc_id")
            .agg(
                F.sum("k").alias("n_tok"),
                F.sum(q9.cast("decimal(38,0)") * F.col("k")).alias("s9"),
            )
            .select(
                "doc_id",
                "n_tok",
                F.round(
                    F.col("s9").cast("double") / F.lit(1e9) / F.col("n_tok"), 6
                ).alias("surprisal_proxy"),
            )
        )

    def tfidf(repart: bool):
        def q():
            tk = docs.select(
                "doc_id",
                F.explode(F.split(F.trim("text"), r"\s+")).alias("term"),
            ).filter(F.col("term") != "")
            tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
            tf_t = tf.repartition("term") if repart else tf
            dfreq = tf_t.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            ndocs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
            from pyspark.sql import Window as W

            scored = (
                tf_t.join(dfreq, "term")
                .crossJoin(F.broadcast(ndocs))
                .withColumn(
                    "score",
                    F.col("tf")
                    * (F.col("n_docs") + F.lit(1.0))
                    / (F.col("df") + F.lit(1.0)),
                )
            )
            w = W.partitionBy("doc_id").orderBy(
                F.col("score").desc(), F.col("term").asc()
            )
            return (
                scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 3)
                .select("doc_id", "rk", "term", "score")
            )

        return q

    for label, fn in [
        ("surp_old", surp_old),
        ("surp_dt_reuse", surp_dt_nojoin_reuse),
        ("surp_repart", surp_repart),
        ("tfidf_norepart", tfidf(False)),
        ("tfidf_repart", tfidf(True)),
    ]:
        print(f"{label:18s} {t(fn):6.3f}s", flush=True)

    print("--- with parallelismFirst=false ---", flush=True)
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    for label, fn in [
        ("surp_old", surp_old),
        ("surp_dt_reuse", surp_dt_nojoin_reuse),
        ("surp_repart", surp_repart),
        ("tfidf_norepart", tfidf(False)),
        ("tfidf_repart", tfidf(True)),
    ]:
        print(f"{label:18s} {t(fn):6.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
