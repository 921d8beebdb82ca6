"""Similarity-search quality checks: the approximate paths must agree
with the exact brute-force baseline to a measured degree, not just
run. Deterministic by construction (fixed centroids/hyperplanes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _load(spark):
    from otrrentetl_spark.catalog import load_table

    return load_table(spark, SF_ORACLE, "embeddings")


def _qvec(emb, vec_id=7):
    return [float(x) for x in emb.filter(F.col("vec_id") == vec_id).first()["embedding"]]


def test_ivf_recall_vs_bruteforce(spark):
    from otrrentetl_spark.operators import similarity

    emb = _load(spark)
    q = _qvec(emb)
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    cents = similarity.kmeans_centroids(emb, k=16, iters=2)
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(emb, q, cents, k=10, nprobe=6).collect()
    }
    # measured 0.9 at nprobe=6 with the Lloyd-trained quantizer
    # (was 0.6 with the retired strided-sample centroids)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"
    # the query vector itself must always be found (cosine 1.0)
    assert 7 in approx


def test_lsh_ann_contains_query(spark):
    from otrrentetl_spark.operators import similarity

    emb = _load(spark)
    q = _qvec(emb)
    got = similarity.ann_topk_lsh(emb, q, k=10).collect()
    assert got[0]["vec_id"] == 7
    assert abs(got[0]["cosine_sim"] - 1.0) < 1e-6


def test_ivf_assignment_partitions_corpus(spark):
    from otrrentetl_spark.operators import similarity

    emb = _load(spark)
    cents = similarity.kmeans_centroids(emb, k=16, iters=2)
    assigned = similarity.ivf_assign(emb, cents)
    n = emb.count()
    # every vector lands in exactly one cluster; clusters are non-trivial
    assert assigned.count() == n
    sizes = assigned.groupBy("__cluster").count()
    assert sizes.count() > 1
    assert sizes.agg(F.sum("count")).first()[0] == n
