"""Dedup pair-finding edge cases — the band-straddling regression
(ADVICE round 1) and signature-width guards."""

from __future__ import annotations

import pytest

from otrrentetl_spark.operators import dedup, similarity


def test_ngram_jaccard_finds_pairs_across_band_edge(spark):
    # near-identical texts whose lengths land in ADJACENT length bands
    # (length_band=16: 112 chars -> band 7, 108 chars -> band 6), with
    # the lower-id doc in the HIGHER band (the round-1 missed
    # direction) and in the lower band
    base = "alpha beta gamma delta " * 5  # 115 chars
    df = spark.createDataFrame(
        [
            (1, base[:112]),   # id 1 in band 7
            (2, base[:108]),   # id 2 in band 6  (lower id is LONGER)
            (10, base[:108]),  # id 10 in band 6 (lower id is shorter)
            (20, base[:112]),  # id 20 in band 7
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.3, length_band=16).collect()
    }
    # both orientations must be found
    assert (1, 2) in pairs
    assert (10, 20) in pairs


def test_simhash_rejects_width_beyond_hash(spark):
    with pytest.raises(ValueError):
        dedup.simhash("text", bits=64)


def test_near_dup_probes_embedding_dim(spark):
    # 8-dim vectors: the auto-probed hyperplanes must bucket correctly —
    # identical vectors share a bucket, and the pair comes out at sim 1.0
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    rows.append((100, rows[0][1]))  # duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.embedding_near_dup_pairs(df, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}
