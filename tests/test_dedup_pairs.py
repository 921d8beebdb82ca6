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


def test_fast_kernel_band_hashes_match_expression_path(spark):
    """The Arrow banding kernel must emit BIT-IDENTICAL band hashes to
    the HOF/md5 expression path — this is the parity contract that
    makes the fast LSH pipeline oracle-checkable."""
    from pyspark.sql import functions as F

    rows = [
        (1, ""),
        (2, "   "),
        (3, "one"),
        (4, "one two"),
        (5, "one two three"),
        (6, "a b c d e f g h i j"),
        (7, "tab\tsep  and\nnewline mix   runs"),
        (8, "unicode café straße tokens here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = df.select("doc_id", dedup._fast_band_udf(8, 4, 3)(F.col("text")).alias("b"))
    expr = df.select("doc_id", dedup.minhash_band_hashes("text", 8, 4, 3).alias("b"))
    assert fast.exceptAll(expr).count() == 0
    assert expr.exceptAll(fast).count() == 0


def test_lsh_fast_and_exact_paths_agree(spark):
    """minhash_lsh_pairs(fast=True) ≡ minhash_lsh_pairs(fast=False) on
    the same input and parameters — the two execution paths are twins."""
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "how vexingly quick daft zebras jump over fences at dawn",
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # near-dup of doc 0: drop last two words
    rows.append((100, " ".join(base[0].split()[:-2])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_hashes=8, bands=4, shingle_n=3, jaccard_threshold=0.3)
    fast = dedup.minhash_lsh_pairs(df, fast=True, **kw)
    exact = dedup.minhash_lsh_pairs(df, fast=False, **kw)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, exact.collect()))
    assert fast.count() >= 1


def test_span_dedup_keeps_first_occurrence(spark):
    """Doc 2 repeats doc 1's first span verbatim: the span survives
    only in doc 1; unique spans survive everywhere."""
    span = " ".join(f"w{i}" for i in range(4))  # 4-token span width
    rows = [
        (1, span + " unique one two three"),
        (2, span + " other four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.span_dedup(df, span_tokens=4).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1  # lost the shared span


def test_boilerplate_removed_from_all_carriers(spark):
    """A span over the doc-frequency threshold disappears from every
    document — including the first one (unlike keep-first dedup)."""
    banner = "b1 b2 b3 b4"
    rows = [(i, banner + f" body{i} x y z") for i in range(10)]
    rows.append((100, "organic only text here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.boilerplate_span_removal(
        df, span_tokens=4, max_doc_frac=0.5
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i in range(10):
        assert by_id[i]["n_boiler"] == 1, i  # banner stripped everywhere
    assert by_id[100]["n_boiler"] == 0
    # md5("") marks a fully-boilerplate doc... not here: bodies survive
    import hashlib

    assert by_id[0]["clean_text_md5"] == hashlib.md5(b"body0 x y z").hexdigest()


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


def test_lsh_bucket_cap_is_observed_not_silent(spark):
    """r3 verdict item 3: a degenerate corpus (many identical docs)
    overflows its LSH buckets; the cap must drop them AND surface the
    truncation through the caller's Observation — dropped-bucket count
    and member mass, not a silent result shrink."""
    from pyspark.sql import Observation

    boiler = [(i, "the same boilerplate text repeated everywhere") for i in range(30)]
    organic = [
        (100, "completely different organic words alpha beta gamma delta"),
        (101, "completely different organic words alpha beta gamma delt"),
    ]
    df = spark.createDataFrame(boiler + organic, "doc_id long, text string")
    obs = Observation("lsh_cap")
    pairs = dedup.minhash_lsh_pairs(
        df, max_bucket_size=5, jaccard_threshold=0.5, observation=obs
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the 30-doc boilerplate bucket (4 bands, all identical) was dropped
    assert not any(a < 100 for a, _ in got)
    # the organic near-dup pair survives in its own small bucket
    assert (100, 101) in got
    m = obs.get
    assert m["dropped_buckets"] == 4, m
    assert m["dropped_member_mass"] == 120, m


def test_simhash_bucket_cap_is_observed(spark):
    from pyspark.sql import Observation

    boiler = [(i, "identical sketch text every time") for i in range(20)]
    df = spark.createDataFrame(boiler, "doc_id long, text string")
    obs = Observation("simhash_cap")
    pairs = dedup.simhash_near_pairs(
        df, bits=16, bands=4, max_hamming=3, max_bucket_size=5, observation=obs
    )
    assert pairs.count() == 0  # every bucket overflowed and was dropped
    m = obs.get
    assert m["dropped_buckets"] == 4, m
    assert m["dropped_member_mass"] == 80, m


def test_lsh_oracle_models_bucket_cap(spark):
    """ADVICE r3: the DuckDB oracle must drop the same oversized
    buckets the engine drops. With the cap forced tiny on the shared
    fixture corpus, engine and oracle must agree exactly — if the
    oracle enumerated pairs from capped buckets this diverges loudly."""
    import duckdb

    params = dict(dedup.LSH_EXACT_PARAMS)
    params["max_bucket_size"] = 3
    sql = (
        "WITH "
        + dedup.lsh_oracle_ctes(**params).strip()
        + " SELECT id_a, id_b, jaccard_sim FROM pairs"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    oracle = {(a, b, round(j, 6)) for a, b, j in con.execute(sql).fetchall()}

    from otrrentetl_spark.plans.llm_ops import near_dup_corpus

    corpus = near_dup_corpus(
        spark, "/root/testdata/sf0.01",
        corpus_max=params["corpus_max"], near_max=params["near_max"],
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard_sim"], 6))
        for r in dedup.minhash_lsh_pairs(
            corpus,
            num_hashes=params["num_hashes"],
            bands=params["bands"],
            shingle_n=params["shingle_n"],
            max_bucket_size=3,
            fast=False,
        ).collect()
    }
    assert got == oracle


def test_embedding_near_dup_bucket_cap(spark):
    """ADVICE r4: a degenerate signature collapse (e.g. duplicate
    vectors) must be bounded by max_bucket_size, like minhash/simhash —
    not collect_listed into one O(N²) task."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]  # one bucket of 40
    rows += [(100, [0.0, 1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.embedding_near_dup_pairs(
        df, threshold=0.99, max_bucket_size=10
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got            # small bucket survives
    assert not any(a < 100 for a, _ in got)  # 40-dup bucket dropped by cap


def test_repeated_invocations_do_not_grow_cache_blocks(spark):
    """ADVICE r7/r8 cache-lifetime pin: minhash_lsh_pairs and
    simhash_near_pairs persist intermediates the returned frame's
    lineage reads; the release contract must keep a long session's
    persistent-RDD count BOUNDED across repeated invocations, and
    release_caches() must free the tail immediately."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        120
    )

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # isolation: a streaming query left active by another module keeps
    # persisting state blocks asynchronously, which reads as "growth"
    # here (observed as a full-suite-only flake); quiesce first
    for q in spark.streams.active:
        q.stop()
    dedup.release_caches()
    spark.catalog.clearCache()

    def settled(limit):
        # DataFrame.unpersist() is NON-blocking: under full-suite load
        # the previous invocation's blocks linger a beat before the
        # executor drops them, which read as "growth" here (full-
        # suite-only flake). Poll until the count settles at/below the
        # limit — a bounded wait, so genuinely UNBOUNDED growth still
        # fails via the timeout fallthrough.
        import time

        n = n_persistent()
        for _ in range(50):
            if n <= limit:
                return n
            time.sleep(0.1)
            n = n_persistent()
        return n

    base = n_persistent()
    counts = []
    for i in range(10):
        dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()
        counts.append(
            n_persistent() if i == 0 else settled(counts[0])
        )
    # self-cleaning: each invocation releases the previous one's blocks
    assert max(counts) == counts[0], counts
    for _ in range(3):
        dedup.simhash_near_pairs(docs).collect()
        counts.append(settled(counts[0] + 1))
    assert max(counts) <= counts[0] + 1, counts  # +1: simhash's banded
    released = dedup.release_caches()
    assert released >= 2
    # <= not ==: blocks owned by OTHER modules may drain concurrently
    assert settled(base) <= base
