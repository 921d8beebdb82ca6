"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the standard near-dup stack for training-data pipelines.

Scale design (the whole point of these operators at 100 TB):
- Exact dedup is one hash-groupBy — a single shuffle on a 16-byte key.
- MinHash/LSH avoids the O(N²) pairwise wall: per-doc signatures are a
  narrow projection (no shuffle), banding explodes each doc into
  `bands` rows, and the candidate join is an equi-join on
  (band_id, band_hash) — i.e. only same-bucket docs ever meet.
  Bucket skew (a boilerplate band shared by millions of docs) is the
  known failure mode → `max_bucket_size` caps pathological buckets,
  and AQE skew-join handles the rest.
- SimHash gives a 64-bit per-doc sketch; near-dups are sketches at
  small Hamming distance, found by pigeonhole banding of the bits.
- All hashing is md5-derived (engine-portable, deterministic) — no
  Python UDFs anywhere in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otrrentetl_spark.operators.text import hash_long, normalize_text, tokens


# ------------------------------------------------------------------ exact (X1)
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per identical (normalized) content.

    One shuffle on the content hash; ties broken by id so the survivor
    set is deterministic. 100 TB posture: the shuffle key is the
    16-byte md5, partial aggregation reduces map output to one row per
    distinct hash per partition.
    """
    h = F.md5(normalize_text(text_col)).alias("__content_hash")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("__content_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------------------ shingling utils
def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle *set* (distinct), via higher-order functions:
    sequence over start offsets → slice → concat. Empty/short docs give
    the whole-doc token string so they still hash."""
    toks = tokens(col)
    k = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingle set over normalized text."""
    norm = normalize_text(col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    grams = F.transform(starts, lambda i: norm.substr(i, F.lit(n)))
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-sets."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ----------------------------------------------------------- MinHash+LSH (X2)
def minhash_signature(col: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as an array<long> of length ``num_hashes``:
    element i = min over shingles of a seed-i md5 hash. Pure column
    expressions — the signature costs one projection, no shuffle."""
    sh = word_shingles(col, shingle_n)

    # Closure factory, NOT `lambda s, i=i: ...`: Spark binds one lambda
    # variable per *parameter* of the callable, so a default-arg capture
    # would receive a Column in place of the seed index.
    def seeded(i: int):
        return lambda s: hash_long(s, seed=f"mh{i}:")

    mins = [F.array_min(F.transform(sh, seeded(i))) for i in range(num_hashes)]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified
    with exact Jaccard.

    rows(bands) → hash each band → equi-join on (band, band_hash) →
    distinct candidate pairs → exact verify. ``max_bucket_size`` drops
    degenerate buckets (boilerplate) instead of letting one hot key
    produce a quadratic blowup — at 100 TB this cap is load-bearing.
    """
    rows_per_band = num_hashes // bands
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            minhash_signature(text_col, num_hashes, shingle_n).alias("sig"),
            word_shingles(text_col, shingle_n).alias("shingles"),
        )
    )
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "id", "shingles", F.posexplode(band_arr).alias("band", "band_hash")
    )
    # kill pathological buckets before the self-join
    bucket_sizes = banded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("__bsz")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("__bsz") <= max_bucket_size),
        ["band", "band_hash"],
        "inner",
    ).drop("__bsz")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
            "inner",
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.shingles").alias("sh_a"),
            F.col("r.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard_sim", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


# ----------------------------------------------------------------- SimHash
def simhash(col: Column | str, bits: int = 64) -> Column:
    """SimHash sketch of the token multiset: bit b of the result is the
    sign of Σ_tokens (±1 by bit b of the token hash). Built entirely
    from higher-order functions — per-row, no explode, no shuffle."""
    tok_hashes = F.transform(tokens(col), lambda t: hash_long(t))

    def bit_vote(b: int):  # closure factory — see seeded() in minhash
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(tok_hashes, F.lit(0), bit_vote(b)) for b in range(bits)]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole banding (a pair within
    Hamming ≤ max_hamming must agree exactly on ≥1 of bands) → candidate
    equi-join → exact Hamming verify."""
    width = bits // bands
    sk = df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sk"))
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("sk"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            for b in range(bands)
        ]
    )
    banded = sk.select("id", "sk", F.posexplode(band_arr).alias("band", "band_key"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
            "inner",
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sk").alias("sk_a"),
            F.col("r.sk").alias("sk_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sk_a"), F.col("sk_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- n-gram Jaccard (X2b)
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.6,
    length_band: int = 32,
) -> DataFrame:
    """Exact char-n-gram Jaccard near-dup pairs, bucketed by a coarse
    length band so the pairwise comparison only happens inside bands
    (near-dups can't differ wildly in length). For full-corpus scale
    prefer MinHash LSH; this is the exact verifier / small-domain tool."""
    base = df.select(
        F.col(id_col).alias("id"),
        char_shingles(text_col, n).alias("grams"),
        (F.length(normalize_text(text_col)) / length_band).cast("long").alias("lband"),
    )
    l, r = base.alias("l"), base.alias("r")
    # neighbor bands too: a near-dup pair may straddle a band edge
    band_match = (F.col("r.lband") - F.col("l.lband")).isin(0, 1)
    cand = l.join(r, band_match & (F.col("l.id") < F.col("r.id")), "inner")
    return (
        cand.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jaccard(F.col("l.grams"), F.col("r.grams")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
