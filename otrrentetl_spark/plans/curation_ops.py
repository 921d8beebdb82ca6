"""Training-corpus curation operators beyond the reference surface:
PII redaction, Gopher-style repetition quality, benchmark
decontamination (n-gram overlap), weighted stratified sampling for
data mixing, and time-series gap-filling.

These are the remaining first-class LLM-pipeline categories
(SURVEY.md §2.12 north star). Everything is built-in column
expressions — regexp/HOF/window — so the hot path stays JVM-side;
the only shuffles are the aggregations/joins the semantics require.

Oracle policy follows the registry conventions: the md5-derived
hash family for any sampling/hashing decision (bit-for-bit
reproducible in DuckDB), doubles routed through DECIMAL(30,6),
total ordering on every output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import fan_out, load_table
from otrrentetl_spark.operators import text
from otrrentetl_spark.registry import register


def _docs(spark, sf_dir):
    return fan_out(
        load_table(spark, sf_dir, "documents"), memo_key=f"documents:{sf_dir}"
    )


# ------------------------------------------------------------- PII redaction
# The synthetic corpus contains no organic PII, so each doc is first
# augmented with a deterministic doc_id-derived email / phone / IPv4 —
# the redaction is then observable and the oracle can replay it
# exactly. Patterns are RE2-safe (no lookarounds) so Java and DuckDB
# compile them identically.
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PAT_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"
_PAT_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails, phone numbers, and IPv4 addresses from document
    text, counting each category. Pure narrow projection (regexp only,
    no shuffle) — scans at full codegen speed at any corpus size."""
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from "),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.0."),
        (F.col("doc_id") % 254 + 1).cast("string"),
        F.lit(" end."),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PAT_EMAIL, "<EMAIL>"),
            _PAT_PHONE,
            "<PHONE>",
        ),
        _PAT_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PAT_EMAIL)).alias("n_email"),
        F.regexp_count(aug, F.lit(_PAT_PHONE)).alias("n_phone"),
        F.regexp_count(aug, F.lit(_PAT_IP)).alias("n_ip"),
        F.length(red).alias("redacted_len"),
        F.md5(red).alias("redacted_fp"),
    )


_PII_AUG_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from ' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.0.' || CAST(doc_id % 254 + 1 AS VARCHAR) || ' end.'"
)

register(
    "text_pii_redaction",
    text_pii_redaction,
    """
    WITH base AS (SELECT doc_id, {aug} AS aug FROM documents),
    red AS (
      SELECT doc_id, aug,
             regexp_replace(regexp_replace(regexp_replace(aug,
               '{email}', '<EMAIL>', 'g'),
               '{phone}', '<PHONE>', 'g'),
               '{ip}', '<IP>', 'g') AS r
      FROM base
    )
    SELECT doc_id,
           len(regexp_extract_all(aug, '{email}')) AS n_email,
           len(regexp_extract_all(aug, '{phone}')) AS n_phone,
           len(regexp_extract_all(aug, '{ip}')) AS n_ip,
           length(r) AS redacted_len,
           md5(r) AS redacted_fp
    FROM red ORDER BY doc_id
    """.format(
        # DuckDB string literals are standard SQL: backslashes pass
        # through verbatim, so the Java-side patterns drop in as-is.
        aug=_PII_AUG_SQL,
        email=_PAT_EMAIL,
        phone=_PAT_PHONE,
        ip=_PAT_IP,
    ),
)


# ------------------------------------------- Gopher-style repetition quality
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates (the Gopher rules' shape):
    duplicate 2-gram / 3-gram fraction via HOF (no shuffle) and
    top-token fraction via explode + two-level aggregation (one
    shuffle of |doc × distinct-token| rows, then |doc|)."""
    d = _docs(spark, sf_dir)
    # Tokenize once into a column: the dup-fraction lambdas would
    # otherwise re-run the regex split per gram (interpreted HOFs are
    # outside codegen CSE), and the two dup_frac widths would tokenize
    # twice more at the project level.
    td = d.select("doc_id", text.tokens("text").alias("t"))
    toks = F.col("t")

    def dup_frac(n: int):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        total = F.size(toks) - (n - 1)
        return F.when(
            F.size(toks) >= n + 1,
            F.round(
                (total - F.size(F.array_distinct(grams))).cast("double")
                / total.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    base = td.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        dup_frac(2).alias("dup2_frac"),
        dup_frac(3).alias("dup3_frac"),
    )
    tok_counts = (
        td.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("n"))
        .select(
            "doc_id",
            F.round(F.col("top_cnt").cast("double") / F.col("n"), 6).alias(
                "top_tok_frac"
            ),
        )
    )
    return (
        base.join(tok_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            "dup2_frac",
            "dup3_frac",
            F.coalesce("top_tok_frac", F.lit(0.0)).alias("top_tok_frac"),
            (
                (F.col("dup2_frac") <= 0.2)
                & (F.coalesce("top_tok_frac", F.lit(0.0)) <= 0.2)
            ).alias("keep"),
        )
        
    )


register(
    "text_repetition_quality",
    text_repetition_quality,
    r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), fr AS (
      SELECT doc_id, len(toks) AS n_tok,
        CASE WHEN len(toks) >= 3 THEN ROUND(
          CAST(len(toks) - 1
               - len(list_distinct([array_to_string(toks[i:i+1], ' ')
                                    for i in range(1, len(toks))])) AS DOUBLE)
          / (len(toks) - 1), 6) ELSE 0.0 END AS dup2_frac,
        CASE WHEN len(toks) >= 4 THEN ROUND(
          CAST(len(toks) - 2
               - len(list_distinct([array_to_string(toks[i:i+2], ' ')
                                    for i in range(1, len(toks) - 1)])) AS DOUBLE)
          / (len(toks) - 2), 6) ELSE 0.0 END AS dup3_frac
      FROM base
    ), tc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
      GROUP BY 1, 2
    ), top AS (
      SELECT doc_id, ROUND(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_tok_frac
      FROM tc GROUP BY 1
    )
    SELECT fr.doc_id, fr.n_tok, fr.dup2_frac, fr.dup3_frac,
           COALESCE(top.top_tok_frac, 0.0) AS top_tok_frac,
           (fr.dup2_frac <= 0.2 AND COALESCE(top.top_tok_frac, 0.0) <= 0.2)
             AS keep
    FROM fr LEFT JOIN top USING (doc_id)
    ORDER BY fr.doc_id
    """,
)


# --------------------------------------- benchmark decontamination (n-grams)
_DECON_N = 4  # testdata docs are short word-salad; real pipelines use 8-13


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    word n-gram with a held-out benchmark set (here: doc_id % 25 == 0).

    Benchmark suites are tiny relative to a 100 TB corpus, so the
    benchmark gram set is broadcast — the corpus side never shuffles;
    each task filters its partition locally, then only the (rare)
    hits aggregate."""
    n = _DECON_N
    d = _docs(spark, sf_dir)
    # Tokenize into a real column first: an inlined tokens() expression
    # inside the gram transform's lambda re-splits the text once per
    # gram (interpreted HOFs are outside codegen CSE).
    td = d.select("doc_id", text.tokens("text").alias("t")).filter(
        F.size("t") >= n
    )
    grams = td.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("t", i, n)),
                )
            )
        ).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 25 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 25 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        
    )


register(
    "decontaminate_ngram_overlap",
    decontaminate_ngram_overlap,
    r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+3], ' ')
                            for i in range(1, len(t) - 2)]) AS gs
      FROM toks WHERE len(t) >= 4
    ), bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 25 = 0
    )
    SELECT doc_id, count(*) AS n_overlap
    FROM grams, unnest(grams.gs) AS u(g)
    WHERE doc_id % 25 <> 0 AND g IN (SELECT g FROM bench)
    GROUP BY doc_id ORDER BY doc_id
    """,
)


# ------------------------------------------- weighted stratified sample (mix)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing sampler: per-source keep rates applied via the
    deterministic md5 hash family — reproducible across engines and
    runs, no RNG state, embarrassingly parallel (the decision is a
    per-row expression; the only shuffle is the per-source audit agg)."""
    d = _docs(spark, sf_dir)
    rate = (
        F.lit(200)
        + F.lit(50) * (F.expr("try_cast(substring(source, 4) AS INT)") % 10)
    ).alias("rate_permille")
    bucket = text.hash_long(
        F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))
    ) % 1000
    return (
        d.select("source", rate, (bucket < F.col("rate_permille")).alias("keep"))
        .groupBy("source", "rate_permille")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .select(
            "source",
            "rate_permille",
            "n_total",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_total")).alias(
                "realized_rate"
            ),
        )
        
    )


register(
    "sample_stratified_mix",
    sample_stratified_mix,
    """
    WITH base AS (
      SELECT source,
             200 + 50 * (CAST(substr(source, 4, 10) AS INT) % 10)
               AS rate_permille,
             CAST(concat('0x', substr(md5(concat('mix|',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 AS bucket
      FROM documents
    )
    SELECT source, rate_permille,
           count(*) AS n_total,
           CAST(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS realized_rate
    FROM base GROUP BY source, rate_permille ORDER BY source
    """,
)


# ------------------------------------------------- time-series gap filling
def events_gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event stream to an hourly grid per event_type:
    build the full hour spine with sequence+explode, left-join the
    hourly aggregate, zero-fill counts, forward-fill the last known
    hourly average (window `last` with ignorenulls).

    Scale shape: the aggregate shuffles |type × hour| rows (tiny vs
    input); the spine is generated, not scanned; the window partitions
    by event_type so state never exceeds one type's spine."""
    ev = load_table(spark, sf_dir, "events")
    val_dec = F.col("value").cast("decimal(30,6)")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(val_dec).cast("double") / F.count(F.lit(1))).alias("avg_v"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("n_events").isNull().alias("gap_filled"),
            F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_ff"),
        )
        
    )


register(
    "events_gapfill_timeseries",
    events_gapfill_timeseries,
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*)
               AS avg_v
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT event_type,
             unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      FROM hourly GROUP BY event_type
    )
    SELECT s.event_type, s.h,
           COALESCE(hy.n_events, 0) AS n_events,
           (hy.n_events IS NULL) AS gap_filled,
           last_value(hy.avg_v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ff
    FROM spine s LEFT JOIN hourly hy
      ON hy.event_type = s.event_type AND hy.h = s.h
    ORDER BY 1, 2
    """,
)


# ------------------------------------------- bloom-filter decontamination
_BF_M = 1 << 20  # bloom bits
_BF_K = 3  # hash functions


def decontaminate_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a Bloom filter instead of a
    broadcast join of the gram strings themselves: the benchmark
    grams are folded into an m=2^20-bit / k=3 filter represented as
    a (word_idx → 64-bit word) table, and the corpus probes it with
    three seeded md5 positions per gram. A gram "hits" iff all three
    bits are set; docs report their bloom-hit gram count
    (superset-with-false-positives of the exact overlap — the point
    of the filter; deterministic given the hash family, so the
    oracle replays it bit-for-bit).

    Why this exists next to `decontaminate_ngram_overlap`: at 100 TB
    the benchmark suite may itself be large (many suites × many
    grams). Broadcasting raw gram strings is O(total gram bytes) per
    executor; the bloom table is capped at m/8 bytes (128 KiB here)
    no matter how many grams feed it, and the probe is a row-local
    bit-test against the inlined word array — the corpus never
    shuffles (the only exchange is the per-doc hit count)."""
    n = _DECON_N
    d = _docs(spark, sf_dir)
    # Tokenize once into a column — see decontaminate_ngram_overlap.
    td = d.select("doc_id", text.tokens("text").alias("t")).filter(
        F.size("t") >= n
    )
    grams = td.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("t", i, n)),
                )
            )
        ).alias("g"),
    )

    def pos(j):
        return F.pmod(text.hash_long("g", seed=f"bf{j}:"), F.lit(_BF_M))

    bench_pos = (
        grams.filter(F.col("doc_id") % 25 == 0)
        .select(F.explode(F.array(*[pos(j) for j in range(_BF_K)])).alias("pos"))
        .distinct()
    )
    # shiftleft's numBits arg must be a Column here → SQL expr form
    bloom_words = bench_pos.groupBy(
        (F.col("pos") / 64).cast("long").alias("word_idx")
    ).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
        .alias("bits")
    )
    # Probe with k NARROW broadcast hash joins on word_idx — one per
    # position column — instead of exploding k rows per gram, joining,
    # and re-aggregating by (doc_id, gram). The k-joins shape removes
    # the 3× row blowup and the corpus-gram-sized (doc_id, g) exchange
    # (hit = all k positions set is now a row-local AND over the three
    # left-join results), keeps every operator inside WholeStageCodegen
    # (a crossJoin'd one-row array scalar was A/B-tested and LOST — the
    # BroadcastNestedLoopJoin fenced the gram pipeline out of codegen),
    # and the only corpus-side exchange left is the final per-doc
    # count. The word table is CAPPED at m/8 bytes (128 KiB) no matter
    # the benchmark size, so it is materialized ONCE driver-side (one
    # vocabulary-scale job over the 4% bench slice) and re-attached as
    # a local relation — three aliased broadcast builds of the lazy
    # frame would re-run the bench subtree three times.
    bw_schema = "word_idx bigint, bits bigint"
    bw_local = spark.createDataFrame(
        [(int(r["word_idx"]), int(r["bits"])) for r in bloom_words.collect()],
        bw_schema,
    )
    probe = grams.filter(F.col("doc_id") % 25 != 0).select(
        "doc_id", *[pos(j).alias(f"p{j}") for j in range(_BF_K)]
    )
    cur = probe
    all_set = None
    for j in range(_BF_K):
        bw = bw_local.select(
            F.col("word_idx").alias(f"w{j}"), F.col("bits").alias(f"bits{j}")
        )
        cur = cur.join(
            F.broadcast(bw),
            (F.col(f"p{j}") / 64).cast("long") == F.col(f"w{j}"),
            "left",
        )
        hit = (
            F.coalesce(F.col(f"bits{j}"), F.lit(0).cast("long")).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p{j} % 64 AS INT))")
            )
            != 0
        )
        all_set = hit if all_set is None else (all_set & hit)
    return (
        cur.filter(all_set)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )


def _bloom_sql() -> str:
    hashes = ", ".join(
        "(CAST(concat('0x', substr(md5(concat('bf%d:', g)), 1, 15)) AS BIGINT)"
        " %% %d) AS p%d" % (j, _BF_M, j)
        for j in range(_BF_K)
    )
    in_bench = " AND ".join(
        f"p{j} IN (SELECT pos FROM bench_pos)" for j in range(_BF_K)
    )
    union_pos = " UNION ALL ".join(f"SELECT doc_id, p{j} AS pos FROM hashed" for j in range(_BF_K))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               [array_to_string(t[i:i+{_DECON_N - 1}], ' ')
                for i in range(1, len(t) - {_DECON_N - 2})])) AS g
      FROM toks WHERE len(t) >= {_DECON_N}
    ), hashed AS (
      SELECT doc_id, g, {hashes} FROM grams
    ), bench_pos AS (
      SELECT DISTINCT pos FROM ({union_pos}) WHERE doc_id % 25 = 0
    )
    SELECT doc_id, COUNT(*) AS n_bloom_hits
    FROM hashed
    WHERE doc_id % 25 <> 0 AND {in_bench}
    GROUP BY doc_id
    """


register("decontaminate_bloom_probe", decontaminate_bloom_probe, _bloom_sql())
