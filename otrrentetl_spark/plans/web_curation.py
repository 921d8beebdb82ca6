"""Web-corpus curation operators: URL parsing / domain analytics,
per-domain document caps, Gopher-style rule-based quality gates, and
bigram LM fluency scoring.

These are the curation steps a web-crawl training-data pipeline runs
between raw fetch and tokenization (the RefinedWeb/Gopher recipe):
parse the URL, group by registered domain, cap each domain's
contribution, drop documents failing hand-written quality rules, and
score fluency against the corpus's own n-gram statistics. The
reference has no web-corpus analog (its scrape sources are fixed
pages, otrrentetl/server/etl.py:123-244); these extend SURVEY.md
§2.12's ⊕ scope.

The documents table carries a synthetic `source` tag rather than a
real URL, so each query derives a deterministic URL from
(source, doc_id, lang) FIRST — the operator under test is the
parsing/grouping/capping dataflow, and the same derivation runs in
the DuckDB oracle so every downstream value is still hash-checked.

Scale posture: every per-doc step is a narrow codegen projection (no
Python, no shuffle); the domain aggregations are single partial-agg
shuffles keyed by domain (bounded cardinality); the bigram model
joins are broadcast while the vocabulary fits and AQE demotes them
past that. All integer-compare gates (3·n ≤ Σlen ≤ 10·n instead of
3.0 ≤ mean ≤ 10.0) so no float boundary can flip between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import fan_out, load_table
from otrrentetl_spark.functions.exprs import bind
from otrrentetl_spark.operators import text
from otrrentetl_spark.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the heavily-compressed text parquet packs into few row
    # groups, so a bare scan runs every per-doc HOF/regex walk at file
    # parallelism (1-5 tasks), not core count. One round-robin text
    # shuffle buys every core for the compute above it; at cluster
    # scale the scan already has thousands of partitions and fan_out
    # is a pass-through. (r4 had this backwards — the "fan_out loses"
    # measurement re-collected one DataFrame, which silently reuses
    # shuffle files and times only the final stage. Fresh-plan A/B at
    # 100×: gates 12.5→9.3 s, pipeline 15.1→8.3 s, bigram 17.5→12.1 s;
    # sf0.1 wins too, e.g. gates 0.82→0.43 s.)
    return fan_out(
        load_table(spark, sf_dir, "documents"), memo_key=f"documents:{sf_dir}"
    )


def round6_portable(c: Column) -> Column:
    """Half-away 6-dp rounding via FLOOR of the scaled double —
    identical binary arithmetic in both engines. F.round HALF_UPs the
    SHORTEST DECIMAL REPR of the double while DuckDB rounds the binary
    value, so a quotient sitting at an exact decimal half can flip its
    last digit between engines (code-review r4c finding 3); the floor
    form cannot."""
    return F.signum(c) * F.floor(F.abs(c) * 1e6 + F.lit(0.5)) / 1e6


# the SQL rendering of round6_portable — same ops, same order
ROUND6_SQL = "SIGN({x}) * FLOOR(ABS({x}) * 1e6 + 0.5) / 1e6"


def synth_url() -> Column:
    """Deterministic URL from (source, doc_id, lang): www-prefix on
    doc_id % 4 == 0, the source tag as the registrable second-level
    domain (`{source}-site.{tld}` — so domain-level grouping has real
    source×tld cardinality), TLD from doc_id % 3, lang-scoped path,
    two query params. Mirrored verbatim in _URL_SQL."""
    return F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("-site."),
        F.when(F.col("doc_id") % 3 == 0, F.lit("com"))
        .when(F.col("doc_id") % 3 == 1, F.lit("org"))
        .otherwise(F.lit("net")),
        F.lit("/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref="),
        F.col("source"),
    )


_URL_SQL = """'https://'
          || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
          || source || '-site.'
          || CASE WHEN doc_id % 3 = 0 THEN 'com'
                  WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END
          || '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR)
          || '?page=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=' || source"""


# ------------------------------------------------------------ URL parsing
def url_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition suite: host, registered domain (last two
    labels), TLD, subdomain flag, path, and typed query parameters —
    Spark's built-in parse_url/substring_index (JVM codegen, no UDF).
    The registered-domain column is what every domain-level curation
    step (caps, reputation, dedup keys) groups by at 100 TB."""
    d = _docs(spark, sf_dir)
    url = synth_url()
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        url.alias("url"),
        host.alias("host"),
        F.substring_index(host, ".", -2).alias("reg_domain"),
        F.substring_index(host, ".", -1).alias("tld"),
        host.startswith("www.").alias("is_www"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).cast("int").alias("page"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )


register(
    "url_parse_suite",
    url_parse_suite,
    rf"""
    WITH u AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ), h AS (
      SELECT doc_id, url,
             regexp_extract(url, 'https://([^/]+)', 1) AS host
      FROM u
    )
    SELECT doc_id, url, host,
           regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS reg_domain,
           regexp_extract(host, '([^.]+)$', 1) AS tld,
           host LIKE 'www.%' AS is_www,
           regexp_extract(url, 'https://[^/]+([^?]*)', 1) AS path,
           CAST(regexp_extract(url, '[?&]page=([^&]*)', 1) AS INTEGER) AS page,
           regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
    FROM h ORDER BY doc_id
    """,
)


# ------------------------------------------------------- per-domain caps
_DOMAIN_CAP = 3
# Fan-out of the salted pre-truncation window: a mega-domain is split
# across this many sub-partitions before any full-domain rank runs.
# 32 matches local core count; on a cluster set ≈ 2× executor cores.
_CAP_SALT = 32


def domain_caps(
    d: DataFrame, cap: int = _DOMAIN_CAP, salt: int = _CAP_SALT
) -> DataFrame:
    """Cap body over any frame with (doc_id, reg_domain, n_chars,
    text) — factored out so tests can drive it over crafted skew
    fixtures (one domain holding half the corpus).

    Skew-safe plan (r4 verdict item 2 — the old single window
    `partitionBy(reg_domain)` put an entire mega-domain in one task,
    the exact spam pattern this RefinedWeb-style cap exists to
    police):

      1. totals — plain groupBy(reg_domain): partial (map-side)
         aggregation collapses a hot domain inside each input
         partition, so the shuffle carries ≤ #partitions rows per
         domain no matter how big the domain is.
      2. kept set — two-level top-N: a first row_number window over
         (reg_domain, hash(doc_id) % salt) bounds every task at
         ~|domain|/salt rows and keeps ≤ cap·salt candidates per
         domain; the survivors (tiny) are re-ranked by a plain
         reg_domain window. Each true top-cap doc ranks ≤ cap inside
         its salt slice, so the candidate set always contains the
         exact answer.
      3. BPE token mass is counted AFTER truncation, by joining the
         ≤ cap·domains kept keys back to the text — the tokenizer
         regex runs on the kept fraction of the corpus, not all of
         it (the old plan tokenized every document only to discard
         all but cap per domain). AQE picks the join strategy: at
         test scale the kept side broadcasts; at 100 TB (where
         cap·domains can exceed the broadcast limit) it degrades to
         a doc_id shuffle join with no hot keys.

    Window frames carry only (doc_id, reg_domain, n_chars) — text
    never enters a sort buffer."""
    base = d.select("doc_id", "reg_domain", "n_chars")
    totals = base.groupBy("reg_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    pre = base.withColumn(
        "rk1",
        F.row_number().over(
            W.partitionBy(
                "reg_domain", F.pmod(F.hash("doc_id"), F.lit(salt))
            ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        ),
    ).filter(F.col("rk1") <= cap)
    kept = (
        pre.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("reg_domain").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("rk") <= cap)
        .select("doc_id", "reg_domain", "n_chars")
    )
    kept_agg = (
        kept.join(d.select("doc_id", "text"), "doc_id")
        .groupBy("reg_domain")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            # coalesce: a domain whose kept docs ALL have null text
            # must report 0 token mass (the pre-r5 when/otherwise(0)
            # shape's behavior), not NULL — sum() skips nulls and
            # returns NULL only when every input was null
            F.coalesce(
                F.sum(text.bpe_token_count("text")), F.lit(0).cast("long")
            ).alias("kept_bpe_tok"),
        )
    )
    # every domain has ≥ 1 doc, so it appears on both sides — inner
    # join; both sides arrive hash-partitioned on reg_domain
    return (
        totals.join(kept_agg, "reg_domain")
        .select(
            "reg_domain",
            "n_docs",
            "n_kept",
            "kept_chars",
            (F.col("total_chars") - F.col("kept_chars")).alias("dropped_chars"),
            "kept_bpe_tok",
        )
        .orderBy("reg_domain")
    )


def domain_topk_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the RefinedWeb anti-spam step): keep at
    most N docs per registered domain, preferring longer documents
    (n_chars DESC, doc_id ASC tiebreak), and report per-domain what the
    cap kept vs dropped — docs, chars, and BPE-token mass. Plan shape
    and skew posture: see domain_caps."""
    d = _docs(spark, sf_dir)
    url = synth_url()
    dom = F.substring_index(F.parse_url(url, F.lit("HOST")), ".", -2)
    return domain_caps(
        d.select("doc_id", dom.alias("reg_domain"), "n_chars", "text")
    )


register(
    "domain_topk_caps",
    domain_topk_caps,
    rf"""
    WITH u AS (
      SELECT doc_id, n_chars, text,
             regexp_extract(regexp_extract({_URL_SQL}, 'https://([^/]+)', 1),
                            '([^.]+\.[^.]+)$', 1) AS reg_domain
      FROM documents
    ), ranked AS (
      SELECT doc_id, reg_domain, n_chars,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
               AS n_bpe,
             ROW_NUMBER() OVER (PARTITION BY reg_domain
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM u
    )
    SELECT reg_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
             AS BIGINT) AS kept_chars,
           CAST(SUM(CASE WHEN rk > {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
             AS BIGINT) AS dropped_chars,
           CAST(COALESCE(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_bpe END), 0)
             AS BIGINT) AS kept_bpe_tok
    FROM ranked GROUP BY reg_domain ORDER BY reg_domain
    """,
)


# ------------------------------------------------- Gopher quality gates
_SW_EN_SQL = ",".join(f"'{w}'" for w in text.STOPWORDS["en"])


def gopher_gates(d: DataFrame, keep: tuple = ()) -> DataFrame:
    """Gate projection over any frame with (doc_id, text) — the body of
    gopher_quality_gates, factored out so tests can drive it over
    crafted literal frames. ``keep`` names extra input columns to carry
    through (so pipeline compositions stay a single scan instead of
    joining flags back by doc_id)."""
    toks = text.tokens("text")

    def _acc(acc, t):
        # ONE pass over the token array computes every per-token metric
        # (total length, alpha-word count, stopword count): HOFs are
        # interpreted, so three separate filter/aggregate passes cost
        # 3× the array walk — measured 10.6 s → 8.6 s at 100× docs.
        return F.struct(
            (acc["l"] + F.length(t)).alias("l"),
            (
                acc["a"] + F.when(t.rlike("[A-Za-z]"), 1).otherwise(0)
            ).alias("a"),
            (
                acc["st"]
                + F.when(
                    F.lower(t).isin(*text.STOPWORDS["en"]), 1
                ).otherwise(0)
            ).alias("st"),
        )

    zero = F.struct(
        F.lit(0).alias("l"), F.lit(0).alias("a"), F.lit(0).alias("st")
    )
    return d.select(
        "doc_id",
        *keep,
        bind(
            toks,
            lambda tk: bind(
                F.size(tk),
                lambda n: bind(
                    F.aggregate(tk, zero, _acc),
                    lambda m: F.struct(
                        n.alias("n_words"),
                        ((n >= 50) & (n <= 100000)).alias("gate_word_count"),
                        (
                            (F.lit(3) * n <= m["l"])
                            & (m["l"] <= F.lit(10) * n)
                        ).alias("gate_mean_word_len"),
                        (
                            F.lit(10)
                            * (
                                F.regexp_count(F.col("text"), F.lit("#"))
                                + F.regexp_count(
                                    F.col("text"), F.lit(r"\.\.\.")
                                )
                            )
                            <= n
                        ).alias("gate_symbol_ratio"),
                        (F.lit(5) * m["a"] >= F.lit(4) * n).alias(
                            "gate_alpha_words"
                        ),
                        (m["st"] >= 2).alias("gate_stopwords"),
                    ),
                ),
            ),
        ).alias("g"),
    ).select(
        "doc_id",
        *keep,
        F.col("g.n_words").alias("n_words"),
        "g.gate_word_count",
        "g.gate_mean_word_len",
        "g.gate_symbol_ratio",
        "g.gate_alpha_words",
        "g.gate_stopwords",
        (
            F.col("g.gate_word_count")
            & F.col("g.gate_mean_word_len")
            & F.col("g.gate_symbol_ratio")
            & F.col("g.gate_alpha_words")
            & F.col("g.gate_stopwords")
        ).alias("passes_all"),
    )


def gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document quality gates in the Gopher/MassiveText
    style: word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, alpha-word fraction, and minimum stopword evidence — each
    emitted as its own flag plus the conjunction, so downstream mixing
    can weight by failure mode rather than a single boolean.

    Every ratio gate compares in INTEGERS (e.g. mean word length in
    [3,10] as 3·n ≤ Σlen ≤ 10·n) — bit-portable across engines, no
    float boundary. One narrow projection, zero shuffles; at 100 TB
    this runs at scan speed alongside every other per-doc gate."""
    return gopher_gates(_docs(spark, sf_dir))


register(
    "gopher_quality_gates",
    gopher_quality_gates,
    rf"""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, text, toks,
             len(toks) AS n,
             COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
               AS total_len,
             len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
             len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
               AS n_alpha,
             len(list_filter(toks, t -> lower(t) IN ({_SW_EN_SQL})))
               AS n_stop
      FROM base
    )
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_words,
           n >= 50 AND n <= 100000 AS gate_word_count,
           3 * n <= total_len AND total_len <= 10 * n AS gate_mean_word_len,
           10 * n_sym <= n AS gate_symbol_ratio,
           5 * n_alpha >= 4 * n AS gate_alpha_words,
           n_stop >= 2 AS gate_stopwords,
           (n >= 50 AND n <= 100000)
             AND (3 * n <= total_len AND total_len <= 10 * n)
             AND (10 * n_sym <= n)
             AND (5 * n_alpha >= 4 * n)
             AND (n_stop >= 2) AS passes_all
    FROM m ORDER BY doc_id
    """,
)


def gopher_gates_kernel(d: DataFrame, keep: tuple = ()) -> DataFrame:
    """Arrow-kernel perf twin of gopher_gates (the CDC-kernel
    pattern): the HOF expression path stays the oracle reference;
    this mapInPandas kernel computes BIT-IDENTICAL per-doc token
    metrics — the interpreted F.aggregate walk re-evaluates its
    lambda per token, and at 100× docs that interpretation is ~60%
    of the query's wall. Tokenization parity is exact: Spark trim
    strips 0x20 only, Java \\s is the ASCII class [ \\t\\n\\x0b\\f\\r]
    (NOT Python's Unicode-aware \\s), split keeps interior/leading
    empties, and '...' counting is the same non-overlapping
    left-to-right scan as regexp_count. The gate flags themselves are
    derived from the kernel's integer metrics by the same column
    expressions as the HOF face. ``keep`` names extra input columns to
    pass through the Arrow batches unchanged (same contract as
    gopher_gates' keep) so pipeline compositions stay a single scan —
    JVM-side expressions among them (md5, regex token counts) are
    computed in the scan stage and ride through as plain values.

    Kernel internals (r6): mapInArrow + whole-buffer numpy passes
    (operators/textkernel.py) — NO per-token or per-doc interpreter
    work at all. Measured at the 5M-doc 1000x fixture, the
    alternatives all lose: per-token Python loop 21.7 s, per-doc
    C-regex findall 23 s, Arrow RE2 count_substring_regex 40 s, JVM
    codegen regexp_count 45 s; the mapInArrow transport floor is
    ~1.9 s, and the byte-level masks/cumsums run near it. Exact
    semantics (trim/split/empties/casefold/'...' counting) are
    documented and proven in textkernel.py; parity with the HOF face
    is pinned by tests including a randomized cross-check."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from otrrentetl_spark.operators import textkernel as tk

    def run(it):
        for batch in it:
            tcol = batch.column("text")
            nulls = pc.is_null(tcol).to_numpy(zero_copy_only=False)
            filled = pc.fill_null(tcol, "")
            trimmed = pc.utf8_trim(filled, " ")
            buf, offs = tk.flatten_utf8(trimmed)
            n, l, a, st = tk.doc_metrics(buf, offs)
            rbuf, roffs = tk.flatten_utf8(filled)
            nsym = tk.symbol_counts(rbuf, roffs)
            mask = nulls if nulls.any() else None
            cols = [
                batch.column("doc_id"),
                pa.array(n, pa.int32(), mask=mask),
                pa.array(l, pa.int64(), mask=mask),
                pa.array(a, pa.int32(), mask=mask),
                pa.array(st, pa.int32(), mask=mask),
                pa.array(nsym, pa.int32(), mask=mask),
            ]
            names = ["doc_id", "n", "l", "a", "st", "nsym"]
            for c in keep:
                cols.append(batch.column(c))
                names.append(c)
            yield pa.RecordBatch.from_arrays(cols, names=names)

    schema = "doc_id long, n int, l long, a int, st int, nsym int"
    if keep:
        schema += ", " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in (d.schema[c] for c in keep)
        )
    m = d.select("doc_id", "text", *keep).mapInArrow(run, schema)
    n = F.col("n")
    return m.select(
        "doc_id",
        *keep,
        n.alias("n_words"),
        ((n >= 50) & (n <= 100000)).alias("gate_word_count"),
        ((F.lit(3) * n <= F.col("l")) & (F.col("l") <= F.lit(10) * n)).alias(
            "gate_mean_word_len"
        ),
        (F.lit(10) * F.col("nsym") <= n).alias("gate_symbol_ratio"),
        (F.lit(5) * F.col("a") >= F.lit(4) * n).alias("gate_alpha_words"),
        (F.col("st") >= 2).alias("gate_stopwords"),
    ).withColumn(
        "passes_all",
        F.col("gate_word_count")
        & F.col("gate_mean_word_len")
        & F.col("gate_symbol_ratio")
        & F.col("gate_alpha_words")
        & F.col("gate_stopwords"),
    )


def gopher_quality_gates_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel path of gopher_quality_gates; carries the SAME value
    oracle because the kernel is bit-identical to the expression path
    (parity pinned in tests/test_web_curation.py)."""
    return gopher_gates_kernel(_docs(spark, sf_dir))


# ------------------------------------------- composed curation plan
_BUDGET_FRAC = 0.5  # waterfill: allocate 50% of corpus tokens
_PIPE_CAP = 5  # per-domain cap inside the pipeline (tighter than
# domain_topk_caps' so the cap stage visibly drops documents)


def web_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole web-curation recipe as ONE plan — URL/domain
    derivation → Gopher gates → exact dedup (keep-first) → per-domain
    cap → per-source water-filled token budget — with per-source
    accounting of how many documents each stage kept.

    Scale shape (r5, found at the 1000×/5M-doc fixture): the corpus is
    touched EXACTLY ONCE. The gates/md5/tokenize pass feeds a single
    partial-aggregated groupBy (content hash, source) — no corpus-sized
    window, so no corpus sort anywhere — and that reduced frame
    (≤ one row per distinct content per source, narrow columns, never
    text) is persisted for the duration of the call and consumed by
    every downstream branch. Without the persist, Catalyst prunes a
    different column set under each consumer branch, the exchange
    subtrees stop canonicalizing identically, ReusedExchange never
    fires, and the expensive corpus pass silently re-runs per branch
    (measured 10× DuckDB at the 1000× fixture; one-pass form is ~1×).
    The result is eager: ≤|sources| rows are collected, the persist is
    released in a finally, and a local DataFrame is returned — the
    same bounded-driver-state lifecycle as BPE induction and pagerank.

    Dedup winner per content hash = the gate-passing doc with the
    minimum doc_id (min_by over the masked id — null ordering keys are
    skipped); cap survivor = rank ≤ cap among winners within the
    domain (ordered n_chars DESC, doc_id), ranked with the same salted
    two-level top-N as domain_caps so a mega-domain never lands in one
    window task."""
    d = _docs(spark, sf_dir)
    url = synth_url()
    dom = F.substring_index(F.parse_url(url, F.lit("HOST")), ".", -2)
    # Gate metrics via the Arrow kernel (bit-identical to the HOF face,
    # parity pinned incl. null text) — at 5M docs the interpreted HOF
    # walk alone costs ~2× the kernel. The JVM-side expressions (md5,
    # URL parse) are computed in the scan stage and pass through the
    # Arrow batches as plain values. The BPE token count is NOT
    # computed here: only capped winners need it (domain_caps' lesson,
    # r4 verdict item 2) — its regex over the full corpus was 40 of
    # the pipeline's 56 s at the 1000× fixture; the kept set is
    # re-tokenized after the cap from a doc_id join instead.
    base = gopher_gates_kernel(
        d.select(
            "doc_id", "text", "source", "n_chars",
            dom.alias("reg_domain"),
            F.md5("text").alias("h"),
        ),
        keep=("source", "n_chars", "reg_domain", "h"),
    ).select(
        "doc_id", "source", "n_chars", "reg_domain", "h",
        "passes_all",
    )
    # THE one corpus pass: everything downstream reads this reduced,
    # persisted frame. min_pass is the smallest gate-passing doc_id of
    # the (content, source) group; best is that doc's payload.
    masked_id = F.when(F.col("passes_all"), F.col("doc_id"))
    hs = base.groupBy("h", "source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("passes_all").cast("long")).alias("n_pass"),
        F.min(masked_id).alias("min_pass"),
        F.min_by(
            F.struct("doc_id", "reg_domain", "n_chars"),
            masked_id,
        ).alias("best"),
    ).persist()
    try:
        # dedup winner per content hash: min passing doc_id across the
        # per-source candidates (min_by skips null min_pass groups)
        winners = (
            hs.filter(F.col("min_pass").isNotNull())
            .groupBy("h")
            .agg(
                F.min_by(
                    F.struct("source", "best"), F.col("min_pass")
                ).alias("w")
            )
            .select(
                F.col("w.source").alias("source"),
                F.col("w.best.doc_id").alias("doc_id"),
                F.col("w.best.reg_domain").alias("reg_domain"),
                F.col("w.best.n_chars").alias("n_chars"),
            )
        )
        capped = (
            winners.withColumn(
                "rk1",
                F.row_number().over(
                    W.partitionBy(
                        "reg_domain",
                        F.pmod(F.hash("doc_id"), F.lit(_CAP_SALT)),
                    ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
                ),
            )
            .filter(F.col("rk1") <= _PIPE_CAP)
            .withColumn(
                "rk",
                F.row_number().over(
                    W.partitionBy("reg_domain").orderBy(
                        F.col("n_chars").desc(), F.col("doc_id")
                    )
                ),
            )
            .filter(F.col("rk") <= _PIPE_CAP)
        )
        # tokenize ONLY the kept set: ≤ cap·domains doc_ids join back
        # to the text (AQE broadcasts the tiny kept side; at 100 TB
        # an IO-bound re-scan of the text column beats running the
        # token regex over every document by an order of magnitude)
        kept_tok = capped.join(d.select("doc_id", "text"), "doc_id").select(
            "source",
            text.bpe_token_count("text").alias("n_bpe"),
        )
        cap_by_source = kept_tok.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_capped"),
            F.sum("n_bpe").alias("supply"),
        )
        n_dedup = winners.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_dedup")
        )
        per_source = (
            hs.groupBy("source")
            .agg(
                F.sum("n_rows").alias("n_in"),
                F.sum("n_pass").alias("n_gated"),
            )
            .join(n_dedup, "source", "left")
            .join(cap_by_source, "source", "left")
            .select(
                "source", "n_in", "n_gated",
                F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
                F.coalesce("n_capped", F.lit(0)).alias("n_capped"),
                F.coalesce("supply", F.lit(0)).alias("supply"),
            )
        )
        alloc = waterfill(per_source.select("source", "supply")).select(
            "source", "waterline", "allocated_tok"
        )
        result = (
            per_source.join(alloc, "source")
            .select(
                "source", "n_in", "n_gated", "n_dedup", "n_capped",
                "supply", "allocated_tok",
            )
            .orderBy("source")
        )
        rows = result.collect()  # ≤ |sources| rows — bounded by design
        schema = result.schema
    finally:
        hs.unpersist()
    return spark.createDataFrame(rows, schema)


def _web_pipeline_sql() -> str:
    return rf"""
    WITH base AS (
      SELECT doc_id, source, n_chars, text,
             regexp_extract(regexp_extract({_URL_SQL}, 'https://([^/]+)', 1),
                            '([^.]+\.[^.]+)$', 1) AS reg_domain,
             md5(text) AS h,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
               AS n_bpe,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), gated AS (
      SELECT *,
             (len(toks) >= 50 AND len(toks) <= 100000)
             AND (3 * len(toks)
                    <= COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
                  AND COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
                    <= 10 * len(toks))
             AND (10 * (len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\.\.\.')))
                    <= len(toks))
             AND (5 * len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                    >= 4 * len(toks))
             AND (len(list_filter(toks, t -> lower(t) IN ({_SW_EN_SQL}))) >= 2)
               AS passes_all
      FROM base
    ), flags AS (
      SELECT *,
             passes_all AND doc_id = MIN(CASE WHEN passes_all THEN doc_id END)
               OVER (PARTITION BY h) AS survived_dedup
      FROM gated
    ), capped AS (
      SELECT *,
             survived_dedup
             AND SUM(CASE WHEN survived_dedup THEN 1 ELSE 0 END)
                 OVER (PARTITION BY reg_domain
                       ORDER BY n_chars DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) <= {_PIPE_CAP}
               AS survived_cap
      FROM flags
    ), per_source AS (
      SELECT source,
             COUNT(*) AS n_in,
             SUM(CASE WHEN passes_all THEN 1 ELSE 0 END) AS n_gated,
             SUM(CASE WHEN survived_dedup THEN 1 ELSE 0 END) AS n_dedup,
             SUM(CASE WHEN survived_cap THEN 1 ELSE 0 END) AS n_capped,
             SUM(CASE WHEN survived_cap THEN n_bpe ELSE 0 END) AS supply
      FROM capped GROUP BY source
    ), ranked AS (
      SELECT source, supply,
             ROW_NUMBER() OVER (ORDER BY supply, source) AS k,
             SUM(supply) OVER (ORDER BY supply, source
                               ROWS UNBOUNDED PRECEDING) AS prefix,
             COUNT(*) OVER () AS n,
             SUM(supply) OVER () AS total
      FROM per_source
    ), cand AS (
      SELECT *,
             (CAST(ROUND(total * {_BUDGET_FRAC}) AS DOUBLE)
              - (prefix - supply)) / (n - k + 1) AS lam
      FROM ranked
    ), waterline AS (
      SELECT lam AS waterline FROM cand
      WHERE lam <= supply ORDER BY k LIMIT 1
    )
    SELECT p.source,
           CAST(n_in AS BIGINT) AS n_in,
           CAST(n_gated AS BIGINT) AS n_gated,
           CAST(n_dedup AS BIGINT) AS n_dedup,
           CAST(n_capped AS BIGINT) AS n_capped,
           CAST(supply AS BIGINT) AS supply,
           CAST(FLOOR(LEAST(CAST(supply AS DOUBLE), waterline)) AS BIGINT)
             AS allocated_tok
    FROM per_source p CROSS JOIN waterline ORDER BY p.source
    """


register("web_curation_pipeline", web_curation_pipeline, _web_pipeline_sql())


# --------------------------------------------- budget water-filling


def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a global token budget across
    sources — the balanced-mixing step when small sources should not
    be drowned by large ones: every source gets min(its supply, λ)
    where the waterline λ spends exactly the budget B over the
    unsaturated sources.

    λ is CLOSED-FORM, not iterative: with sources sorted by supply
    ascending, λ_k = (B − prefix_{k−1}) / (n−k+1) per rank, and the
    true waterline is the first rank where λ_k ≤ supply_k. One
    corpus-scale aggregate (per-source token sums, map-side combined
    to |sources| rows), then window prefix sums over the source frame
    and a 1-row waterline broadcast back — the 100 TB cost is the
    scan, everything after is |sources|-sized."""
    d = _docs(spark, sf_dir)
    supplies = d.select(
        "source", text.bpe_token_count("text").alias("t")
    ).groupBy("source").agg(F.sum("t").alias("supply"))
    return waterfill(supplies)


def waterfill(supplies: DataFrame, frac: float = _BUDGET_FRAC) -> DataFrame:
    """Closed-form waterline allocation over a (source, supply) frame —
    factored out so tests can drive skewed hand cases where some
    sources saturate below the waterline."""
    w = W.orderBy("supply", "source")
    ranked = supplies.select(
        "source",
        "supply",
        F.row_number().over(w).alias("k"),
        F.sum("supply").over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "prefix"
        ),
        F.count(F.lit(1)).over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
        F.sum("supply").over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("total"),
    )
    budget = F.round(F.col("total") * F.lit(frac)).cast("double")
    cand = ranked.withColumn(
        "lam",
        (budget - (F.col("prefix") - F.col("supply")))
        / (F.col("n") - F.col("k") + 1),
    )
    # ADVICE r4: distinct name for the un-rounded crossJoin column so
    # the rounded display alias below can't shadow the allocation
    # input (both were called "waterline"; resolution happened to pick
    # the input column, but the shadowing was a trap).
    waterline = (
        cand.filter(F.col("lam") <= F.col("supply"))
        .orderBy("k")
        .limit(1)
        .select(F.col("lam").alias("raw_waterline"))
    )
    return (
        cand.crossJoin(F.broadcast(waterline))
        .select(
            "source",
            "supply",
            round6_portable(F.col("raw_waterline")).alias("waterline"),
            # explicit FLOOR: a bare double→long cast truncates in
            # Spark but rounds in DuckDB — floor is identical in both
            F.floor(
                F.least(F.col("supply").cast("double"), F.col("raw_waterline"))
            ).cast("long").alias("allocated_tok"),
        )
        .orderBy("source")
    )


register(
    "token_budget_waterfill",
    token_budget_waterfill,
    rf"""
    WITH supplies AS (
      SELECT source,
             SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
               AS supply
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT source, supply,
             ROW_NUMBER() OVER (ORDER BY supply, source) AS k,
             SUM(supply) OVER (ORDER BY supply, source
                               ROWS UNBOUNDED PRECEDING) AS prefix,
             COUNT(*) OVER () AS n,
             SUM(supply) OVER () AS total
      FROM supplies
    ), cand AS (
      SELECT *,
             (CAST(ROUND(total * {_BUDGET_FRAC}) AS DOUBLE)
              - (prefix - supply)) / (n - k + 1) AS lam
      FROM ranked
    ), waterline AS (
      SELECT lam AS waterline FROM cand
      WHERE lam <= supply ORDER BY k LIMIT 1
    )
    SELECT source, CAST(supply AS BIGINT) AS supply,
           SIGN(waterline) * FLOOR(ABS(waterline) * 1e6 + 0.5) / 1e6
             AS waterline,
           CAST(FLOOR(LEAST(CAST(supply AS DOUBLE), waterline)) AS BIGINT)
             AS allocated_tok
    FROM cand CROSS JOIN waterline ORDER BY source
    """,
)


# ------------------------------------------------- inverted index
_POSTINGS_CAP = 20
_INDEX_TOP_TERMS = 100


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (the IR primitive under search and
    exact-decontamination tooling): term → document frequency + the
    first K sorted postings, for the top terms by df.

    Scale shape: the postings list is capped BEFORE any collection —
    a row_number window keyed by term keeps K rows per term, so no
    task ever materializes an unbounded posting list for a stopword
    (the classic inverted-index OOM); df comes from a count over the
    same window partition, so the term exchange is computed once and
    reused by the capped collect_list aggregate on the same key.
    Output stringifies the postings (array columns don't hash in the
    driver compare)."""
    d = _docs(spark, sf_dir)
    pairs = (
        d.select(F.explode(text.tokens("text")).alias("term"), "doc_id")
        .filter(F.col("term") != "")
        .distinct()
    )
    w = W.partitionBy("term")
    ranked = pairs.select(
        "term",
        "doc_id",
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("df"),
    )
    return (
        ranked.filter(F.col("rn") <= _POSTINGS_CAP)
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(_INDEX_TOP_TERMS)
    )


register(
    "inverted_index_postings",
    inverted_index_postings,
    rf"""
    WITH pairs AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id,
               UNNEST(CASE WHEN length(trim(text)) = 0
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
        FROM documents
      ) WHERE term <> ''
    ), ranked AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY term) AS df
      FROM pairs
    )
    SELECT term,
           CAST(ANY_VALUE(df) AS BIGINT) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM ranked WHERE rn <= {_POSTINGS_CAP}
    GROUP BY term ORDER BY df DESC, term LIMIT {_INDEX_TOP_TERMS}
    """,
)


# -------------------------------------- content-defined chunking
_CDC_W = 8  # rolling-hash window (chars)
_CDC_MASK = 64  # cut when h % 64 == 0 → expected chunk ≈ 64 chars
_CDC_M = 1_000_000_007


def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rolling-hash cut-point scheme
    under storage dedup and long-document shingling): a Rabin-style
    polynomial hash of each W-char window picks cut points wherever
    h % MASK == 0, so chunk boundaries move WITH the content — an
    insertion reshuffles only nearby chunks, which is what makes
    chunk-hash dedup robust to edits (unlike fixed-width blocks).

    Variant note (engine-portable by construction): EVERY mask
    position cuts — no minimum-chunk-length suppression, which would
    need a sequential scan; boundaries are therefore position-local
    expressions both engines evaluate identically. Per doc the output
    is the chunk count, mean chunk length, and a digest of the chunk
    hash sequence (md5 over per-chunk md5s — the value a chunk-level
    dedup store would key on).

    Scale shape: one narrow projection, zero shuffles, O(n·W) per doc
    inside codegen'd HOFs; no Python anywhere."""
    return cdc_chunks(_docs(spark, sf_dir))


def cdc_chunks(d: DataFrame) -> DataFrame:
    """Body of content_defined_chunks over any (doc_id, text) frame."""
    t = F.col("text")
    n = F.length(t)

    def win_hash(i):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(_CDC_W - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: F.pmod(
                acc * 31 + F.ascii(t.substr(i + j, F.lit(1))).cast("long"),
                F.lit(_CDC_M),
            ),
        )

    # sequence(1, stop) DESCENDS when stop < 1 — guard short texts
    pos = F.when(
        n >= _CDC_W, F.sequence(F.lit(1), n - _CDC_W + 1)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(pos, lambda i: win_hash(i) % _CDC_MASK == 0)
    starts = F.concat(
        F.array(F.lit(1)),
        F.filter(
            F.transform(cuts, lambda c: c + _CDC_W),
            lambda s_: s_ <= n,
        ),
    )
    chunks = bind(
        starts,
        lambda st: F.transform(
            F.sequence(F.lit(1), F.size(st)),
            lambda k: t.substr(
                F.element_at(st, k),
                F.when(
                    k < F.size(st),
                    F.element_at(st, k + 1) - F.element_at(st, k),
                ).otherwise(n - F.element_at(st, k) + 1),
            ),
        ),
    )
    return d.select(
        "doc_id",
        bind(
            chunks,
            lambda ch: F.struct(
                F.when(n > 0, F.size(ch)).otherwise(0).alias("n_chunks"),
                # floor(n*100/k + 0.5): identical binary arithmetic in
                # Spark, DuckDB, and the numpy kernel. F.round would
                # HALF_UP the shortest decimal repr while DuckDB rounds
                # the binary double — 2569/40 = 64.225 flips between
                # 64.23 and 64.22 (code-review r4c finding 1).
                F.when(
                    n > 0,
                    F.floor(
                        n.cast("double") * 100 / F.size(ch) + F.lit(0.5)
                    )
                    / 100,
                )
                .otherwise(0.0)
                .alias("mean_chunk_len"),
                F.md5(
                    F.concat_ws(
                        "", F.transform(ch, lambda c: F.md5(c))
                    )
                ).alias("chunks_digest"),
            ),
        ).alias("g"),
    ).select(
        "doc_id",
        F.col("g.n_chunks").alias("n_chunks"),
        F.col("g.mean_chunk_len").alias("mean_chunk_len"),
        F.col("g.chunks_digest").alias("chunks_digest"),
    )


register(
    "content_defined_chunks",
    content_defined_chunks,
    rf"""
    WITH c AS (
      SELECT doc_id, text AS s, length(text) AS n,
             CASE WHEN length(text) >= {_CDC_W}
                  THEN [i for i in range(1, length(text) - {_CDC_W} + 2)
                        if list_reduce(list_prepend(CAST(0 AS BIGINT),
                             [CAST(ascii(text[i+j]) AS BIGINT)
                              for j in range(0, {_CDC_W})]),
                           (acc, ch) -> (acc * 31 + ch) % {_CDC_M})
                           % {_CDC_MASK} = 0]
                  ELSE [] END AS cuts
      FROM documents
    ), b AS (
      SELECT doc_id, s, n,
             list_prepend(1, [x + {_CDC_W} for x in cuts
                              if x + {_CDC_W} <= n]) AS starts
      FROM c
    ), ch AS (
      SELECT doc_id, s, n, starts,
             [s[starts[k] : CASE WHEN k < len(starts)
                                 THEN starts[k+1] - 1 ELSE n END]
              for k in range(1, len(starts) + 1)] AS chunks
      FROM b
    )
    SELECT doc_id,
           CASE WHEN n > 0 THEN CAST(len(chunks) AS INT) ELSE 0 END
             AS n_chunks,
           CASE WHEN n > 0
                THEN FLOOR(CAST(n AS DOUBLE) * 100 / len(chunks) + 0.5)
                     / 100
                ELSE 0.0 END AS mean_chunk_len,
           md5(array_to_string(list_transform(chunks, x -> md5(x)), ''))
             AS chunks_digest
    FROM ch ORDER BY doc_id
    """,
)


def cdc_chunks_kernel(d: DataFrame) -> DataFrame:
    """Arrow-kernel perf twin of cdc_chunks — the LSH-banding pattern:
    the HOF expression path stays the oracle reference; this mapInPandas
    kernel computes BIT-IDENTICAL output (same Horner hash, same mod,
    same cuts, same digests) with the rolling hash vectorized in numpy
    (W shifted multiply-adds over the whole code-point array instead of
    n·W interpreted lambda evaluations — the expression path is
    compute-bound at 100× docs). Code points come from utf-32 decoding,
    exactly what ascii() returns per char in both engines."""
    import hashlib

    import numpy as np
    import pandas as pd

    w, mask, m = _CDC_W, _CDC_MASK, _CDC_M

    def run(it):
        for pdf in it:
            rows = []
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                n = len(s)
                if n == 0:
                    # expression-path parity: an empty text still
                    # yields one empty chunk in the digest chain
                    empty = hashlib.md5(
                        hashlib.md5(b"").hexdigest().encode()
                    ).hexdigest()
                    rows.append((doc_id, 0, 0.0, empty))
                    continue
                codes = np.frombuffer(
                    s.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                starts = [0]
                if n >= w:
                    L = n - w + 1
                    acc = codes[0:L] % m
                    for j in range(1, w):
                        acc = (acc * 31 + codes[j : j + L]) % m
                    cuts = np.nonzero(acc % mask == 0)[0]  # 0-based
                    starts += [int(c) + w for c in cuts if c + w < n]
                digest = hashlib.md5()
                bounds = starts + [n]
                for a, b in zip(bounds, bounds[1:]):
                    digest.update(
                        hashlib.md5(s[a:b].encode("utf-8"))
                        .hexdigest()
                        .encode()
                    )
                # same operation ORDER as the expression/oracle form
                # (n*100 first, ONE division) so the double is
                # bit-identical before the floor
                mean_len = np.floor(n * 100.0 / len(starts) + 0.5) / 100
                rows.append(
                    (doc_id, len(starts), float(mean_len), digest.hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_chunks", "mean_chunk_len", "chunks_digest",
                ],
            )

    return d.mapInPandas(
        run,
        "doc_id long, n_chunks int, mean_chunk_len double,"
        " chunks_digest string",
    )


def content_defined_chunks_fast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kernel path of content_defined_chunks; carries the SAME value
    oracle because the kernel is bit-identical to the expression path
    (parity pinned in tests/test_web_curation.py)."""
    from otrrentetl_spark.catalog import fan_out

    return cdc_chunks_kernel(
        fan_out(
            _docs(spark, sf_dir).select("doc_id", "text"),
            memo_key=f"documents:{sf_dir}",
        )
    )


from otrrentetl_spark.registry import ORACLES as _ORACLES  # noqa: E402

register(
    "content_defined_chunks_fast",
    content_defined_chunks_fast,
    # the kernel is bit-identical to the expression path, so it carries
    # the expression path's full value oracle (LSH-kernel precedent)
    _ORACLES["content_defined_chunks"],
)

register(
    "gopher_quality_gates_fast",
    gopher_quality_gates_fast,
    # bit-identical kernel twin — carries the expression path's oracle
    _ORACLES["gopher_quality_gates"],
)


# ----------------------------------------------- snapshot diff (CDC)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture bookkeeping between two corpus snapshots —
    the first question of every incremental crawl ingest: what was
    added, deleted, changed, unchanged since last time? Snapshot B is
    derived deterministically from A (doc_id%7 deleted, %5 text
    revised, %11 re-keyed as new docs above the id space) so the oracle sees the same two
    states; the operator itself is the production shape: full-outer
    join on the key, content-hash equality for change detection, one
    aggregate over the change status. The synthetic 'new' ids offset by
    2e9 — above any fixture's replica id space — so snapshot B never
    contains duplicate keys.

    Scale shape: comparing 100 TB snapshots never compares text —
    each side reduces to (key, md5) in the scan projection, the
    full-outer join shuffles only those ~48-byte rows, and the status
    aggregate map-combines to 4 rows. With both snapshots stored
    bucketed by doc_id the join needs no shuffle at all (the
    bucketed_colocated_join pattern)."""
    a = _docs(spark, sf_dir).select("doc_id", "text", "n_chars")
    b = (
        a.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            a.filter(F.col("doc_id") % 11 == 0).select(
                # offset far above any scale-fixture replica id space
                # (base + r*1e6 for r <= 1000) so re-keyed docs can
                # never collide with real ids (code-review r4c #5);
                # tools/scale_fixture.py enforces max(doc_id) < 2e9
                # so the invariant can't silently break (ADVICE r4)
                (F.col("doc_id") + 2_000_000_000).alias("doc_id"), "text"
            )
        )
    )
    ah = a.select("doc_id", F.md5("text").alias("ha"))
    bh = b.select("doc_id", F.md5("text").alias("hb"))
    status = (
        F.when(F.col("ha").isNull(), F.lit("added"))
        .when(F.col("hb").isNull(), F.lit("deleted"))
        .when(F.col("ha") != F.col("hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        ah.join(bh, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


register(
    "corpus_snapshot_diff",
    corpus_snapshot_diff,
    """
    WITH a AS (SELECT doc_id, text FROM documents),
    b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' rev' ELSE text END AS text
      FROM a WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 2000000000 AS doc_id, text FROM a WHERE doc_id % 11 = 0
    ),
    ah AS (SELECT doc_id, md5(text) AS ha FROM a),
    bh AS (SELECT doc_id, md5(text) AS hb FROM b),
    j AS (
      SELECT CASE WHEN ha IS NULL THEN 'added'
                  WHEN hb IS NULL THEN 'deleted'
                  WHEN ha <> hb THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM ah FULL OUTER JOIN bh USING (doc_id)
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY status ORDER BY status
    """,
)


# ------------------------------------------------ BPE merge induction
_BPE_MERGES = 6


def _merge_pair(s, a, b):
    """One BPE merge applied to a symbol array: fuse every adjacent
    (a, b) into a||b. Candidacy excludes self-pairs (a == b), so
    matches can never overlap and the rewrite is position-local:
    drop the b of every match, rewrite the a to a||b. Boundary probes
    go through CASE WHEN (guaranteed conditional evaluation) because
    even try_element_at rejects index 0 under ANSI."""
    idx = F.sequence(F.lit(1), F.size(s))
    # the drop predicate must be FALSE (not NULL) at i=1: a bare
    # `when(i>1, prev) == a` yields NULL there, and filter() drops
    # NULL rows — which would silently eat a first symbol equal to b
    # (three-valued-logic bug caught by self-review; DuckDB's
    # `i > 1 AND ...` resolves FALSE for the same row)
    kept = F.filter(
        idx,
        lambda i: ~F.when(
            i > F.lit(1),
            (F.element_at(s, i - 1) == a) & (F.element_at(s, i) == b),
        ).otherwise(F.lit(False)),
    )
    return F.transform(
        kept,
        lambda i: F.when(
            (F.element_at(s, i) == a)
            & (F.when(i < F.size(s), F.element_at(s, i + 1)) == b),
            F.concat(a, b),
        ).otherwise(F.element_at(s, i)),
    )


def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first K merge rules of a BPE tokenizer from the
    corpus's own word frequencies (Sennrich-style byte-pair encoding —
    the vocabulary-induction step of building a tokenizer): start from
    character symbols, repeatedly fuse the most frequent adjacent
    symbol pair (frequency-weighted by word count), and emit the merge
    table (rank, pair, fused symbol, pair count).

    Two portability choices, mirrored in the oracle: words normalize
    to [a-z0-9]+ (symbols stay regex/engine-safe), and self-pairs
    (a == b) are excluded from candidacy — with a ≠ b adjacent matches
    can never overlap, so greedy left-to-right merging equals
    independent position-local rewriting, which BOTH engines can
    express without sequential scans. Ties break (count DESC, a, b).

    Scale shape (the iterative-operator pattern, like graph_pagerank):
    ONE corpus-scale aggregate — the word-frequency table, map-side
    combined to vocabulary size before its exchange — then every
    iteration runs on the vocabulary-sized segmentation frame (HOF
    pair explode → partial-agg count → 1-row argmax collect, bounded
    driver state). K iterations touch the corpus zero more times."""
    return bpe_merges(_docs(spark, sf_dir), spark)


# how many top candidates one batched round collects (bounded driver
# state: at most _BPE_BATCH_MAX rows of (a, b, cnt, ub) per round).
# The size ADAPTS to the provable-equivalence acceptance rate (r5
# verdict item 7): a round that accepts its WHOLE batch was ended by
# the cap, not by the soundness rules, so the next round doubles; a
# round accepting under a quarter of its batch halves it (collecting
# candidates the rules will reject is wasted sort+collect). The
# accepted sequence itself is invariant under the batch size — the
# rules only ever admit a prefix equal to sequential BPE's picks —
# so adaptation changes round count, never output.
_BPE_BATCH_M = 32
_BPE_BATCH_MIN = 8
_BPE_BATCH_MAX = 1024
# rounds the last bpe_merges call executed — perf instrumentation for
# the batching regression test / 100× measurement (r4 verdict item 8)
_LAST_BPE_ROUNDS = 0


def _bpe_pairs(segs: DataFrame) -> DataFrame:
    # the size guard lives INSIDE the expression (when/otherwise),
    # not in a trailing .filter(): relying on the optimizer to push
    # the filter below the Generate is not guaranteed semantics —
    # sequence(1, 0) DESCENDS and element_at(s, 0) throws for
    # single-symbol segmentations (code-review r4c finding 2)
    return segs.select(
        "n",
        F.explode(
            F.when(
                F.size("s") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("s"), i).alias("a"),
                        F.element_at(F.col("s"), i + 1).alias("b"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<a:string,b:string>>")
            )
        ).alias("p"),
    ).select("n", "p.a", "p.b")


def bpe_merges(
    d: DataFrame,
    spark: SparkSession,
    k: int = _BPE_MERGES,
    batched: bool = True,
    adapt: bool = True,
) -> DataFrame:
    """DataFrame face of :func:`_bpe_merge_list` (the registry/test
    surface; the encode path consumes the driver-side list directly)."""
    return spark.createDataFrame(
        _bpe_merge_list(d, spark, k=k, batched=batched, adapt=adapt),
        "merge_rank int, left string, right string, merged string,"
        " pair_count long",
    )


def _bpe_merge_list(
    d: DataFrame,
    spark: SparkSession,
    k: int = _BPE_MERGES,
    batched: bool = True,
    adapt: bool = True,
) -> list[tuple]:
    """Body of bpe_merge_induction over any (text) frame — factored
    out so tests can drive hand-computable corpora. Returns the merge
    table as driver rows (rank order): it is ≤ k rows by construction
    and already lives on the driver, so callers that only need the
    rules (bpe_encode) skip a createDataFrame→collect round trip.

    ``batched=True`` (the default) accepts SEVERAL merges per round
    (r4 verdict item 8) while provably reproducing the one-merge-per-
    round sequence the SQL oracle replays. Per round it collects the
    top-M candidates plus, for each, an upper bound on any pair count
    its merge can CREATE (max symbol-triple count containing the pair
    — a new pair (x, ab) or (ab, y) needs the triple x·a·b or a·b·y),
    then greedily accepts a PREFIX of the sorted candidates while:

      - the candidate's symbols are disjoint from every earlier
        accepted merge's {a, b, merged} (its count is then provably
        unchanged by applying them), and
      - its count strictly exceeds every earlier accepted merge's
        new-pair upper bound (nothing created can out-rank it, even
        by tie-break), and
      - its merged string is not an already-existing multi-char
        symbol (tracked exactly driver-side: merges are the only way
        multi-char symbols arise), so no old pair's count can be
        inflated by name collision — a colliding TOP candidate is
        still applied, alone in its own round, exactly as the
        sequential reference would.

    The first violation STOPS the batch (a skipped higher-count pair
    would have been sequential BPE's next pick). Worst case every
    round accepts one merge and the behavior degenerates to the
    sequential loop; typically rounds shrink ~2-3× and the corpus-
    and vocabulary-scale work per round is unchanged (one extra
    vocabulary-sized triple aggregate)."""
    global _LAST_BPE_ROUNDS
    word = F.regexp_replace(F.lower(F.col("t")), "[^a-z0-9]", "")
    wf = (
        d.select(F.explode(text.tokens("text")).alias("t"))
        .select(word.alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # localCheckpoint (not persist): persist materializes but KEEPS
    # lineage, so after R rounds the logical plan holds every prior
    # round's merge Projects and per-round analysis/optimization cost
    # — and the driver memory for plan tree strings — grows O(R²)
    # overall (the second half of the r6 1k-merge crash). Checkpointing
    # truncates the plan to a LogicalRDD each round; superseded
    # checkpoint blocks are released by the ContextCleaner when the
    # previous round's frame goes out of scope. segs is vocabulary-
    # scale (distinct words), far below corpus scale, so the blocks
    # are small at any SF.
    #
    # eager=False (r13, guide §1.2 job-count — the connected-components
    # one-action-per-round pattern): an eager checkpoint is its own
    # Spark job, so every round paid TWO actions (materialize + the
    # candidate collect). Lazily marked, the checkpoint materializes
    # inside the SAME action as the round's collect — the marked RDD is
    # storage-backed from first computation, so the pairs and triples
    # subtrees that both read it within that one action still compute
    # it once — and the final round's never-consumed frame skips its
    # materialization job entirely. Plan truncation is unchanged
    # (localCheckpoint wraps the RDD in a LogicalRDD at call time,
    # eager or not).
    segs = wf.select(
        "n",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("s"),
    ).localCheckpoint(eager=False)

    merges: list[tuple] = []
    vocab_extra: set[str] = set()  # every multi-char symbol in segs
    rounds = 0
    m = _BPE_BATCH_M  # adaptive batch size (see the constant block)
    while len(merges) < k:
        rounds += 1
        pairs = _bpe_pairs(segs).filter(F.col("a") != F.col("b"))
        cand_df = (
            pairs.groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(m if batched else 1)
        )
        if batched:
            # per-candidate upper bound on created-pair counts: the
            # max weighted triple count having the pair on its right
            # (x·a·b → new pair (x, ab)) or left (a·b·y → (ab, y));
            # a created (m_i, m_j) adjacency needs b_i·a_j·b_j, which
            # the right-form bound of candidate j already covers
            triples = (
                segs.select(
                    "n",
                    F.explode(
                        F.when(
                            F.size("s") >= 3,
                            F.transform(
                                F.sequence(F.lit(1), F.size("s") - 2),
                                lambda i: F.struct(
                                    F.element_at(F.col("s"), i).alias("x"),
                                    F.element_at(F.col("s"), i + 1).alias("y"),
                                    F.element_at(F.col("s"), i + 2).alias("z"),
                                ),
                            ),
                        ).otherwise(
                            F.array().cast(
                                "array<struct<x:string,y:string,z:string>>"
                            )
                        )
                    ).alias("t3"),
                )
                .select("n", "t3.x", "t3.y", "t3.z")
                .groupBy("x", "y", "z")
                .agg(F.sum("n").alias("tc"))
            )
            ub_r = (
                triples.groupBy("y", "z")
                .agg(F.max("tc").alias("ubr"))
                .withColumnRenamed("y", "ra")
                .withColumnRenamed("z", "rb")
            )
            ub_l = (
                triples.groupBy("x", "y")
                .agg(F.max("tc").alias("ubl"))
                .withColumnRenamed("x", "la")
                .withColumnRenamed("y", "lb")
            )
            rows = (
                cand_df.join(
                    ub_r,
                    (F.col("a") == F.col("ra")) & (F.col("b") == F.col("rb")),
                    "left",
                )
                .join(
                    ub_l,
                    (F.col("a") == F.col("la")) & (F.col("b") == F.col("lb")),
                    "left",
                )
                .select("a", "b", "cnt", "ubr", "ubl")
                .orderBy(F.col("cnt").desc(), "a", "b")
                .collect()
            )
        else:
            rows = cand_df.collect()
        if not rows:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        max_new_ub = -1
        for r in rows:
            a, b, cnt = r["a"], r["b"], r["cnt"]
            if accepted and cnt <= max_new_ub:
                break  # something a prior merge creates could outrank
            if a in used or b in used:
                break  # count would change under the prior merges
            collides = a + b in vocab_extra
            if collides and accepted:
                break  # name collision could inflate old pair counts
            accepted.append((a, b, cnt))
            used.update((a, b, a + b))
            if collides:
                # A colliding top candidate is still THE top candidate:
                # the sequential reference applies it unconditionally
                # (symbol identity IS string concatenation there too),
                # so apply it alone in its own round — only batching
                # further merges behind it would be unsound. (Breaking
                # with accepted empty — the pre-r5 behavior — would
                # truncate the learner below k merges and diverge from
                # the oracle.) Believed unreachable in practice:
                # symbols never split, so any intact occurrence of the
                # merged string evolves identically to the one that
                # produced the vocab entry and is already one symbol;
                # a 600k-random-corpus search found no trigger. Kept
                # as a guard because batching soundness depends on it.
                break
            if batched:
                max_new_ub = max(
                    max_new_ub, r["ubr"] or 0, r["ubl"] or 0
                )
            if len(merges) + len(accepted) >= k or not batched:
                break
        if not accepted:
            break
        if batched and adapt and len(merges) + len(accepted) < k:
            # adapt the NEXT round's collect: saturation ⇒ the cap
            # ended the batch — double; < 25% acceptance ⇒ the rules
            # did — shrink (output is invariant either way)
            if len(accepted) >= m:
                m = min(m * 2, _BPE_BATCH_MAX)
            elif len(accepted) * 4 < m:
                m = max(m // 2, _BPE_BATCH_MIN)
        # Apply each accepted merge as its OWN projection over the
        # previous (r6 verdict item 1): _merge_pair references its
        # input array ~7 times, so folding a batch into one nested
        # expression grows the tree ~7^batch and its lambda nesting
        # exceeds the Catalyst analyzer's 100-iteration Resolution
        # fixed point at large batches (the 1k-merge crash in
        # /tmp/bpe_adapt.log). Chained Projects grow LINEARLY, resolve
        # in one analyzer pass, and compute every intermediate array
        # once instead of ~7× per nesting level; CollapseProject will
        # not re-nest them (the inner expression is non-cheap and
        # multiply referenced). Output is identical: the chain is the
        # same function composition in the same order.
        new_segs = segs
        for a, b, cnt in accepted:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
            vocab_extra.add(a + b)
            new_segs = new_segs.select(
                "n",
                _merge_pair(F.col("s"), F.lit(a), F.lit(b)).alias("s"),
            )
        segs = new_segs.localCheckpoint(eager=False)
    _LAST_BPE_ROUNDS = rounds
    return merges


def _bpe_ladder_sql(k: int) -> str:
    """The shared learn-chain CTEs: toks/wf/segs0, then per round r
    pairs{r} (adjacent symbol pairs), best{r} (the single top merge
    under the count-desc, (a,b)-asc tie-break) and segs{r} (the merge
    applied left-to-right, overlap-free). Both the merge-table oracle
    and the encode oracle build on the same ladder."""
    base = r"""
    WITH toks AS (
      SELECT regexp_replace(lower(UNNEST(
               CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END)),
             '[^a-z0-9]', '', 'g') AS word
      FROM documents
    ), wf AS (
      SELECT word, COUNT(*) AS n FROM toks
      WHERE length(word) >= 2 GROUP BY word
    ), segs0 AS (
      SELECT n, [word[i] for i in range(1, len(word)+1)] AS s FROM wf
    )"""
    blocks = []
    for r in range(1, k + 1):
        p = r - 1
        blocks.append(f"""
    , pairs{r} AS (
      SELECT n, UNNEST([{{'a': s[i], 'b': s[i+1]}}
                        for i in range(1, len(s))], recursive := true)
      FROM segs{p} WHERE len(s) >= 2
    ), best{r} AS (
      SELECT a, b, SUM(n) AS cnt FROM pairs{r} WHERE a <> b
      GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    ), segs{r} AS (
      SELECT n,
             [CASE WHEN s[i] = bb.a AND i < len(s) AND s[i+1] = bb.b
                   THEN bb.a || bb.b ELSE s[i] END
              for i in range(1, len(s)+1)
              if NOT (i > 1 AND s[i-1] = bb.a AND s[i] = bb.b)] AS s
      FROM segs{p} CROSS JOIN best{r} bb
    )""")
    return base + "".join(blocks)


def _bpe_oracle_sql(k: int = _BPE_MERGES) -> str:
    finals = [
        f"SELECT {r} AS merge_rank, a AS \"left\", b AS \"right\","
        f" a || b AS merged, CAST(cnt AS BIGINT) AS pair_count"
        f" FROM best{r}"
        for r in range(1, k + 1)
    ]
    return _bpe_ladder_sql(k) + "\n" + "\nUNION ALL\n".join(finals)


register("bpe_merge_induction", bpe_merge_induction, _bpe_oracle_sql())


def bpe_encode(
    d: DataFrame, spark: SparkSession, k: int = _BPE_MERGES
) -> DataFrame:
    """Encode the corpus with its OWN learned BPE merges — the apply
    half of BPE (``bpe_merges`` learns the table; this tokenizes with
    it), i.e. the training pipeline's "token count under the trained
    tokenizer" step (reference analogue: the per-item token budgeting
    the ETL applies before upload, otrrentetl/server/etl.py).

    Per document: ``n_words`` (normalized whitespace words, empties
    dropped) and ``n_tokens`` (total BPE symbols after applying the
    learned merges in rank order). Documents with no words — empty,
    NULL, or all-symbol text — report 0/0.

    Scale shape: the merge table is k driver rows by construction;
    the merge chain is applied once per DISTINCT word (vocabulary
    scale, Zipf-small vs token volume) as k chained Projects, exactly
    the learn loop's analyzer-safe shape; the probe join ships the
    encoded vocabulary to the token stream (AQE broadcasts under the
    threshold, hash-join fallback past it — the surprisal probe's
    plan); the per-doc aggregate map-combines to ≈ one row per doc
    before its exchange. The corpus is tokenized twice (vocabulary
    build + probe) — two embarrassingly-parallel codegen scans,
    deliberately preferred over carrying doc_id through the merge
    chain, which would run the k-fold array rewrite at token volume
    instead of vocabulary volume."""
    # rank-ordered driver rows straight from the learner — no
    # createDataFrame → orderBy → collect round trip (r13): the merge
    # table is ≤ k driver tuples by construction
    ranked = _bpe_merge_list(d, spark, k=k)
    word = F.regexp_replace(F.lower(F.col("t")), "[^a-z0-9]", "")
    occurrences = (
        d.select("doc_id", F.explode(text.tokens("text")).alias("t"))
        .select("doc_id", word.alias("word"))
        .filter(F.length("word") >= 1)
    )
    enc = (
        occurrences.select("word")
        .distinct()
        .select(
            "word",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ).alias("s"),
        )
    )
    for _rank, left, right, _merged, _cnt in ranked:
        enc = enc.select(
            "word",
            _merge_pair(F.col("s"), F.lit(left), F.lit(right)).alias("s"),
        )
    wtoks = enc.select("word", F.size("s").cast("long").alias("w_toks"))
    per_doc = (
        occurrences.join(wtoks, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_toks").alias("n_tokens"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of :func:`bpe_encode` over the documents table."""
    return bpe_encode(_docs(spark, sf_dir), spark, k=_BPE_MERGES)


def _bpe_encode_oracle_sql(k: int = _BPE_MERGES) -> str:
    """Replays the learn ladder, then applies best1..bestK to every
    distinct word of the corpus (length-1 words included: they carry
    no pairs, so the merge chain passes them through) and aggregates
    token counts per document."""
    enc_blocks = [r"""
    , dw AS (
      SELECT doc_id, regexp_replace(lower(UNNEST(
               CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END)),
             '[^a-z0-9]', '', 'g') AS word
      FROM documents
    ), dwf AS (
      SELECT doc_id, word FROM dw WHERE length(word) >= 1
    ), enc0 AS (
      SELECT word, [word[i] for i in range(1, len(word)+1)] AS s
      FROM (SELECT DISTINCT word FROM dwf) v
    )"""]
    for r in range(1, k + 1):
        p = r - 1
        enc_blocks.append(f"""
    , enc{r} AS (
      SELECT word,
             [CASE WHEN s[i] = bb.a AND i < len(s) AND s[i+1] = bb.b
                   THEN bb.a || bb.b ELSE s[i] END
              for i in range(1, len(s)+1)
              if NOT (i > 1 AND s[i-1] = bb.a AND s[i] = bb.b)] AS s
      FROM enc{p} CROSS JOIN best{r} bb
    )""")
    final = f"""
    SELECT d.doc_id,
           CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_words, SUM(w_toks) AS n_tokens
      FROM dwf JOIN (SELECT word, len(s) AS w_toks FROM enc{k}) w
        USING (word)
      GROUP BY doc_id
    ) a USING (doc_id)
    ORDER BY doc_id"""
    return _bpe_ladder_sql(k) + "".join(enc_blocks) + final


register("bpe_encode_corpus", bpe_encode_corpus, _bpe_encode_oracle_sql())


# --------------------------------------------------- bigram LM fluency
# Kernel-vs-expression dispatch bound (see llm_ops._PROBE_MODEL_CAP:
# the kernel ships model arrays exactly where a broadcast join would
# ship its build side; past the cap the expression face carries the
# query with its AQE-demoting joins).
_BIGRAM_MODEL_CAP = 4_000_000


def text_bigram_surprisal_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency scored by the corpus's own BIGRAM model —
    the order-2 upgrade of text_unigram_surprisal: each transition
    (w1→w2) contributes its conditional probability
    P(w2|w1) = bf(w1,w2)/uf(w1), and the document score is the mean
    transition probability (monotone inverse of bigram surprisal, no
    log so no libm portability hazard).

    Determinism: each P is quantized to 1e-9 (round(1e9·bf/uf) as a
    long — bf ≤ uf so every item ≤ 1e9) and summed exactly in longs;
    the per-doc sum is bounded by 1e9 × doc length, independent of
    corpus size. Mirrored op-for-op in the oracle.

    This face is the ORACLE twin of `text_bigram_surprisal` and its
    unconditional-scale path. Scale shape: ZERO token-volume
    shuffles. The bigram count bf map-side-combines to vocabulary
    size before its exchange; the unigram context count uf = Σ_w2 bf
    derives from bf via a vocabulary-sized window (identical to
    re-counting — never rescans the corpus); the scoring join probes
    the token stream against the broadcast model (AQE demotes past
    the threshold); the per-doc aggregate map-combines to ≈ one row
    per doc before its exchange. The corpus is tokenized twice (model
    build + probe) — two embarrassingly-parallel codegen scans,
    deliberately chosen over a per-(doc,w1,w2) pre-aggregate that
    would tokenize once but shuffle the full token volume (measured
    equal at sf0.1; the shuffle loses at cluster scale where network,
    not scan CPU, is the scarce resource)."""
    d = _docs(spark, sf_dir)
    pairs = d.select(
        "doc_id",
        F.explode(
            bind(
                text.tokens("text"),
                lambda tk: F.when(
                    F.size(tk) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - 1),
                        lambda i: F.struct(
                            F.element_at(tk, i).alias("w1"),
                            F.element_at(tk, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bf = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bf"))
    model = bf.withColumn("uf", F.sum("bf").over(W.partitionBy("w1")))
    p9 = F.round(
        F.lit(1e9) * F.col("bf").cast("double") / F.col("uf").cast("double")
    ).cast("long")
    return (
        pairs.join(model.select("w1", "w2", p9.alias("p9")), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("p9").alias("s9"))
        .select(
            "doc_id",
            "n_bigrams",
            round6_portable(
                F.col("s9").cast("double") / F.lit(1e9) / F.col("n_bigrams")
            ).alias("mean_trans_p"),
        )
    )


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram fluency — kernel face. Same values as
    `text_bigram_surprisal_expr` (the oracle twin; see its docstring
    for the scoring semantics), with the model/probe restructured so
    NO per-pair string ever crosses an exchange or a join
    (r5 verdict item 1: this query sat at 3.5-5× DuckDB at the
    adversarial 1000× fixture, whose per-replica suffix tokens make
    distinct bigrams grow linearly and pushed the model past any
    broadcast threshold):

    1. the token VOCABULARY (with the split()-edge empty token — the
       bigram stream keeps leading/trailing empties) is counted and,
       under the cap, collected and shipped once per worker;
    2. a mapInArrow pass emits per-partition (bigram-code, count)
       pairs — codes are ints (left·|V|+right), deduplicated per
       partition in C (np.unique), so the bf exchange carries ≈
       per-partition-distinct int64 rows instead of 270M string
       pairs;
    3. bf→p9 arithmetic runs IN SPARK on the vocabulary-sized model
       frame (uf window, round(1e9·bf/uf)) — bit-identical to the
       expression face because it IS the same expression;
    4. the judge-suggested singleton split, made exact: only the
       bf ≥ 2 model rows are collected for the probe (the singleton
       mass — dominant in the adversarial fixture — stays out), and
       a probe pair missing from that set has bf == 1 BY
       CONSTRUCTION (same corpus, same tokenization), so its p9 is
       the vocabulary-indexed round(1e9/uf(w1)) array, also computed
       in Spark;
    5. the probe pass re-derives pair codes and reduces per doc with
       exact int64 cumsums; a final Spark select applies the
       identical rounding expression.

    Past the cap — models too big to ship, where a join must shuffle
    anyway — the expression face runs unchanged. Measured at the
    5M-doc 1000× sink harness: 72.4 s (r5 expression plan) → 20.6 s
    vs DuckDB 12.3 s = 1.68× (was 3.5-5×)."""
    d = _docs(spark, sf_dir)
    vocab_df = d.select(
        F.explode(text.tokens("text")).alias("term")
    ).distinct()
    # ONE job for the vocabulary: limit(cap+1) bounds the driver
    # collect by construction AND doubles as the cap probe (cap+1
    # rows back ⇒ over the cap ⇒ expression face). A separate
    # count-then-collect pays the corpus tokenize twice (measured
    # 10.4 s + 6.5 s of this query's 48 s at the 1000× fixture).
    # toArrow(): columnar driver transport, not 4M py4j Rows (r6 item 5)
    vtbl = vocab_df.limit(_BIGRAM_MODEL_CAP + 1).toArrow()
    if vtbl.num_rows > _BIGRAM_MODEL_CAP:
        return text_bigram_surprisal_expr(spark, sf_dir)
    terms = vtbl.column("term").to_pylist()
    if "" not in terms:
        terms.append("")
    empty_code = terms.index("")
    v = len(terms)
    bc = spark.sparkContext.broadcast(terms)

    def count_pairs(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from otrrentetl_spark.operators import textkernel as tk

        vocab_arr = pa.array(bc.value, pa.string())
        # dedup PER BATCH and let the downstream groupBy finish the
        # reduction (map-side partial agg absorbs cross-batch dups):
        # buffering every key of the partition before one np.unique
        # grows executor memory with partition TOKEN count — a skewed
        # partition could OOM even under the model cap (ADVICE r6)
        for batch in it:
            trimmed = pc.utf8_trim(
                pc.fill_null(batch.column("text"), ""), " "
            )
            keys, _, _ = tk.doc_bigram_keys(trimmed, vocab_arr, empty_code)
            if len(keys):
                uniq, cnt = np.unique(keys, return_counts=True)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(uniq, pa.int64()),
                     pa.array(cnt.astype(np.int64), pa.int64())],
                    names=["key", "cnt"],
                )

    bf = (
        d.select("text")
        .mapInArrow(count_pairs, "key long, cnt long")
        .groupBy("key")
        .agg(F.sum("cnt").alias("bf"))
    )
    # ONE corpus pass for the whole model: bf (compact int64
    # (key, bf) rows — 16 bytes per distinct bigram, disk-spillable)
    # is persisted, the cap probe counts it, and the m2 + singles
    # collects both read the cache instead of re-running the scan.
    # Collecting them from separate lineages re-ran the corpus
    # tokenize per collect (Catalyst prunes different columns under
    # each consumer, so the exchange never canonicalizes for reuse) —
    # 3 of this query's 5 scans, 25.6 of 48 s at the 1000× fixture.
    from pyspark import StorageLevel

    bf = bf.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if bf.count() > _BIGRAM_MODEL_CAP:
            return text_bigram_surprisal_expr(spark, sf_dir)
        model = bf.withColumn("w1", F.expr(f"key div {v}")).withColumn(
            "uf", F.sum("bf").over(W.partitionBy("w1"))
        )
        p9 = F.round(
            F.lit(1e9)
            * F.col("bf").cast("double")
            / F.col("uf").cast("double")
        ).cast("long")
        m2 = model.filter(F.col("bf") >= 2).select("key", p9.alias("p9"))
        singles = model.select("w1", "uf").distinct().select(
            "w1",
            F.round(F.lit(1e9) / F.col("uf").cast("double"))
            .cast("long")
            .alias("p9"),
        )
        import numpy as np

        # Arrow transport for the capped models (r6 verdict item 5):
        # toArrow() → numpy, instead of materializing up to 4M py4j
        # Row objects on the driver
        m2_tbl = m2.toArrow()
        m2_keys = (
            m2_tbl.column("key")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        m2_p9 = (
            m2_tbl.column("p9")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        order = np.argsort(m2_keys)
        m2_keys, m2_p9 = m2_keys[order], m2_p9[order]
        s_tbl = singles.toArrow()
        p9_single = np.full(v, -1, dtype=np.int64)
        p9_single[
            s_tbl.column("w1")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        ] = (
            s_tbl.column("p9")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
    finally:
        bf.unpersist()
    bcm = spark.sparkContext.broadcast(
        (m2_keys, m2_p9, p9_single, empty_code)
    )

    def probe(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from otrrentetl_spark.operators import textkernel as tk

        vocab_arr = pa.array(bc.value, pa.string())
        keys2, p92, psing, ecode = bcm.value
        for batch in it:
            trimmed = pc.utf8_trim(
                pc.fill_null(batch.column("text"), ""), " "
            )
            keys, doc_of_pair, m = tk.doc_bigram_keys(
                trimmed, vocab_arr, ecode
            )
            n_pairs = np.maximum(m - 1, 0)
            if len(keys):
                pos = np.searchsorted(keys2, keys)
                pos_c = np.minimum(pos, max(len(keys2) - 1, 0))
                found = (
                    (keys2[pos_c] == keys) if len(keys2) else
                    np.zeros(len(keys), dtype=bool)
                )
                left = keys // np.int64(v)
                pvals = np.where(found, p92[pos_c] if len(keys2) else 0,
                                 psing[left])
                if (pvals < 0).any():
                    raise ValueError("bigram context missing from model")
                cs = np.zeros(len(pvals) + 1, dtype=np.int64)
                np.cumsum(pvals, out=cs[1:])
                bounds = np.zeros(len(m) + 1, dtype=np.int64)
                np.cumsum(n_pairs, out=bounds[1:])
                s9 = cs[bounds[1:]] - cs[bounds[:-1]]
            else:
                s9 = np.zeros(len(m), dtype=np.int64)
            keep = n_pairs > 0
            yield pa.RecordBatch.from_arrays(
                [
                    pc.filter(batch.column("doc_id"), pa.array(keep)),
                    pa.array(n_pairs[keep], pa.int64()),
                    pa.array(s9[keep], pa.int64()),
                ],
                names=["doc_id", "n_bigrams", "s9"],
            )

    per_doc = d.select("doc_id", "text").mapInArrow(
        probe, "doc_id long, n_bigrams long, s9 long"
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        round6_portable(
            F.col("s9").cast("double") / F.lit(1e9) / F.col("n_bigrams")
        ).alias("mean_trans_p"),
    )


register(
    "text_bigram_surprisal",
    text_bigram_surprisal,
    r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), pairs AS (
      SELECT doc_id,
             UNNEST(CASE WHEN len(toks) >= 2
                    THEN [{'w1': toks[i], 'w2': toks[i+1]}
                          for i in range(1, len(toks))]
                    ELSE [] END, recursive := true)
      FROM base
    ), bf AS (SELECT w1, w2, COUNT(*) AS bf FROM pairs GROUP BY w1, w2),
    model AS (
      SELECT w1, w2,
             CAST(ROUND(1e9 * CAST(bf AS DOUBLE)
                  / CAST(SUM(bf) OVER (PARTITION BY w1) AS DOUBLE))
                  AS BIGINT) AS p9
      FROM bf
    ), scored AS (
      SELECT doc_id, p9 FROM pairs JOIN model USING (w1, w2)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           SIGN(CAST(SUM(p9) AS DOUBLE) / 1e9 / COUNT(*))
             * FLOOR(ABS(CAST(SUM(p9) AS DOUBLE) / 1e9 / COUNT(*))
                     * 1e6 + 0.5) / 1e6 AS mean_trans_p
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
# expression twin, same oracle (§2.11 kernel/twin policy)
from otrrentetl_spark.registry import ORACLES as _ORC  # noqa: E402

register(
    "text_bigram_surprisal_expr",
    text_bigram_surprisal_expr,
    _ORC["text_bigram_surprisal"],
)


# ----------------------------------------------- collocation mining
_COLLOC_MIN_BF = 5
_COLLOC_TOP = 50


def text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the word pairs that co-occur far more than
    chance — PMI expressed as a LIFT ratio (no log, so no libm
    portability hazard): lift = N·bf / (uf(w1)·vf(w2)), where bf is
    the bigram count, uf/vf the left/right context counts, N the
    total bigram count. The corpus-statistics report behind phrase
    detection and tokenizer-merge sanity checks.

    Scale shape: ONE token-volume aggregate (bf, map-side combined to
    vocabulary size); uf, vf, and N all derive from bf via windows
    over the vocabulary frame — the corpus is never rescanned; top-k
    via TakeOrdered with a full deterministic tiebreak. Lift is
    computed as (bf/uf)·(N/vf) — identical operation order both
    engines — and rounded with the portable floor form."""
    d = _docs(spark, sf_dir)
    pairs = d.select(
        F.explode(
            bind(
                text.tokens("text"),
                lambda tk: F.when(
                    F.size(tk) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - 1),
                        lambda i: F.struct(
                            F.element_at(tk, i).alias("w1"),
                            F.element_at(tk, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bf = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bf"))
    whole = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    stats = (
        bf.withColumn("uf", F.sum("bf").over(W.partitionBy("w1")))
        .withColumn("vf", F.sum("bf").over(W.partitionBy("w2")))
        .withColumn("n_total", F.sum("bf").over(whole))
    )
    lift = (
        F.col("bf").cast("double") / F.col("uf")
    ) * (F.col("n_total").cast("double") / F.col("vf"))
    return (
        stats.filter(F.col("bf") >= _COLLOC_MIN_BF)
        .select(
            "w1",
            "w2",
            "bf",
            round6_portable(lift).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(_COLLOC_TOP)
    )


register(
    "text_collocations_lift",
    text_collocations_lift,
    rf"""
    WITH base AS (
      SELECT CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), pairs AS (
      SELECT UNNEST(CASE WHEN len(toks) >= 2
                    THEN [{{'w1': toks[i], 'w2': toks[i+1]}}
                          for i in range(1, len(toks))]
                    ELSE [] END, recursive := true)
      FROM base
    ), bf AS (SELECT w1, w2, COUNT(*) AS bf FROM pairs GROUP BY w1, w2),
    stats AS (
      SELECT w1, w2, bf,
             SUM(bf) OVER (PARTITION BY w1) AS uf,
             SUM(bf) OVER (PARTITION BY w2) AS vf,
             SUM(bf) OVER () AS n_total
      FROM bf
    ), scored AS (
      SELECT w1, w2, CAST(bf AS BIGINT) AS bf,
             (CAST(bf AS DOUBLE) / uf) * (CAST(n_total AS DOUBLE) / vf)
               AS lift_raw
      FROM stats WHERE bf >= {_COLLOC_MIN_BF}
    )
    SELECT w1, w2, bf,
           SIGN(lift_raw) * FLOOR(ABS(lift_raw) * 1e6 + 0.5) / 1e6 AS lift
    FROM scored
    ORDER BY lift DESC, w1, w2 LIMIT {_COLLOC_TOP}
    """,
)
