"""Web-corpus curation suite: invariants the DuckDB oracle can't
express (cap arithmetic, probability bounds, plan shape) plus a
hand-checked gate case.

The value-level correctness of each query is carried by the oracle
registry (tools/verify_oracle.py / the round driver); these tests pin
the *semantics contracts* that stay true at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.plans import web_curation as wc
from tests.conftest import SF_SMOKE


def test_domain_cap_arithmetic(spark):
    rows = wc.domain_topk_caps(spark, SF_SMOKE).collect()
    assert rows, "expected at least one domain"
    for r in rows:
        assert 0 < r["n_kept"] <= wc._DOMAIN_CAP
        assert r["n_kept"] <= r["n_docs"]
        # a domain at or under the cap drops nothing
        if r["n_docs"] <= wc._DOMAIN_CAP:
            assert r["dropped_chars"] == 0
        assert r["kept_chars"] >= 0 and r["kept_bpe_tok"] >= 0


def test_url_parse_roundtrip(spark):
    """Host/path/query decomposition must reassemble into the URL —
    parse_url is lossless over the synthesized shape."""
    df = wc.url_parse_suite(spark, SF_SMOKE)
    bad = df.filter(
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.col("path"),
            F.lit("?page="),
            F.col("page").cast("string"),
            F.lit("&ref="),
            F.col("ref"),
        )
        != F.col("url")
    ).count()
    assert bad == 0
    doms = df.select("reg_domain").distinct().count()
    assert doms > 1  # registrable domain varies by source×tld
    # www-stripped: reg_domain never carries the subdomain
    assert df.filter(F.col("reg_domain").startswith("www.")).count() == 0


def test_bigram_probability_bounds(spark):
    """Mean transition probability is a probability: (0, 1]; and a
    document of one repeated word scores exactly 1.0 when scored
    against a corpus where that transition is deterministic."""
    rows = wc.text_bigram_surprisal(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["mean_trans_p"] <= 1.0
        assert r["n_bigrams"] >= 1


def test_gopher_gates_hand_case(spark):
    """Drive the gate expressions over a crafted frame where each rule's
    pass/fail is computable by hand."""
    good = " ".join(["the", "and", "word"] * 20)  # 60 words, alpha, stopwords
    short = "tiny doc"  # fails word count
    symbols = " ".join(["#tag"] * 60)  # symbol-heavy: 60 '#' vs 60 words
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in wc.gopher_gates(df).collect()}
    assert out[1]["passes_all"] is True
    assert out[2]["gate_word_count"] is False
    assert out[3]["gate_symbol_ratio"] is False


def test_bpe_merges_hand_case(spark):
    """BPE induction on a corpus computable by hand: 'ab' × 3 + 'abc'.
    Words: ab(3), abc(1) → pair (a,b) count 4 wins merge 1; then
    segmentations [ab], [ab, c] → pair (ab, c) count 1 wins merge 2."""
    df = spark.createDataFrame(
        [("ab ab ab abc",)], "text string"
    )
    rows = wc.bpe_merges(df, spark, k=2).collect()
    assert [(r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"]) for r in rows] == [
        (1, "a", "b", "ab", 4),
        (2, "ab", "c", "abc", 1),
    ]


def test_bpe_merge_pair_overlap_free(spark):
    """The position-local rewrite: fusing (a,b) in 'ababa' merges both
    non-overlapping occurrences; self-pairs are never candidates so
    runs like 'aaa' cannot arise."""
    df = spark.createDataFrame([(["a", "b", "a", "b", "a"],)], "s array<string>")
    out = df.select(
        wc._merge_pair(F.col("s"), F.lit("a"), F.lit("b")).alias("m")
    ).collect()[0]["m"]
    assert out == ["ab", "ab", "a"]


def test_bpe_merge_pair_first_symbol_is_b(spark):
    """Three-valued-logic regression: a word STARTING with the merge's
    right symbol must keep that symbol (the kept-filter predicate must
    be FALSE, not NULL, at position 1)."""
    df = spark.createDataFrame([(["b", "a", "b"],)], "s array<string>")
    out = df.select(
        wc._merge_pair(F.col("s"), F.lit("a"), F.lit("b")).alias("m")
    ).collect()[0]["m"]
    assert out == ["b", "ab"]


def test_gopher_single_stage_plan(spark):
    """The gates are a pure per-row projection: the physical plan must
    contain NO data-keyed exchange. The only allowed exchange is the
    round-robin fan_out (parallelism repair for few-row-group local
    parquet — a pass-through at cluster scale); any hash/range
    partitioning would mean the gates started shuffling by key."""
    plan = wc.gopher_quality_gates(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_bigram_model_broadcasts(spark):
    """EXPRESSION face (the oracle twin and past-the-cap scale path):
    the scoring join must probe the token stream against a BROADCAST
    model — a shuffle of the token stream here is the 100 TB
    regression this test pins (cf. the r3 tfidf/surprisal verdict
    items). Also pins the zero-token-volume-shuffle claim: exactly
    the model-build exchange, the model window exchange, and the
    per-doc aggregate exchange survive, all map-side combined."""
    df = wc.text_bigram_surprisal_expr(spark, SF_SMOKE)
    df.collect()  # finalize AQE
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # bf partial-aggregates map-side before its exchange
    assert plan.count("HashAggregate") >= 2


def test_bigram_kernel_face_no_join(spark):
    """KERNEL face: the probe ships the (deduplicated, bf>=2) model
    as a broadcast variable and scores inside one mapInArrow pass —
    the returned plan must contain NO join and no aggregate at all
    (the model build ran eagerly during construction; per-pair
    traffic never touches an exchange)."""
    df = wc.text_bigram_surprisal(spark, SF_SMOKE)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan
    assert "Join" not in plan


def test_waterfill_skewed_hand_case(spark):
    """Supplies 10/10/100, budget 50% (=60): the two small sources
    saturate at 10 each; the waterline spends the remaining 40 on the
    big one. Σ allocations == budget exactly when λ is integral."""
    sup = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 100)], "source string, supply long"
    )
    rows = {r["source"]: r for r in wc.waterfill(sup).collect()}
    assert rows["a"]["allocated_tok"] == 10
    assert rows["b"]["allocated_tok"] == 10
    assert rows["c"]["allocated_tok"] == 40
    assert rows["c"]["waterline"] == 40.0


def test_waterfill_budget_conservation(spark):
    """On the real table: allocations never exceed supply, total spend
    is within |sources| of the budget (floor slack only)."""
    import math

    out = wc.token_budget_waterfill(spark, SF_SMOKE).collect()
    spent = sum(r["allocated_tok"] for r in out)
    supply = sum(r["supply"] for r in out)
    # match the plan's F.round (half-up), not Python round (banker's)
    budget = math.floor(supply * wc._BUDGET_FRAC + 0.5)
    assert all(r["allocated_tok"] <= r["supply"] for r in out)
    assert budget - len(out) <= spent <= budget


def test_cdc_edit_locality(spark):
    """The content-defined property: editing the head of a document
    must leave the TAIL chunks identical (boundaries move with
    content, unlike fixed-width blocks). Compare per-chunk digests of
    a long text vs the same text with a head insertion — the suffix
    chunk sequence must re-align."""
    import hashlib

    base = " ".join(f"tok{i % 97}word{i % 13}" for i in range(200))
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    # recompute chunks driver-side with the same hash to get the lists
    def chunks(s):
        w, mask, m = wc._CDC_W, wc._CDC_MASK, wc._CDC_M
        cuts = []
        for i in range(len(s) - w + 1):
            acc = 0
            for j in range(w):
                acc = (acc * 31 + ord(s[i + j])) % m
            if acc % mask == 0:
                cuts.append(i)
        starts = [0] + [c + w for c in cuts if c + w < len(s)]
        starts = sorted(set(starts))
        return [
            s[a:b] for a, b in zip(starts, starts[1:] + [len(s)])
        ]

    c1, c2 = chunks(base), chunks(edited)
    # suffix alignment: the last chunks agree once past the edit
    tail_common = 0
    while (
        tail_common < min(len(c1), len(c2))
        and c1[-1 - tail_common] == c2[-1 - tail_common]
    ):
        tail_common += 1
    assert tail_common >= max(1, len(c1) - 3), (
        f"edit failed to stay local: only {tail_common} tail chunks "
        f"re-aligned of {len(c1)}"
    )

    # and the engine's digest agrees with the driver-side model
    out = {r["doc_id"]: r for r in wc.cdc_chunks(df).collect()}
    for doc_id, cl in [(1, c1), (2, c2)]:
        digest = hashlib.md5(
            "".join(
                hashlib.md5(c.encode()).hexdigest() for c in cl
            ).encode()
        ).hexdigest()
        assert out[doc_id]["chunks_digest"] == digest
        assert out[doc_id]["n_chunks"] == len(cl)


def test_cdc_kernel_expression_parity(spark):
    """The Arrow kernel must be BIT-identical to the HOF expression
    path (it carries the expression path's value oracle) — including
    empty and shorter-than-window texts."""
    rows = [
        (1, ""),
        (2, "short"),
        (3, "x" * 7),
        (4, "exactly8"),
        (5, " ".join(f"w{i % 11}tok{i % 5}" for i in range(300))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: tuple(r) for r in wc.cdc_chunks(df).collect()}
    kern = {r["doc_id"]: tuple(r) for r in wc.cdc_chunks_kernel(df).collect()}
    assert expr == kern


def test_domain_cap_skew_fixture(spark):
    """r4 verdict item 2: the cap must survive the exact mega-domain
    it exists to police. One domain holds half the corpus; the salted
    two-level top-N must still return the exact per-domain answer."""
    n_mega, n_small = 400, 8
    rows = [
        (i, "mega.com", 1000 + (i % 97), f"doc {i} text")
        for i in range(n_mega)
    ] + [
        (10_000 + i, "tiny.org", 500 + i, f"tiny {i}")
        for i in range(n_small)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, reg_domain string, n_chars long, text string"
    )
    got = {r["reg_domain"]: r for r in wc.domain_caps(d, cap=3, salt=8).collect()}
    assert set(got) == {"mega.com", "tiny.org"}

    # exact expected kept-set: top-3 by (n_chars DESC, doc_id ASC)
    def top3(items):
        return sorted(items, key=lambda x: (-x[1], x[0]))[:3]

    mega = [(i, 1000 + (i % 97)) for i in range(n_mega)]
    tiny = [(10_000 + i, 500 + i) for i in range(n_small)]
    for dom, items in (("mega.com", mega), ("tiny.org", tiny)):
        kept = top3(items)
        r = got[dom]
        assert r["n_docs"] == len(items)
        assert r["n_kept"] == 3
        assert r["kept_chars"] == sum(c for _, c in kept)
        assert r["dropped_chars"] == sum(c for _, c in items) - r["kept_chars"]
    # mega top-3: n_chars 1096 ties broken by doc_id — ids 96, 193, 290
    assert got["mega.com"]["kept_chars"] == 1096 * 3


def test_gopher_kernel_expression_parity(spark):
    """The Arrow gate kernel must be BIT-identical to the HOF
    expression path (it carries that path's value oracle) — including
    the tokenizer's edge semantics: trim strips 0x20 only, Java \\s is
    the ASCII class, leading/interior empties survive the split, and
    '...' counts non-overlapping."""
    rows = [
        (1, ""),
        (2, "   "),
        (3, "\tleading tab token"),
        (4, "the a and of to in is that it for extra words here"),
        (5, "dots..... and #### symbols # everywhere..."),
        (6, "x" * 30),
        (7, " ".join(f"w{i % 13}" for i in range(200))),
        (8, "mixed\ttabs\nnewlines\x0bvt\x0cff\rcr spaces"),
        (9, "trailing-nonspace-ws\t"),
        (10, "The Quick brown fox 123 456 !!! ... #tag"),
        (11, None),  # NULL text: null metrics, not a kernel crash
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: tuple(r) for r in wc.gopher_gates(df).collect()}
    kern = {r["doc_id"]: tuple(r) for r in wc.gopher_gates_kernel(df).collect()}
    assert expr == kern


def test_gopher_kernel_corpus_parity(spark):
    """Whole-corpus parity at the oracle scale factor — the kernel and
    the expression path must agree row-for-row on real fixture text."""
    from tests.conftest import SF_ORACLE

    expr = {r["doc_id"]: tuple(r)
            for r in wc.gopher_quality_gates(spark, SF_ORACLE).collect()}
    kern = {r["doc_id"]: tuple(r)
            for r in wc.gopher_quality_gates_fast(spark, SF_ORACLE).collect()}
    assert expr == kern


def test_bpe_batched_equals_sequential(spark):
    """The batched learner must reproduce the one-merge-per-round
    sequence EXACTLY (same pairs, same ranks, same counts) — it only
    accepts a batch when the acceptance rule proves equivalence — and
    it must need no more rounds than merges."""
    corpus = [
        ("the cat sat on the mat with the rat",),
        ("deep deep learning learning pipelines scale scale scale",),
        ("tokenize tokenize everything everything everything now",),
        ("aa ab ba bb abab baba",),
    ]
    df = spark.createDataFrame(corpus * 5, "text string")
    seq = [tuple(r) for r in wc.bpe_merges(df, spark, k=6, batched=False).collect()]
    seq_rounds = wc._LAST_BPE_ROUNDS
    bat = [tuple(r) for r in wc.bpe_merges(df, spark, k=6, batched=True).collect()]
    bat_rounds = wc._LAST_BPE_ROUNDS
    assert bat == seq
    assert bat_rounds <= seq_rounds


def test_bpe_encode_hand_case(spark):
    """Encode with the corpus's own learned merges, hand-traced:
    words abab(2 in d1, 1 in d5), ab(1), xy(1) → round 1 accepts only
    (a,b) (count 5; (b,a)=2 shares symbols and stops the batch),
    round 2 accepts (x,y) → abab encodes to [ab,ab], ab to [ab],
    xy to [xy]. Empty/NULL/symbol-only docs report 0/0."""
    df = spark.createDataFrame(
        [
            ("d1", "abab abab"),
            ("d2", "ab"),
            ("d3", ""),
            ("d4", None),
            ("d5", "xy abab"),
            ("d6", "!!! ..."),
        ],
        "doc_id string, text string",
    )
    got = [tuple(r) for r in wc.bpe_encode(df, spark, k=6).collect()]
    assert got == [
        ("d1", 2, 4),
        ("d2", 1, 1),
        ("d3", 0, 0),
        ("d4", 0, 0),
        ("d5", 2, 3),
        ("d6", 0, 0),
    ]


def test_bpe_large_merge_target(spark):
    """r6 verdict item 1: large merge targets must not crash the
    Catalyst analyzer (the pre-fix code folded a whole batch into one
    nested _merge_pair expression — ~7× tree growth per merge — and
    kept full lineage across rounds, hitting the analyzer's
    100-iteration Resolution cap / driver OOM near 1k merges).

    Corpus with an ANALYTICALLY KNOWN merge sequence: successive
    perfect matchings of K_36 (round-robin 1-factorization) yield
    length-2 words whose 18-per-band symbol-disjoint pairs carry
    strictly decreasing counts and produce NO triples (so created-pair
    upper bounds are 0, and each round provably accepts a whole
    matching). Expected merges = the words in descending count order —
    checked exactly, no sequential replay needed. Also pins
    adapt-invariance at scale: adaptive and fixed batch sizes must
    emit identical tables."""
    K = 520
    letters = "abcdefghijklmnopqrstuvwxyz0123456789"
    pairs = []
    # circle method: fix letters[35]; round r pairs it with ring[r]
    # and pairs ring[(r+i) % 35] with ring[(r-i) % 35] — each round a
    # perfect matching, all 630 edges distinct across rounds
    for r in range(35):
        pairs.append((letters[35], letters[r]))
        for i in range(1, 18):
            pairs.append((letters[(r + i) % 35], letters[(r - i) % 35]))
    pairs = pairs[: K + 18]  # a few spare bands past K
    n = len(pairs)
    rows = [((a + b + " ") * (n + 10 - i),) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "text string")

    got = [
        tuple(r)
        for r in wc.bpe_merges(df, spark, k=K, batched=True, adapt=True)
        .orderBy("merge_rank")
        .collect()
    ]
    want = [
        (i + 1, a, b, a + b, n + 10 - i) for i, (a, b) in enumerate(pairs[:K])
    ]
    assert got == want
    # whole disjoint matchings accepted per round → far fewer rounds
    # than merges (the analyzer survives multi-merge rounds)
    assert wc._LAST_BPE_ROUNDS <= K // 10
    fixed = [
        tuple(r)
        for r in wc.bpe_merges(df, spark, k=K, batched=True, adapt=False)
        .orderBy("merge_rank")
        .collect()
    ]
    assert fixed == want


def test_gopher_kernel_randomized_parity(spark):
    """Adversarial randomized cross-check of the byte-level numpy
    kernel vs the HOF expression face: strings drawn from an alphabet
    heavy in separators, dots, hashes, stopwords, empties, and
    multi-byte unicode — the exact corners where byte-level masks
    could drift from string semantics (doc-boundary runs, UTF-8
    continuation bytes, case folding, split-empty tokens)."""
    import random

    rng = random.Random(60)
    pieces = [
        " ", "  ", "\t", "\n", "\x0b", "\x0c", "\r", ".", "...", "....",
        "#", "##", "the", "The", "THE", "a", "A", "and", "of", "to",
        "that", "it", "für", "naïve", "héllo", "x", "yz", "123", "!?",
        "...#", "İT", "ıs", "tHe",
    ]
    rows = [(0, ""), (1, None), (2, "   "), (3, "\t\t")]
    for i in range(4, 120):
        k = rng.randint(0, 12)
        rows.append((i, "".join(rng.choice(pieces) for _ in range(k))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: tuple(r) for r in wc.gopher_gates(df).collect()}
    kern = {r["doc_id"]: tuple(r) for r in wc.gopher_gates_kernel(df).collect()}
    assert expr == kern
