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

import re
import threading
from hashlib import md5

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.functions.exprs import bind
from otrrentetl_spark.operators.text import hash_long, normalize_text, tokens

# ------------------------------------------------- cache-lifetime contract
# The LSH operators persist small intermediate frames (candidates,
# signatures, shingles) that the RETURNED DataFrame's lineage still
# reads — they cannot be unpersisted before the caller materializes the
# result. Without a release path, a long-lived session (notebook,
# sweep) calling the operators repeatedly accumulates MEMORY_AND_DISK
# blocks unboundedly (ADVICE r7/r8). Contract:
#
# - each operator REGISTERS its persisted intermediates here, which
#   FIRST releases the previous same-operator invocation's blocks —
#   repeated calls are self-cleaning (block count is bounded by one
#   invocation's worth, pinned in tests/test_dedup_pairs.py);
# - ``release_caches()`` frees everything immediately once results are
#   consumed (the sweep runner's clearCache is a superset of this).
#
# Unpersisting never affects correctness: a consumer of an older
# result just recomputes through lineage (speed, not semantics).
_LIVE_CACHES: dict[str, list[DataFrame]] = {}
# Registry mutation is lock-guarded (ADVICE r9): two session threads
# invoking the same operator concurrently could otherwise interleave
# pop/iterate/unpersist and evict a sibling invocation's in-flight
# intermediates — correctness-safe (recompute-through-lineage
# contract) but a silent performance surprise. The lock serializes
# only the bookkeeping, never a Spark job.
_CACHES_LOCK = threading.Lock()


def release_caches(op: str | None = None) -> int:
    """Unpersist the tracked intermediate caches of ``op`` (or all
    operators); returns the number of frames released. Call once the
    returned pair frames have been materialized/consumed."""
    with _CACHES_LOCK:
        ops = [op] if op is not None else list(_LIVE_CACHES)
        popped = [f for o in ops for f in _LIVE_CACHES.pop(o, [])]
    n = 0
    for f in popped:
        try:
            f.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def _same_result(a: DataFrame, b: DataFrame) -> bool:
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def _register_caches(op: str, frames: list[DataFrame]) -> None:
    # Release the previous invocation's entries EXCEPT those whose
    # canonical plan matches a new frame: Spark's CacheManager keys
    # cache entries by plan equality, so a same-input re-invocation
    # persists the SAME entry — unpersisting the "old" frame would
    # evict the data the new invocation just registered (measured:
    # dedup_minhash_lsh_pairs 0.94 → 3.11 s in the bench, whose warm
    # runs legitimately reuse the same-plan cache) and same-plan
    # entries cannot accumulate anyway (one entry per canonical plan).
    with _CACHES_LOCK:
        prev = _LIVE_CACHES.pop(op, [])
        _LIVE_CACHES[op] = frames
    for f in prev:
        if any(_same_result(f, g) for g in frames):
            continue
        try:
            f.unpersist()
        except Exception:
            pass


# ------------------------------------------------------------------ exact (X1)
def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ids_only: bool = False,
    hash_col: str | None = None,
) -> DataFrame:
    """Keep the lowest-id row per identical (normalized) content.

    One shuffle on the content hash; ties broken by id so the survivor
    set is deterministic. 100 TB posture: the shuffle key is the
    16-byte md5, partial aggregation reduces map output to one row per
    distinct hash per partition.

    ``ids_only=True`` returns just the surviving id column straight
    off the aggregate — callers that don't need the full row (corpus
    accounting, tombstone lists) skip the survivor join entirely.

    ``hash_col`` names a caller-precomputed content hash column that
    must equal ``coalesce(md5(normalize_text(text_col)), '~null~')``.
    Callers that fan one physical row into several logical rows with
    identical content (injected-duplicate corpora: explode of the id
    pair) hash each text ONCE before the explode instead of once per
    copy — the hash is copy-invariant, so the groups are unchanged
    (optimization guide §2.3: compute-before-multiply).
    """
    # The survivor semi-join matches on (content hash, id), not id
    # alone: with id-only matching, an input whose ids are not unique
    # (e.g. two different contents sharing a doc_id) would resurrect
    # EVERY row of a surviving id — caught by the r5 10×-fixture
    # sweep, where replica ids collided with injected-duplicate ids.
    # NULL text hashes to a sentinel (not 32 hex chars, so it cannot
    # collide with a real md5): without it the semi-join's null-unsafe
    # equality would drop every null-text row from the survivor set
    # while ids_only (straight off the aggregate, where NULL is a
    # grouping value like any other) would keep one — the two paths
    # must agree that null content is one dedup group.
    # Working-column name must not collide with a caller column:
    # withColumn REPLACES an existing column of the same name, so an
    # input already carrying __content_hash would be silently
    # corrupted (its column overwritten, then dropped on return).
    if hash_col is not None:
        keep = df.groupBy(hash_col).agg(F.min(id_col).alias(id_col))
        if ids_only:
            return keep.select(id_col)
        return df.join(keep, [hash_col, id_col], "left_semi").drop(hash_col)
    hcol = "__content_hash"
    while hcol in df.columns:
        hcol += "_"
    keyed = df.withColumn(
        hcol,
        F.coalesce(F.md5(normalize_text(text_col)), F.lit("~null~")),
    )
    keep = keyed.groupBy(hcol).agg(F.min(id_col).alias(id_col))
    if ids_only:
        return keep.select(id_col)
    return keyed.join(keep, [hcol, id_col], "left_semi").drop(hcol)


# ------------------------------------------------------------ shingling utils
def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle *set* (distinct), via higher-order functions:
    sequence over start offsets → slice → concat. Empty/short docs give
    the whole-doc token string so they still hash.

    The token array is ``bind``-bound: interpreted HOF lambdas sit
    outside codegen CSE, so an inlined ``tokens(col)`` would re-run the
    regex split once per gram (O(tokens²) per doc)."""

    def build(toks: Column) -> Column:
        k = F.size(toks)
        starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
        grams = F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        )
        return F.array_distinct(grams)

    return bind(tokens(col), build)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingle set over normalized text. The
    normalized string is ``bind``-bound — an inlined expression would
    re-normalize once per character position (see word_shingles)."""

    def build(norm: Column) -> Column:
        starts = F.sequence(
            F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))
        )
        grams = F.transform(starts, lambda i: norm.substr(i, F.lit(n)))
        return F.array_distinct(grams)

    return bind(normalize_text(col), build)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-sets."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ----------------------------------------------------------- MinHash+LSH (X2)
_MH_P = 1_000_000_007  # modulus of the universal-hash permutation family
_MH_C = 998_244_353  # per-permutation stride

# Shared bucket cap: the engine's default AND the value every oracle
# models (ADVICE r3: an unmodeled cap makes the engine silently lose
# true pairs the oracle reports on a degenerate corpus — now both
# sides drop the same oversized buckets, so drift fails loudly).
DEFAULT_MAX_BUCKET = 1000

# Fixture parameter sets shared by the near-dup plan queries
# (plans/llm_ops.py, plans/graph_ops.py) and their DuckDB oracle
# generators — one source of truth so the Spark pipeline and the SQL
# replay can never drift apart.
LSH_FAST_PARAMS = {
    "num_hashes": 16,
    "bands": 4,
    "shingle_n": 3,
    "corpus_max": None,  # full corpus
    "near_max": 100,
    "max_bucket_size": DEFAULT_MAX_BUCKET,
}
LSH_EXACT_PARAMS = {
    "num_hashes": 8,
    "bands": 4,
    "shingle_n": 3,
    "corpus_max": 150,
    "near_max": 50,
    "max_bucket_size": DEFAULT_MAX_BUCKET,
}


def near_dup_corpus_ctes(corpus_max: int | None, near_max: int) -> str:
    """DuckDB CTEs `unioned` (near-dup fixture corpus: documents +
    ~90%-prefix copies for doc_id ≤ near_max) and `base` (tokenized) —
    the SQL twin of plans.llm_ops.near_dup_corpus."""
    corpus_where = f"WHERE doc_id <= {corpus_max}" if corpus_max is not None else ""
    near_where = (
        f"WHERE doc_id <= {min(corpus_max, near_max)}"
        if corpus_max is not None
        else f"WHERE doc_id <= {near_max}"
    )
    return f"""
    unioned AS (
      SELECT doc_id, text FROM documents {corpus_where}
      UNION ALL
      SELECT doc_id + 2000000000 AS doc_id,
             array_to_string(toks[1:GREATEST(CAST(floor(len(toks) * 9 / 10) AS INT), 1)],
                             ' ') AS text
      FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                        ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
            FROM documents {near_where})
    ), base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
      FROM unioned
    )"""


def lsh_oracle_ctes(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    corpus_max: int | None,
    near_max: int,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    candidate_strategy: str = "all_pairs",
    verify: str = "exact",
) -> str:
    """DuckDB CTE chain replaying the banded MinHash-LSH pipeline
    bit-for-bit over the near-dup fixture corpus (documents + injected
    ~90%-prefix copies for doc_id ≤ near_max): signatures → band
    digests → bucket candidate join → exact-Jaccard verify. Ends with
    a ``pairs(id_a, id_b, jaccard_sim)`` CTE; callers append the final
    SELECT (and, for clustering, a recursive component closure).

    Valid for BOTH execution paths of minhash_lsh_pairs — the HOF
    expression path and the Arrow kernel emit identical band hashes
    (see _fast_band_udf's parity contract)."""
    p, c = _MH_P, _MH_C
    rpb = num_hashes // bands
    mins = ", ".join(
        "list_min(list_transform(grams, s -> "
        f"((CAST(concat('0x', substr(md5(concat('mh:', s)), 1, 15)) AS BIGINT) "
        f"% {p}) * {2 * i + 1} + {i * c}) % {p}))"
        for i in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(concat("
        + ", ',', ".join(
            f"CAST(sig[{b * rpb + j + 1}] AS VARCHAR)" for j in range(rpb)
        )
        + "))"
        for b in range(bands)
    )
    n = shingle_n
    return f"""{near_dup_corpus_ctes(corpus_max, near_max)}, sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                            for i in range(1, GREATEST(len(toks) - {n - 1}, 1) + 1)])
               AS grams
      FROM base
    ), sig AS (
      SELECT doc_id, grams, [{mins}] AS sig FROM sh
    ), banded AS (
      SELECT doc_id, grams, UNNEST(range({bands})) AS band,
             UNNEST([{band_exprs}]) AS bh
      FROM sig
    ), bucket_ok AS (
      -- the engine's max_bucket_size cap, modeled: oversized buckets
      -- contribute no candidate pairs on EITHER side
      SELECT band, bh FROM banded GROUP BY band, bh
      HAVING COUNT(*) <= {max_bucket_size}
    ), cand AS ({
      '''
      SELECT DISTINCT mn.id_a, r.doc_id AS id_b
      FROM (SELECT band, bh, MIN(doc_id) AS id_a
            FROM banded GROUP BY band, bh) mn
      JOIN bucket_ok k ON mn.band = k.band AND mn.bh = k.bh
      JOIN banded r
        ON r.band = mn.band AND r.bh = mn.bh AND r.doc_id > mn.id_a
      ''' if candidate_strategy == "star" else '''
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM banded l
      JOIN bucket_ok k ON l.band = k.band AND l.bh = k.bh
      JOIN banded r
        ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
      '''}
    ), pairs AS ({
      f'''
      SELECT c.id_a, c.id_b,
             ROUND(CAST(len([i for i in range(1, {num_hashes} + 1)
                             if a.sig[i] = b.sig[i]]) AS DOUBLE)
                   / {num_hashes}, 6) AS jaccard_sim
      FROM cand c
      JOIN sig a ON a.doc_id = c.id_a
      JOIN sig b ON b.doc_id = c.id_b
      WHERE CAST(len([i for i in range(1, {num_hashes} + 1)
                      if a.sig[i] = b.sig[i]]) AS DOUBLE)
            / {num_hashes} >= 0.5
      ''' if verify == "estimate" else '''
      SELECT c.id_a, c.id_b,
             ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / NULLIF(len(list_distinct(list_concat(a.grams, b.grams))), 0),
                   6) AS jaccard_sim
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / NULLIF(len(list_distinct(list_concat(a.grams, b.grams))), 0) >= 0.5
      '''}
    )"""


def _observe_cap_sizes(
    sizes: DataFrame, observation, n_col: str, cap: int
) -> DataFrame:
    """Attach dropped-bucket metrics to a bucket-SIZE frame (the
    pre-collect cap pass) and deliver them immediately — same
    persist + terminal-count delivery contract, but
    over (bucket, count) rows so no member array ever materializes."""
    over = F.col(n_col) > cap
    sizes = sizes.persist()
    sizes.observe(
        observation,
        F.sum(F.when(over, 1).otherwise(0)).alias("dropped_buckets"),
        F.sum(F.when(over, F.col(n_col)).otherwise(0)).alias(
            "dropped_member_mass"
        ),
    ).count()
    return sizes


def minhash_signature(col: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as an array<long> of length ``num_hashes``:
    element i = min over shingles of permutation
    ``h_i(s) = ((2i+1)·h(s) + i·C) mod P`` with one md5-based base hash
    ``h`` per shingle. Pure column expressions — the signature costs one
    projection, no shuffle.

    Single-evaluation design: the base-hash array (the md5 work) is
    computed once and ``bind``-bound; the ``num_hashes`` permutations
    are cheap integer re-traversals of that array. The naive form —
    one seeded md5 family per permutation — re-evaluates the shingle
    construction per permutation (HOFs are outside codegen CSE) and is
    ~30× slower.
    """
    base = F.transform(
        word_shingles(col, shingle_n),
        lambda s: F.pmod(hash_long(s, seed="mh:"), F.lit(_MH_P)),
    )

    # Closure factory, NOT `lambda h, i=i: ...`: Spark binds one lambda
    # variable per *parameter* of the callable, so a default-arg capture
    # would receive a Column in place of the permutation index.
    def perm(i: int):
        return lambda h: F.pmod(h * (2 * i + 1) + i * _MH_C, F.lit(_MH_P))

    return bind(
        base,
        lambda hb: F.array(
            *[F.array_min(F.transform(hb, perm(i))) for i in range(num_hashes)]
        ),
    )


def minhash_band_hashes(
    col: Column | str, num_hashes: int = 16, bands: int = 4, shingle_n: int = 3
) -> Column:
    """Array of ``bands`` LSH bucket keys: md5 over each contiguous
    signature band. The signature is bound once — the band fan-out
    re-reads the array, it does not re-hash the document."""
    rows_per_band = num_hashes // bands
    return bind(
        minhash_signature(col, num_hashes, shingle_n),
        lambda sg: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sg, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ),
        ),
    )


def _fast_band_udf(num_hashes: int, bands: int, shingle_n: int):
    """Arrow-vectorized banding kernel producing BIT-IDENTICAL band
    hashes to the HOF expression path (minhash_band_hashes): the same
    md5 base hash (first 15 hex chars → int64, seeded 'mh:'), the same
    universal-hash permutation family, and the same md5-of-joined-band
    digest. Because the two paths agree value-for-value, the fast
    pipeline's output is oracle-checkable by the identical DuckDB SQL
    that checks the expression path — no rows-only gap. (The one place
    the engine uses a Python UDF, per SURVEY.md §2.11 policy —
    Arrow-batched, never per-row.)

    Parity contract (each clause mirrors the expression path):
    - tokens: ASCII \\s+ split of SPACE-trimmed text. Spark's trim
      (and DuckDB's) strips only ASCII 0x20 — Python's bare .strip()
      would also eat tabs/newlines and change the token list for
      whitespace-edged docs (hypothesis-found edge). A doc that is
      entirely non-space whitespace splits into empty-string tokens,
      exactly as Spark's split(limit=-1) keeps them; genuinely empty
      text → one empty shingle.
    - shingles: distinct word n-grams; docs with ≤ n tokens produce
      the whole-token-string single shingle.
    - base hash: int(md5('mh:'+s).hex[:15], 16) % P  ≡
      conv(substring(md5(concat('mh:', s)), 1, 15), 16, 10) % P.
    - permutation i: (h·(2i+1) + i·C) % P (fits int64: P ≈ 1e9,
      max h·31 + 15C ≈ 4.6e10 « 2^63).
    - band digest: md5(','.join(str(sig_slice))) ≡
      md5(array_join(transform(slice(sig, ...), cast string), ',')).
    """
    rpb = num_hashes // bands
    a = (np.arange(num_hashes, dtype=np.int64) * 2 + 1)[:, None]
    b = (np.arange(num_hashes, dtype=np.int64) * _MH_C)[:, None]
    ws = re.compile(r"\s+", re.ASCII)

    @F.pandas_udf("array<string>")
    def bands_of(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "").strip(" ")  # space-only, like engine trim
            toks = ws.split(t) if t else []
            n = len(toks)
            if n <= shingle_n:
                sh = {" ".join(toks)}
            else:
                sh = {" ".join(toks[i : i + shingle_n]) for i in range(n - shingle_n + 1)}
            hs = np.fromiter(
                (
                    int(md5(b"mh:" + s.encode("utf-8")).hexdigest()[:15], 16) % _MH_P
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            sig = (a * hs[None, :] + b) % _MH_P
            mins = sig.min(axis=1)
            out.append(
                [
                    md5(
                        ",".join(
                            str(v) for v in mins[i * rpb : (i + 1) * rpb]
                        ).encode()
                    ).hexdigest()
                    for i in range(bands)
                ]
            )
        return pd.Series(out)

    return bands_of


def _fast_sig_udf(num_hashes: int, shingle_n: int):
    """Arrow-vectorized MinHash SIGNATURE kernel — the same tokenize/
    shingle/base-hash/permutation chain as :func:`_fast_band_udf` (see
    its parity contract), stopping before the band digest: returns the
    array<long> signature itself, bit-identical to
    :func:`minhash_signature`'s expression values, so DuckDB's ``sig``
    CTE oracle-checks it directly."""
    a = (np.arange(num_hashes, dtype=np.int64) * 2 + 1)[:, None]
    b = (np.arange(num_hashes, dtype=np.int64) * _MH_C)[:, None]
    ws = re.compile(r"\s+", re.ASCII)

    @F.pandas_udf("array<long>")
    def sig_of(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "").strip(" ")  # space-only, like engine trim
            toks = ws.split(t) if t else []
            n = len(toks)
            if n <= shingle_n:
                sh = {" ".join(toks)}
            else:
                sh = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(n - shingle_n + 1)
                }
            hs = np.fromiter(
                (
                    int(md5(b"mh:" + s.encode("utf-8")).hexdigest()[:15], 16)
                    % _MH_P
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            sig = (a * hs[None, :] + b) % _MH_P
            out.append(sig.min(axis=1).tolist())
        return pd.Series(out)

    return sig_of


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
    fast: bool = True,
    observation=None,
    candidate_strategy: str = "all_pairs",
    verify: str = "exact",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified
    with exact Jaccard (default) or the signature-agreement estimate.

    ``verify``:
      - ``"exact"`` (default): exact Jaccard over word-shingle sets of
        the candidate docs. The shingle arrays are corpus-text-sized —
        right for pairwise consumers at survey scale, but at a
        replica-heavy 5M-doc fixture the cached candidate shingles are
        tens of GB and building their columnar cache OOMs (observed
        r7).
      - ``"estimate"``: matching-component fraction of the MinHash
        signatures — ``jaccard_sim`` becomes the unbiased estimator
        E[matches]/num_hashes, each doc contributes 16 longs instead
        of a KB-scale array, and no shingle ever crosses an exchange.
        The standard trade at corpus scale (the bands already ARE
        signature agreement); deterministic and oracle-replayable from
        the same ``sig`` CTE.

    ``candidate_strategy``:
      - ``"all_pairs"`` (default): every ordered pair inside a bucket —
        the full candidate set, O(k²) per bucket (bounded by the cap).
      - ``"star"``: each bucket contributes only (min_id, other) edges —
        O(k) per bucket. For CONNECTED-COMPONENT consumers (cluster
        assignment, leakage-safe splits) the star closure equals the
        all-pairs closure whenever the star edges pass verification,
        and on a replica-heavy corpus (the scale fixtures' ~0.97
        Jaccard clusters) it is the difference between a linear and a
        quadratic candidate volume: at the 5M-doc fixture, all-pairs
        enumerates ~10^10 candidates (the cap-sized buckets are real
        near-dup clusters, 57+ GB of shuffle — observed r7), star
        ~20M. Pairwise consumers that need every edge keep all_pairs.

    rows(bands) → hash each band → ONE shuffle into buckets
    (groupBy + collect_list) → enumerate ordered pairs inside each
    bucket → distinct candidate id-pairs → shingles for the candidate
    docs only → exact Jaccard verify.

    Scale notes (this shape is what survives 100 TB):
    - The corpus is scanned ONCE; the signature/band projection is a
      single narrow pass (``bind`` guarantees single evaluation).
    - No self-join: in-bucket pair enumeration replaces the banded
      equi-self-join, so the corpus is not shuffled twice and there is
      no join-key skew to manage — ``max_bucket_size`` drops degenerate
      buckets (boilerplate), bounding per-bucket work at
      O(cap²) and making the explode's output size predictable.
    - Exact-verify shingles are computed only for docs that appear in
      some candidate pair (semi-join), a set orders of magnitude
      smaller than the corpus. The small candidate/shingle frames are
      persisted; the corpus never is.
    - Pass ``observation`` (a ``pyspark.sql.Observation``) to surface
      what the cap dropped: metrics ``dropped_buckets`` and
      ``dropped_member_mass`` are filled when the pipeline
      materializes (this function's own internal count) — truncation
      on a degenerate corpus is observable, not silent.

    CACHE LIFETIME (ADVICE r7/r8): the intermediate ``banded`` frame
    is unpersisted as soon as the candidate set is materialized; the
    small candidate/signature/shingle frames stay cached for the life
    of the returned DataFrame (its lineage reads them) and are
    registered with the module release contract — the NEXT invocation
    frees them automatically, and ``dedup.release_caches()`` frees
    them immediately once the result is consumed (pinned by a
    no-block-growth pytest across repeated invocations).
    """
    # reject usage errors BEFORE any corpus work: the old late checks
    # fired after the full banding + candidate materialization had
    # already run (and leaked the persisted sizes frame on the way out)
    if verify not in ("exact", "estimate"):
        raise ValueError(f"verify must be exact|estimate: {verify}")
    if candidate_strategy not in ("all_pairs", "star"):
        raise ValueError(
            f"candidate_strategy must be all_pairs|star: {candidate_strategy}"
        )
    band_expr = (
        _fast_band_udf(num_hashes, bands, shingle_n)(F.col(text_col))
        if fast
        else minhash_band_hashes(text_col, num_hashes, bands, shingle_n)
    )
    # banded is consumed by TWO passes (size count, then capped
    # collect) — without a cache each pass re-runs the banding kernel
    # over the corpus (Catalyst prunes differently per consumer, so
    # ReusedExchange never canonicalizes — the multi-consumer rule
    # BASELINE.md records for the pipelines; measured 0.8→1.5 s at
    # sf0.1 before this persist). The frame is NARROW — (id, band,
    # band_hash), no text, no arrays — so the cache is ~60 B/row and
    # spillable.
    banded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(band_expr).alias("band", "band_hash"),
    ).persist()
    # The cap is enforced BEFORE any bucket membership materializes:
    # collect_list-then-filter builds the full member array of every
    # bucket first, and on a degenerate corpus one viral bucket
    # (identical boilerplate at fixture scale — millions of ids) OOMs
    # the single task that collects it (observed r7 at the 5M-doc
    # fixture). The size pass is a partial-aggregatable count over the
    # cached banding.
    caches: list[DataFrame] = []  # registered with release_caches below
    sizes = banded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("__n")
    )
    if observation is not None:
        # No-silent-caps (r3 verdict item 3): the cap below protects
        # the engine from degenerate buckets, but the truncation must
        # be visible. The observed frame is persisted and the metrics
        # delivered by a terminal count on the observe node itself —
        # metrics on an intermediate AQE stage of a bigger query can
        # be dropped, so don't rely on the pipeline's own action. The
        # pipeline then reads the cached sizes, no double scan.
        sizes = _observe_cap_sizes(sizes, observation, "__n", max_bucket_size)
        caches.append(sizes)
    ok = sizes.filter(F.col("__n").between(2, max_bucket_size)).select(
        "band", "band_hash"
    )
    buckets = (
        banded.join(ok, ["band", "band_hash"], "left_semi")
        .groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )
    if candidate_strategy == "star":
        # ids is sort_array-ed ascending: element 1 is the bucket min,
        # so id_a < id_b holds by construction, as in all_pairs
        pair_arr = bind(
            F.col("ids"),
            lambda ids: F.transform(
                F.slice(ids, 2, F.size(ids)),
                lambda y: F.struct(
                    F.element_at(ids, 1).alias("id_a"), y.alias("id_b")
                ),
            ),
        )
    else:  # "all_pairs" — validated at entry
        pair_arr = bind(
            F.col("ids"),
            lambda ids: F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            ),
        )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
        .persist()
    )
    cand.count()  # materialize NOW: two downstream branches read cand,
    # and a lazy persist lets both trigger the full corpus banding pass
    # concurrently (cache miss on both) — the whole pipeline's dominant
    # cost would run twice
    # banded fed only the bucket passes that produced cand; with cand
    # materialized it is dead weight — release its blocks here (ADVICE
    # r7: repeated invocations in one session otherwise accumulate
    # MEMORY_AND_DISK blocks unboundedly). Eviction-recompute safety is
    # unaffected: if cand's blocks are later lost, lineage re-runs the
    # banding from the source frame, trading speed, never correctness.
    banded.unpersist()
    cand_ids = (
        cand.select(F.col("id_a").alias("__sid"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    if verify == "estimate":
        sig_expr = (
            _fast_sig_udf(num_hashes, shingle_n)(F.col("__t"))
            if fast
            else minhash_signature(F.col("__t"), num_hashes, shingle_n)
        )
        sigs = (
            df.select(F.col(id_col).alias("__sid"), F.col(text_col).alias("__t"))
            .join(cand_ids, "__sid", "left_semi")
            .select("__sid", sig_expr.alias("__sig"))
            .persist()
        )
        sigs.count()  # double-compute guard, as for shingles below
        spairs = (
            cand.join(sigs, cand.id_a == sigs.__sid, "inner")
            .select("id_a", "id_b", F.col("__sig").alias("sig_a"))
            .join(sigs, F.col("id_b") == sigs.__sid, "inner")
            .select("id_a", "id_b", "sig_a", F.col("__sig").alias("sig_b"))
        )
        est = F.aggregate(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double") / F.lit(float(num_hashes))
        _register_caches("minhash_lsh_pairs", [cand, sigs, *caches])
        return (
            spairs.withColumn("jaccard_sim", F.round(est, 6))
            .filter(F.col("jaccard_sim") >= jaccard_threshold)
            .select("id_a", "id_b", "jaccard_sim")
        )
    # verify == "exact" (validated at entry).
    # Semi-join BEFORE the shingle projection: the expensive expression
    # runs only on candidate docs, not the whole corpus.
    shing = (
        df.select(F.col(id_col).alias("__sid"), F.col(text_col).alias("__t"))
        .join(cand_ids, "__sid", "left_semi")
        .select("__sid", word_shingles("__t", shingle_n).alias("__sh"))
        .persist()
    )
    shing.count()  # same double-compute guard: both pair-side probes read it
    _register_caches("minhash_lsh_pairs", [cand, shing, *caches])
    pairs = (
        cand.join(shing, cand.id_a == shing.__sid, "inner")
        .select("id_a", "id_b", F.col("__sh").alias("sh_a"))
        .join(shing, F.col("id_b") == shing.__sid, "inner")
        .select("id_a", "id_b", "sh_a", F.col("__sh").alias("sh_b"))
    )
    return (
        pairs.withColumn(
            "jaccard_sim", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
        )
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


# ------------------------------------------------------ span-level dedup
def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 16,
) -> DataFrame:
    """Segment-level (C4/RefinedWeb-style) dedup: split every document
    into fixed ``span_tokens``-token spans, keep each distinct span's
    FIRST occurrence corpus-wide (ordered by (doc_id, span_idx)), and
    reassemble the surviving text per document.

    Output: (doc_id, n_spans, n_kept, kept_ratio, dedup_text_md5) —
    the rebuilt text is hashed so the result stays narrow while the
    reassembly order (span_idx ascending) is still fully pinned.

    100 TB posture: span explosion is a narrow projection; the
    keep-first decision is ONE shuffle keyed by the span content (high
    cardinality — no skew beyond genuinely viral passages, which AQE
    skew-split handles); the winner join is keyed the same way; the
    reassembly groups by doc_id. No driver-side state, no all-pairs.
    """
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            bind(
                tokens(text_col),
                lambda tk: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(tk), F.lit(1)),
                        F.lit(span_tokens),
                    ),
                    lambda s: F.concat_ws(" ", F.slice(tk, s, span_tokens)),
                ),
            )
        ).alias("span_idx", "span"),
    )
    # first occurrence = min combined key; span_idx is bounded far
    # below 1e6 (docs are token-bounded), so the packing is injective.
    # The winner decision is ONE window over span-content partitions
    # (r5: the previous aggregate-then-rejoin shape shuffled the span
    # text twice — once into the winner aggregate, once as the join
    # probe; the window shuffles it once and marks in place). Span
    # content is high-cardinality, so the window partitioning has no
    # skew beyond genuinely viral passages.
    key = F.col("doc_id") * 1_000_000 + F.col("span_idx")
    marked = spans.withColumn(
        "keep", key == F.min(key).over(W.partitionBy("span"))
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keep"), F.struct("span_idx", "span"))
                )
            ),
            lambda x: x["span"],
        ),
        " ",
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(
            F.sum(F.col("keep").cast("double")) / F.count(F.lit(1)), 6
        ).alias("kept_ratio"),
        F.md5(kept_text).alias("dedup_text_md5"),
    )


def boilerplate_span_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 16,
    max_doc_frac: float = 0.01,
) -> DataFrame:
    """Boilerplate filter (the header/footer/banner-removal pass of a
    pretraining pipeline): a fixed-width token span that occurs in
    more than ``max_doc_frac`` of all documents is boilerplate and is
    dropped from EVERY document; the surviving text is reassembled in
    span order.

    Distinct from span_dedup's keep-first: keep-first retains one
    copy of a repeated passage, the boilerplate pass removes all of
    them — the right semantics for site chrome that carries no
    training signal.

    Output: (doc_id, n_spans, n_boiler, clean_text_md5).

    100 TB posture: one distinct-doc-count shuffle keyed by span
    content, one winner join keyed the same, one reassembly groupBy —
    same shapes as span_dedup; the doc-count threshold is computed
    from a 1-row broadcast aggregate, never on the driver.
    """
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            bind(
                tokens(text_col),
                lambda tk: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(tk), F.lit(1)),
                        F.lit(span_tokens),
                    ),
                    lambda s: F.concat_ws(" ", F.slice(tk, s, span_tokens)),
                ),
            )
        ).alias("span_idx", "span"),
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    span_df = (
        spans.select("span", "doc_id")
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "span",
            (F.col("sdf") > F.col("n_docs") * F.lit(max_doc_frac)).alias("boiler"),
        )
    )
    marked = spans.join(span_df, "span")
    clean_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("boiler"), F.struct("span_idx", "span"))
                )
            ),
            lambda x: x["span"],
        ),
        " ",
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
        F.md5(clean_text).alias("clean_text_md5"),
    )


# ----------------------------------------------------------------- SimHash
def simhash(col: Column | str, bits: int = 60) -> Column:
    """SimHash sketch of the token multiset: bit b of the result is the
    sign of Σ_tokens (±1 by bit b of the token hash). Built entirely
    from higher-order functions — per-row, no explode, no shuffle.

    ``bits`` is capped at 60 because ``hash_long`` is a 60-bit hash
    (15 hex chars of md5): bits 60-63 of the token hash are always 0,
    so wider sketches would carry dead never-positive bits.

    The token-hash array (the md5 work) is ``bind``-bound so the
    ``bits`` per-bit vote aggregates re-traverse precomputed longs
    instead of re-hashing every token per bit."""
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash bits must be in [1, 60], got {bits}")
    tok_hashes = F.transform(tokens(col), lambda t: hash_long(t))

    def assemble(hs: Column) -> Column:
        def bit_vote(b: int):  # closure factory — see perm() in minhash
            return lambda acc, h: acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        out = F.lit(0).cast("long")
        for b in range(bits):
            vote = F.aggregate(hs, F.lit(0), bit_vote(b))
            out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
        return out

    return bind(tok_hashes, assemble)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1000,
    observation=None,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole banding (a pair within
    Hamming ≤ max_hamming must agree exactly on ≥1 of bands) →
    in-bucket pair enumeration → exact Hamming verify.

    Same scale shape as minhash_lsh_pairs: ONE shuffle of the narrow
    sketch table into (band, band_key) buckets and pair enumeration
    inside each bucket — no self-join, so the corpus is not shuffled
    twice and join-key skew never materializes; ``max_bucket_size``
    caps degenerate buckets (all-identical boilerplate sketches).
    As in minhash_lsh_pairs, pass ``observation`` to surface
    ``dropped_buckets``/``dropped_member_mass`` for the cap.

    CACHE LIFETIME (ADVICE r7/r8): the banded sketch frame stays
    cached for the life of the returned DataFrame (its lineage reads
    it twice) and is registered with the module release contract —
    the next invocation frees it, ``dedup.release_caches()`` frees it
    immediately."""
    width = bits // bands
    sk = df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sk"))
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("sk"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            for b in range(bands)
        ]
    )
    # persisted for the same two-consumer reason as minhash_lsh_pairs'
    # banded frame (the sketch HOF would re-run per pass); narrow rows
    banded = sk.select(
        "id", "sk", F.posexplode(band_arr).alias("band", "band_key")
    ).persist()
    caches = [banded]
    # cap BEFORE collecting membership (same degenerate-bucket OOM
    # guard as minhash_lsh_pairs — see its comment)
    sizes = banded.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("__n")
    )
    if observation is not None:
        sizes = _observe_cap_sizes(sizes, observation, "__n", max_bucket_size)
        caches.append(sizes)
    _register_caches("simhash_near_pairs", caches)
    ok = sizes.filter(F.col("__n").between(2, max_bucket_size)).select(
        "band", "band_key"
    )
    buckets = (
        banded.join(ok, ["band", "band_key"], "left_semi")
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sk"))).alias("ms"))
    )
    pair_arr = bind(
        F.col("ms"),
        lambda ms: F.flatten(
            F.transform(
                ms,
                lambda x, i: F.transform(
                    F.slice(ms, i + 2, F.size(ms)),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        x["sk"].alias("sk_a"),
                        y["sk"].alias("sk_b"),
                    ),
                ),
            )
        ),
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.sk_a", "p.sk_b")
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
    # Neighbor bands too (a near-dup pair may straddle a band edge),
    # expressed as an EQUI-join: the left side probes its own band AND
    # both adjacent bands, so Catalyst gets a hash/sort-merge join
    # instead of the O(N²) nested-loop an `abs(r.lband - l.lband) <= 1`
    # theta predicate would force. Probing both neighbors is required
    # because the join keeps only l.id < r.id — the lower-id doc of a
    # straddling pair may sit in either the higher or the lower band.
    l = base.select(
        F.col("id"),
        F.col("grams"),
        F.explode(
            F.array(F.col("lband") - 1, F.col("lband"), F.col("lband") + 1)
        ).alias("jband"),
    ).alias("l")
    r = base.withColumnRenamed("lband", "jband").alias("r")
    cand = l.join(
        r,
        (F.col("l.jband") == F.col("r.jband")) & (F.col("l.id") < F.col("r.id")),
        "inner",
    )
    return (
        cand.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jaccard(F.col("l.grams"), F.col("r.grams")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
