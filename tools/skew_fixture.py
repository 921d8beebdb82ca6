"""Data-skew fixture for the certification sweep (r4 verdict item 7).

The hostile-config sweep proves layout/join-strategy independence;
this fixture proves the SKEW GUARDS work on actual skewed data rather
than by argument: one hot key takes ~40% of the mass in each of the
two natural partitioning keys the engine windows/groups on —

  - documents.source → one source value holds 40% of docs, so the
    derived registered domain (``{source}-site.{tld}``) concentrates
    the same way: the mega-domain the per-domain cap polices, the hot
    posting lists in the inverted index, the hot corpus slice in
    every text aggregate.
  - orders.o_custkey → one existing customer holds 40% of orders:
    the hot group for per-customer windows/collections and the hub
    node in the interaction graph.
  - embeddings.embedding → ~40% of vectors are replaced by ONE shared
    vector (a viral near-duplicate cluster), so a single LSH
    signature bucket — one partition directory of the materialized
    ANN index — carries 40% of the corpus: the oversized-write-slice
    and hot-probe shape of r8 verdict item 8. The probe vector
    (vec_id 0) is itself hot, so the indexed top-k reads the viral
    bucket and resolves pure cosine ties by vec_id.

Everything else (ids, text, lineitem, joins' FK validity) is
untouched, so every DuckDB oracle replays unchanged on the same
parquet — correctness under skew is checked by the same value-hash
gate as every other sweep.

    python tools/skew_fixture.py /tmp/skewfix [src_sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.01"
UNTOUCHED = [
    "region", "nation", "customer", "supplier", "part",
    "lineitem", "events",
]


def build(out: str, src: str = SRC) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # ~40% of docs into one source => one registered domain per tld
    # carries ~13% of the corpus each and the source-level key 40%
    con.execute(
        f"""
        COPY (
          SELECT doc_id,
                 text,
                 lang,
                 CASE WHEN doc_id % 5 < 2 THEN 'hotsrc' ELSE source END
                   AS source,
                 n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # ~40% of orders onto one existing customer (FKs stay valid)
    (hot_cust,) = con.execute(
        f"SELECT MIN(c_custkey) FROM read_parquet('{src}/customer.parquet')"
    ).fetchone()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_orderkey % 5 < 2 THEN {hot_cust}
                 ELSE o_custkey END AS o_custkey)
          FROM read_parquet('{src}/orders.parquet')
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    # ~40% of vectors collapse onto one shared vector → one viral LSH
    # signature bucket (one oversized ANN partition dir); every oracle
    # recomputes signatures from this same parquet, so value-hash
    # checks replay unchanged
    con.execute(
        f"""
        COPY (
          WITH hot AS (
            SELECT embedding AS hv
            FROM read_parquet('{src}/embeddings.parquet')
            ORDER BY vec_id LIMIT 1 OFFSET 7
          )
          SELECT vec_id,
                 CASE WHEN vec_id % 5 < 2 THEN hot.hv ELSE embedding END
                   AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet'), hot
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in UNTOUCHED:
        dst = f"{out}/{t}.parquet"
        # always re-point: a kept link from a previous build against a
        # different (or since-regenerated) src would silently mix two
        # sources into one fixture, and a dangling link fails
        # os.path.exists yet still makes os.symlink raise
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{src}/{t}.parquet", dst)


# the queries whose plans window/group/join on the skewed keys —
# the regression net certify.py drives over this fixture
SKEW_QUERIES = [
    "domain_topk_caps",          # mega-domain top-N cap (salted window)
    "web_curation_pipeline",     # cap + gates + budget composition
    "inverted_index_postings",   # hot posting list
    "tfidf_top_terms",           # hot term df
    "text_bigram_surprisal",     # hot bigram in the broadcast model
    "text_unigram_surprisal",    # hot unigram mass
    "text_collocations_lift",    # hot collocation pairs
    "token_budget_waterfill",    # one source dominating the budget
    "window_running_frames",     # hot o_custkey frames window (cust 0
                                 # is the hot key and passes the <=100
                                 # sample filter, so ~40% of orders
                                 # land in one window partition)
    "j5_child_collection",       # hot customer's child list
    "graph_pagerank",            # hub node in the interaction graph
    "dedup_exact",               # unchanged content hashes under skew
    # r7 verdict item 6: the star-expansion + signature-estimate LSH
    # path under adversarial bucket skew — the hot source slab makes
    # shared shingle buckets concentrate, which is exactly the viral-
    # bucket shape the cap-before-collect guard polices
    "dedup_clusters",            # LSH star -> hash-min components
    "leakage_safe_split",        # components -> cluster-hash split
    # r8 verdict item 8: the materialized ANN index under a viral
    # near-dup cluster — one signature bucket holds ~40% of vectors,
    # so the build's hot partition dir takes an oversized write slice
    # and the (hot) probe reads the viral bucket; identity vs the
    # DuckDB hamming-gate oracle must hold
    "similarity_ann_indexed",    # build + single hot probe
    "similarity_knn_join_bulk",  # distributed batch face, hot queries
    # r9 verdict item 7: the refresh path under a viral bucket — the
    # fixture's shared vector makes ONE signature bucket hold ~40% of
    # the index, and ann_refresh_probe's negated updates delete+
    # reinsert straight through that oversized partition (the
    # delete_by_keys/upsert_replace rewrite of the hot dir)
    "ann_refresh_probe",         # CDC fold through the hot bucket
]


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewfix"
    src = sys.argv[2] if len(sys.argv) > 2 else SRC
    build(out, src)
    print(f"wrote {out} (hot source + hot custkey at ~40% mass)")
