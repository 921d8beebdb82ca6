"""Reproducible scale fixtures for the BASELINE.md 10x/100x tables.

Replicates the sf0.1 documents table N times with a per-replica
suffix token (near-dup-heavy — replicas are ~0.97 Jaccard neighbors
of the original, so dedup workloads grow quadratically in dup-degree
by construction) and symlinks the other tables unchanged. doc_ids
stay unique (replica r adds r*1_000_000).

    python tools/scale_fixture.py 10 /tmp/sfx10
    python tools/scale_fixture.py 100 /tmp/sfx100
    python tools/microbench.py /tmp/sfx10 <query> ...

The same fixture then drives the correctness-at-scale sweep:

    python tools/verify_oracle.py /tmp/sfx10 <doc-centric queries>
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OTHER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]


def build(mult: int, out: str, src: str = SRC) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # corpus_snapshot_diff and the dedup fixtures (exact/simhash/
    # minhash/pipeline injected duplicates, r5) key their synthetic
    # rows at doc_id + 2e9 and document that offset as collision-free;
    # keep the fixture inside that invariant (ADVICE r4: at mult >
    # ~2000 the replica id space would cross 2e9 and silently break
    # it — r5 found and fixed exactly that collision class when the
    # injected-duplicate offset was still 1e6, inside replica space).
    (max_id,) = con.execute(
        f"SELECT MAX(doc_id) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()
    if max_id + (mult - 1) * 1_000_000 >= 2_000_000_000:
        raise ValueError(
            f"mult={mult} would push doc_ids past 2e9 and collide with "
            "corpus_snapshot_diff's re-key offset; use a smaller mult"
        )
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.r * 1000000 AS doc_id,
                 d.text || ' rep' || CAST(r.r AS VARCHAR) AS text,
                 d.lang, d.source,
                 -- keep the base-table invariant n_chars == length(text):
                 -- the suffix is 4 + digits(r) chars, not a flat 5
                 d.n_chars + 4 + length(CAST(r.r AS VARCHAR)) AS n_chars
          FROM read_parquet('{src}/documents.parquet') d
          CROSS JOIN (SELECT UNNEST(range({mult})) AS r) r
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in OTHER_TABLES:
        dst = f"{out}/{t}.parquet"
        # always re-point (stale/dangling links from a prior build
        # against a different src must not survive a rebuild)
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{src}/{t}.parquet", dst)


if __name__ == "__main__":
    build(int(sys.argv[1]), sys.argv[2])
    print(f"wrote {sys.argv[2]} (documents x{sys.argv[1]})")
