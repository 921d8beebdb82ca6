"""Scale pin for the r13 shingle-bind fix (r13 verdict item 7).

r13 commit ee94d7f bind-bound the token array / normalized string out
of the shingle HOF lambdas on structural evidence only: interpreted
HOF lambdas sit outside codegen CSE, so an inlined ``tokens(col)``
re-runs the regex split once per gram — O(tokens²) per document —
which the bench fixture's ~50-token docs cannot show. This pin builds
synthetic long documents (the CPU regime the fix targets), times the
BOUND form (the shipped ``operators.dedup.word_shingles``) against a
local replica of the pre-r13 INLINED expression at increasing doc
lengths, and prints the walls — the inlined form must diverge
superlinearly while the bound form stays ~linear.

    python tools/shingle_scale_pin.py [out_json]

One noop-sink run per (form, length) after a warm-up, min of 2.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 256
LENGTHS = [500, 1000, 2000, 4000]


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None

    from pyspark.sql import functions as F

    from otrrentetl_spark.operators.dedup import word_shingles
    from otrrentetl_spark.operators.text import tokens
    from otrrentetl_spark.session import get_spark

    def word_shingles_inlined(col, n: int = 3):
        # pre-r13 shape: the token-array expression appears INSIDE the
        # interpreted transform lambda, so it re-evaluates per gram
        toks = tokens(col)
        k = F.size(toks)
        starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
        grams = F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        )
        return F.array_distinct(grams)

    spark = get_spark(
        "shingle-scale-pin",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def corpus(n_tokens: int):
        # deterministic pseudo-words; every doc distinct
        return spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_tokens)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.conv(
                            (i * 2654435761 + F.col("id")).cast("string"),
                            10,
                            36,
                        ),
                    ),
                ),
                " ",
            ).alias("text"),
        )

    def run(expr_fn, n_tokens: int) -> float:
        df = corpus(n_tokens).select(
            F.size(expr_fn(F.col("text"))).alias("n")
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # warm-up: codegen both shapes once at the smallest length
    run(word_shingles, 100)
    run(word_shingles_inlined, 100)

    rows = []
    for n_tokens in LENGTHS:
        bound_s = run(word_shingles, n_tokens)
        inlined_s = run(word_shingles_inlined, n_tokens)
        rows.append(
            {
                "tokens_per_doc": n_tokens,
                "bound_s": bound_s,
                "inlined_s": inlined_s,
                "ratio": round(inlined_s / max(bound_s, 1e-9), 2),
            }
        )
        print(rows[-1])

    out = {"n_docs": N_DOCS, "rows": rows}
    if out_json:
        Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
