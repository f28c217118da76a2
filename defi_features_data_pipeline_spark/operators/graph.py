"""Connected components over an edge list — the step that turns
pairwise near-dup matches into dedup groups (keep min id per
component).

Reference scope note: the reference has no graph operator; this is
part of the training-data-pipeline surface (near-dup clustering after
LSH/cosine pair generation).

Algorithm: iterative min-label propagation PLUS pointer jumping.
Each round does

1. neighbor-min: ``label(v) <- min(label(v), min over neighbors u of
   label(u))`` — one equi-join edges⋈labels + groupBy min;
2. pointer jump: ``label(v) <- label(label(v))`` — labels⋈labels.

Plain propagation needs O(diameter) rounds (a 1M-node chain would need
1M joins); the jump step halves the remaining distance-to-root every
round, so convergence is O(log diameter) — the standard
large-star/small-star trick from the MapReduce CC literature. Each
round shuffles on node id only; at 100 TB the per-round cost is two
hash joins on bigint keys.

Convergence is detected by a changed-count of 0 (at the fixed point
every label is the component's min id and labels are idempotent, so
both steps are no-ops). If ``max_iters`` rounds pass without reaching
the fixed point the result would be silently under-merged — that is an
ERROR here, never a silent return.

Iterative-plan hygiene: every round ``localCheckpoint``s the label
frame, otherwise the lineage re-plans all previous joins and the plan
grows exponentially. On a real cluster prefer ``checkpoint()`` to
reliable storage (localCheckpoint dies with an executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, label) for every node in ``edges``, where ``label`` is
    the minimum node id of the node's connected component.

    ``edges`` must be SYMMETRIC (both (a,b) and (b,a) present);
    isolated nodes (no edges) are the caller's concern — they never
    appear here. Raises RuntimeError if ``max_iters`` rounds do not
    converge (with jumping, 25 rounds cover diameters beyond 2^20 —
    hitting the guard means something is wrong, not that more
    iterations are needed)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            e.join(labels, e.dst == labels.node)
            .groupBy(F.col("src").alias("nm_node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == F.col("nm_node"), "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: follow label -> label(label). Every label value
        # is itself a node id present in `propagated`, so the lookup is
        # an equi self-join; coalesce is only defensive.
        lookup = propagated.select(
            F.col("node").alias("j_node"), F.col("label").alias("j_label")
        )
        jumped = (
            propagated.join(lookup, propagated.label == F.col("j_node"), "left")
            .select(
                "node",
                F.coalesce(F.col("j_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "the labeling is still moving and returning it would silently "
        "under-merge components. With pointer jumping this bound covers "
        "diameters beyond 2^20; check the edge list (must be symmetric) "
        "or raise max_iters."
    )
