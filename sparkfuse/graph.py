"""Connected components over near-duplicate pair edges.

Corpus dedup needs TRANSITIVE clustering: a chain A~B~C must collapse to one
canonical document even when A and C are not themselves a near-dup pair.
``connected_components`` labels every node with the minimum id reachable from
it (hash-min label propagation), the standard distributed CC formulation:

    labels   := id -> id
    repeat:  label(v) := min(label(v), min over neighbors u of label(u))
    until no label changes

Each round is one join + one min-aggregate — both shuffle on the node id, so
AQE coalesces/splits as usual; no driver-side graph ever exists. Convergence
is O(diameter) rounds; near-dup clusters are short-diameter (boilerplate
families are star-shaped, chains are rare and shallow), so the default round
budget of 25 covers any realistic corpus — and the operator FAILS LOUDLY if
the budget is exhausted rather than returning partial labels. Lineage is cut
per round with ``localCheckpoint`` (iterative plans otherwise grow
exponentially in Catalyst); at cluster scale prefer a reliable checkpoint
dir (``spark.sparkContext.setCheckpointDir``) for executor-loss resilience.

The operator is oracle-checkable: min-reachable-id is expressible as a SQL
recursive CTE (DuckDB ``WITH RECURSIVE``), so the driver's correctness gate
covers it end-to-end (entry query ``neardup_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, comp) for every id appearing in ``pairs``; comp = min id in the
    node's connected component. Deterministic (pure min fixpoint).
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    labels = (
        und.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    changing_rounds = 0
    while True:
        prop = und.join(
            labels.select(F.col("id").alias("src"), "comp"), "src"
        ).select(F.col("dst").alias("id"), "comp")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "_old"), "id"
            )
            .filter(F.col("comp") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
        # only rounds that still change labels consume budget: the final
        # confirming (no-change) pass is free, so max_rounds = graph
        # diameter suffices exactly
        changing_rounds += 1
        if changing_rounds > max_rounds:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} "
                "label-changing rounds — the pair graph has a longer chain "
                "than the round budget; raise max_rounds (rounds needed = "
                "graph diameter)"
            )


def components_reach_cte(pairs_cte: str = "pairs") -> str:
    """Shared CTE fragment (``edges``, ``reach``) enumerating (node,
    reachable id) over the undirected pair edges of an existing
    ``pairs_cte`` producing (id_a, id_b). Compose inside a
    ``WITH RECURSIVE`` chain — the single source of truth for the CC oracle
    formulation (used by both ``components_oracle_sql`` and the
    curate_documents oracle)."""
    return f"""edges AS (
  SELECT id_a AS src, id_b AS dst FROM {pairs_cte}
  UNION
  SELECT id_b, id_a FROM {pairs_cte}
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
)"""


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB recursive-CTE twin: min reachable id per node over the pair
    edges produced by ``pairs_sql`` (a SELECT yielding id_a, id_b)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
{components_reach_cte()}
SELECT id, MIN(comp) AS comp FROM reach GROUP BY id
"""
