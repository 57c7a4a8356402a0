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
    method: str = "hashmin",
) -> DataFrame:
    """(id, comp) for every id appearing in ``pairs``; comp = min id in the
    node's connected component. Deterministic (pure min fixpoint).

    method:
      * ``"hashmin"`` (default) — plain label propagation, one join + one
        min-aggregate per round, O(diameter) rounds. The right default for
        near-dup graphs (stars and shallow chains).
      * ``"jump"`` — hash-min plus POINTER JUMPING each round: after
        propagating, every label is replaced by its label's label
        (comp := label(comp), a self-join on the label table), doubling the
        reach per round — O(log diameter) rounds. Use for graphs with long
        chains that would exhaust an O(d) round budget (a 100-node path
        converges in ~7 jumping rounds vs ~99 propagation rounds). Costs one
        extra join + checkpoint per round, so hash-min stays the default
        where diameters are small. Both methods reach the identical fixpoint
        (min reachable id — property-tested against union-find).
    """
    if method not in ("hashmin", "jump"):
        raise ValueError(f"method must be 'hashmin' or 'jump', got {method!r}")
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
        )
        if method == "jump":
            # comp := label(comp). Every comp value is itself a node id (the
            # min id reached so far), so its row exists; the left join +
            # coalesce only guards the invariant, and least() is monotone —
            # labels never increase, preserving the min fixpoint.
            jump_to = new_labels.select(
                F.col("id").alias("comp"), F.col("comp").alias("_jump")
            )
            new_labels = new_labels.join(jump_to, "comp", "left").select(
                "id",
                F.coalesce(F.least("comp", "_jump"), F.col("comp")).alias("comp"),
            )
        new_labels = new_labels.localCheckpoint()
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
