"""Connected-components canonicalization tests (transitive near-dup clusters)."""

import pytest
from pyspark.sql import functions as F

from sparkfuse.graph import connected_components, components_oracle_sql


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_chain_collapses_to_min(spark):
    # A~B~C chain: (A, C) is not an edge, only transitivity links them
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(_pairs(spark, [(1, 2), (2, 3)])).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1}


def test_star_with_nonminimal_center(spark):
    # center 3, leaves 0 and 1: pairwise-drop would keep BOTH leaves; the
    # component collapses to one canonical id (0)
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(_pairs(spark, [(0, 3), (1, 3)])).collect()
    }
    assert labels == {0: 0, 1: 0, 3: 0}


def test_multiple_components_and_determinism(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    a = {r["id"]: r["comp"] for r in connected_components(_pairs(spark, edges)).collect()}
    b = {r["id"]: r["comp"] for r in connected_components(_pairs(spark, edges)).collect()}
    assert a == b
    assert a == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_path_needs_diameter_rounds(spark):
    # a 12-node path has diameter 11: a 2-round budget must fail LOUDLY,
    # and max_rounds = diameter suffices EXACTLY (the confirming no-change
    # pass is free — only label-changing rounds consume budget)
    path = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, path), max_rounds=2)
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(_pairs(spark, path), max_rounds=11).collect()
    }
    assert set(labels.values()) == {0}


def test_jump_converges_in_log_rounds(spark):
    # a 50-node path (diameter 49) is unlabelable for hash-min under a
    # 7-round budget, but pointer jumping doubles reach per round:
    # ceil(log2(49)) + 1 = 7 changing rounds suffice
    path = [(i, i + 1) for i in range(49)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, path), max_rounds=7)
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(
            _pairs(spark, path), max_rounds=7, method="jump"
        ).collect()
    }
    assert labels == {i: 0 for i in range(50)}


def test_jump_rejects_unknown_method(spark):
    with pytest.raises(ValueError, match="method"):
        connected_components(_pairs(spark, [(1, 2)]), method="nope")


def test_matches_recursive_cte_oracle(spark, tmp_path):
    import duckdb

    edges = [(5, 9), (9, 2), (14, 15), (3, 5)]
    got = sorted(
        (r["id"], r["comp"])
        for r in connected_components(_pairs(spark, edges)).collect()
    )
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = components_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(id_a, id_b)"
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp_min = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(3, 40, 25), (7, 60, 80), (11, 30, 60)])
def test_random_graphs_match_union_find(spark, seed, n_nodes, n_edges):
    import random

    rng = random.Random(seed)
    edges = []
    while len(edges) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    want = _union_find_labels(edges)
    for method in ("hashmin", "jump"):
        got = {
            r["id"]: r["comp"]
            for r in connected_components(
                _pairs(spark, edges), method=method
            ).collect()
        }
        assert got == want, method


def test_curate_components_collapses_chain(spark):
    # end-to-end through curate_documents: a text chain A~B~C (window
    # shingle overlap) keeps only A under components, A and C under pairwise
    from sparkfuse.pipeline import curate_documents

    w = [f"w{i}x" for i in range(13)]
    rows = [
        # star through center 3: 1~3 and 2~3 near-dup, 1 !~ 2
        (1, " ".join(w[0:9])),
        (2, " ".join(w[4:13])),
        (3, " ".join(w[2:11])),
        (50, "completely unrelated content about spark adaptive execution plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    comp = sorted(
        r["doc_id"]
        for r in curate_documents(docs, "doc_id", "text", canonical="components").collect()
    )
    pair = sorted(
        r["doc_id"]
        for r in curate_documents(docs, "doc_id", "text", canonical="pairwise").collect()
    )
    assert comp == [1, 50]      # one canonical doc for the whole cluster
    assert pair == [1, 2, 50]   # pairwise only drops id_b (3): keeps BOTH leaves
    with pytest.raises(ValueError, match="canonical"):
        curate_documents(docs, "doc_id", "text", canonical="nope").collect()
