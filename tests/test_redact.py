"""PII redaction: exact planted-case behavior, false-positive guards, and
the DuckDB cross-engine twin (patterns must mean the same thing to Java's
regex and RE2 — the redact module's documented contract)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkfuse.redact import (
    PII_PATTERNS,
    pii_stats,
    pii_stats_oracle_sql,
    redact_oracle_sql,
    redact_pii,
)

PLANTED = [
    # (id, text, expected_redacted)
    (0, "mail me at jane.doe+spam@example.co.uk today",
     "mail me at <EMAIL> today"),
    (1, "server at 192.168.1.254 timed out", "server at <IPV4> timed out"),
    (2, "ssn 123-45-6789 on file", "ssn <SSN> on file"),
    (3, "card 4111 1111 1111 1111 declined", "card <CREDIT_CARD> declined"),
    (4, "call 555-123-4567 or (212) 555-0199",
     "call <PHONE> or <PHONE>"),
    (5, "intl +44 20 7946 0958 works", "intl <PHONE> works"),
    # false-positive guards: dates, versions, id-ish digit runs survive
    (6, "released 2024-08-17 version 1.2.3 build 20240817",
     "released 2024-08-17 version 1.2.3 build 20240817"),
    (7, "order 978-0-306-40615 qty 12", "order 978-0-306-40615 qty 12"),
    (8, "no pii here", "no pii here"),
    # two kinds in one document, email containing digits
    (9, "a1b2@x.io from 10.0.0.1", "<EMAIL> from <IPV4>"),
]


@pytest.fixture(scope="module")
def planted_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in PLANTED], "doc_id long, text string"
    )


def test_redact_planted_cases(spark, planted_df):
    got = {
        r["doc_id"]: r["text"]
        for r in redact_pii(planted_df, "text").collect()
    }
    for i, _, want in PLANTED:
        assert got[i] == want, (i, got[i], want)


def test_redact_out_col_preserves_input(spark, planted_df):
    out = redact_pii(planted_df, "text", out_col="clean").collect()
    for r in out:
        if r["doc_id"] == 2:
            assert "123-45-6789" in r["text"] and "<SSN>" in r["clean"]


def test_redact_is_single_projection_no_exchange(spark, planted_df):
    plan = redact_pii(planted_df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_stats_counts(spark, planted_df):
    rows = {r["doc_id"]: r.asDict() for r in
            pii_stats(planted_df, "doc_id", "text").collect()}
    assert rows[0]["n_email"] == 1 and rows[0]["n_pii"] == 1
    assert rows[4]["n_phone"] == 2 and rows[4]["n_pii"] == 2
    assert rows[6]["n_pii"] == 0 and rows[7]["n_pii"] == 0
    assert rows[9]["n_email"] == 1 and rows[9]["n_ipv4"] == 1


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Real documents text with planted PII appended — exercises the
    patterns against organic text, not just the planted lines."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
    )
    planted = spark.createDataFrame(
        [(10_000 + i, t) for i, t, _ in PLANTED], "doc_id long, text string"
    )
    df = docs.unionByName(planted)
    path = str(tmp_path_factory.mktemp("redact") / "corpus.parquet")
    df.toPandas().to_parquet(path, index=False)
    return df, path


def test_pii_stats_matches_duckdb_twin(spark, corpus):
    df, path = corpus
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM '{path}'")
    want = {
        r[0]: r[1:]
        for r in con.execute(
            pii_stats_oracle_sql("corpus", "doc_id", "text")
        ).fetchall()
    }
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in pii_stats(df, "doc_id", "text").collect()
    }
    assert got.keys() == want.keys()
    mismatches = {k: (got[k], want[k]) for k in got if tuple(got[k]) != tuple(want[k])}
    assert not mismatches, mismatches


def test_redact_matches_duckdb_twin(spark, corpus):
    df, path = corpus
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM '{path}'")
    want = dict(
        con.execute(redact_oracle_sql("corpus", "doc_id", "text")).fetchall()
    )
    got = {
        r["doc_id"]: r["redacted"]
        for r in redact_pii(df, "text", out_col="redacted")
        .select("doc_id", "redacted")
        .collect()
    }
    assert got == want


def test_unknown_kind_raises(spark, planted_df):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(planted_df, "text", kinds=("email", "name"))


def test_kind_subset_only_touches_selected(spark, planted_df):
    out = {
        r["doc_id"]: r["text"]
        for r in redact_pii(planted_df, "text", kinds=("email",)).collect()
    }
    assert out[0] == "mail me at <EMAIL> today"
    assert out[2] == "ssn 123-45-6789 on file"  # ssn untouched


def test_pattern_order_is_canonical():
    # credit_card must precede phone (a PAN half-eaten by the phone
    # pattern would leak digits) and ssn must precede phone
    kinds = [k for k, _ in PII_PATTERNS]
    assert kinds.index("credit_card") < kinds.index("phone")
    assert kinds.index("ssn") < kinds.index("phone")


def test_curate_documents_redact_stage(spark, tmp_path):
    """redact=True makes documents differing ONLY in their PII collapse to
    one canonical doc, and the whole pipeline still matches its DuckDB
    twin (redaction CTE prefixed)."""
    import pandas as pd

    from sparkfuse.pipeline import curate_documents, curate_documents_oracle_sql

    rows = [
        (1, "contact alice at alice@example.com for the report today ok"),
        (2, "contact alice at bob.smith@corp.io for the report today ok"),
        (3, "a completely different document about distributed systems design"),
        (4, "short doc"),  # fails min_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"] for r in curate_documents(df, "doc_id", "text", redact=True).collect()
    )
    # 1 and 2 redact to identical text -> exact dup, min id kept; 4 too short
    assert kept == [1, 3]
    # without redaction they are distinct documents
    kept_plain = sorted(
        r["doc_id"] for r in curate_documents(df, "doc_id", "text").collect()
    )
    assert kept_plain == [1, 2, 3]

    path = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path, index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{path}'")
    want = sorted(
        r[0]
        for r in con.execute(
            curate_documents_oracle_sql("docs", "doc_id", "text", redact=True)
        ).fetchall()
    )
    assert want == kept
