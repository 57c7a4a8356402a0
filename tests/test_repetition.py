"""Within-document repetition signals: hand-computed planted values, the
exact DuckDB cross-engine twins (on planted AND organic documents), and
the zero-exchange plan-shape claim that makes repetition filtering a
scan-speed stage."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfuse.bucketing import exchange_count
from sparkfuse.repetition import (
    dup_fraction_gate,
    dup_fraction_gate_sql,
    repetition_cols,
    repetition_oracle_sql,
    repetition_stats,
    top_gram_counts,
    top_gram_counts_oracle_sql,
)
from sparkfuse.textops import quality_stats

PLANTED = [
    (0, "menu\nhome\nmenu\nabout\nmenu"),          # repeated line x3
    (1, "a b a b a b"),                            # repeated bigram
    (2, "one line only, no repeats here"),
    (3, ""),                                       # empty doc
    (4, "x"),                                      # 1 token: no 2/3-grams
    (5, "hdr\n\nhdr\n\nbody text body text\nhdr"), # empty lines skipped
    (6, "é ü é ü é"),                              # non-ASCII chars
    (7, "tab\tsep  and\nnewline tab\tsep"),        # mixed whitespace tokens
]


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("rep") / "planted.parquet")
    pd.DataFrame(PLANTED, columns=["doc_id", "text"]).to_parquet(
        path, index=False
    )
    return df, path


def _twin_frames(spark_df, oracle_sql, path):
    got = spark_df.toPandas()
    con = duckdb.connect()
    con.sql(f"create view t as select * from '{path}'")
    want = con.sql(oracle_sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_hand_computed_values(spark, planted):
    df, _ = planted
    rows = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    # doc 0: lines [menu home menu about menu] -> 2 dups of 'menu' (8 chars)
    assert rows[0]["n_lines"] == 5
    assert rows[0]["n_dup_lines"] == 2
    assert rows[0]["chars_dup_lines"] == 8
    # doc 1: bigrams [a b, b a, a b, b a, a b] -> dups: 2x'a b'+1x'b a'
    assert rows[1]["n_grams_2"] == 5
    assert rows[1]["n_dup_grams_2"] == 3
    assert rows[1]["chars_dup_grams_2"] == 9
    # trigram 'a b a'/'b a b' each appear twice -> 2 dups, 5 chars each
    assert rows[1]["n_grams_3"] == 4
    assert rows[1]["n_dup_grams_3"] == 2
    assert rows[1]["chars_dup_grams_3"] == 10
    assert rows[2]["n_dup_lines"] == 0 and rows[2]["n_dup_grams_2"] == 0
    # empty doc: no lines, one empty token, zero grams
    assert rows[3]["n_lines"] == 0 and rows[3]["n_grams_2"] == 0
    # 1 token: the sequence() descending guard (would fabricate grams)
    assert rows[4]["n_grams_2"] == 0 and rows[4]["n_grams_3"] == 0
    # empty lines dropped: [hdr, hdr, 'body text body text', hdr] -> 2 dups
    assert rows[5]["n_lines"] == 4 and rows[5]["n_dup_lines"] == 2
    # non-ASCII: 'é ü' x2 dup -> beyond-first chars counted in code points
    assert rows[6]["n_dup_grams_2"] == 2  # 'é ü' and 'ü é' each repeat
    assert rows[6]["chars_dup_grams_2"] == 6


def test_repetition_matches_duckdb_twin_planted(spark, planted):
    df, path = planted
    _twin_frames(
        repetition_stats(df, "doc_id", "text"),
        repetition_oracle_sql("t", "doc_id", "text"),
        path,
    )


def test_repetition_matches_duckdb_twin_organic(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    path = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(path, index=False)
    _twin_frames(
        repetition_stats(docs, "doc_id", "text", ngram_ns=(2, 3, 5)),
        repetition_oracle_sql("t", "doc_id", "text", ngram_ns=(2, 3, 5)),
        path,
    )


def test_top_gram_counts_hand_and_twin(spark, planted):
    df, path = planted
    rows = {
        r["doc_id"]: r["top_gram_count"]
        for r in top_gram_counts(df, "doc_id", "text", n=2).collect()
    }
    assert rows[1] == 3          # 'a b' x3
    assert rows[0] == 1          # single line -> each bigram once
    assert 3 not in rows and 4 not in rows  # gramless docs emit no row
    _twin_frames(
        top_gram_counts(df, "doc_id", "text", n=2),
        top_gram_counts_oracle_sql("t", "doc_id", "text", n=2),
        path,
    )


def test_repetition_stats_plan_has_no_exchange(spark, planted):
    df, _ = planted
    assert exchange_count(repetition_stats(df, "doc_id", "text")) == 0
    assert exchange_count(
        repetition_stats(df, "doc_id", "text", engine="sql")
    ) == 0


def test_repetition_engines_bit_equal(spark, planted):
    """The arrow kernel (r6: pyarrow RE2 split + dictionary codes + numpy
    dup counting) must agree row-for-row with the pure-JVM SQL staging on
    the planted corpus PLUS the null/whitespace/tab-tail edge rows the
    DuckDB twins never see (NULL text must yield NULL counts; Java split
    keeps leading/trailing empty fields with limit -1)."""
    df, _ = planted
    edge = spark.createDataFrame(
        [
            (100, None),
            (101, "a\tb\t"),       # trailing separator: trailing "" token
            (102, "\ta b"),        # leading separator: leading "" token
            (103, "trail space "),
            (104, "a\x0bb c a\x0bb c"),  # \x0b is NOT a separator
            (105, "line\r\nwith cr\r\nline\r\nwith cr"),
        ],
        "doc_id long, text string",
    )
    both = df.unionByName(edge)
    for ns in [(2, 3), (1,), (3, 5)]:
        a = repetition_stats(both, "doc_id", "text", ns, engine="arrow")
        s = repetition_stats(both, "doc_id", "text", ns, engine="sql")
        assert a.columns == s.columns
        assert [f.dataType for f in a.schema] == [f.dataType for f in s.schema]
        assert a.exceptAll(s).count() == 0 and s.exceptAll(a).count() == 0


def test_dup_fraction_gate_matches_duckdb_twin(spark, planted):
    """The gate predicate agrees engine-for-engine, including the
    boundary ratio (doc 0: 2 dup / 5 lines exactly equals frac=0.4 —
    the case where DuckDB's DECIMAL literal reading would diverge from
    Spark's double if the twin didn't CAST to DOUBLE)."""
    df, path = planted
    con = duckdb.connect()
    con.sql(f"create view t as select * from '{path}'")
    for kwargs in (
        dict(max_dup_line_frac=0.4),
        dict(max_dup_line_frac=0.39),
        dict(max_dup_gram_frac=0.5, gram_n=2),
        dict(max_dup_line_frac=0.4, max_dup_gram_frac=0.5, gram_n=2),
        dict(),  # no gates -> keep everything
    ):
        got = sorted(
            r["doc_id"]
            for r in df.filter(dup_fraction_gate("text", **kwargs)).collect()
        )
        want = sorted(
            r[0]
            for r in con.sql(
                "select doc_id from t where "
                + dup_fraction_gate_sql("text", **kwargs)
            ).fetchall()
        )
        assert got == want, kwargs
    # sanity on the planted content: frac=0.39 drops the menu-spam doc
    kept = {
        r["doc_id"]
        for r in df.filter(
            dup_fraction_gate("text", max_dup_line_frac=0.39)
        ).collect()
    }
    assert 0 not in kept and 2 in kept and 3 in kept


def test_curate_documents_repetition_gate(spark, tmp_path):
    """The pipeline gate drops the boilerplate-heavy doc and the whole
    composition still matches its DuckDB twin with the gate predicate
    threaded through kept2."""
    from sparkfuse.pipeline import curate_documents, curate_documents_oracle_sql

    rows = [
        (1, "spam line here\nspam line here\nspam line here\nspam line here"),
        (2, "a completely different document about distributed systems design"),
        (3, "another ordinary document with enough distinct tokens inside it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kwargs = dict(max_dup_line_frac=0.5)
    kept = sorted(
        r["doc_id"]
        for r in curate_documents(df, "doc_id", "text", **kwargs).collect()
    )
    assert kept == [2, 3]  # doc 1: 3 dup / 4 lines > 0.5
    # without the gate doc 1 survives (it passes the token-count gates)
    assert sorted(
        r["doc_id"] for r in curate_documents(df, "doc_id", "text").collect()
    ) == [1, 2, 3]
    path = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path, index=False)
    con = duckdb.connect()
    con.sql(f"create view docs as select * from '{path}'")
    want = sorted(
        r[0]
        for r in con.sql(
            curate_documents_oracle_sql("docs", "doc_id", "text", **kwargs)
        ).fetchall()
    )
    assert want == kept


def test_repetition_cols_fuse_with_quality_projection(spark, planted):
    """The production composition: quality + repetition measurements in
    ONE projection over one scan — still exchange-free."""
    df, _ = planted
    fused = df.select(
        F.col("doc_id"), *repetition_cols("text", ngram_ns=(2,))
    ).join(quality_stats(df, "doc_id", "text"), "doc_id")
    single = df.select(
        F.col("doc_id"),
        F.length("text").cast("long").alias("n_chars_text"),
        *repetition_cols("text", ngram_ns=(2,)),
    )
    assert exchange_count(single) == 0
    got = {r["doc_id"]: r.asDict() for r in single.collect()}
    ref = {r["doc_id"]: r.asDict() for r in fused.collect()}
    for i in got:
        assert got[i]["n_dup_grams_2"] == ref[i]["n_dup_grams_2"]
        assert got[i]["n_chars_text"] == ref[i]["n_chars_text"]


# ---------------------------------------------------------------------------
# cross-document boilerplate lines (CCNet-style corpus-level line dedup)
# ---------------------------------------------------------------------------

_BL_PLANTED = [
    (0, "NAV MENU BAR\nreal content zero\nCOPYRIGHT FOOTER LINE"),
    (1, "NAV MENU BAR\nunique middle one\nCOPYRIGHT FOOTER LINE"),
    (2, "NAV MENU BAR\nanother body two"),
    (3, "NAV MENU BAR\nCOPYRIGHT FOOTER LINE"),      # all-boilerplate doc
    (4, "ok\nok\nsolo document body"),               # short line, in-doc dup
    (5, "ok\ntotally different text"),               # 'ok' in 2 docs, short
    (6, ""),                                          # empty doc
]


@pytest.fixture(scope="module")
def bl_planted(spark, tmp_path_factory):
    from sparkfuse.repetition import boilerplate_lines

    df = spark.createDataFrame(_BL_PLANTED, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("bl") / "planted.parquet")
    pd.DataFrame(_BL_PLANTED, columns=["doc_id", "text"]).to_parquet(
        path, index=False
    )
    return df, path


def test_boilerplate_lines_hand(spark, bl_planted):
    from sparkfuse.repetition import boilerplate_lines

    df, _ = bl_planted
    census = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(
            df, "doc_id", "text", min_docs=2, min_chars=3
        ).collect()
    }
    # distinct-document counts: doc 4's in-doc 'ok' duplicate never
    # double-counts, and min_chars=3 keeps 'ok' out entirely
    assert census == {"NAV MENU BAR": 4, "COPYRIGHT FOOTER LINE": 3}
    with_short = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(
            df, "doc_id", "text", min_docs=2, min_chars=1
        ).collect()
    }
    assert with_short["ok"] == 2


def test_boilerplate_census_matches_duckdb_twin(spark, bl_planted):
    from sparkfuse.repetition import (
        boilerplate_lines,
        boilerplate_lines_oracle_sql,
    )

    df, path = bl_planted
    _twin_frames(
        boilerplate_lines(df, "doc_id", "text", min_docs=2, min_chars=3),
        boilerplate_lines_oracle_sql(
            "t", "doc_id", "text", min_docs=2, min_chars=3
        ),
        path,
    )


@pytest.mark.parametrize("regime", ["broadcast", "join"])
def test_strip_boilerplate_hand(spark, bl_planted, regime):
    from sparkfuse.repetition import strip_boilerplate_lines

    df, _ = bl_planted
    rows = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(
            df, "doc_id", "text", min_docs=2, min_chars=3, regime=regime
        ).collect()
    }
    assert len(rows) == len(_BL_PLANTED)  # every doc survives, even empty
    assert rows[0]["text"] == "real content zero"
    assert rows[0]["n_lines_kept"] == 1 and rows[0]["n_lines_stripped"] == 2
    assert rows[3]["text"] == "" and rows[3]["n_lines_kept"] == 0
    assert rows[3]["n_lines_stripped"] == 2
    # 'ok' is under min_chars: kept, and doc 4's in-doc duplicate survives
    assert rows[4]["text"] == "ok\nok\nsolo document body"
    assert rows[6]["text"] == "" and rows[6]["n_lines_stripped"] == 0


def test_strip_regimes_agree_and_match_duckdb_twin(spark, bl_planted):
    from sparkfuse.repetition import (
        strip_boilerplate_lines,
        strip_boilerplate_oracle_sql,
    )

    df, path = bl_planted
    for regime in ("broadcast", "join"):
        _twin_frames(
            strip_boilerplate_lines(
                df, "doc_id", "text", min_docs=2, min_chars=3, regime=regime
            ),
            strip_boilerplate_oracle_sql(
                "t", "doc_id", "text", min_docs=2, min_chars=3
            ),
            path,
        )


def test_strip_boilerplate_organic_twin(spark, tmp_path):
    """Organic corpus, min_docs=2: any naturally repeated line across the
    synthetic documents is stripped identically in both engines."""
    from sparkfuse.repetition import (
        strip_boilerplate_lines,
        strip_boilerplate_oracle_sql,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    path = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(path, index=False)
    _twin_frames(
        strip_boilerplate_lines(docs, "doc_id", "text", min_docs=2),
        strip_boilerplate_oracle_sql("t", "doc_id", "text", min_docs=2),
        path,
    )


def test_strip_broadcast_is_projection_only(spark, bl_planted):
    """With the census collected, the broadcast-regime strip plans with
    ZERO exchanges — boilerplate removal rides the scan like the other
    repetition gates."""
    from sparkfuse.repetition import strip_boilerplate_lines

    df, _ = bl_planted
    out = strip_boilerplate_lines(
        df, "doc_id", "text", min_docs=2, min_chars=3, regime="broadcast"
    )
    assert exchange_count(out) == 0


def test_strip_broadcast_budget_raises(spark, bl_planted):
    from sparkfuse.repetition import strip_boilerplate_lines

    df, _ = bl_planted
    with pytest.raises(ValueError, match="max_broadcast"):
        strip_boilerplate_lines(
            df, "doc_id", "text", min_docs=2, min_chars=1, max_broadcast=1
        )


def test_curate_documents_boilerplate_stage(spark, tmp_path):
    """strip_boilerplate_min_docs composes into curate_documents BEFORE
    dedup: two documents differing only in shared boilerplate become
    exact duplicates and collapse to the min id — and the full gated
    pipeline matches the composed DuckDB twin."""
    import duckdb

    from sparkfuse.pipeline import (
        curate_documents,
        curate_documents_oracle_sql,
    )

    rows = [
        # same body, different boilerplate headers; each header is shared
        # by >= 3 docs while the shared body sits in only 2, so at
        # min_docs=3 the headers strip and the bodies survive -> docs 10
        # and 11 become exact duplicates after the strip
        (10, "SITE NAV ALPHA\ncommon body words here for quality gate"),
        (11, "SITE NAV BETA\ncommon body words here for quality gate"),
        (12, "SITE NAV ALPHA\nSITE NAV BETA\nunique body twelve with words"),
        (13, "SITE NAV ALPHA\nanother unique body thirteen some words"),
        (14, "SITE NAV BETA\nyet another body fourteen has words too"),
        (15, "no boilerplate at all fifteen plenty of words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        path, index=False
    )

    kept = sorted(
        r["doc_id"]
        for r in curate_documents(
            df, "doc_id", "text", strip_boilerplate_min_docs=3
        ).collect()
    )
    # 10/11 collapse to 10 once their headers are stripped
    assert 10 in kept and 11 not in kept

    con = duckdb.connect()
    con.sql(f"create view t as select * from '{path}'")
    want = sorted(
        r[0]
        for r in con.sql(
            curate_documents_oracle_sql(
                "t", "doc_id", "text", strip_boilerplate_min_docs=3
            )
        ).fetchall()
    )
    assert kept == want
