"""PII redaction for training-data curation — pure-JVM regexp chains.

A corpus headed for training needs deterministic PII scrubbing (emails,
phone numbers, IP addresses, SSNs, card numbers) BEFORE any
dedup/fingerprint stage — redaction changes the text, so fingerprints,
simhash and n-gram stages must see the redacted form or near-duplicate
detection diverges on documents differing only in the PII they carry.

Design constraints, in order:

1. **Pure codegen.** Every pattern is applied with the built-in
   ``regexp_replace`` / ``regexp_extract_all`` expressions — the scan →
   project plan has no Python, no shuffle, and whole-stage codegen spans
   the entire redaction chain. At 100 TB this runs at parquet-scan speed.
2. **Cross-engine patterns.** Patterns use only syntax Java's regex and
   RE2 (DuckDB) interpret identically — no lookahead/lookbehind, no
   backreferences, explicit ``[0-9]`` classes (same rationale as
   ``textops.TOKEN_SPLIT``: Java ``\\d``/``\\s`` and RE2's disagree on
   edge classes), so a plain SQL twin can replay the exact redaction and
   the operator is oracle-checkable.
3. **Deterministic placeholders.** Matches become ``<EMAIL>`` &c. — stable
   tokens a tokenizer can learn, and equal inputs stay equal (dedup-safe).

Recall/precision trade is the standard one for regex PII: patterns target
high-precision formats (false redaction destroys data); genuinely
ambiguous matches (8-digit numbers, names) are out of scope for a regex
pass and belong to a model-based pass injected like ``extract_features``'s
decoder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: more-specific numeric formats FIRST so e.g. a 16-digit card is
# not half-eaten by the phone pattern; email before phone so extension-ish
# digit runs inside addresses never match. Each entry: (kind, pattern).
# Patterns are Java-regex ∩ RE2 (cross-engine contract above).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # 13-19 digit runs in 4-4-4-{1,7} grouping (card PANs), optional -/space
    ("credit_card", r"\b[0-9]{4}([- ][0-9]{4}){2}[- ][0-9]{1,7}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    (
        "ipv4",
        r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
    ),
    # phone: two high-precision branches only — (a) explicit +CC
    # international form, (b) NANP 3-3-4 with separators or (NNN). Loose
    # grouped-digit grammars false-match dates (2024-08-17 is 4-2-2, an
    # ISO date is exactly the shape `{2,4}([ -][0-9]{2,4}){1,3}` accepts),
    # and a false redaction destroys data — so bare digit runs, dates and
    # id-like groupings deliberately do NOT match.
    (
        "phone",
        r"(\+[0-9]{1,3}[ -]?(\([0-9]{1,4}\)[ -]?)?[0-9]([ -]?[0-9]){6,11})"
        r"|((\([0-9]{3}\)[ -]?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b)",
    ),
)

_KINDS = tuple(k for k, _ in PII_PATTERNS)


def _pattern_map(kinds) -> list[tuple[str, str]]:
    unknown = set(kinds) - set(_KINDS)
    if unknown:
        raise ValueError(f"unknown PII kinds {sorted(unknown)}; have {_KINDS}")
    return [(k, p) for k, p in PII_PATTERNS if k in set(kinds)]


def redact_col(text: str | Column, kinds=_KINDS) -> Column:
    """Column expression applying the redaction chain in PII_PATTERNS
    order; each match becomes ``<KIND>``."""
    col = F.col(text) if isinstance(text, str) else text
    for kind, pat in _pattern_map(kinds):
        col = F.regexp_replace(col, pat, f"<{kind.upper()}>")
    return col


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    kinds=_KINDS,
) -> DataFrame:
    """Replace PII matches in ``text_col`` with ``<KIND>`` placeholders.

    ``out_col`` defaults to replacing ``text_col`` in place (the curation
    default: downstream fingerprint/dedup stages must see redacted text).
    The plan is a single projection — chained regexp_replace inside one
    whole-stage-codegen span, no exchange."""
    out = out_col or text_col
    return df.withColumn(out, redact_col(text_col, kinds))


def pii_stats(
    df: DataFrame, id_col: str, text_col: str, kinds=_KINDS
) -> DataFrame:
    """Per-document PII match counts (one ``n_<kind>`` column per kind,
    counted on the PRE-redaction text with the same patterns) plus
    ``n_pii`` total — the audit/threshold signal (e.g. drop documents whose
    density suggests a credential dump). Counts use
    ``size(regexp_extract_all(...))`` — still pure codegen."""
    pats = _pattern_map(kinds)
    # BIGINT counts: the contract-mirror's type-parity rule (no 32-bit
    # ints in oracle-checked results — DuckDB/Spark width drift)
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{kind}")
        for kind, pat in pats
    ]
    out = df.select(F.col(id_col), *cols)
    total = None
    for kind, _ in pats:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def pii_count_exprs_sql(text_col: str, kinds=_KINDS) -> str:
    """The DuckDB column expressions counting each kind's matches on
    ``text_col`` (comma-joined, ``n_<kind>`` BIGINT each plus ``n_pii``
    BIGINT) — reusable inside a larger oracle SELECT (the quality_stats
    entry row embeds these beside the token features)."""
    pats = _pattern_map(kinds)
    cols = ", ".join(
        "CAST(len(regexp_extract_all({t}, '{p}')) AS BIGINT) AS n_{k}".format(
            t=text_col, p=p.replace("'", "''"), k=k
        )
        for k, p in pats
    )
    total = " + ".join(
        "len(regexp_extract_all({t}, '{p}'))".format(
            t=text_col, p=p.replace("'", "''")
        )
        for _, p in pats
    )
    return f"{cols}, CAST({total} AS BIGINT) AS n_pii"


def pii_stats_oracle_sql(
    table: str, id_col: str, text_col: str, kinds=_KINDS
) -> str:
    """DuckDB twin of ``pii_stats`` — identical patterns through RE2.

    Cross-engine caveat (the reason this twin exists): the patterns avoid
    every construct Java and RE2 disagree on — no lookaround, no
    backreferences, explicit ASCII classes, and both engines resolve
    alternation leftmost-first — so ``len(regexp_extract_all(...))`` must
    count the same matches ``size(regexp_extract_all(...))`` does, kind by
    kind."""
    return (
        f"SELECT {id_col}, {pii_count_exprs_sql(text_col, kinds)} "
        f"FROM (SELECT {id_col}, {text_col} FROM {table})"
    )


def redact_expr_sql(text_sql: str, kinds=_KINDS) -> str:
    """The redaction chain as one inline DuckDB expression over
    ``text_sql`` — RE2's 'g' flag per pattern (Spark's regexp_replace is
    global by default; DuckDB's replaces only the first match without
    it). Lets twins compose redaction into multi-column pipelines where
    the table has no single-row key (e.g. transcript turns)."""
    expr = text_sql
    for kind, pat in _pattern_map(kinds):
        expr = (
            f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}', "
            f"'<{kind.upper()}>', 'g')"
        )
    return expr


def redact_oracle_sql(
    table: str, id_col: str, text_col: str, kinds=_KINDS
) -> str:
    """DuckDB twin of ``redact_pii``."""
    return (
        f"SELECT {id_col}, {redact_expr_sql(text_col, kinds)} AS redacted "
        f"FROM {table}"
    )
