"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side column expressions (split/filter/aggregate inside
whole-stage codegen) — no Python in the scan path. Each operator has an exact
ANSI-SQL twin used as the DuckDB oracle; outputs are integers or
deterministically tie-broken labels so cross-engine comparison is bit-safe.

Operators:
  token_stats     — token/char counts per document
  quality_stats   — integer quality features (unique tokens, max token len,
                    stopword hits) for filtering pipelines
  lang_id         — deterministic stopword-vote language heuristic
  fingerprint     — 64-bit full-text fingerprint (xxhash64) for exact dedup;
                    fingerprint-equality ≡ text-equality at any realistic
                    corpus size (collision ~ n^2/2^64)
  simhash64       — 64-bit SimHash over token multiset (pure JVM: explode +
                    xxhash64 + 64 codegen bit-vote aggregates; the
                    locality-sensitive fingerprint for near-dup hunting)
  compression_stats — zlib compressibility per doc (repetition/boilerplate
                    signal; the one non-SQL op here — a single scalar
                    pandas_udf returning the DEFLATE length)
"""

from __future__ import annotations

import pandas as pd  # module-global: pandas_udf resolves `pd.Series` annotations
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic stopword lists for the vote heuristic (tiny on purpose —
# the operator contract is determinism + parity, not linguistic accuracy).
LANG_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "los", "una", "es", "en", "que", "por"],
    "fr": ["le", "la", "les", "une", "est", "et", "que", "pour"],
}

# Explicit whitespace class, shared verbatim by the Spark (Java regex) and
# DuckDB-oracle (RE2) sides: Java's \s includes \x0B, RE2's does not, so a
# literal \s+ would diverge on vertical-tab-bearing text. Spelling the class
# out makes cross-engine divergence impossible. (\x0B itself therefore
# tokenizes as a punctuation character — identically in both engines.)
TOKEN_SPLIT = r"[ \t\n\r\f]+"


def tokens_col(text: str | Column) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(col), TOKEN_SPLIT)


def grams_chain_col(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams over a token-array column; empty when
    fewer than ``n`` tokens.

    Built by CHAINED zip_with, never by indexing ``toks`` inside a
    lambda: higher-order functions evaluate interpreted and re-run any
    expression a lambda body CAPTURES once per element, so the obvious
    ``transform(sequence(1, m), i -> concat_ws(' ', slice(toks, i, n)))``
    re-evaluates ``toks`` (the full regex tokenization) per gram —
    O(tokens²) splits per document (PLANS.md §28; jstack-confirmed
    StringSplit under ArrayTransform.eval). Here every occurrence of
    ``toks`` is a HOF CHILD, evaluated once per row; lambda bodies touch
    only lambda variables and literals. zip_with pads the shorter side
    with NULL and ``concat`` propagates it, so tail positions with fewer
    than ``n`` tokens remaining become NULL grams — dropped by the final
    filter, which also makes short documents yield [] with no size
    guard. ``toks`` still appears ``n`` times as a child; callers with
    large ``n`` (13-gram decontamination) should stage the token array
    as a projected column first so the tokenization runs once per row.
    """
    grams = toks
    for k in range(1, n):
        nxt = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        grams = F.zip_with(grams, nxt, lambda g, t: F.concat(g, F.lit(" "), t))
    return F.filter(grams, lambda g: g.isNotNull())


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens_col(text_col)
    # cast to long: cross-engine oracles (DuckDB len/length return BIGINT)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_text"),
    )


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Integer quality features; the scoring policy (thresholds) stays with
    the caller — these are the measurements."""
    toks = tokens_col(text_col)
    uniq = F.array_distinct(toks)
    stop_en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(uniq).cast("long").alias("n_uniq_tokens"),
        F.array_max(F.transform(toks, F.length)).cast("long").alias("max_token_len"),
        F.size(F.array_intersect(uniq, stop_en)).cast("long").alias("n_stopword_kinds"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_text"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language heuristic.

    score(lang) = #tokens (with multiplicity) in lang's stopword list;
    prediction = lexicographically-first lang among the max scorers, or
    'und' (undetermined) when every score is 0. Fully deterministic, so the
    identical rule is expressible in ANSI SQL for the oracle.
    """
    toks = tokens_col(text_col)
    def _score(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [
        _score(LANG_STOPWORDS[lang]).alias(f"score_{lang}")
        for lang in sorted(LANG_STOPWORDS)
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first max wins (lexicographic because langs is sorted)
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def lang_id_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """The identical heuristic in DuckDB SQL (the oracle twin of lang_id)."""
    langs = sorted(LANG_STOPWORDS)
    score_exprs = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_exprs.append(
            f"len(list_filter(string_split_regex(trim({text_col}), '{TOKEN_SPLIT}'), "
            f"t -> list_contains([{words}], t))) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN score_{lang} = {best} THEN '{lang}' "
    case += "END"
    return (
        f"SELECT {id_col}, {case} AS pred_lang FROM "
        f"(SELECT {id_col}, {', '.join(score_exprs)} FROM {table})"
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit content fingerprint — the doc-level analog of the reference's
    caller-side key hashing (/root/reference/README.md:25-29)."""
    return df.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("fingerprint")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the token multiset (Charikar 2002): for each bit,
    majority vote of token-hash bits weighted by term frequency.

    Entirely JVM-side — no Python anywhere in the kernel: tokens explode in
    codegen, token hashing is the built-in ``xxhash64``, and the 64 bit-votes
    are 64 partial-aggregating ``sum(±1)`` expressions (explode emits one row
    per occurrence, so term-frequency weighting is automatic). The final
    fingerprint folds the vote signs back into one int64 with bitwise OR of
    shifted bits (bit shifts are overflow-free under ANSI mode).

    At 100 TB the plan is scan → explode → xxhash64 → one partial+final agg
    shuffled by doc id; only (id, 64×8-byte partial sums) cross the wire per
    map-side group. Docs with no tokens fingerprint to 0.

    The 64 votes and the fingerprint fold are built as SQL STRINGS parsed
    JVM-side (one ``F.expr`` per column), not as Column-method chains:
    each Column operator is a py4j round-trip, and the ~1,500 round-trips
    of the chained form cost ~0.9 s of pure driver-side constant per
    query instance (measured round 6; JVM parse of the same strings is
    ~0.15 s). Values are pinned bit-identical against the Column form.
    """
    from sparkfuse.keys import fan_out_small

    tok = fan_out_small(df.select(id_col, text_col)).select(
        id_col, F.explode(tokens_col(text_col)).alias("_tok")
    ).filter(F.col("_tok") != "")
    th = tok.select(id_col, F.xxhash64("_tok").alias("_th"))
    votes = [
        F.expr(
            f"sum((shiftrightunsigned(_th, {b}) & CAST(1 AS BIGINT)) * 2 - 1) AS _v{b}"
        )
        for b in range(64)
    ]
    agg = th.groupBy(id_col).agg(*votes)
    # balanced pairwise OR fold (depth 6) — a left-deep reduce builds a
    # 64-level expression tree that Catalyst rules walk superlinearly.
    # shiftleft(1L, b) rather than a decimal literal: 1<<63 has no legal
    # positive long literal, and Catalyst constant-folds the shift anyway.
    terms = [
        f"(CASE WHEN _v{b} > 0 THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    ]
    while len(terms) > 1:
        terms = [
            terms[i] if i + 1 >= len(terms) else f"({terms[i]} | {terms[i + 1]})"
            for i in range(0, len(terms), 2)
        ]
    sims = agg.select(F.col(id_col), F.expr(terms[0]).alias("simhash"))
    # left join restores empty-token docs (simhash 0), preserving df's rows
    return (
        df.select(id_col)
        .join(sims, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash"),
        )
    )


def hamming64(a: Column, b: Column) -> Column:
    """Population count of (a XOR b) — JVM-side, for simhash joins."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    sims_df: DataFrame | None = None,
) -> DataFrame:
    """EXACT SimHash near-duplicate pairs (id_a < id_b, hamming distance of
    the 64-bit fingerprints ≤ ``max_hamming``) — the pairs operator of the
    SimHash rung of the dedup ladder, entirely JVM-side.

    Candidate generation is the pigeonhole multi-index (Manku et al., WWW
    2007): split the 64 bits into bands; two fingerprints within hamming
    k differ in ≤ k bands, so with ``k + 1`` bands they MATCH EXACTLY in
    at least one. Banding is therefore lossless — unlike minhash/sign-LSH
    there is no recall knob; the band join finds every qualifying pair
    and the exact ``bit_count(xor)`` filter keeps only true ones. Past
    max_hamming 3 the exact-match bands would narrow below 16 bits and
    corpus-wide collisions on the short slices explode the candidate
    join, so the generator switches to WIDE bands + single-bit query
    expansion (``floor(k/2)+1`` bands: ≤ k errors leave some band with
    ≤ 1, so the probe side emits each band value plus its single-bit
    flips and the build side stays exact — still lossless, and the small
    exact side lets AQE turn the candidate join into one codegen
    broadcast-hash pass). ``max_bucket_size`` (same guard as the LSH
    generators — then NOT lossless; in the expansion regime it caps each
    side's (band, value) buckets independently) bounds boilerplate
    blowup, and exact-dedup first removes the identical-text mass.

    Plan: simhash64 (explode + 64 partial-agg bit votes) → band slices
    (shift/mask codegen) → explode bands (probe side with its expansion
    variants) → join on (band, slice) → exact hamming verify. No Python
    anywhere. Pass a precomputed (ideally cached) ``sims_df`` —
    (id_col, simhash) — to share the fingerprint subtree with other
    consumers instead of recomputing it.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    # Band plan. Exact-match pigeonhole needs max_hamming+1 bands; past
    # max_hamming 3 those bands narrow below 16 bits and corpus-wide
    # collisions on the short slices explode the candidate join (measured
    # at sf1.0, max_hamming=6: 7x9-bit bands produced 1.3e9 candidate
    # pairs for 1.55e6 true pairs — the row was 140 s). The fix keeps the
    # scheme LOSSLESS but widens the bands and absorbs the lost bands
    # with single-bit QUERY EXPANSION: with nb = floor(k/2)+1 bands,
    # <= k errors leave some band with <= floor(k/nb) <= 1 errors, so a
    # qualifying pair matches EXACTLY when one side's band value is
    # XORed with 0 or one of the band's w single-bit masks. The probe
    # side therefore emits (w+1) variants per band; the build side stays
    # exact, small enough for AQE to broadcast — the candidate join runs
    # as one codegen broadcast-hash pass, no shuffle of candidates.
    n_bands = max_hamming + 1
    expand = 64 // n_bands < 16 and n_bands > 1
    if expand:
        n_bands = max_hamming // 2 + 1
    width = 64 // n_bands
    sims = sims_df if sims_df is not None else simhash64(df, id_col, text_col)
    # The fingerprint aggregate's output is tiny (16 bytes/doc), so AQE
    # coalesces the post-agg exchange to ~1 partition — and the band
    # explode + candidate join ABOVE it multiply the work ~100x, leaving
    # the heavy stage single-threaded (measured: 47 s single-task vs
    # ~6 s fanned out at sf1.0). Fan the small frame back out before the
    # expansion; no-op at corpus scale (plan-size estimate guard).
    from sparkfuse.keys import fan_out_small

    sims = fan_out_small(sims)
    # Band slices, probe expansion and the first-band filter are SQL
    # STRINGS (one F.expr per frame) for the same reason as simhash64's
    # votes: the Column-method form was ~700 py4j round-trips ≈ 0.6 s of
    # driver constant per instance; one JVM parse is ~0.1 s. Pinned
    # identical to the Column form at max_hamming 0/1/3/6/9 and capped.

    def _mask_sql(w: int) -> str:
        # w == 64 (single band): the mask is all ones = -1 in two's
        # complement ((1<<64)-1 does not fit a long literal)
        return "-1L" if w >= 64 else f"{(1 << w) - 1}L"

    exact_structs, probe_structs = [], []
    for b in range(n_bands):
        lo = b * width
        # last band absorbs the remainder bits
        w = 64 - lo if b == n_bands - 1 else width
        v = f"(shiftrightunsigned(simhash, {lo}) & {_mask_sql(w)})"
        exact_structs.append(f"named_struct('b', {b}, 'v', {v})")
        probe_structs.append(f"named_struct('b', {b}, 'v', {v})")
        if expand:
            for j in range(w):
                # shiftleft(1L, j): no legal positive literal at j=63
                probe_structs.append(
                    f"named_struct('b', {b}, 'v', ({v} ^ shiftleft(1L, {j})))"
                )

    def _bands(structs):
        out = sims.select(
            F.col(id_col), F.col("simhash"),
            F.expr("explode(array(" + ", ".join(structs) + ")) AS bk"),
        ).select(id_col, "simhash", "bk.b", "bk.v")
        if max_bucket_size is not None:
            from sparkfuse.keys import cap_group_size

            out = cap_group_size(out, ["b", "v"], max_bucket_size)
        return out

    a = _bands(probe_structs).select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"), "b", "v"
    )
    bb = _bands(exact_structs).select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"), "b", "v"
    )
    out = (
        a.join(bb, ["b", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming64(F.col("_sa"), F.col("_sb")) <= max_hamming)
    )
    if max_bucket_size is not None:
        # capped buckets can drop a pair's earliest qualifying band, so
        # only the generic dedup is safe here
        return out.select("id_a", "id_b").dropDuplicates()
    # FIRST-QUALIFYING-BAND filter: a pair matches once per band whose
    # slice distance is within the match tolerance (0 exact / 1 expanded);
    # keeping only the row whose band is the pair's first such band makes
    # every pair unique BY CONSTRUCTION — the final distinct shuffle of
    # the (multi-band-duplicated) survivor set disappears outright, for
    # nb-1 extra bit_count evaluations per candidate inside the same
    # codegen stage.
    tol = 1 if expand else 0
    band_d = []
    for b in range(n_bands):
        lo = b * width
        w = 64 - lo if b == n_bands - 1 else width
        band_d.append(
            f"(bit_count(shiftrightunsigned(_sa ^ _sb, {lo}) & {_mask_sql(w)}) <= {tol})"
        )
    whens = ["WHEN b = 0 THEN true"]
    any_before = band_d[0]
    for b in range(1, n_bands):
        whens.append(f"WHEN b = {b} THEN NOT {any_before}")
        any_before = f"({any_before} OR {band_d[b]})"
    first_ok = "CASE " + " ".join(whens) + " ELSE false END"
    return out.filter(F.expr(first_ok)).select("id_a", "id_b")


# BPE-ish pretokenizer regex (GPT-2-style segment classes: optional leading
# space + letter run / digit run / punctuation run, else whitespace run).
# Deliberately lookahead-free so Spark's Java regex and DuckDB's RE2 agree
# token-for-token — the cross-engine oracle contract.
# \s spelled out as the explicit class in BOTH alternatives (same Java-vs-RE2
# \x0B rationale as TOKEN_SPLIT).
BPE_SPLIT_REGEX = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r\f]+|[ \t\n\r\f]+"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting with a BPE-ish pretokenizer regex (the training-cost
    estimator's unit), alongside the whitespace count for comparison. Pure
    codegen: regexp_extract_all + size, no Python."""
    toks = tokens_col(text_col)
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_REGEX), 0)
    # whitespace-run segments are dropped with an explicit char class (trim()
    # strips only spaces, and Java's \s includes \x0B while RE2's does not)
    ws = "^[ \\t\\n\\r\\f]+$"
    return df.select(
        F.col(id_col),
        F.size(F.filter(bpe, lambda t: ~t.rlike(ws))).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.size(toks).cast("long").alias("n_ws_tokens"),
    )


def bpe_token_stats_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin (RE2 regex, same lookahead-free pattern)."""
    return (
        f"SELECT {id_col}, "
        f"len(list_filter(regexp_extract_all({text_col}, '{BPE_SPLIT_REGEX}'), "
        "t -> NOT regexp_matches(t, '^[ \\t\\n\\r\\f]+$'))) AS n_bpe_tokens, "
        f"len(string_split_regex(trim({text_col}), '{TOKEN_SPLIT}')) AS n_ws_tokens "
        f"FROM {table}"
    )


# Winnowing rolling-hash parameters: Horner base 256 over character code
# points, prime modulus < 2^31 so every intermediate (h*256 + code < 2^39)
# stays ANSI-safe in Spark and exact in DuckDB BIGINT — the integer-exact
# cross-engine contract the oracle needs.
WINNOW_BASE = 256
WINNOW_MOD = 1_000_000_007


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS rolling-hash scheme): polynomial rolling hash of every char
    k-gram, then the minimum hash of each window of ``window`` consecutive
    k-grams; the distinct minima are the document's fingerprint set.

    Guarantee: two documents sharing any substring of length >= k+window-1
    share at least one fingerprint — the substring-robust complement to the
    whole-text xxhash64 ``fingerprint`` (which any 1-char edit breaks).

    Entirely JVM-side (split/zip_with higher-order functions; no Python, no
    shuffle — a pure per-row projection). Returns exploded (id, fp) rows;
    docs shorter than k characters contribute no rows.

    Non-ASCII characters are projected to '?' BEFORE hashing: Spark's
    ``ascii()`` returns the first UTF-16 code unit (a surrogate for astral
    chars) while SQL engines' ``ord()`` returns the codepoint, so hashing
    raw unicode would be engine-dependent. The ASCII projection makes the
    fingerprints identical everywhere at the cost of non-ASCII runs losing
    identity (acceptable for a similarity fingerprint; documented contract).
    """
    b = F.lit(WINNOW_BASE).cast("long")
    p = F.lit(WINNOW_MOD).cast("long")
    txt = F.regexp_replace(F.col(text_col), "[^\\x00-\\x7F]", "?")
    n = F.length(txt)

    # One char-codes array per row, then the k-gram Horner as a fold of k-1
    # zip_with passes over SHIFTED SLICES of it — each pass is one vectorized
    # array op, vs a per-gram aggregate() re-reading chars via substring()
    # (measured 60x slower). Stepwise mod keeps h*256 + code < 2^39.
    codes = F.transform(F.split(txt, ""), lambda c: F.ascii(c).cast("long"))
    m = n - (k - 1)  # gram count
    grams = F.slice(codes, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(codes, j + 1, m), lambda h, c: (h * b + c) % p
        )
    grams = F.when(n >= k, grams).otherwise(F.array().cast("array<long>"))
    n_g = F.size(grams)
    # window minima as a least() fold over shifted gram slices, same trick
    wc = n_g - (window - 1)  # window count
    wins = F.slice(grams, 1, wc)
    for j in range(1, window):
        wins = F.zip_with(wins, F.slice(grams, j + 1, wc), lambda a, c: F.least(a, c))
    wins = (
        F.when(n_g >= window, wins)
        .when(n_g > 0, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<long>"))
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
    fp_cutoff: int | None = None,
) -> DataFrame:
    """SUBSTRING-overlap near-dup pairs: documents sharing >= ``min_shared``
    winnowing fingerprints (id_a < id_b, with the exact shared count).

    The substring rung of the dedup ladder: whole-doc shingle Jaccard misses
    a copied paragraph inside two otherwise-different documents, but any
    shared substring of length >= k+window-1 chars shares >= 1 winnow
    fingerprint (the SIGMOD'03 guarantee), so chunk-level copy-paste surfaces
    here. EXACT and SQL-expressible (the winnow twin recomputes the same
    fingerprints), unlike the probabilistic LSH rungs.

    Plan: per-row fingerprint projection (no shuffle) → inverted-index
    self-join on fp → count shared per pair. ``fp_cutoff`` drops fingerprints
    appearing in more than that many docs before the join (stop-fingerprint
    pruning, same fan-out math as stop-shingles: a fingerprint in d docs
    emits d(d-1)/2 pairs). Ids are assumed unique (one row per document —
    duplicate ids are collapsed arbitrarily; dedup upstream for defined
    behavior).
    """
    # winnow_fingerprints already emits per-row DISTINCT fingerprints, so
    # (id, fp) rows are unique whenever ids are unique — dedup only the tiny
    # id column instead of shuffling the whole exploded fingerprint table
    fps = winnow_fingerprints(
        df.dropDuplicates([id_col]), id_col, text_col, k, window
    )
    if fp_cutoff is not None:
        freq = fps.groupBy("fp").agg(F.count("*").alias("_df"))
        fps = fps.join(freq.filter(F.col("_df") <= fp_cutoff), "fp", "left_semi")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def winnow_overlap_pairs_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
) -> str:
    """DuckDB twin of winnow_overlap_pairs (no cutoff — exactness first)."""
    inner = winnow_fingerprints_oracle_sql(table, id_col, text_col, k, window)
    return f"""
WITH fps AS (SELECT DISTINCT * FROM ({inner}))
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       COUNT(*) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.{id_col} < b.{id_col}
GROUP BY a.{id_col}, b.{id_col}
HAVING COUNT(*) >= {min_shared}
"""


def winnow_fingerprints_oracle_sql(
    table: str, id_col: str, text_col: str, k: int = 5, window: int = 4
) -> str:
    """DuckDB twin of winnow_fingerprints — identical stepwise-mod Horner
    (list_reduce seeds with the first element; code_0 == 0*256 + code_0, so
    the fold agrees with Spark's zero-seeded fold) over the same
    ASCII-projected text."""
    codes = ", ".join(
        f"CAST(ord(substr(_t, i + {j}, 1)) AS BIGINT)" for j in range(k)
    )
    return f"""
WITH norm AS (
  SELECT {id_col},
         regexp_replace({text_col}, '[^\\x00-\\x7F]', '?', 'g') AS _t
  FROM {table}
),
g AS (
  SELECT {id_col},
         CASE WHEN length(_t) >= {k} THEN
           [list_reduce([{codes}],
                        (h, c) -> (h * {WINNOW_BASE} + c) % {WINNOW_MOD})
            for i in range(1, length(_t) - {k - 2})]
         ELSE [] END AS grams
  FROM norm
),
w AS (
  SELECT {id_col},
         CASE WHEN len(grams) >= {window} THEN
           [list_min(list_slice(grams, i, i + {window - 1}))
            for i in range(1, len(grams) - {window - 2})]
         WHEN len(grams) > 0 THEN [list_min(grams)]
         ELSE [] END AS wins
  FROM g
)
SELECT {id_col}, unnest(list_distinct(wins)) AS fp FROM w
"""


def compression_stats(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Per-document zlib compressibility — the standard web-scale
    repetition/boilerplate signal (Gopher-style curation: template spam and
    repeated boilerplate DEFLATE far below natural prose; near-random text
    barely compresses, so both tails of the ratio distribution are filter
    candidates).

    The one step SQL can't express — DEFLATE — is a single Arrow-batched
    scalar ``pandas_udf`` returning the compressed LENGTH (8 bytes/row back
    over Arrow, never the compressed payload); raw byte length and the
    ratio stay JVM-side column arithmetic. No shuffle, no state: the plan
    is scan → project, so at 100 TB it scales with scan bandwidth exactly
    like token_stats. NULL text counts as empty (ratio 0 with raw_bytes 0;
    zlib's empty-stream overhead keeps deflate_bytes > 0, so the ratio
    column is total and division-safe).

    Returns (id, raw_bytes, deflate_bytes, compression_ratio double).
    Thresholding stays with the caller, matching ``quality_stats``. Not
    DuckDB-oracle-expressible (no SQL DEFLATE); pinned instead by pytest
    against direct ``zlib.compress`` ground truth (tests/test_pipeline_ops).
    """
    import zlib

    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _deflate_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress((t or "").encode("utf-8"), level))
        )

    raw = F.octet_length(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    return df.select(
        F.col(id_col),
        raw.alias("raw_bytes"),
        _deflate_len(F.col(text_col)).alias("deflate_bytes"),
    ).withColumn(
        "compression_ratio",
        F.col("raw_bytes").cast("double") / F.col("deflate_bytes").cast("double"),
    )
