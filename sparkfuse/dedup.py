"""Deduplication operators for training-data pipelines.

Scale ladder (each step trades exactness for shuffle volume):

  1. ``exact_dedup``            — fingerprint group-by (partial+final agg).
  2. ``ngram_jaccard_pairs``    — EXACT near-dup pairs: inverted-index join
     on word n-gram shingles (candidates = pairs sharing >= 1 shingle — a
     superset of every pair with Jaccard > 0) then exact integer-arithmetic
     Jaccard verification. SQL-expressible => DuckDB-oracle-checkable.
  3. ``minhash_lsh_candidates`` — approximate scale path: k minhash
     signatures computed JVM-side (explode + min-agg), banded into LSH
     buckets, candidate pairs from bucket joins. Recall vs the exact op is
     pytest-verified; no SQL oracle (minhash needs a shared hash function
     SQL lacks).
  4. simhash near-dup          — see sparkfuse.textops.simhash64 + hamming64.

Jaccard thresholding is integer-exact: J(a,b) >= p/q  <=>  q*|I| >= p*|U|,
so the Spark result and the SQL oracle agree bit-for-bit (no float boundary).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.textops import TOKEN_SPLIT, grams_chain_col, tokens_col


def fingerprint_cols(text_col: str, bits: int = 128) -> list:
    """Content-fingerprint column(s) for dedup grouping, width-parameterized.

    128-bit (default for the EXACT path): two independent-seed xxhash64
    lanes — ``xxhash64(text)`` and ``xxhash64(text, 1)``. Expected false
    merges ~ n²/2^129: ~4·10^-16 at n = 10^12 docs, i.e. zero at any corpus
    scale that fits in storage. 64-bit is kept for the APPROXIMATE ladder
    (minhash/simhash candidates), where ~n²/2^65 ≈ 27k collisions at 10^12
    docs is noise among millions of true near-dups — but on a path labeled
    EXACT those would be silently dropped distinct documents.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if bits == 64:
        return [F.xxhash64(c).alias("fp")]
    if bits == 128:
        return [F.xxhash64(c).alias("fp"), F.xxhash64(c, F.lit(1)).alias("fp2")]
    raise ValueError(f"fingerprint bits must be 64 or 128, got {bits}")


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, fingerprint_bits: int = 128
) -> DataFrame:
    """Canonical id per distinct text (min id), via hash fingerprint group-by.

    Grouping on the fingerprint instead of the full text means the shuffle
    carries 16 bytes + id per row instead of the document body — the
    difference between shuffling 100 TB and shuffling ~3 TB. The default
    128-bit width keeps fingerprint-equality ≡ text-equality at 10^12-doc
    scale (see ``fingerprint_cols``); the SQL oracle groups on the full
    text, so any collision would surface as an oracle mismatch.
    """
    fps = fingerprint_cols(text_col, fingerprint_bits)
    sel = df.select(F.col(id_col), *fps)
    group_cols = [c for c in sel.columns if c != id_col]
    return (
        sel.groupBy(*group_cols)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles over a token-array column. PASS A
    STAGED TOKEN COLUMN: any non-cheap expression repeated under a HOF
    lambda or across the k references re-runs per use on the interpreted
    path (PLANS.md §28) — ``tokens_col(text)`` inlined here at k=13 was
    O(tokens²) regex splits per document. Documents with fewer than k
    tokens have NO k-shingles (empty array, also for NULL text — the
    historical shingles_col contract).

    Two builders by regime (both interpreted HOFs; costs per row):

    * k < 8 — chained zip_with, O((k-1)·tokens) concat element-ops.
    * k >= 8 — index transform over a staged ref, O(grams·k): the chain
      pays its k-1 full-array passes even when a row yields few or zero
      grams, which regressed short-turn corpora (transcript turns at
      k=13) ~1.5x; the transform's work is proportional to the grams
      actually produced, and the ``when`` guard short-circuits rows with
      fewer than k tokens entirely (CaseWhen evaluates only the taken
      branch).
    """
    empty = F.array().cast("array<string>")
    n = F.size(toks)
    if k >= 8:
        idx = F.sequence(F.lit(1), n - (k - 1))
        gram = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    else:
        gram = grams_chain_col(toks, k)
    return F.when(n >= k, F.array_distinct(gram)).otherwise(empty)


def shingles_col(text_col: str, k: int = 3):
    """Distinct word k-gram shingles, built JVM-side via the chained
    zip_with gram builder (``textops.grams_chain_col``).

    An earlier form used ``transform(sequence(1, m), i -> concat_ws(' ',
    slice(toks, i, k)))`` — the index-lambda CAPTURES the tokenization,
    which interpreted HOF eval re-runs per gram: O(tokens²) regex splits
    per document (PLANS.md §28; this was 20 of contamination_13gram's
    21 s at sf1.0).
    """
    return shingles_of_tokens(tokens_col(text_col), k)


# Stop-shingle document-frequency cap for the scale preset. A shingle seen
# in d docs emits d(d-1)/2 candidate pairs, so ONE boilerplate shingle across
# a 10^9-doc corpus emits ~5*10^17 pairs — the cutoff bounds per-shingle
# fan-out at ~8k pairs. A true near-dup pair at J >= 1/2 shares roughly a
# third of its shingles; it is missed only if EVERY shared shingle clears the
# cutoff, i.e. the overlap is pure boilerplate (measured on the skewed bench
# corpus: planted near-dups keep recall 1.0 — see PLANS.md §5a).
DEFAULT_STOP_SHINGLE_DF = 128


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: Fraction = Fraction(1, 2),
    df_cutoff: int | None = None,
    scale: bool = False,
) -> DataFrame:
    """EXACT near-duplicate pairs (id_a < id_b) with shingle-set Jaccard >=
    threshold.

    Plan: shingle arrays (codegen) → explode → self-join on shingle (the
    inverted index; this is where AQE's skew handling matters for hot
    shingles) → distinct candidate pairs → join back both shingle arrays →
    integer-exact Jaccard test. ``df_cutoff`` drops shingles appearing in
    more than that many docs before the join — the standard stop-shingle
    pruning for web-scale corpora; pairs sharing ONLY ultra-common shingles
    can be missed, so it is off by default (exactness first).

    ``scale=True`` is the documented web-scale preset: it applies
    DEFAULT_STOP_SHINGLE_DF (unless df_cutoff is given explicitly), keeping
    the candidate set O(near-dups + bounded skew) instead of O(hot-shingle²).
    Note the Jaccard verification stays exact over the FULL shingle sets —
    the cutoff only prunes candidate *generation*.
    """
    if scale and df_cutoff is None:
        df_cutoff = DEFAULT_STOP_SHINGLE_DF
    # no .cache(): the shingle projection is pure codegen over the scan, and
    # pinning shingle arrays (larger than the text) in executor storage for
    # the app lifetime is worse than recomputing them in each join branch.
    # Tokens staged (the chain references them k times under interpreted
    # HOF eval — PLANS.md §28). No fan_out_small here: the shingle join
    # dominates this operator and the extra exchange measured as a pure
    # ~2x loss on already-parallel inputs (PLANS.md §31).
    sh = df.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_tk")
    )
    sh = sh.select("_id", shingles_of_tokens(F.col("_tk"), k).alias("_sh"))
    inv = sh.select("_id", F.explode("_sh").alias("_g"))
    if df_cutoff is not None:
        freq = inv.groupBy("_g").agg(F.count("*").alias("_df"))
        inv = (
            inv.join(freq.filter(F.col("_df") <= df_cutoff), "_g", "left_semi")
        )
    a = inv.select(F.col("_id").alias("id_a"), "_g")
    b = inv.select(F.col("_id").alias("id_b"), "_g")
    cand = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    pairs = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb")), "id_b")
    )
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    p, q = threshold.numerator, threshold.denominator
    # inter > 0 is guaranteed by the inverted-index candidates, but kept as
    # an explicit guard so 0/0 pairs (both shingle-less) can never match
    return (
        pairs.filter((inter > 0) & (inter * q >= union * p))
        .select("id_a", "id_b")
    )


def ngram_jaccard_pairs_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: Fraction = Fraction(1, 2),
) -> str:
    """DuckDB twin of ngram_jaccard_pairs (brute-force all-pairs — the oracle
    can afford O(n^2) at sf0.01)."""
    p, q = threshold.numerator, threshold.denominator
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT {id_col} AS _id, string_split_regex(trim({text_col}), '{TOKEN_SPLIT}') AS ts
  FROM {table}
),
sh AS (
  SELECT _id,
         list_distinct([{gram} for i in range(1, len(ts) - {k - 2})]) AS gs
  FROM toks
)
SELECT a._id AS id_a, b._id AS id_b
FROM sh a JOIN sh b ON a._id < b._id
WHERE len(list_intersect(a.gs, b.gs)) * {q}
      >= (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) * {p}
  AND len(list_intersect(a.gs, b.gs)) > 0
"""


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """k-gram minhash signatures, entirely JVM-side: explode shingles, hash
    each with ``xxhash64(shingle, i)`` per permutation i, take min per doc.
    One explode + one grouped aggregation (partial+final) — no Python.
    """
    inv = (
        df.select(F.col(id_col), tokens_col(text_col).alias("_tk"))
        .select(F.col(id_col), F.explode(shingles_of_tokens(F.col("_tk"), k)).alias("_g"))
    )
    aggs = [
        F.min(F.xxhash64(F.col("_g"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return inv.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded minhash-LSH (the 100-TB path:
    candidates ~ O(near-dups), not O(n^2)). rows = bands/num_hashes per band;
    two docs collide iff some band of their signatures is identical.

    ``max_bucket_size``: drop LSH buckets holding more than this many docs
    before the self-join — a bucket of d docs emits d(d-1)/2 candidates, so
    one boilerplate family of 10^6 near-identical docs would emit 5·10^11
    pairs. Oversized buckets are overwhelmingly exact-duplicate families
    (run ``exact_dedup`` first) or template boilerplate; a true near-dup
    pair is lost only if EVERY band bucket it shares is oversized. Off by
    default (recall first) — the web-scale preset is ~1024.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing hash functions and "
            "change the collision probability"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    buckets = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("h"))
                            for b in range(bands)])).alias("bk"),
    ).select(id_col, "bk.b", "bk.h")
    if max_bucket_size is not None:
        from sparkfuse.keys import cap_group_size

        buckets = cap_group_size(buckets, ["b", "h"], max_bucket_size)
    a = buckets.select(F.col(id_col).alias("id_a"), "b", "h")
    bb = buckets.select(F.col(id_col).alias("id_b"), "b", "h")
    return (
        a.join(bb, ["b", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
