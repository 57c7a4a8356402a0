"""Checkpointable sketch builds: per-shard mergeable states in a parquet sink.

This is the sketch-library twin of the forest's resumable build
(sparkfuse.forest.build_forest_resumable): every sketch kind the library
ships (HLL, Count-Min, t-digest, KLL, Bloom, Misra-Gries, theta) can be
built as ONE state per
deterministic shard, persisted with per-shard lineage + metrics, and a
killed job re-submitted with the same arguments completes the sink
byte-identically to a fresh full build (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Why per-SHARD rather than per-Spark-partition: Spark partition ids are not
stable across runs/parallelism, so a checkpoint keyed by them cannot be
resumed. Shard = top ``shard_bits`` bits of ``xxhash64(route_col)`` — the
same JVM-side routing the forest uses — IS stable, and the anti-join that
skips done shards runs below the build kernel, so resumed work is never
recomputed-and-discarded.

Determinism contract (what makes resume ≡ fresh *byte*-identical):
  * HLL / CMS / Bloom adds are order-independent (register max / cell add /
    bit OR), so any per-shard input order gives the same state.
  * t-digest and KLL are order-SENSITIVE, so the kernel sorts each shard's
    values before feeding them; KLL's compaction coin is a splitmix64
    stream from a fixed seed (sparkfuse.kll.KLL._coin), never wall-clock
    randomness.

Scale shape (the 10^12-turn story): the input scan + shard routing stays in
whole-stage codegen; exactly one shuffle moves (shard, value) pairs; one
Arrow-batched kernel per shard builds all requested sketches in a single
pass; only KB-sized serialized states land in the sink. Finishing estimates
(``finish_sketch_states``) merges shard states *distributed* —
groupBy(sketch) over 2^shard_bits KB-rows — with no driver collect;
``merge_sketch_states`` is the deliberate driver-side variant for
query-style use (CMS point lookups, Bloom membership) and is bounded by
(2^shard_bits × n_specs) KB-sized rows.

Reference parity: the reference repo's filters are static (no merge —
SURVEY.md §1.1); this module is the mergeable-aggregation contrast case the
north_rule names, with the reference's build-retry checkpoint idea
(xorfilter.go MaxIterations/reseed) generalized to "any sketch state is a
restartable per-shard artifact".
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.utils import AnalysisException

from sparkfuse.bloom import BloomFilter, BloomParams
from sparkfuse.keys import shard_column
from sparkfuse.kll import KLL, KllParams
from sparkfuse.sketches import (
    CmsParams,
    CountMin,
    HllParams,
    HyperLogLog,
    MgParams,
    MisraGries,
)
from sparkfuse.tdigest import TDigest, TDigestParams
from sparkfuse.theta import ThetaParams, ThetaSketch

SKETCH_KINDS = ("hll", "cms", "tdigest", "kll", "bloom", "mg", "theta")
_HASHED_KINDS = frozenset({"hll", "cms", "bloom", "mg", "theta"})
# mg is NOT listed order-sensitive: the sink kernel feeds a shard in ONE
# add() call, which np.unique's the whole batch — the resulting state is
# identical for any input order, so sorting would be pure overhead. (MG
# merge order across shards IS order-sensitive; finish's sorted merge
# covers that.)
_ORDER_SENSITIVE = frozenset({"tdigest", "kll"})

_DEFAULT_PARAMS = {
    "hll": HllParams,
    "cms": CmsParams,
    "tdigest": TDigestParams,
    "kll": KllParams,
    "mg": MgParams,
    "theta": ThetaParams,
}

_PARAM_TYPES = {
    "hll": HllParams,
    "cms": CmsParams,
    "tdigest": TDigestParams,
    "kll": KllParams,
    "bloom": BloomParams,
    "mg": MgParams,
    "theta": ThetaParams,
}

SKETCH_STATE_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("sketch", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("params", StringType(), False),
        StructField("state", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_nulls", LongType(), False),
        StructField("state_bytes", LongType(), False),
        StructField("shard_bits", IntegerType(), False),
        StructField("route_col", StringType(), False),
    ]
)

SKETCH_FINISH_SCHEMA = StructType(
    [
        StructField("sketch", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("stat", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to maintain over one input column.

    kind='hll'|'cms'|'bloom'|'mg'|'theta' hash the column JVM-side (xxhash64 → u64 keys,
    NULLs skipped to match COUNT(DISTINCT)/COUNT semantics); 'tdigest'|'kll'
    cast to double (NULL/NaN skipped, matching percentile_approx).
    ``params`` defaults per kind except 'bloom', whose size is
    capacity-dependent and must be given (BloomParams.for_capacity).
    ``quantiles`` applies to tdigest/kll finishing only.
    """

    name: str
    kind: str
    col: str
    params: object | None = None
    quantiles: tuple = (0.5,)


def _resolve_params(spec: SketchSpec):
    if spec.kind not in SKETCH_KINDS:
        raise ValueError(f"unknown sketch kind {spec.kind!r} (spec {spec.name!r})")
    if spec.params is not None:
        expected = _PARAM_TYPES[spec.kind]
        if not isinstance(spec.params, expected):
            raise TypeError(
                f"spec {spec.name!r}: params must be {expected.__name__}, "
                f"got {type(spec.params).__name__}"
            )
        return spec.params
    if spec.kind == "bloom":
        raise ValueError(
            f"spec {spec.name!r}: bloom needs explicit params "
            "(BloomParams.for_capacity(n, fpp)) — its size is capacity-dependent"
        )
    return _DEFAULT_PARAMS[spec.kind]()


def _params_json(params) -> str:
    return json.dumps(dataclasses.asdict(params), sort_keys=True)


def _params_from_json(kind: str, data: str):
    return _PARAM_TYPES[kind](**json.loads(data))


def _make(kind: str, params):
    if kind == "hll":
        return HyperLogLog(params)
    if kind == "cms":
        return CountMin(params)
    if kind == "tdigest":
        return TDigest(params)
    if kind == "kll":
        return KLL(params)
    if kind == "mg":
        return MisraGries(params)
    if kind == "theta":
        return ThetaSketch(params)
    return BloomFilter(params)


def _from_bytes(kind: str, params, data: bytes):
    if kind == "hll":
        return HyperLogLog.from_bytes(params, data)
    if kind == "cms":
        return CountMin.from_bytes(params, data)
    if kind == "tdigest":
        return TDigest.from_bytes(params, data)
    if kind == "kll":
        return KLL.from_bytes(params, data)
    if kind == "mg":
        return MisraGries.from_bytes(params, data)
    if kind == "theta":
        return ThetaSketch.from_bytes(params, data)
    return BloomFilter.from_bytes(params, data)


def _qname(q: float) -> str:
    return f"q_{str(q).replace('.', '_')}"


def _finish_stats(kind: str, sketch, spec: SketchSpec) -> list[tuple[str, float]]:
    """Long-form (stat, value) rows per finished sketch. All values are
    deterministic functions of the merged state."""
    if kind == "hll":
        return [("n_distinct_est", float(sketch.estimate()))]
    if kind == "theta":
        return [
            ("n_distinct_est", float(sketch.estimate())),
            ("n_retained", float(len(sketch.values))),
        ]
    if kind == "cms":
        # every CMS row sums to the total weight added — an exact N, which
        # the oracle can cross-check even though point queries cannot be
        return [("n_total", float(sketch.table[0].sum()))]
    if kind == "tdigest":
        out = [(_qname(q), float(sketch.quantile(q))) for q in spec.quantiles]
        out.append(("n", float(sketch.n)))
        return out
    if kind == "kll":
        out = [(_qname(q), float(sketch.quantile(q))) for q in spec.quantiles]
        out.append(("n", float(sketch.n)))
        return out
    if kind == "mg":
        # heavy-hitter candidates are queried (estimates/keys), not
        # finished; n and dec certify the guarantee window
        return [
            ("n", float(sketch.n)),
            ("dec", float(sketch.dec)),
            ("n_tracked", float(len(sketch.keys))),
        ]
    # bloom: structural stats; membership is queried, not finished
    bits_set = int(np.unpackbits(sketch.words.view(np.uint8)).sum())
    return [
        ("size_bytes", float(sketch.size_in_bytes)),
        ("bits_set", float(bits_set)),
    ]


def _validate_specs(specs: list[SketchSpec]) -> None:
    if not specs:
        raise ValueError("need at least one SketchSpec")
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate spec names: {sorted(names)}")
    for s in specs:
        _resolve_params(s)


def _input_slots(specs: list[SketchSpec]) -> dict[tuple[bool, str], int]:
    """Distinct (hashed?, column) inputs → projected slot index. Specs that
    share an input (e.g. HLL+CMS+Bloom over one key column) share ONE
    shuffled value column instead of duplicating it per spec."""
    slots: dict[tuple[bool, str], int] = {}
    for s in specs:
        key = (s.kind in _HASHED_KINDS, s.col)
        if key not in slots:
            slots[key] = len(slots)
    return slots


def _projected(
    df: DataFrame, specs: list[SketchSpec], shard_bits: int, route_col: str
) -> DataFrame:
    """shard + one (value, isnull) pair per DISTINCT spec input, all
    JVM-side codegen.

    Hashed kinds carry the xxhash64 as a non-null int64 column plus a
    separate null flag: letting NULL flow into the hashed column would make
    Arrow hand pandas a float64 (lossy for 64-bit hashes), and
    ``xxhash64(NULL)`` silently hashes to the seed — both wrong.
    """
    cols = [shard_column(route_col, shard_bits, "xxh64").cast("int").alias("shard")]
    for (hashed, col), i in _input_slots(specs).items():
        if hashed:
            cols.append(F.xxhash64(col).alias(f"v_{i}"))
            cols.append(F.col(col).isNull().alias(f"z_{i}"))
        else:
            # numeric kinds need no flag: Arrow hands NULL as NaN in the
            # float64 column, and data NaNs are skipped identically (the
            # percentile_approx convention) — both count as n_nulls
            cols.append(F.col(col).cast("double").alias(f"v_{i}"))
    return df.select(*cols)


def _kernel_factory(specs: list[SketchSpec], shard_bits: int, route_col: str):
    resolved = [(s, _resolve_params(s), _params_json(_resolve_params(s))) for s in specs]
    slots = _input_slots(specs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        rows = []
        for spec, params, pjson in resolved:
            i = slots[(spec.kind in _HASHED_KINDS, spec.col)]
            if spec.kind in _HASHED_KINDS:
                isnull = pdf[f"z_{i}"].to_numpy()
                vals = pdf[f"v_{i}"].to_numpy()[~isnull]
            else:
                arr = pdf[f"v_{i}"].to_numpy()
                vals = arr[~np.isnan(arr)]
            # n_rows + n_nulls == shard row count ALWAYS (NaN counts as
            # null for numeric kinds — it is skipped like one)
            n_nulls = len(pdf) - len(vals)
            if spec.kind in _ORDER_SENSITIVE:
                vals = np.sort(vals)
            sk = _make(spec.kind, params)
            if len(vals):
                sk.add(vals)
            state = sk.to_bytes()
            rows.append(
                {
                    "shard": shard,
                    "sketch": spec.name,
                    "kind": spec.kind,
                    "params": pjson,
                    "state": state,
                    "n_rows": int(len(vals)),
                    "n_nulls": n_nulls,
                    "state_bytes": len(state),
                    "shard_bits": shard_bits,
                    "route_col": route_col,
                }
            )
        return pd.DataFrame(rows)

    return kernel


def build_sketch_states(
    df: DataFrame,
    specs: list[SketchSpec],
    shard_bits: int,
    route_col: str,
) -> DataFrame:
    """One mergeable state per (shard, spec), with lineage + metrics columns.

    Plan: codegen scan+projection → one shuffle on shard →
    groupBy(shard).applyInPandas building ALL specs in a single pass over
    each shard's Arrow batches. Every sink column is a deterministic
    function of (input rows, specs, shard_bits, route_col), which is what
    makes the resumable path's byte-identity contract possible.
    """
    _validate_specs(specs)
    if shard_bits < 0:
        raise ValueError("shard_bits must be >= 0")
    proj = _projected(df, specs, shard_bits, route_col)
    out = proj.groupBy("shard").applyInPandas(
        _kernel_factory(specs, shard_bits, route_col), SKETCH_STATE_SCHEMA
    )
    # construction-guaranteed triples: lets finish/merge validate without
    # executing this build pipeline once per validation
    out._sf_state_triples = _expected_rows_triples(specs)
    return out


def write_sketch_states(states: DataFrame, path: str, mode: str = "append") -> None:
    """Persist states (parquet). Append is the resume-friendly mode; the
    resumable builder only ever appends whole shards.

    Double-appending the SAME build is safe: rows are byte-identical
    (deterministic kernels) and every merging consumer dedupes them.
    Appending a DIFFERENT build under the same layout is corruption, and
    finish/merge/compact raise on the conflicting keys."""
    states.write.mode(mode).parquet(path)


def _expected_rows_triples(specs: list[SketchSpec]):
    return {
        (s.name, s.kind, _params_json(_resolve_params(s))) for s in specs
    }


def _expected_rows(specs: list[SketchSpec], shard_bits: int, route_col: str):
    return {
        (s.name, s.kind, _params_json(_resolve_params(s)), shard_bits, route_col)
        for s in specs
    }


def _validate_sink(
    existing: DataFrame,
    specs: list[SketchSpec],
    shard_bits: int,
    route_col: str,
) -> None:
    """Fail loudly when the sink was built with different arguments.

    Same lesson as the epoch-sink shard_bits guard (PLANS.md §15): a layout
    or param mismatch between build and resume silently corrupts results
    (duplicate shards, unmergeable states) — raising with the exact
    mismatch is the only safe behavior.
    """
    got = {
        (r["sketch"], r["kind"], r["params"], r["shard_bits"], r["route_col"])
        for r in existing.select(
            "sketch", "kind", "params", "shard_bits", "route_col"
        )
        .dropDuplicates()
        .collect()
    }
    want = _expected_rows(specs, shard_bits, route_col)
    if got != want:
        raise ValueError(
            "sketch sink does not match the requested build: "
            f"sink-only={sorted(got - want)!r} request-only={sorted(want - got)!r}. "
            "Resume must use the exact specs/shard_bits/route_col the sink was "
            "built with; use a fresh path for a different configuration."
        )


def _local_dir_has_data(path: str) -> bool:
    """True iff ``path`` is a listable local dir containing any committed
    data file (not _- or .-prefixed, recursively). Non-local/unlistable
    paths return True — the conservative answer, since the caller treats
    False as license to write a fresh full build."""
    import os

    if "://" in path and not path.startswith("file:"):
        return True
    local = path[len("file:"):] if path.startswith("file:") else path
    if not os.path.isdir(local):
        return True
    for root, dirs, files in os.walk(local):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(not f.startswith(("_", ".")) for f in files):
            return True
    return False


def build_sketch_states_resumable(
    df: DataFrame,
    path: str,
    spark: SparkSession,
    specs: list[SketchSpec],
    shard_bits: int,
    route_col: str,
) -> DataFrame:
    """Build only the shards missing from ``path``, append them, return the
    completed sink. Deterministic kernels make resume-after-kill yield a
    sink byte-identical to a fresh full build (tested in
    tests/test_sketchsink.py::test_resume_equals_fresh).

    The done-shard anti-join filters the INPUT below the kernel (same
    reasoning as forest.build_forest_resumable: Catalyst cannot push an
    anti-join under a Python UDF, so filtering kernel *output* would
    rebuild every shard and discard the work).
    """
    _validate_specs(specs)
    try:
        existing = spark.read.parquet(path)
    except AnalysisException as e:
        cond = ""
        try:
            cond = e.getCondition() or ""
        except Exception:
            pass
        text = cond + " " + str(e)
        # "sink absent" means fresh build. So does "dir exists but holds no
        # committed data file" (a kill before the first task commit leaves
        # only _temporary/, which reads as UNABLE_TO_INFER_SCHEMA) — but
        # ONLY when we can list the dir and confirm it is truly data-free;
        # any other read failure (corrupt footers, permissions) must
        # propagate, or we'd append a duplicate full build onto real data.
        fresh = "PATH_NOT_FOUND" in text or (
            "UNABLE_TO_INFER_SCHEMA" in text and not _local_dir_has_data(path)
        )
        if not fresh:
            raise
        write_sketch_states(
            build_sketch_states(df, specs, shard_bits, route_col), path
        )
        return spark.read.parquet(path)

    if "epoch" in existing.columns:
        raise ValueError(
            f"sink {path!r} is a streaming epoch sink (has an 'epoch' "
            "column): its exactly-once resume is managed by the streaming "
            "checkpoint, not the batch resumable builder — resuming here "
            "would mark every shard done and silently skip the new data"
        )
    if not existing.limit(1).collect():
        # sink dir exists but holds no committed rows (e.g. a kill before
        # the first task commit): behaves exactly like a fresh build
        write_sketch_states(
            build_sketch_states(df, specs, shard_bits, route_col), path
        )
        return spark.read.parquet(path)
    _validate_sink(existing, specs, shard_bits, route_col)
    per_shard = existing.groupBy("shard").agg(
        F.count_distinct("sketch").alias("n_sketches")
    )
    partial = per_shard.filter(F.col("n_sketches") != len(specs))
    partial_rows = partial.limit(5).collect()
    if partial_rows:
        # one kernel call emits ALL specs of a shard into one task output,
        # so a committed-but-partial shard means the sink was hand-edited
        # or written by a different spec list — resuming would duplicate
        raise ValueError(
            f"sink has partial shards {[r['shard'] for r in partial_rows]!r} "
            f"(expected {len(specs)} sketches per shard): the sink is "
            "corrupt for this spec list — rebuild it at a fresh path"
        )
    done = per_shard.select("shard")
    proj = _projected(df, specs, shard_bits, route_col)
    missing = proj.join(F.broadcast(done), on="shard", how="left_anti")
    states = missing.groupBy("shard").applyInPandas(
        _kernel_factory(specs, shard_bits, route_col), SKETCH_STATE_SCHEMA
    )
    write_sketch_states(states, path)
    return spark.read.parquet(path)


def _dedup_replayed(states: DataFrame) -> DataFrame:
    """Drop BYTE-IDENTICAL duplicate state rows before any merge.

    Two legitimate sources of exact duplicates exist: a replayed streaming
    micro-batch (exactly-once via checkpoint + deterministic rebuild) and a
    double ``write_sketch_states(..., mode="append")`` of the same build.
    Forest probes OR duplicates away for free, but CMS/t-digest/KLL merges
    DOUBLE-COUNT them — so every consumer dedupes on the full row identity
    first. Determinism is what makes this exact: a re-run of the same data
    produces the same bytes, so "identical row" == "same contribution".

    Rows that share a key but DIFFER in content are real corruption
    (different data appended under one layout) and are detected downstream
    by ``_conflicting_keys`` / the merge kernels, which raise loudly."""
    key = ["shard", "sketch"] + (["epoch"] if "epoch" in states.columns else [])
    return states.dropDuplicates(key + ["state", "n_rows", "n_nulls"])


def _raise_if_conflicting(pdf: pd.DataFrame, key_cols: list[str], where: str) -> None:
    """Inside a merge kernel, post-dedup: any repeated key means two
    DIFFERENT states were appended for the same slot — merging them would
    silently double-count, so fail with a clear remediation."""
    if pdf.duplicated(key_cols).any():
        dups = pdf.loc[pdf.duplicated(key_cols), key_cols].drop_duplicates()
        raise ValueError(
            f"{where}: sink holds CONFLICTING states for "
            f"{dups.to_dict('records')!r} (same key, different bytes) — the "
            "sink mixes appends from different inputs; rebuild it at a "
            "fresh path"
        )


def _validate_states_specs(states: DataFrame, specs: list[SketchSpec]) -> None:
    """The (sketch, kind, params) triples in the sink must be exactly the
    requested specs — a missing/extra/mismatched triple means the caller is
    finishing a sink with the wrong spec list, which would otherwise
    surface as an opaque KeyError inside an executor-side kernel.

    When ``states`` came straight from ``build_sketch_states`` its triples
    are known BY CONSTRUCTION (the builder tags the DataFrame object), so
    the check is a driver-side set compare. Only untagged frames (sink
    reads, re-composed unions) pay the validating collect — on a lazy
    build pipeline that collect would execute the ENTIRE build a second
    time per finish call (measured: it doubled sketch_profile_5kind)."""
    got = getattr(states, "_sf_state_triples", None)
    if got is None:
        got = {
            (r["sketch"], r["kind"], r["params"])
            for r in states.select("sketch", "kind", "params")
            .dropDuplicates()
            .collect()
        }
    want = {
        (s.name, s.kind, _params_json(_resolve_params(s))) for s in specs
    }
    if got != want:
        raise ValueError(
            "sketch states do not match the given specs: "
            f"sink-only={sorted(got - want)!r} specs-only={sorted(want - got)!r}"
        )


def finish_sketch_states(states: DataFrame, specs: list[SketchSpec]) -> DataFrame:
    """Merge every sketch's shard states DISTRIBUTED and emit long-form
    estimates: (sketch, kind, stat, value), one partition group per spec.

    States are merged in ascending (shard, epoch) order so order-sensitive
    kinds (t-digest centroid layout, KLL compaction) finish
    deterministically. Only 2^shard_bits KB-rows per sketch (times the
    epoch count for streaming sinks) move — never input rows, never a
    driver collect.
    """
    _validate_specs(specs)
    _validate_states_specs(states, specs)
    by_name = {s.name: s for s in specs}
    has_epoch = "epoch" in states.columns
    sort_cols = ["shard", "epoch"] if has_epoch else ["shard"]

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["sketch"].iloc[0]
        spec = by_name[name]
        _raise_if_conflicting(pdf, sort_cols, f"finish_sketch_states({name})")
        params = _params_from_json(spec.kind, pdf["params"].iloc[0])
        acc = _make(spec.kind, params)
        for b in pdf.sort_values(sort_cols)["state"]:
            acc = acc.merge(_from_bytes(spec.kind, params, bytes(b)))
        return pd.DataFrame(
            [
                {"sketch": name, "kind": spec.kind, "stat": stat, "value": val}
                for stat, val in _finish_stats(spec.kind, acc, spec)
            ]
        )

    return _dedup_replayed(states).groupBy("sketch").applyInPandas(
        fin, SKETCH_FINISH_SCHEMA
    )


def merge_sketch_states(states: DataFrame, specs: list[SketchSpec]) -> dict:
    """Driver-side merge → {spec name: sketch object}, for query-style use
    (CMS point estimates, Bloom membership, quantile sweeps).

    Deliberately bounded: collects (2^shard_bits × n_specs) KB-sized rows —
    the states, never input rows. For finish-only consumption prefer
    ``finish_sketch_states`` (fully distributed).
    """
    _validate_specs(specs)
    _validate_states_specs(states, specs)
    by_name = {s.name: s for s in specs}
    states = _dedup_replayed(states)
    has_epoch = "epoch" in states.columns
    sel = ["sketch", "kind", "params", "shard", "state"] + (
        ["epoch"] if has_epoch else []
    )
    rows = states.select(sel).collect()
    keyf = (
        (lambda r: (r["sketch"], r["shard"], r["epoch"]))
        if has_epoch
        else (lambda r: (r["sketch"], r["shard"]))
    )
    rows.sort(key=keyf)
    seen = set()
    for r in rows:
        k = keyf(r)
        if k in seen:
            raise ValueError(
                f"merge_sketch_states: sink holds CONFLICTING states for {k!r} "
                "(same key, different bytes) — rebuild it at a fresh path"
            )
        seen.add(k)
    out: dict = {}
    for r in rows:
        spec = by_name[r["sketch"]]
        params = _params_from_json(spec.kind, r["params"])
        sk = _from_bytes(spec.kind, params, bytes(r["state"]))
        acc = out.get(spec.name)
        out[spec.name] = sk if acc is None else acc.merge(sk)
    return out


def sketch_append_batch(
    batch_df: DataFrame,
    epoch_id: int,
    path: str,
    specs: list[SketchSpec],
    shard_bits: int,
    route_col: str,
) -> None:
    """foreachBatch body: build this micro-batch's per-shard states and
    append them tagged with the batch epoch.

    Streaming is where the sketches' merge semantics beat the forest's:
    epoch-appended fuse filters pay fpp per epoch (k epochs ≈ k× fpp until
    compaction), but sketch merges are the algorithms' OWN defined
    operation, so a multi-epoch sink finishes to exactly the state a
    single-pass build over the union would reach (bit-equal for the
    order-independent kinds; same error bounds for t-digest/KLL). The sink
    stays one row per (epoch, shard, sketch); ``finish_sketch_states``
    drops replayed-epoch duplicates before merging (see _dedup_replayed).
    """
    _validate_specs(specs)
    # no isEmpty() pre-check: it costs one extra job over the micro-batch
    # every epoch, while an empty batch simply yields zero kernel groups
    # and appends nothing
    states = build_sketch_states(batch_df, specs, shard_bits, route_col)
    states.withColumn("epoch", F.lit(int(epoch_id)).cast("long")).write.mode(
        "append"
    ).parquet(path)


def stream_sketch_states(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    specs: list[SketchSpec],
    shard_bits: int,
    route_col: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming DataFrame into epoch-appended sketch maintenance;
    returns the StreamingQuery. Exactly-once: a replayed epoch re-appends
    byte-identical rows (deterministic kernels), which every sink consumer
    dedupes by (epoch, shard, sketch) before merging."""

    def _batch(df: DataFrame, epoch_id: int) -> None:
        sketch_append_batch(df, epoch_id, path, specs, shard_bits, route_col)

    writer = stream_df.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_sketch_states(
    spark: SparkSession,
    path: str,
    out_path: str,
    specs: list[SketchSpec],
) -> DataFrame:
    """Merge an epoch sink down to one row per (shard, sketch) — the
    bounded-cost form for long-running streams (finish cost goes from
    O(epochs × shards) rows back to O(shards)).

    States merge in ascending epoch order (deterministic for the
    order-sensitive kinds); lineage rows/nulls are summed so the compacted
    sink's metrics still add up to everything the stream absorbed. The
    output is a batch-shaped sink (no epoch column) and finishes to the
    same estimates as the uncompacted sink (merge associativity).
    """
    _validate_specs(specs)
    by_name = {s.name: s for s in specs}
    states = spark.read.parquet(path)
    if "epoch" not in states.columns:
        raise ValueError(f"{path!r} is not an epoch sink (no 'epoch' column)")
    meta = states.select("shard_bits", "route_col").dropDuplicates().collect()
    if len(meta) != 1:
        raise ValueError(
            f"epoch sink {path!r} mixes shard layouts: "
            f"{[(r['shard_bits'], r['route_col']) for r in meta]!r}"
        )
    _validate_sink(states, specs, meta[0]["shard_bits"], meta[0]["route_col"])

    def squash(pdf: pd.DataFrame) -> pd.DataFrame:
        spec = by_name[pdf["sketch"].iloc[0]]
        _raise_if_conflicting(
            pdf, ["epoch"], f"compact_sketch_states({pdf['sketch'].iloc[0]})"
        )
        params = _params_from_json(spec.kind, pdf["params"].iloc[0])
        acc = _make(spec.kind, params)
        for b in pdf.sort_values("epoch")["state"]:
            acc = acc.merge(_from_bytes(spec.kind, params, bytes(b)))
        state = acc.to_bytes()
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    "shard": int(first["shard"]),
                    "sketch": first["sketch"],
                    "kind": first["kind"],
                    "params": first["params"],
                    "state": state,
                    "n_rows": int(pdf["n_rows"].sum()),
                    "n_nulls": int(pdf["n_nulls"].sum()),
                    "state_bytes": len(state),
                    "shard_bits": int(first["shard_bits"]),
                    "route_col": first["route_col"],
                }
            ]
        )

    compacted = (
        _dedup_replayed(states)
        .groupBy("shard", "sketch")
        .applyInPandas(squash, SKETCH_STATE_SCHEMA)
    )
    compacted.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def sketch_sink_metrics(states: DataFrame) -> DataFrame:
    """Per-sketch lineage rollup over the sink: shard count, rows/nulls
    absorbed, state bytes — the job-monitoring view of the checkpoint.
    Epoch sinks drop replayed duplicates first so the sums stay exact."""
    states = _dedup_replayed(states)
    return states.groupBy("sketch", "kind").agg(
        F.count_distinct("shard").alias("n_shards"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.sum("state_bytes").alias("state_bytes"),
        F.max("state_bytes").alias("max_state_bytes"),
    )
