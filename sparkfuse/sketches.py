"""Bonus mergeable sketches (north_rule family: HLL, count-min; plus
Misra-Gries frequent items — the enumerable heavy-hitter summary CMS
cannot provide).

The xor/fuse forest is a *static* membership structure (no merge of two
filters exists in the reference — SURVEY.md §1.1); these sketches are the
contrast case the north_rule names: true mergeable aggregation states with
associative, commutative merge (HLL: register-wise max; CMS: cell-wise add),
so they compose as partial-aggregate → tree-merge with no keyed shuffle at
all — the same plan shape as the Bloom baseline (sparkfuse.bloom).

Both are from scratch on numpy over Arrow batches; published error bounds:
  HLL  : relative std error 1.04 / sqrt(m) on count-distinct
  CMS  : point overcount <= eps * N with prob 1 - delta,
         eps = e / width, delta = e^-depth
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

from sparkfuse.hashing import murmur64, to_i64, to_u64

_PARTIAL_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("state", BinaryType(), False),
    ]
)


# ---------------------------------------------------------------------------
# HyperLogLog (dense, numpy registers)
# ---------------------------------------------------------------------------

@dataclass
class HllParams:
    p: int = 14  # 2^14 = 16384 registers, ~0.8% std error

    @property
    def m(self) -> int:
        return 1 << self.p


class HyperLogLog:
    """Dense HLL over u64 keys. Merge = elementwise register max."""

    def __init__(self, params: HllParams | None = None, registers: np.ndarray | None = None):
        params = params or HllParams()
        self.params = params
        self.registers = (
            registers if registers is not None else np.zeros(params.m, dtype=np.uint8)
        )

    def add(self, keys: np.ndarray) -> None:
        idx, rank = hll_idx_rank(keys, self.params.p)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.params == other.params
        return HyperLogLog(self.params, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.params.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting for small n
        return float(e)

    def to_bytes(self) -> bytes:
        """Smaller of two LOSSLESS encodings, chosen deterministically:

        - DENSE: the raw m register bytes (exactly ``params.m`` long).
        - SPARSE: ``b'\\x01' + uint32 nnz + nnz*uint32 idx (sorted) +
          nnz*uint8 rank`` — 5 bytes per NONZERO register.

        The sparse form is what makes high-cardinality grouped HLL viable
        at 10^12-turn scale: a per-(partition, group) partial over a few
        dozen turns serializes to ~hundreds of bytes instead of a fixed
        16 KB (p=14) dense block, so the partial-state shuffle stays
        proportional to data seen, not to 2^p × groups (the HLL++ sparse
        idea, Heule et al. 2013 — same register precision here, so the
        estimate is bit-identical to dense). Dispatch is unambiguous for
        every p: a sparse payload is 5 + 5·nnz bytes and 2^p ≢ 0 (mod 5),
        so only the dense form can ever be exactly m bytes long — which
        also keeps every pre-existing dense checkpoint readable."""
        nnz = int(np.count_nonzero(self.registers))
        if 5 + 5 * nnz >= self.params.m:
            return self.registers.tobytes()
        idx = np.flatnonzero(self.registers)
        return _hll_sparse_bytes(idx, self.registers[idx])

    @classmethod
    def from_bytes(cls, params: HllParams, data: bytes) -> "HyperLogLog":
        parsed = _hll_state_parts(data, params.m)
        if isinstance(parsed, np.ndarray):
            return cls(params, parsed.copy())
        idx, ranks = parsed
        registers = np.zeros(params.m, dtype=np.uint8)
        registers[idx] = ranks
        return cls(params, registers)

    @property
    def relative_std_error(self) -> float:
        return 1.04 / math.sqrt(self.params.m)


def _hll_sparse_bytes(idx: np.ndarray, ranks: np.ndarray) -> bytes:
    """The sparse wire form: explicit little-endian everywhere so state
    tables written on any host load on any other (these are shippable
    artifacts, not process-local scratch)."""
    return (
        b"\x01"
        + struct.pack("<I", len(idx))
        + np.ascontiguousarray(idx, dtype="<u4").tobytes()
        + np.ascontiguousarray(ranks, dtype=np.uint8).tobytes()
    )


def _hll_state_parts(data: bytes, m: int):
    """Parse either HLL wire form — the ONE place the format is read.
    Returns a dense uint8 view (len == m) or an (idx int64, ranks uint8)
    pair for sparse payloads; raises ValueError on anything else."""
    data = bytes(data)
    if len(data) == m:  # dense raw (legacy and large-state form)
        return np.frombuffer(data, dtype=np.uint8)
    if not data or data[0] != 1:
        raise ValueError(f"HLL state is neither {m} dense bytes nor sparse-tagged")
    nnz = int(np.frombuffer(data, dtype="<u4", count=1, offset=1)[0])
    if len(data) != 5 + 5 * nnz:
        raise ValueError("sparse HLL state length mismatch")
    idx = np.frombuffer(data, dtype="<u4", count=nnz, offset=5).astype(np.int64)
    ranks = np.frombuffer(data, dtype=np.uint8, count=nnz, offset=5 + 4 * nnz)
    return idx, ranks


def merge_hll_states(states, params: HllParams) -> np.ndarray:
    """Register-max merge of serialized HLL states (either wire form) into
    one dense register array — without densifying each sparse state
    individually: sparse payloads are scattered once, together, onto the
    (possibly dense-merged) result. Same parse/validation as
    ``from_bytes`` (shared ``_hll_state_parts``)."""
    m = params.m
    dense: list[np.ndarray] = []
    sp_idx: list[np.ndarray] = []
    sp_rank: list[np.ndarray] = []
    for b in states:
        parsed = _hll_state_parts(b, m)
        if isinstance(parsed, np.ndarray):
            dense.append(parsed)
        else:
            sp_idx.append(parsed[0])
            sp_rank.append(parsed[1])
    reg = (
        np.maximum.reduce(dense).copy() if dense else np.zeros(m, dtype=np.uint8)
    )
    if sp_idx:
        np.maximum.at(reg, np.concatenate(sp_idx), np.concatenate(sp_rank))
    return reg


def hll_idx_rank(keys: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) for each key — the HLL update decomposed so
    grouped aggregation can compute it once, vectorized, across ALL groups
    in a batch instead of once per group."""
    h = murmur64(to_u64(np.asarray(keys)))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits at the top
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest==0)
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    nz = rest != 0
    # count leading zeros via float64 exponent trick is lossy; use
    # bit-length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(h), dtype=np.uint8)
    r = rest[nz]
    # bit_length via log2 is unsafe at 2^53; do it in halves
    hi = (r >> np.uint64(32)).astype(np.uint32)
    lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_hi = np.where(hi != 0, 32 + _bit_length32(hi), _bit_length32(lo))
    bl[nz] = bl_hi.astype(np.uint8)
    lz[nz] = (64 - bl[nz]).astype(np.uint8)
    rank = (lz + 1).astype(np.uint8)
    return idx, rank


def _bit_length32(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint32 (exact: float64 holds 32-bit ints)."""
    out = np.zeros(len(x), dtype=np.int64)
    nz = x != 0
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

@dataclass
class CmsParams:
    depth: int = 5
    width: int = 1 << 16
    seed: int = 0xC0FFEE

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)


class CountMin:
    """Count-min sketch over u64 keys. Merge = elementwise add."""

    def __init__(self, params: CmsParams | None = None, table: np.ndarray | None = None):
        params = params or CmsParams()
        self.params = params
        self.table = (
            table
            if table is not None
            else np.zeros((params.depth, params.width), dtype=np.int64)
        )

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        p = self.params
        h = murmur64(to_u64(np.asarray(keys)) + np.uint64(p.seed))
        out = np.empty((p.depth, len(h)), dtype=np.int64)
        cur = h
        for d in range(p.depth):
            out[d] = (cur % np.uint64(p.width)).astype(np.int64)
            cur = murmur64(cur ^ np.uint64(d + 1))
        return out

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        cols = self._cols(keys)
        w = np.ones(cols.shape[1], dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        for d in range(self.params.depth):
            np.add.at(self.table[d], cols[d], w)

    def query(self, keys: np.ndarray) -> np.ndarray:
        cols = self._cols(keys)
        est = self.table[0][cols[0]]
        for d in range(1, self.params.depth):
            est = np.minimum(est, self.table[d][cols[d]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert self.params == other.params
        return CountMin(self.params, self.table + other.table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, params: CmsParams, data: bytes) -> "CountMin":
        t = np.frombuffer(data, dtype=np.int64).reshape(params.depth, params.width)
        return cls(params, t.copy())


# ---------------------------------------------------------------------------
# distributed builds (partial per batch -> tree merge), Bloom-style
# ---------------------------------------------------------------------------

def _tree_build(keys_df: DataFrame, key_name: str, make, add, merge, to_bytes, from_bytes, fanout: int = 16):
    keys_df = keys_df.select(F.col(key_name).alias("key"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = make()
        saw = False
        for pdf in batches:
            if len(pdf):
                saw = True
                add(state, pdf["key"].to_numpy())
        if saw:
            b = to_bytes(state)
            yield pd.DataFrame({"bucket": [hash(b) % fanout], "state": [b]})

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = make()
        for b in pdf["state"]:
            acc = merge(acc, from_bytes(bytes(b)))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "state": [to_bytes(acc)]})

    reduced = (
        keys_df.mapInPandas(partials, _PARTIAL_SCHEMA)
        .groupBy("bucket")
        .applyInPandas(reduce_group, _PARTIAL_SCHEMA)
    )
    final = make()
    for row in reduced.collect():
        final = merge(final, from_bytes(bytes(row["state"])))
    return final


def build_hll(keys_df: DataFrame, key_name: str = "key", params: HllParams | None = None) -> HyperLogLog:
    params = params or HllParams()
    return _tree_build(
        keys_df,
        key_name,
        make=lambda: HyperLogLog(params),
        add=lambda s, k: s.add(k),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: HyperLogLog.from_bytes(params, b),
    )


def build_cms(keys_df: DataFrame, key_name: str = "key", params: CmsParams | None = None) -> CountMin:
    params = params or CmsParams()
    return _tree_build(
        keys_df,
        key_name,
        make=lambda: CountMin(params),
        add=lambda s, k: s.add(k),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: CountMin.from_bytes(params, b),
    )


# ---------------------------------------------------------------------------
# grouped sketch aggregation (mergeable UDAF shape, per group key)
# ---------------------------------------------------------------------------

def _grouped_states(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    make,
    add,
    merge,
    to_bytes,
    from_bytes,
    finish_schema: StructType,
    finish,
) -> DataFrame:
    """Per-group mergeable sketch aggregation — the true-UDAF plan shape:

        scan → mapInPandas PARTIAL (one state per (partition, group)) →
        groupBy(group) FINAL merge → finish columns

    Only KB-sized serialized states cross the shuffle, one per
    (input partition, group) — never raw rows. This is the grouped analog
    of ``_tree_build`` (which handles the global, no-key case) and the plan
    a 10^12-row corpus needs for per-slice statistics.

    Cardinality regime: built for LOW-cardinality group keys (slices —
    event types, languages, sources), where partitions × groups × state
    is tiny next to the rows it replaces. For high-cardinality grouping
    (per-user, per-conv_id) the fixed-size kinds (t-digest/KLL/CMS) still
    exceed the rows they summarize — aggregate exactly there — but HLL
    partials now serialize SPARSE (5 bytes per nonzero register, see
    ``HyperLogLog.to_bytes``), so grouped_hll's shuffle stays proportional
    to data seen per (partition, group) and the high-cardinality case is
    first-class rather than deferred to ``approx_count_distinct``.
    The value of these from-scratch states over the built-in is that they
    are persistable/resumable artifacts: write the partial-state table,
    merge later, ship cross-system (north_rule: mergeable UDAFs from
    scratch with checkpointable lineage).
    """
    from pyspark import TaskContext
    from pyspark.sql.types import LongType

    gfields = [df.schema[c] for c in group_cols]
    partial_schema = StructType(
        list(gfields)
        + [StructField("_pid", LongType(), False), StructField("state", BinaryType(), False)]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            # dropna=False: Spark's groupBy keeps a NULL group — silently
            # dropping it here would delete a whole output row. NULL VALUES
            # are skipped to match countDistinct/percentile null semantics.
            for g, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                k = g if isinstance(g, tuple) else (g,)
                st = accs.get(k)
                if st is None:
                    st = accs[k] = make()  # all-null groups keep their row
                vals = sub[value_col].dropna().to_numpy()
                if len(vals):
                    add(st, vals)
        if accs:
            # the source partition id rides along so the final merge can
            # order states deterministically — shuffle FETCH order is not
            # deterministic, and t-digest/KLL merges are order-sensitive,
            # so without it per-group results could drift run to run
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                [
                    dict(zip(group_cols, k)) | {"_pid": pid, "state": to_bytes(s)}
                    for k, s in accs.items()
                ]
            )

    res_fields = [f for f in finish_schema.fields if f.name not in group_cols]
    res_schema = StructType(res_fields)
    res_names = [f.name for f in res_fields]

    # FINAL is a JVM collect_list aggregation (true partial+final shuffle
    # agg of KB states) feeding ONE batch pandas UDF — never a pandas
    # invocation per group (applyInPandas prices ~ms of split/convert
    # overhead per GROUP; the batch UDF prices it per ARROW BATCH, the
    # 26x difference PLANS.md §30 measured on grouped_hll). sort_array
    # over struct(_pid, state) restores the deterministic per-partition
    # merge order the order-sensitive kinds (t-digest/KLL) require.
    @F.pandas_udf(res_schema)
    def _finish_states(state_lists: pd.Series) -> pd.DataFrame:
        rows = []
        for states in state_lists:
            acc = make()
            for st in states:
                acc = merge(acc, from_bytes(bytes(st["state"])))
            rows.append(finish(acc))
        return pd.DataFrame(rows, columns=res_names)

    sel = df.select(*group_cols, value_col)
    return (
        sel.mapInPandas(partials, partial_schema)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list(F.struct("_pid", "state"))).alias("_states")
        )
        .select(*group_cols, _finish_states("_states").alias("_r"))
        .select(*group_cols, "_r.*")
    )


def grouped_hll(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    params: HllParams | None = None,
) -> DataFrame:
    """Count-distinct estimate per group (HLL registers merged register-max).
    Returns group_cols + ``n_distinct_est`` double. Error: 1.04/sqrt(m).

    High-cardinality fast path: unlike the generic ``_grouped_states``
    (one Python ``add`` per (group, batch) sub-frame AND one
    ``applyInPandas`` invocation per group — fine for a handful of
    slices, ~ms-per-group overhead at 10k+ groups), both stages here are
    vectorized ACROSS groups. Partial: one murmur/idx/rank pass over the
    whole Arrow batch (``hll_idx_rank``), then a lexsort reduce to
    max-rank per (group, register), states built directly in the sparse
    wire format ``HyperLogLog.to_bytes`` defines (bit-identical: sorted
    nonzero registers). Final: a JVM ``collect_list`` aggregation (true
    partial+final shuffle agg of KB states — never one pandas group per
    output row) feeding a batch pandas UDF that merges register-max and
    estimates; max-merge is commutative/associative, so dropping the
    per-partition ordering the order-sensitive kinds need keeps results
    deterministic. Estimates are bit-identical to the per-group
    ``HyperLogLog`` path (same registers, same float summation).

    Null-safe integer handling: Arrow→pandas coerces a nullable integral
    column to float64 whenever a batch contains a NULL, silently rounding
    values past 2^53 — which would both hash wrong keys AND emit rounded
    group values back to the JVM groupBy. Integral key/group columns are
    therefore shipped as (coalesce(col, 0), isnull(col)) pairs — a
    null-free int64 column stays int64 through Arrow — and reconstructed
    exactly on the Python side."""
    from pyspark.sql.types import ByteType, DoubleType, LongType, ShortType

    params = params or HllParams()
    p, m = params.p, params.m
    integral = (ByteType, ShortType, IntegerType, LongType)

    proj = []
    pand_keys: list[str] = []  # pandas-side grouping columns
    recon: list[tuple] = []  # (orig name, value col, null-flag col | None)
    for c in group_cols:
        if isinstance(df.schema[c].dataType, integral):
            proj += [
                F.coalesce(F.col(c), F.lit(0)).alias(f"_g_{c}"),
                F.col(c).isNull().alias(f"_n_{c}"),
            ]
            pand_keys += [f"_g_{c}", f"_n_{c}"]
            recon.append((c, f"_g_{c}", f"_n_{c}"))
        else:
            proj.append(F.col(c))
            pand_keys.append(c)
            recon.append((c, c, None))
    if isinstance(df.schema[key_col].dataType, integral):
        proj += [
            F.coalesce(F.col(key_col), F.lit(0)).alias("_v"),
            F.col(key_col).isNotNull().alias("_vok"),
        ]
        val_col, val_ok = "_v", "_vok"
    else:
        proj.append(F.col(key_col))
        val_col, val_ok = key_col, None
    kpos = {name: i for i, name in enumerate(pand_keys)}

    gfields = [df.schema[c] for c in group_cols]
    partial_schema = StructType(
        list(gfields) + [StructField("state", BinaryType(), False)]
    )

    def _reduce_triples(g, idx, rank):
        """max rank per (group, register): sort so the max lands last in
        each (g, idx) run, keep run tails."""
        order = np.lexsort((rank, idx, g))
        g, idx, rank = g[order], idx[order], rank[order]
        last = np.empty(len(g), dtype=bool)
        last[-1] = True
        last[:-1] = (g[:-1] != g[1:]) | (idx[:-1] != idx[1:])
        return g[last], idx[last], rank[last]

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        group_code: dict = {}  # normalized group tuple -> stable code
        group_vals: list[tuple] = []  # code -> group tuple (for output rows)
        acc_g, acc_i, acc_r = [], [], []
        for pdf in batches:
            if not len(pdf):
                continue
            # vectorized grouping: per-row group numbers in order of first
            # appearance (C-level), no per-group sub-frames. dropna=False
            # keeps NULL groups — dropping them would delete output rows.
            gb = pdf.groupby(pand_keys, sort=False, dropna=False)
            local = gb.ngroup().to_numpy()
            uniq = gb.size().reset_index()[pand_keys]
            lut = np.empty(len(uniq), dtype=np.int64)
            for j, row in enumerate(uniq.itertuples(index=False, name=None)):
                k = tuple(
                    None
                    if (nc is not None and row[kpos[nc]])
                    or (nc is None and pd.isna(row[kpos[vc]]))
                    else (int(row[kpos[vc]]) if nc is not None else row[kpos[vc]])
                    for _, vc, nc in recon
                )
                code = group_code.get(k)
                if code is None:
                    code = group_code[k] = len(group_vals)
                    group_vals.append(k)
                lut[j] = code
            gcodes = lut[local]
            # NULL values skipped (countDistinct semantics); their groups
            # stay registered above so all-null groups keep their row
            mask = (
                pdf[val_ok].to_numpy()
                if val_ok is not None
                else pdf[val_col].notna().to_numpy()
            )
            if mask.any():
                idx, rank = hll_idx_rank(pdf[val_col].to_numpy()[mask], p)
                bg, bi, br = _reduce_triples(gcodes[mask], idx, rank)
                acc_g.append(bg)
                acc_i.append(bi)
                acc_r.append(br)
        if not group_vals:
            return
        if acc_g:
            g, idx, rank = _reduce_triples(
                np.concatenate(acc_g), np.concatenate(acc_i), np.concatenate(acc_r)
            )
            starts = np.flatnonzero(np.r_[True, g[:-1] != g[1:]])
            ends = np.r_[starts[1:], len(g)]
            bounds = {int(g[s]): (s, e) for s, e in zip(starts, ends)}
        else:
            bounds = {}
        empty = _hll_sparse_bytes(np.empty(0, np.int64), np.empty(0, np.uint8))
        states = []
        for code in range(len(group_vals)):
            se = bounds.get(code)
            if se is None:
                states.append(empty)  # == HyperLogLog().to_bytes(), fresh
            else:
                s, e = se
                nnz = e - s
                if 5 + 5 * nnz < m:  # the sparse wire form, built in place
                    states.append(_hll_sparse_bytes(idx[s:e], rank[s:e]))
                else:
                    reg = np.zeros(m, dtype=np.uint8)
                    reg[idx[s:e]] = rank[s:e]
                    states.append(reg.tobytes())
        # build group columns as OBJECT series: pd.DataFrame would coerce an
        # int+None column to float64, rounding values past 2^53 — the same
        # trap the input side dodges with the coalesce/flag projection
        out = {
            c: pd.Series([k[i] for k in group_vals], dtype=object)
            for i, c in enumerate(group_cols)
        }
        out["state"] = pd.Series(states, dtype=object)
        yield pd.DataFrame(out)

    @F.pandas_udf(DoubleType())
    def _estimate(state_lists: pd.Series) -> pd.Series:
        out = np.empty(len(state_lists), dtype=np.float64)
        for i, states in enumerate(state_lists):
            reg = merge_hll_states(states, params)
            out[i] = HyperLogLog(params, reg).estimate()
        return pd.Series(out)

    sel = df.select(*proj)
    return (
        sel.mapInPandas(partials, partial_schema)
        .groupBy(*group_cols)
        .agg(F.collect_list("state").alias("_states"))
        .select(*group_cols, _estimate("_states").alias("n_distinct_est"))
    )


def grouped_tdigest_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    params=None,
) -> DataFrame:
    """Per-group approximate quantiles via mergeable t-digests. Returns
    group_cols + one ``q_<percent>`` double column per requested quantile."""
    from pyspark.sql.types import DoubleType

    from sparkfuse.tdigest import TDigest, TDigestParams

    params = params or TDigestParams()
    qnames = [f"q_{str(q).replace('.', '_')}" for q in quantiles]
    gfields = [df.schema[c] for c in group_cols]
    out_schema = StructType(
        list(gfields) + [StructField(n, DoubleType(), True) for n in qnames]
    )
    return _grouped_states(
        df, group_cols, value_col,
        make=lambda: TDigest(params),
        add=lambda s, v: s.add(v.astype(np.float64)),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: TDigest.from_bytes(params, b),
        finish_schema=out_schema,
        finish=lambda s: {
            n: float(s.quantile(q)) for n, q in zip(qnames, quantiles)
        },
    )


def grouped_kll_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    params=None,
) -> DataFrame:
    """Per-group approximate quantiles via mergeable KLL sketches —
    completes the grouped family (grouped_hll / grouped_tdigest_quantiles)
    with the rank-error-bounded kind. Returns group_cols + one
    ``q_<percent>`` double column per requested quantile."""
    from pyspark.sql.types import DoubleType

    from sparkfuse.kll import KLL, KllParams

    params = params or KllParams()
    qnames = [f"q_{str(q).replace('.', '_')}" for q in quantiles]
    gfields = [df.schema[c] for c in group_cols]
    out_schema = StructType(
        list(gfields) + [StructField(n, DoubleType(), True) for n in qnames]
    )

    def _add(s, v):
        s.add(v.astype(np.float64))
        return s

    return _grouped_states(
        df, group_cols, value_col,
        make=lambda: KLL(params),
        add=_add,
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: KLL.from_bytes(params, b),
        finish_schema=out_schema,
        finish=lambda s: {
            n: (float(s.quantile(q)) if s.n else None)
            for n, q in zip(qnames, quantiles)
        },
    )


# ---------------------------------------------------------------------------
# Misra-Gries frequent items (mergeable, enumerable heavy-hitter summary)
# ---------------------------------------------------------------------------

@dataclass
class MgParams:
    capacity: int = 256  # max tracked keys; undercount <= n/(capacity+1)


class MisraGries:
    """Mergeable Misra-Gries summary over u64 keys: at most ``capacity``
    (key, counter) pairs, with the classic guarantee

        c(x) - dec  <=  counter(x)  <=  c(x)

    where ``dec`` (tracked explicitly) is the cumulative threshold ever
    subtracted, and dec <= n / (capacity+1). Every key whose true count
    exceeds ``dec`` is PRESENT in the summary — which is what makes
    threshold heavy-hitter queries exactly verifiable (CMS estimates
    counts but cannot enumerate candidates; MG enumerates).

    Merge (mergeable-summaries construction): sum counters keywise, then
    subtract the (capacity+1)-th largest counter from all and drop the
    non-positive — each such shrink subtracts its threshold t from at
    least capacity+1 counters, so the dec <= n/(capacity+1) bound
    composes across any merge tree.
    """

    def __init__(self, params: MgParams | None = None, keys=None, counts=None,
                 n: int = 0, dec: int = 0):
        # no mutable default instance (round-4 ADVICE)
        self.params = params or MgParams()
        self.keys = keys if keys is not None else np.empty(0, dtype=np.uint64)
        self.counts = counts if counts is not None else np.empty(0, dtype=np.int64)
        self.n = n
        self.dec = dec

    @staticmethod
    def _combine(keys_a, counts_a, keys_b, counts_b):
        k = np.concatenate([keys_a, keys_b])
        c = np.concatenate([counts_a, counts_b])
        uk, inv = np.unique(k, return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, c)
        return uk, uc

    def _shrink(self, keys, counts):
        cap = self.params.capacity
        if len(keys) <= cap:
            return keys, counts, 0
        # (capacity+1)-th largest counter; >= capacity+1 counters lose t
        t = int(np.partition(counts, len(counts) - cap - 1)[len(counts) - cap - 1])
        c2 = counts - t
        keep = c2 > 0
        return keys[keep], c2[keep], t

    def add(self, keys: np.ndarray) -> None:
        keys = to_u64(np.asarray(keys))
        if len(keys) == 0:
            return
        uk, uc = np.unique(keys, return_counts=True)
        k, c = self._combine(self.keys, self.counts, uk, uc.astype(np.int64))
        self.keys, self.counts, t = self._shrink(k, c)
        self.n += int(len(keys))
        self.dec += t

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.params == other.params
        out = MisraGries(self.params, n=self.n + other.n)
        k, c = self._combine(self.keys, self.counts, other.keys, other.counts)
        out.keys, out.counts, t = out._shrink(k, c)
        out.dec = self.dec + other.dec + t
        return out

    def estimates(self, keys: np.ndarray) -> np.ndarray:
        """Lower-bound counts for ``keys`` (0 if untracked); true count is
        within [estimate, estimate + dec]."""
        keys = to_u64(np.asarray(keys))
        idx = np.searchsorted(self.keys, keys)
        idx = np.clip(idx, 0, max(len(self.keys) - 1, 0))
        out = np.zeros(len(keys), dtype=np.int64)
        if len(self.keys):
            hit = self.keys[idx] == keys
            out[hit] = self.counts[idx[hit]]
        return out

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<QQI", self.n, self.dec, len(self.keys))
        return head + self.keys.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, params: MgParams, data: bytes) -> "MisraGries":
        import struct

        n, dec, ln = struct.unpack_from("<QQI", data, 0)
        off = struct.calcsize("<QQI")
        keys = np.frombuffer(data, dtype=np.uint64, count=ln, offset=off).copy()
        counts = np.frombuffer(
            data, dtype=np.int64, count=ln, offset=off + 8 * ln
        ).copy()
        return cls(params, keys, counts, n=int(n), dec=int(dec))


def build_mg(
    keys_df: DataFrame, key_name: str = "key", params: MgParams | None = None
) -> MisraGries:
    params = params or MgParams()
    return _tree_build(
        keys_df,
        key_name,
        make=lambda: MisraGries(params),
        add=lambda s, k: s.add(k),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: MisraGries.from_bytes(params, b),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT counts of every ``col`` value occurring >= ``min_count``
    times, MG-prescreened so the exact pass only aggregates candidate
    rows. Returns (col, n) rows.

    Pass 1 builds a mergeable Misra-Gries summary over xxhash64(col)
    (KB-sized states tree-merged, no keyed shuffle). Its guarantee makes
    the prescreen LOSSLESS: every value with true count >= min_count has a
    surviving counter whenever min_count > dec, which is checked at
    runtime — a too-small capacity raises with the remediation instead of
    silently dropping heavy hitters. Hash collisions only ever ADD
    candidates (counts inflate), never lose one; the exact confirm
    groups by the VALUE, so extras are filtered precisely.

    Scale shape: a plain groupBy(col) at 10^12 rows shuffles every
    distinct key once; here only rows whose hash is among <= capacity
    candidates reach the exchange (an in-list filter inside the scan's
    codegen stage), and capacity rides the threshold: the MG bound needs
    capacity >~ n/min_count, which is exactly the heavy-hitter working-set
    size."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keys = df.filter(F.col(col).isNotNull()).select(F.xxhash64(col).alias("key"))
    mg = build_mg(keys, params=MgParams(capacity=capacity))
    if mg.dec >= min_count:
        raise ValueError(
            f"heavy_hitters: MG undercount bound dec={mg.dec} >= "
            f"min_count={min_count}: candidates may be incomplete — raise "
            f"capacity (needs roughly n/min_count = "
            f"{max(1, mg.n // max(min_count, 1))})"
        )
    cand = [int(k) for k in to_i64(mg.keys)]
    nn = df.filter(F.col(col).isNotNull())
    if len(cand) <= 1024:
        # small candidate sets compile to an INSET hash-set filter inside
        # the scan's codegen stage (verified plan, PLANS.md §18)
        filtered = nn.filter(F.xxhash64(col).isin(cand))
    else:
        # a multi-thousand-literal IN list bloats the expression tree and
        # Catalyst plan time; a broadcast semi-join on the hashed key keeps
        # the same only-candidate-rows-shuffle shape at any capacity
        cand_df = df.sparkSession.createDataFrame(
            [(c,) for c in cand], "_sf_hh_key long"
        )
        filtered = nn.join(
            F.broadcast(cand_df),
            F.xxhash64(col) == cand_df["_sf_hh_key"],
            "left_semi",
        )
    return (
        filtered.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
