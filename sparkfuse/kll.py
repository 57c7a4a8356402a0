"""Mergeable KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016 —
"Optimal Quantile Approximation in Streams"; same family as Spark's own
approx_percentile helper and the DataSketches KLL).

A KLL sketch is a hierarchy of compactors: level l holds items with weight
2^l. When a level overflows its capacity (k·c^(depth−l), c=2/3, floor 2),
it sorts itself and promotes every other item (random even/odd phase) to
level l+1 — halving count, doubling weight, keeping ranks unbiased. Rank
error is O(1/k) with high probability.

Merge = levelwise concatenation + the same compaction — associative in
distribution (accuracy-stable, not byte-stable), the standard KLL contract.
Randomness is a seeded splitmix64 counter, so a given add/merge sequence is
reproducible.

Distributed build: identical plan shape to HLL/CMS/t-digest (PLANS.md §6) —
per-partition partials via mapInPandas, bucketed tree merge, driver merge of
the survivors; only sketch states move.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.hashing import splitmix64_next
from sparkfuse.sketches import _tree_build

_C = 2.0 / 3.0


@dataclass
class KllParams:
    k: int = 200
    seed: int = 0x5EED


class KLL:
    def __init__(self, params: KllParams | None = None):
        # no shared mutable default instance (round-5 ADVICE)
        params = params or KllParams()
        self.params = params
        self.levels: list[np.ndarray] = [np.empty(0)]
        self._rng_state = params.seed
        self.n = 0
        self.min = math.inf
        self.max = -math.inf

    # -- internals ----------------------------------------------------------

    def _coin(self) -> int:
        self._rng_state, v = splitmix64_next(self._rng_state)
        return v & 1

    def _capacity(self, level: int) -> int:
        depth = len(self.levels)
        return max(2, int(math.ceil(self.params.k * (_C ** (depth - 1 - level)))))

    def _compact(self) -> None:
        while True:
            for l, buf in enumerate(self.levels):
                if len(buf) > self._capacity(l):
                    if l + 1 == len(self.levels):
                        self.levels.append(np.empty(0))
                    buf = np.sort(buf, kind="stable")
                    phase = self._coin()
                    promoted = buf[phase::2]
                    self.levels[l] = np.empty(0)
                    self.levels[l + 1] = np.concatenate(
                        [self.levels[l + 1], promoted]
                    )
                    break
            else:
                return

    # -- public -------------------------------------------------------------

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        # feed level 0 in k-sized chunks: memory stays O(k), and unlike
        # _capacity(0) (which decays to 2 on a deep sketch) the per-add
        # Python-loop count stays ~len(v)/k
        chunk = max(self.params.k, 2)
        for start in range(0, len(v), chunk):
            self.levels[0] = np.concatenate([self.levels[0], v[start:start + chunk]])
            self._compact()

    def merge(self, other: "KLL") -> "KLL":
        assert self.params == other.params
        out = KLL(self.params)
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for l in range(depth):
            a = self.levels[l] if l < len(self.levels) else np.empty(0)
            b = other.levels[l] if l < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]))
        # advance rng differently per merge input sizes (deterministic)
        out._rng_state = (self._rng_state ^ other._rng_state) or 1
        out._compact()
        return out

    def rank(self, x: float) -> float:
        """Estimated number of items <= x."""
        r = 0.0
        for l, buf in enumerate(self.levels):
            if len(buf):
                r += (1 << l) * float((buf <= x).sum())
        return r

    def quantile(self, q: float) -> float:
        items = []
        weights = []
        for l, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << l, dtype=np.float64))
        if not items:
            return math.nan
        items = np.concatenate(items)
        weights = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        total = cum[-1]
        target = np.clip(q, 0, 1) * total
        i = int(np.searchsorted(cum, target))
        i = min(i, len(items) - 1)
        est = float(items[i])
        return float(min(max(est, self.min), self.max))

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<QddQI", self.n, self.min, self.max, self._rng_state & (2**64 - 1),
            len(self.levels),
        )
        parts = [head]
        for buf in self.levels:
            parts.append(struct.pack("<I", len(buf)))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, params: KllParams, data: bytes) -> "KLL":
        out = cls(params)
        n, vmin, vmax, rng, depth = struct.unpack_from("<QddQI", data, 0)
        out.n, out.min, out.max, out._rng_state = n, vmin, vmax, rng
        off = struct.calcsize("<QddQI")
        out.levels = []
        for _ in range(depth):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            out.levels.append(
                np.frombuffer(data, dtype=np.float64, count=cnt, offset=off).copy()
            )
            off += 8 * cnt
        return out


def build_kll(
    values_df: DataFrame, value_col: str = "value",
    params: KllParams | None = None, fanout: int = 16,
) -> KLL:
    """Distributed mergeable KLL (partial per partition → tree merge);
    shares the sketch tree-merge plan in sketches._tree_build."""
    params = params or KllParams()
    values_df = values_df.select(F.col(value_col).cast("double").alias("value"))
    return _tree_build(
        values_df,
        "value",
        make=lambda: KLL(params),
        add=lambda s, v: s.add(v),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: KLL.from_bytes(params, b),
        fanout=fanout,
    )
